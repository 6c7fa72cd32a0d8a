"""Unit tests for the pure reference-semantics functions (no Ray)."""

import numpy as np
import pytest

from clinicaltransformerner_ray.labels import (
    NEXT_GUARD,
    build_label_vocab,
    invert,
    system_labels,
)
from clinicaltransformerner_ray.functions.decode import (
    argmax_decode,
    decode_windows,
    fix_bio,
    fix_system_labels,
)
from clinicaltransformerner_ray.functions.eval_bio import (
    counts,
    eval_sentence_pair,
    load_exclude_tags,
    merge_counters,
    performance,
)
from clinicaltransformerner_ray.functions.lexicon import (
    Lexicon,
    perturb_tags,
    project_tags_to_subtokens,
    tags_to_logits,
)
from clinicaltransformerner_ray.functions.spans import (
    discontinuous_offsets,
    spans_to_bio,
    tag2entity_turn,
)
from clinicaltransformerner_ray.functions.subword import MockWordpieceTokenizer
from clinicaltransformerner_ray.functions.text import normalize_surface, tokenize_with_offsets
from clinicaltransformerner_ray.functions.windowing import make_windows, word_boundary_cut


def test_label_vocab_control_ids_below_O():
    """data_utils.py:78,86 — control labels must have ids < id('O')."""
    v = build_label_vocab(["problem", "drug"])
    assert v["PAD"] == 0 and v["CLS"] == 1 and v["X"] == 2 and v["O"] == 3
    assert system_labels(v) == {"PAD", "CLS", "X"}
    # sorted by type suffix (data_utils.py:103)
    tags = [k for k, i in sorted(v.items(), key=lambda kv: kv[1]) if "-" in k]
    assert tags == ["B-drug", "I-drug", "B-problem", "I-problem"]


def test_tokenize_with_offsets():
    toks, offs = tokenize_with_offsets("Hello  world\nfoo")
    assert toks == ["Hello", "world", "foo"]
    assert offs == [(0, 5), (7, 12), (13, 16)]
    assert normalize_surface("  A   B ") == "a b"


def test_fix_bio_reference_cases():
    """task.py:467-491: leading I-x; O,I-x; I-y after x!=y."""
    assert fix_bio(["I-a", "I-a", "O"]) == ["B-a", "I-a", "O"]
    assert fix_bio(["O", "I-a", "I-a"]) == ["O", "B-a", "I-a"]
    assert fix_bio(["B-a", "I-b"]) == ["B-a", "B-b"]
    assert fix_bio(["B-a", "I-a", "I-a"]) == ["B-a", "I-a", "I-a"]
    # repaired prev is used for the next comparison
    assert fix_bio(["O", "I-a", "I-a", "I-b"]) == ["O", "B-a", "I-a", "B-b"]


def test_fix_system_labels():
    v = build_label_vocab(["a"])
    sys_lb = system_labels(v)
    assert fix_system_labels(["X", "B-a", "PAD", "CLS", "O"], sys_lb) == [
        "O", "B-a", "O", "O", "O"]


def test_tag2entity_semantics():
    toks = ["aa", "bb", "cc", "dd", "ee"]
    offs = [(0, 2), (3, 5), (6, 8), (9, 11), (12, 14)]
    labels = ["B-x", "I-x", "O", "B-y", "I-x"]
    ents = tag2entity_turn(toks, offs, labels)
    # I-x after B-y closes y and opens x (output_format_converter.py:174-183)
    assert ents == [("aa bb", 0, 5, "x"), ("dd", 9, 11, "y"), ("ee", 12, 14, "x")]
    # trailing open span is flushed (:189-190)
    assert tag2entity_turn(toks[:2], offs[:2], ["O", "B-x"]) == [("bb", 3, 5, "x")]


def test_spans_to_bio_roundtrip():
    labels = ["O", "B-x", "I-x", "O", "B-y"]
    toks = ["a", "b", "c", "d", "e"]
    offs = [(i, i + 1) for i in range(5)]
    ents = tag2entity_turn(toks, offs, labels)
    spans = []
    for _, s, e, t in ents:
        ws = [i for i, (a, b) in enumerate(offs) if a >= s and b <= e]
        spans.append((ws[0], ws[-1] + 1, t))
    assert spans_to_bio(5, spans) == labels


def test_discontinuous_offsets():
    field, text = discontinuous_offsets("ab\ncd", 10, 15)
    assert field == "10 12;13 15" and text == "ab cd"
    field, text = discontinuous_offsets("abcd", 3, 7)
    assert field == "3 7" and text == "abcd"


def test_windowing_roundtrip_and_next_guard():
    """M2 property: windows reassemble to the original token/label sequence;
    non-final windows end with [next]/NEXT_GUARD (data_utils.py:301-331)."""
    tok = MockWordpieceTokenizer(piece_len=3)
    v = build_label_vocab(["x"])
    words = [f"wordy{i}" for i in range(40)]
    labels = ["B-x" if i % 7 == 0 else "O" for i in range(40)]
    wins = make_windows(words, labels, tok, max_seq_length=16, label2idx=v)
    assert len(wins) > 2
    # reassemble: walk guards, first-subtoken labels
    idx2label = invert(v)
    seen_words, seen_labels = [], []
    prev_gd = 0
    for w in wins:
        assert len(w.input_ids) == 16 == len(w.guards) == len(w.attention_mask)
        for k, gd in enumerate(w.guards):
            if gd == 0:
                continue
            if gd == NEXT_GUARD:
                break
            if gd != prev_gd:
                seen_words.append(gd)
                seen_labels.append(idx2label[w.label_ids[k]])
                prev_gd = gd
    assert seen_words == list(range(1, 41))
    assert seen_labels == labels
    # every non-final window carries the NEXT_GUARD marker
    for w in wins[:-1]:
        assert NEXT_GUARD in w.guards
    assert NEXT_GUARD not in wins[-1].guards


def test_word_boundary_cut():
    guards = [1, 1, 2, 2, 2, 3]
    assert word_boundary_cut(guards, 4) == 2
    assert word_boundary_cut(guards, 5) == 5
    # degenerate: whole prefix is one word -> returns i (reference
    # find_idx falls through its loop, data_utils.py:268-274)
    assert word_boundary_cut(guards, 1) == 1


def test_decode_windows_merges_sentence():
    tok = MockWordpieceTokenizer(piece_len=3)
    v = build_label_vocab(["x"])
    idx2label = invert(v)
    words = [f"w{i}abcdef" for i in range(30)]
    word_tags = ["B-x" if i % 5 == 0 else "O" for i in range(30)]
    wins = make_windows(words, ["O"] * 30, tok, 16, v)
    # mock model output: project word tags onto subtokens, then argmax decode
    masks, preds, guards = [], [], []
    for w in wins:
        sub_labels = project_tags_to_subtokens(word_tags, w.guards)
        logits = tags_to_logits(sub_labels, v, len(v))
        preds.append(argmax_decode(logits).tolist())
        masks.append(w.attention_mask)
        guards.append(w.guards)
    y = decode_windows(masks, preds, guards, idx2label)
    y = fix_system_labels(y, system_labels(v))
    assert y == word_tags


def test_perturb_net_neutral_after_repair():
    lex = Lexicon([(("aa", "bb"), "x", "E1"), (("cc",), "y", "E2")])
    words = ["f1", "aa", "bb", "f2", "cc", "f3"]
    tags = lex.tag_words(words)
    assert tags == ["O", "B-x", "I-x", "O", "B-y", "O"]
    noisy = perturb_tags(words, tags, mod=1)  # flip every B
    assert noisy == ["O", "I-x", "I-x", "O", "I-y", "O"]
    assert fix_bio(noisy) == tags


def test_eval_golden_example():
    """The reference's in-memory golden example
    (new_bio_eval.py:381-383, expected at bio_prf_eval.py:2-35)."""
    gold = [["O", "O", "B-MISC", "O", "O", "B-MISC", "I-MISC", "I-MISC", "I-MISC", "I-MISC", "O"],
            ["O", "B-PER", "I-PER", "O", "O", "B-MISC", "I-MISC", "O", "B-MISC", "O", "O"]]
    pred = [["O", "O", "B-MISC", "O", "O", "B-MISC", "I-MISC", "O", "O", "B-MISC", "O"],
            ["O", "B-PER", "I-PER", "O", "O", "B-MISC", "O", "O", "B-MISC", "O", "O"]]
    merged = merge_counters([eval_sentence_pair(g, p) for g, p in zip(gold, pred)])
    c = counts(merged)
    # gold spans: misc x4, per x1
    assert c["expect"]["overall"] == 5
    assert c["expect"]["misc"] == 4 and c["expect"]["per"] == 1
    # pred spans: per 1 strict-true; misc: 1 strict true (sent1 span1),
    # the split long span -> relax matches with double-count guard
    perf = performance(merged)
    assert 0 < perf["overall"]["strict"]["f_score"] <= 1
    assert perf["overall"]["relax"]["f_score"] >= perf["overall"]["strict"]["f_score"]
    assert perf["category"]["strict"]["per"]["f_score"] == 1.0


def test_eval_identity_is_perfect():
    g = [["O", "B-a", "I-a", "O", "B-b"]]
    merged = merge_counters([eval_sentence_pair(s, s) for s in g])
    perf = performance(merged)
    assert perf["overall"]["strict"] == {"precision": 1.0, "recall": 1.0, "f_score": 1.0}
    assert perf["overall"]["acc"] == 1.0


def test_eval_against_reference_structure():
    """Counts structure mirrors bio_prf_eval.py:24-35 exactly for the
    documented xx/yy example shape."""
    gold = [["B-xx", "I-xx", "O", "B-yy", "O", "B-xx", "O", "B-yy", "I-yy", "O", "B-xx", "O", "B-yy", "O"]]
    pred = [["B-xx", "I-xx", "O", "B-yy", "I-yy", "B-xx", "O", "O", "I-yy", "O", "B-xx", "I-xx", "O", "B-yy"]]
    merged = merge_counters([eval_sentence_pair(g, p) for g, p in zip(gold, pred)])
    c = counts(merged)
    assert set(c["prediction"]["strict"].keys()) == {"xx", "yy", "overall"}
    assert c["expect"]["overall"] == 6


def test_load_exclude_tags_file_plumbing(tmp_path):
    """Exclusion list from FILE (new_bio_eval.py:356-368): one tag per
    line, lowercased at the consumer boundary (bio_prf_eval.py:101-103),
    excluded categories drop out of the counters entirely."""
    f = tmp_path / "not_for_eval.txt"
    f.write_text("B-MISC\nI-MISC\n\n  B-PER  \nI-PER\n")
    excl = load_exclude_tags(str(f))
    assert excl == {"b-misc", "i-misc", "b-per", "i-per"}
    gold = [["B-MISC", "I-MISC", "O", "B-PER", "O", "B-LOC"]]
    pred = [["B-MISC", "I-MISC", "O", "B-PER", "O", "B-LOC"]]
    merged = merge_counters(
        [eval_sentence_pair(g, p, excluded=excl | {"o"}) for g, p in zip(gold, pred)]
    )
    c = counts(merged)
    assert c["expect"]["overall"] == 1  # only LOC survives
    assert set(c["expect"]) == {"overall", "loc"}


def test_argmax_decode_matches_plain_argmax():
    rng = np.random.RandomState(0)
    logits = rng.normal(size=(7, 9)).astype(np.float32)
    assert np.array_equal(argmax_decode(logits), logits.argmax(-1))


def test_viterbi_matches_brute_force():
    """T3: DP decode == exhaustive search on random small problems."""
    from clinicaltransformerner_ray.functions.crf import (
        brute_force_decode, viterbi_decode)

    rng = np.random.RandomState(7)
    for _ in range(20):
        T, C = int(rng.randint(2, 6)), int(rng.randint(2, 5))
        em = rng.normal(size=(T, C))
        tr = rng.normal(size=(C, C))
        assert list(viterbi_decode(em, tr)) == list(brute_force_decode(em, tr))


def test_viterbi_zero_transitions_is_argmax():
    from clinicaltransformerner_ray.functions.crf import viterbi_decode

    rng = np.random.RandomState(3)
    em = rng.normal(size=(4, 9, 6))
    tr = np.zeros((6, 6))
    out = viterbi_decode(em, tr)
    assert (out == em.argmax(axis=-1)).all()


def test_viterbi_respects_mask():
    from clinicaltransformerner_ray.functions.crf import viterbi_decode

    rng = np.random.RandomState(5)
    em = rng.normal(size=(2, 5, 3))
    tr = rng.normal(size=(3, 3))
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    out = viterbi_decode(em, tr, mask=mask)
    full = viterbi_decode(em[0, :3], tr)
    assert (out[0, :3] == full).all() and (out[0, 3:] == 0).all()


def test_viterbi_prepad_mask_alignment():
    """XLNet-style pre-padding (mask zeros at the FRONT): the decode
    must land in positions [T-L, T) aligned with the guards, and equal
    the post-pad decode of the same real emissions (r2 advice)."""
    from clinicaltransformerner_ray.functions.crf import (
        brute_force_decode, viterbi_decode)

    rng = np.random.RandomState(11)
    T, C = 6, 4
    tr = rng.normal(size=(C, C))
    for _ in range(30):
        L = int(rng.randint(1, T + 1))
        em_real = rng.normal(size=(L, C)) * 3
        ref = brute_force_decode(em_real, tr)
        em = np.zeros((T, C))
        em[T - L:] = em_real
        mask = np.zeros(T, dtype=bool)
        mask[T - L:] = True
        out = viterbi_decode(em, tr, mask=mask)
        assert (out[T - L:] == ref).all()
        assert (out[:T - L] == 0).all()


def test_viterbi_mixed_pad_batch():
    """One batch mixing pre- and post-padded sequences decodes each
    row over its own real index range."""
    from clinicaltransformerner_ray.functions.crf import (
        brute_force_decode, viterbi_decode)

    rng = np.random.RandomState(12)
    T, C = 7, 3
    tr = rng.normal(size=(C, C))
    ems, masks, refs, spans = [], [], [], []
    for b in range(12):
        L = int(rng.randint(1, T + 1))
        em_real = rng.normal(size=(L, C)) * 3
        s = (T - L) if b % 2 else 0
        em = np.zeros((T, C))
        mask = np.zeros(T, dtype=bool)
        em[s:s + L] = em_real
        mask[s:s + L] = True
        ems.append(em)
        masks.append(mask)
        refs.append(brute_force_decode(em_real, tr))
        spans.append((s, L))
    out = viterbi_decode(np.stack(ems), tr, np.stack(masks))
    for b, (s, L) in enumerate(spans):
        assert (out[b, s:s + L] == refs[b]).all()
