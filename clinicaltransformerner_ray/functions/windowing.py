"""Subword expansion with guard arrays and sentence-window chunking (M1-M3).

Semantics parity with the reference featurizer:

  - per word: first subtoken keeps the word label, continuations get 'X',
    guards record the 1-based word index per subtoken
    (`src/transformer_ner/data_utils.py:287-299`),
  - a sentence whose subtoken length exceeds ``max_seq_length - 2`` is cut
    at the last word boundary before the limit (backward guard scan,
    `data_utils.py:268-274`) and each non-final window is terminated by the
    ``[next]`` token with label 'O' and guard ``NEXT_GUARD``
    (`data_utils.py:301-331`),
  - BERT-family framing: [CLS] (label 'CLS', guard 0) front, [SEP] (label
    'O', guard 0) end, post-padding with PAD/mask 0/guard 0, all-zero
    segment ids (`data_utils.py:174-265`); label->id with OOV->'O'
    (`data_utils.py:241`).

Windows of one sentence stay together as a nested list so the
continuation-window merge during decode is always intra-row (SURVEY.md
§7.5 hard-part #1) — no cross-batch state anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from clinicaltransformerner_ray.labels import CLS, NEXT_GUARD, NEXT_TOKEN, O, PAD, X
from clinicaltransformerner_ray.functions.subword import (
    CLS_TOKEN,
    PAD_TOKEN,
    SEP_TOKEN,
    MockWordpieceTokenizer,
)

SHIFTS = 2  # room for [CLS]/[SEP] in the BERT-family framing (data_utils.py:303-306)


@dataclass
class Window:
    """One fixed-length model input (reference InputFeature, data_utils.py:31-41)."""

    input_tokens: list[str]
    input_ids: list[int]
    attention_mask: list[int]
    segment_ids: list[int]
    label_ids: list[int]
    guards: list[int]


def word_boundary_cut(guards: list[int], i: int) -> int:
    """Index of the first subtoken of the word covering position ``i``
    (backward scan until the guard value changes, data_utils.py:268-274)."""
    prev = guards[i]
    for j in range(i - 1, -1, -1):
        if guards[j] != prev:
            return j + 1
        prev = guards[j]
    return i


def subword_with_guards(
    words: list[str], labels: list[str], tokenizer: MockWordpieceTokenizer
) -> tuple[list[str], list[str], list[int]]:
    """M1: expand words to subtokens; first piece keeps the label,
    continuations get 'X'; guard = 1-based word index (data_utils.py:287-299)."""
    toks: list[str] = []
    labs: list[str] = []
    guards: list[int] = []
    for i, (word, label) in enumerate(zip(words, labels)):
        pieces = tokenizer.tokenize(word)
        toks.extend(pieces)
        for k in range(len(pieces)):
            labs.append(label if k == 0 else X)
            guards.append(i + 1)
    return toks, labs, guards


def _frame_and_pad(
    toks: list[str],
    labs: list[str],
    guards: list[int],
    tokenizer: MockWordpieceTokenizer,
    max_seq_length: int,
    label2idx: dict[str, int],
) -> Window:
    """M3: special-token framing + padding for the BERT family
    (data_utils.py:207-247)."""
    toks = [CLS_TOKEN] + toks + [SEP_TOKEN]
    labs = [CLS] + labs + [O]
    guards = [0] + guards + [0]
    mask = [1] * len(toks)
    while len(toks) < max_seq_length:
        toks.append(PAD_TOKEN)
        labs.append(PAD)
        mask.append(0)
        guards.append(0)
    label_ids = [label2idx.get(lb, label2idx[O]) for lb in labs]
    assert len(toks) == max_seq_length, (len(toks), max_seq_length)
    return Window(
        input_tokens=toks,
        input_ids=tokenizer.convert_tokens_to_ids(toks),
        attention_mask=mask,
        segment_ids=[0] * max_seq_length,
        label_ids=label_ids,
        guards=guards,
    )


def make_windows(
    words: list[str],
    labels: list[str],
    tokenizer: MockWordpieceTokenizer,
    max_seq_length: int,
    label2idx: dict[str, int],
) -> list[Window]:
    """M1+M2+M3 for one sentence: subword expansion then window chunking
    with the [next]/NEXT_GUARD chain (data_utils.py:277-331)."""
    toks, labs, guards = subword_with_guards(words, labels, tokenizer)
    out: list[Window] = []
    tlen = len(toks)
    limit = max_seq_length - SHIFTS
    while tlen > limit:
        cutoff = word_boundary_cut(guards, limit - 1)
        if cutoff == 0:
            # a single word longer than the window: hard-cut (the reference
            # would loop forever here; we bound it and split the word)
            cutoff = limit - 1
        w_toks = toks[:cutoff] + [NEXT_TOKEN]
        w_labs = labs[:cutoff] + [O]
        w_guards = guards[:cutoff] + [NEXT_GUARD]
        out.append(_frame_and_pad(w_toks, w_labs, w_guards, tokenizer, max_seq_length, label2idx))
        toks, labs, guards = toks[cutoff:], labs[cutoff:], guards[cutoff:]
        tlen -= cutoff
    out.append(_frame_and_pad(toks, labs, guards, tokenizer, max_seq_length, label2idx))
    return out
