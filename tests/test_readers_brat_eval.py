"""BIO/brat text-format readers, writer round-trips, and the brat-style
strict/lenient micro/macro evaluator (expected values produced by running
the reference `eval_scripts/brat_eval.py` on the same fixture corpus)."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"

GOLD_DOC1 = """T1\tproblem 10 20\theadache x
T2\tdrug 30 38\taspirin1
T3\ttest 50 60\tblood test
"""
SYS_DOC1 = """T1\tproblem 10 20\theadache x
T2\tdrug 31 38\tspirin1
T3\tproblem 12 18\tadache
T4\ttest 70 80\tother test
"""
GOLD_DOC2 = "T1\tdrug 5 12\tstatin x\n"
SYS_DOC2 = "T1\tdrug 5 12\tstatin x\nT2\tdrug 5 12\tstatin x\n"


@pytest.fixture()
def brat_dirs(tmp_path):
    g = tmp_path / "gold"
    s = tmp_path / "sys"
    g.mkdir(); s.mkdir()
    (g / "doc1.ann").write_text(GOLD_DOC1)
    (s / "doc1.ann").write_text(SYS_DOC1)
    (g / "doc2.ann").write_text(GOLD_DOC2)
    (s / "doc2.ann").write_text(SYS_DOC2)
    return str(g), str(s)


def test_brat_reader(ray_session, brat_dirs):
    from clinicaltransformerner_ray.sources.brat import read_brat

    g, _ = brat_dirs
    tags, rels = read_brat(g)
    rows = sorted(tags.take_all(), key=lambda r: (r["doc_id"], r["tid"]))
    assert len(rows) == 4
    assert rows[0] == {"doc_id": "doc1", "tid": "T1", "type": "problem",
                       "start": 10, "end": 20, "text": "headache x"}
    assert rels.count() == 0


def test_brat_reader_discontinuous_and_relations(ray_session, tmp_path):
    from clinicaltransformerner_ray.sources.brat import parse_ann

    txt = ("T1\tproblem 5 9;10 15\tfoo bar\n"
           "T2\tdrug 20 25\tzap\n"
           "R1\ttreats Arg1:T2 Arg2:T1\n")
    tags, rels = parse_ann("d", txt)
    assert tags[0]["start"] == 5 and tags[0]["end"] == 15
    assert rels == [{"doc_id": "d", "rid": "R1", "rtype": "treats",
                     "arg1": "T2", "arg2": "T1"}]


@pytest.mark.parametrize("mode,exp", [
    # expected values from running the reference brat_eval.py on this corpus
    ("strict", {"tp": 2, "fp": 3, "fn": 2,
                "micro": (0.4, 0.5, 0.4444),
                "macro": (0.625, 0.6667, 0.6429)}),
    ("lenient", {"tp": 3, "fp": 1, "fn": 1,
                 "micro": (0.75, 0.75, 0.75),
                 "macro": (0.8333, 0.8333, 0.8333)}),
])
def test_brat_eval_matches_reference(ray_session, brat_dirs, mode, exp):
    from clinicaltransformerner_ray.pipelines.brat_eval_pipeline import (
        brat_span_eval)
    from clinicaltransformerner_ray.sources.brat import read_brat

    g, s = brat_dirs
    gold, _ = read_brat(g)
    sys_, _ = read_brat(s)
    res = brat_span_eval(gold, sys_, mode=mode)
    assert (res["tp"], res["fp"], res["fn"]) == (exp["tp"], exp["fp"], exp["fn"])
    for key, (p, r, f1) in (("micro", exp["micro"]), ("macro", exp["macro"])):
        assert round(res[key]["precision"], 4) == p
        assert round(res[key]["recall"], 4) == r
        assert round(res[key]["f1"], 4) == f1
    assert res["unpaired_gold"] == [] and res["unpaired_sys"] == []


def test_brat_eval_reports_unpaired_docs(ray_session, tmp_path):
    from clinicaltransformerner_ray.pipelines.brat_eval_pipeline import (
        brat_span_eval)
    from clinicaltransformerner_ray.sources.brat import read_brat

    g = tmp_path / "g"; s = tmp_path / "s"
    g.mkdir(); s.mkdir()
    (g / "a.ann").write_text(GOLD_DOC2)
    (g / "only_gold.ann").write_text(GOLD_DOC2)
    (s / "a.ann").write_text(SYS_DOC2)
    (s / "only_sys.ann").write_text(SYS_DOC2)
    gold, _ = read_brat(str(g))
    sys_, _ = read_brat(str(s))
    res = brat_span_eval(gold, sys_)
    assert res["unpaired_gold"] == ["only_gold"]
    assert res["unpaired_sys"] == ["only_sys"]
    assert res["n_docs"] == 1


def test_bio_roundtrip(ray_session, tmp_path):
    """read_bio ∘ format_bio == identity on token/label content."""
    import ray.data as rd

    from clinicaltransformerner_ray.sources.bio_text import (
        format_bio, parse_bio_text, read_bio)

    bio = ("Patient O\nhas O\nsevere B-problem\npain I-problem\n\n"
           "Taking O\naspirin B-drug\n")
    (tmp_path / "note1.txt").write_text(bio)
    ds = read_bio(str(tmp_path / "note1.txt"))
    rows = sorted(ds.take_all(), key=lambda r: r["sent_idx"])
    assert [list(r["tokens"]) for r in rows] == [
        ["Patient", "has", "severe", "pain"], ["Taking", "aspirin"]]
    assert list(rows[0]["labels"]) == ["O", "O", "B-problem", "I-problem"]

    out = format_bio(rd.from_items([
        {k: (list(v) if isinstance(v, (list, tuple)) or
             hasattr(v, "__len__") and not isinstance(v, str) else v)
         for k, v in r.items()} for r in rows])).take_all()
    assert out[0]["bio_text"] == bio

    # offset-bearing variant parses the reference 6-field format
    rows6 = parse_bio_text("d", "word 3 7 3 7 B-x\n")
    assert rows6[0]["offsets"] == [[3, 7]]
    # malformed lines are skipped with a count (data_utils.py:150-158)
    rows_bad = parse_bio_text("d", "one 1 2 X\nok O\n")
    assert rows_bad[0]["tokens"] == ["ok"]
    assert rows_bad[0]["n_malformed"] == 1


def test_bio_test_mode_forces_O(ray_session, tmp_path):
    from clinicaltransformerner_ray.sources.bio_text import parse_bio_text

    rows = parse_bio_text("d", "a B-x\nb I-x\n", test_mode=True)
    assert rows[0]["labels"] == ["O", "O"]


# ---------------------------------------------------------------------------
# relation evaluation (A5 complete: tags + relations micro/macro)

GOLD_RELS = {
    "doc1": ("T1\tdrug 10 18\twarfarin\n"
             "T2\tsymptom 25 33\theadache\n"
             "T3\tdrug 40 47\taspirin\n"
             "R1\tcauses Arg1:T1 Arg2:T2\n"
             "R2\ttreats Arg1:T3 Arg2:T2\n"),
    "doc2": ("T1\tdrug 5 12\tlisinop\n"
             "T2\tsymptom 20 25\tcough\n"
             "R1\tcauses Arg1:T1 Arg2:T2\n"),
    "doc3": "T1\tdrug 0 4\tdrugx\n",
}
SYS_RELS = {
    "doc1": ("T1\tdrug 10 18\twarfarin\n"
             "T2\tsymptom 26 33\teadache\n"
             "T3\tdrug 40 47\taspirin\n"
             "T4\tdrug 60 65\textra\n"
             "R1\tcauses Arg1:T1 Arg2:T2\n"
             "R2\ttreats Arg1:T4 Arg2:T2\n"),
    "doc2": ("T1\tdrug 5 12\tlisinop\n"
             "T2\tsymptom 20 25\tcough\n"
             "R1\tcauses Arg1:T2 Arg2:T1\n"),
    "doc3": ("T1\tdrug 0 4\tdrugx\n"
             "R1\tcauses Arg1:T1 Arg2:T1\n"),
}

# expected values produced by running the REFERENCE evaluator
# (src/eval_scripts/brat_eval.py MultipleEvaluator.track2) on exactly
# these fixture files — see brat_eval.py:264-364
EXPECTED = {
    "strict": {
        "tags": {"tp": 5, "fp": 2, "fn": 1,
                 "micro": (0.7142857142857143, 0.8333333333333334,
                           0.7692307692307692),
                 "macro": (0.8333333333333334, 0.8888888888888888,
                           0.8571428571428572)},
        "relations": {"tp": 0, "fp": 4, "fn": 3,
                      "micro": (0.0, 0.0, 0.0),
                      "macro": (0.0, 0.0, 0.0)},
    },
    "lenient": {
        "tags": {"tp": 6, "fp": 1, "fn": 0,
                 "micro": (0.8571428571428571, 1.0, 0.923076923076923),
                 "macro": (0.9166666666666666, 1.0, 0.9523809523809524)},
        "relations": {"tp": 1, "fp": 3, "fn": 2,
                      "micro": (0.25, 0.3333333333333333,
                                0.28571428571428575),
                      "macro": (0.16666666666666666, 0.16666666666666666,
                                0.16666666666666666)},
    },
}


@pytest.mark.parametrize("mode", ["strict", "lenient"])
def test_brat_full_eval_matches_reference(ray_session, tmp_path, mode):
    from clinicaltransformerner_ray.pipelines.brat_eval_pipeline import (
        brat_full_eval)
    from clinicaltransformerner_ray.sources.brat import read_brat

    g = tmp_path / "gold"; s = tmp_path / "sys"
    g.mkdir(); s.mkdir()
    for d, content in GOLD_RELS.items():
        (g / f"{d}.ann").write_text(content)
    for d, content in SYS_RELS.items():
        (s / f"{d}.ann").write_text(content)
    gt, gr = read_brat(str(g))
    st, sr = read_brat(str(s))
    res = brat_full_eval(gt, gr, st, sr, mode=mode)
    assert res["n_docs"] == 3
    for target in ("tags", "relations"):
        want = EXPECTED[mode][target]
        got = res[target]
        assert (got["tp"], got["fp"], got["fn"]) == (
            want["tp"], want["fp"], want["fn"]), (mode, target)
        for level in ("micro", "macro"):
            for i, metric in enumerate(("precision", "recall", "f1")):
                assert got[level][metric] == pytest.approx(
                    want[level][i], abs=1e-12), (mode, target, level, metric)


def test_do_lower_and_label_gap_and_copier(ray_session, tmp_path):
    """S2 do_lower (whole-text lowercasing, common_io.py:43-47), D2
    dev-label gap warning (data_utils.py:99-101), K7 text copier
    (output_format_converter.py:142-144)."""
    from clinicaltransformerner_ray.labels import dev_label_gap
    from clinicaltransformerner_ray.sinks.formatters import copy_source_texts
    from clinicaltransformerner_ray.sources.bio_text import parse_bio_text

    rows = parse_bio_text("d", "Foo B-X\nBAR O\n", do_lower=True)
    assert rows[0]["tokens"] == ["foo", "bar"]
    assert rows[0]["labels"] == ["b-x", "o"]  # labels lowered too, as ref

    assert dev_label_gap({"B-a", "O"}, {"B-a", "B-b", "O"}) == {"B-b"}
    assert dev_label_gap({"B-a", "O"}, {"O"}) == set()

    src = tmp_path / "src"; dst = tmp_path / "dst"
    src.mkdir()
    (src / "n1.txt").write_text("hello")
    (src / "n2.txt").write_text("world")
    (src / "skip.ann").write_text("x")
    assert copy_source_texts(str(src), str(dst)) == 2
    assert (dst / "n1.txt").read_text() == "hello"
    assert not (dst / "skip.ann").exists()


def test_read_split_name_resolution(ray_session, tmp_path):
    """S4 getters: <dir>/<split>.txt defaults, file_name override, and
    test-mode label masking — mirrors data_utils.py:58-71."""
    import pytest as _pytest

    from clinicaltransformerner_ray.sources.bio_text import read_split

    (tmp_path / "train.txt").write_text("tok B-x\n\n")
    (tmp_path / "test.txt").write_text("tok B-x\n\n")
    (tmp_path / "alt.txt").write_text("alt B-y\n\n")

    tr = read_split(str(tmp_path), "train").take_all()
    assert tr[0]["labels"] == ["B-x"]
    te = read_split(str(tmp_path), "test").take_all()
    assert te[0]["labels"] == ["O"]          # test task mode
    al = read_split(str(tmp_path), "dev", file_name="alt.txt").take_all()
    assert al[0]["tokens"] == ["alt"]
    with _pytest.raises(ValueError):
        read_split(str(tmp_path), "validation")
