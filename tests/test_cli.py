"""CLI surface (`python -m clinicaltransformerner_ray`): the reference's
batch-prediction + format-converter jobs driven end-to-end over temp
output dirs, with content checks against the mention table."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _run(argv):
    from clinicaltransformerner_ray.cli import main

    main(argv)  # session owned by the fixture; main must not kill it


def test_cli_predict_brat_files(ray_session, tmp_path):
    out = str(tmp_path / "brat")
    _run(["predict", "--sf-dir", SF, "--output-dir", out,
          "--format", "brat", "--files"])
    files = glob.glob(os.path.join(out, "files", "*.ann"))
    assert files, "no .ann files written"
    body = open(sorted(files)[0]).read()
    # brat T lines: id, type, offsets, surface
    assert body.startswith("T1\t")
    # parquet twin holds the same documents
    n_rows = sum(pq.read_metadata(f).num_rows
                 for f in glob.glob(os.path.join(out, "parquet",
                                                 "*.parquet")))
    assert n_rows == len(files)


def test_cli_predict_bio_labels_match_mentions(ray_session, tmp_path):
    """BIO output: every turn present, token count == whitespace tokens,
    and a turn's B- label count == its mention count."""
    from clinicaltransformerner_ray.pipelines.kg import detect_mentions
    from clinicaltransformerner_ray.sources.turns import (
        load_alias_rows, read_turns)

    out = str(tmp_path / "bio")
    _run(["predict", "--sf-dir", SF, "--output-dir", out,
          "--format", "bio"])
    df = pd.concat([pq.read_table(f).to_pandas() for f in
                    glob.glob(os.path.join(out, "parquet", "*.parquet"))])
    turns = read_turns(SF, columns=["conv_id", "turn_idx", "text"]) \
        .to_pandas()
    assert len(df) == len(turns)
    m = (detect_mentions(
            read_turns(SF, columns=["conv_id", "turn_idx", "text"]),
            load_alias_rows(SF)).to_pandas()
         .groupby(["conv_id", "turn_idx"]).size())
    from clinicaltransformerner_ray.functions.text import (
        tokenize_with_offsets)

    merged = df.merge(turns, on=["conv_id", "turn_idx"])
    for r in merged.head(200).itertuples():
        lines = [ln for ln in r.bio_text.split("\n") if ln]
        assert len(lines) == len(tokenize_with_offsets(r.text or "")[0])
        n_b = sum(1 for ln in lines if ln.split(" ")[1].startswith("B-"))
        assert n_b == m.get((r.conv_id, r.turn_idx), 0)


def test_cli_kg_writes_tables(ray_session, tmp_path):
    out = str(tmp_path / "kg")
    _run(["kg", "--sf-dir", SF, "--output-dir", out])
    tri = sum(pq.read_metadata(f).num_rows for f in
              glob.glob(os.path.join(out, "triples", "*.parquet")))
    ent = sum(pq.read_metadata(f).num_rows for f in
              glob.glob(os.path.join(out, "entities", "*.parquet")))
    assert tri == 1387 and ent == 120  # the sf0.001 flagship outputs


def _run_json(argv, capsys):
    import json

    _run(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_eval_bio_golden_counters(ray_session, tmp_path, capsys):
    """`eval --mode bio` reproduces the reference BioEval counters
    (same fixture + expected values as test_distributed_span_prf,
    produced by running the reference new_bio_eval on this input)."""
    gold_labels = ["O", "O", "B-misc", "O", "O", "B-misc", "I-misc",
                   "I-misc", "I-misc", "I-misc", "O"]
    pred_labels = ["O", "O", "B-misc", "O", "O", "B-misc", "I-misc",
                   "O", "O", "B-misc", "O"]
    g = tmp_path / "gold"
    p = tmp_path / "pred"
    g.mkdir(); p.mkdir()
    (g / "c1.txt").write_text(
        "\n".join(f"w{i} {lb}" for i, lb in enumerate(gold_labels)) + "\n")
    (p / "c1.txt").write_text(
        "\n".join(f"w{i} {lb}" for i, lb in enumerate(pred_labels)) + "\n")
    res = _run_json(["eval", "--mode", "bio",
                     "--gold", str(g), "--pred", str(p)], capsys)
    strict = res["counts"]["prediction"]["strict"]["overall"]
    relax = res["counts"]["prediction"]["relax"]["overall"]
    assert res["counts"]["expect"]["overall"] == 2
    assert strict == {"total": 2, "true": 1, "false": 1}
    assert relax == {"total": 2, "true": 2, "false": 0}
    perf = res["performance"]["overall"]
    assert round(perf["acc"], 4) == 0.7273
    assert perf["strict"]["f_score"] == 0.5
    assert perf["relax"]["f_score"] == 1.0


def test_cli_eval_brat_golden_counters(ray_session, tmp_path, capsys):
    """`eval --mode brat` reproduces the reference brat_eval micro/macro
    scores (same fixture corpus as test_brat_eval_matches_reference)."""
    from tests.test_readers_brat_eval import (
        GOLD_DOC1, GOLD_DOC2, SYS_DOC1, SYS_DOC2)

    g = tmp_path / "gold"
    s = tmp_path / "sys"
    g.mkdir(); s.mkdir()
    (g / "doc1.ann").write_text(GOLD_DOC1)
    (s / "doc1.ann").write_text(SYS_DOC1)
    (g / "doc2.ann").write_text(GOLD_DOC2)
    (s / "doc2.ann").write_text(SYS_DOC2)

    res = _run_json(["eval", "--mode", "brat", "--match", "strict",
                     "--gold", str(g), "--pred", str(s)], capsys)
    assert (res["tp"], res["fp"], res["fn"]) == (2, 3, 2)
    assert round(res["micro"]["f1"], 4) == 0.4444

    res = _run_json(["eval", "--mode", "brat", "--match", "lenient",
                     "--gold", str(g), "--pred", str(s)], capsys)
    assert (res["tp"], res["fp"], res["fn"]) == (3, 1, 1)
    assert round(res["micro"]["f1"], 4) == 0.75

    # exclusion list drops a tag type at the reader (ref brat_eval
    # exclusion lists): excluding 'test' removes one gold/sys pair
    res = _run_json(["eval", "--mode", "brat", "--match", "strict",
                     "--gold", str(g), "--pred", str(s),
                     "--exclude", "test"], capsys)
    assert res["tp"] + res["fn"] == 3  # only problem/drug gold spans left


def test_cli_multimodal_ops(ray_session, tmp_path):
    """`multimodal --op {features,resize,frames}` runs the binary-media
    actor pools from the shell and writes parquet with the stage's
    schema; the resize/frames knobs reach the actors."""
    feats = str(tmp_path / "feats")
    _run(["multimodal", "--sf-dir", SF, "--output-dir", feats,
          "--op", "features", "--batch-size", "32",
          "--concurrency", "2"])
    t = pq.read_table(feats)
    assert t.num_rows > 0
    assert {"media_id", "feature", "decode_ok"} <= set(t.schema.names)

    rsz = str(tmp_path / "resized")
    _run(["multimodal", "--sf-dir", SF, "--output-dir", rsz,
          "--op", "resize", "--out-w", "4", "--out-h", "4"])
    import pyarrow.compute as pc
    r = pq.read_table(rsz)
    imgs = r.filter(pc.and_(pc.equal(r.column("media_type"), "image"),
                            r.column("decode_ok"))).to_pydict()
    assert imgs["meta_width"] and set(imgs["meta_width"]) == {4}
    assert set(imgs["meta_height"]) == {4}

    frm = str(tmp_path / "frames")
    _run(["multimodal", "--sf-dir", SF, "--output-dir", frm,
          "--op", "frames", "--frame-ms", "50", "--hop-ms", "25"])
    f = pq.read_table(frm).to_pydict()
    assert f["media_id"], "no audio frames emitted"
    # 25 ms hop -> frame starts are multiples of 25
    starts = [s for s, i in zip(f["start_ms"], f["frame_idx"]) if i >= 0]
    assert all(s % 25 == 0 for s in starts)
