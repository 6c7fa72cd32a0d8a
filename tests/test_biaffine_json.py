"""Biaffine JSON reader/writer (S5/K4) validated on the reference's own
fixture (`test_data/biaffine_conll2003/train.json`)."""

from __future__ import annotations

import json
import os

import pytest

REF_FIXTURE = "/root/reference/test_data/biaffine_conll2003/train.json"


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE),
                    reason="reference fixture not present")
def test_reads_reference_fixture(ray_session):
    from clinicaltransformerner_ray.sources.biaffine_json import (
        collect_entity_types, gold_spans, read_biaffine_json)

    ds = read_biaffine_json(REF_FIXTURE)
    raw = json.load(open(REF_FIXTURE))
    assert ds.count() == len(raw)
    # the canonical CoNLL-2003 first sentence parses exactly
    row = [r for r in ds.take(5) if len(r["tokens"]) == 9][0]
    assert row["tokens"][0] == "EU"
    assert row["ent_texts"] == ["EU", "German", "British"]
    assert row["ent_types"] == ["ORG", "MISC", "MISC"]
    assert row["ent_starts"] == [0, 2, 6]
    assert row["ent_ends"] == [0, 2, 6]
    assert collect_entity_types(ds) == ["LOC", "MISC", "ORG", "PER"]
    spans = gold_spans(ds)
    want = sum(len(ex["entities"]) for ex in raw)
    assert spans.count() == want


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE),
                    reason="reference fixture not present")
def test_json_roundtrip_on_reference_fixture(ray_session, tmp_path):
    from clinicaltransformerner_ray.sources.biaffine_json import (
        read_biaffine_json, write_biaffine_json)

    ds = read_biaffine_json(REF_FIXTURE).limit(200)
    out = str(tmp_path / "roundtrip.json")
    n = write_biaffine_json(ds, out, slice_end=False)
    assert n == 200
    back = read_biaffine_json(out)
    a = sorted(ds.take_all(), key=lambda r: r["doc_idx"])
    b = sorted(back.take_all(), key=lambda r: r["doc_idx"])
    assert a == b


def test_writer_adds_slice_end(ray_session, tmp_path):
    """The prediction writer emits e+1 (task.py:112-113 'so you can use
    e directly in list slice')."""
    import ray.data as rd

    from clinicaltransformerner_ray.sources.biaffine_json import (
        write_biaffine_json)

    ds = rd.from_items([{
        "doc_idx": 0, "tokens": ["a", "b", "c"],
        "ent_texts": ["b c"], "ent_types": ["x"],
        "ent_starts": [1], "ent_ends": [2],
    }])
    out = str(tmp_path / "pred.json")
    write_biaffine_json(ds, out)
    data = json.load(open(out))
    assert data == [{"tokens": ["a", "b", "c"],
                     "entities": [["b c", "x", 1, 3]]}]
    # and the span slices the tokens directly, as the reference promises
    e = data[0]["entities"][0]
    assert " ".join(data[0]["tokens"][e[2]:e[3]]) == "b c"


def test_jsonl_scale_path(ray_session, tmp_path):
    from clinicaltransformerner_ray.sources.biaffine_json import (
        examples_as_turns, read_biaffine_jsonl)

    p = tmp_path / "ex.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"tokens": ["take", "aspirin"],
                            "entities": [["aspirin", "drug", [1, 1]]]})
                + "\n")
        f.write(json.dumps({"tokens": ["ok"], "entities": []}) + "\n")
    ds = read_biaffine_jsonl(str(p))
    rows = sorted(ds.take_all(), key=lambda r: r["tokens"])
    assert rows[1]["ent_texts"] == ["aspirin"]
    turns = examples_as_turns(ds).take_all()
    assert sorted(t["text"] for t in turns) == ["ok", "take aspirin"]
