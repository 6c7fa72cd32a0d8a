"""Biaffine JSON reader/writer (SURVEY.md §2.1 S5, §2.2 K4).

The reference's biaffine route reads training/prediction examples as
``[{tokens: [...], entities: [[text, type, [s, e]], ...]}]`` with
WORD-INDEX inclusive spans (`src/transformer_biaffine_ner/
data_utils.py:192-208`; fixture `test_data/biaffine_conll2003/train.json`)
and writes predictions as ``[{tokens, entities: [(text, type, s, e)]}]``
with ``e`` already +1'd for list slicing
(`src/transformer_biaffine_ner/task.py:108-115`).

Engine mapping: one Dataset row per example, entities exploded into
parallel list columns (Arrow list<> — never Python objects in blocks).
The single-array-JSON layout is the reference's small-file format; at
scale the same rows round-trip through ``.jsonl`` shards
(``read_biaffine_jsonl`` / ``Dataset.write_json``), which is the path a
100 TB corpus would use.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data as rd

EXAMPLE_SCHEMA = pa.schema([
    ("doc_idx", pa.int64()),
    ("tokens", pa.list_(pa.string())),
    ("ent_texts", pa.list_(pa.string())),
    ("ent_types", pa.list_(pa.string())),
    ("ent_starts", pa.list_(pa.int32())),
    ("ent_ends", pa.list_(pa.int32())),
])


def _span(e) -> tuple[int, int]:
    """Both entity shapes: training ``[text, type, [s, e]]``
    (data_utils.py:205) and prediction ``[text, type, s, e]``
    (task.py:108-115)."""
    if isinstance(e[2], (list, tuple)):
        return int(e[2][0]), int(e[2][1])
    return int(e[2]), int(e[3])


def _rows_from_examples(data: list[dict], base_idx: int = 0) -> pa.Table:
    rows = []
    for i, ex in enumerate(data):
        ents = ex.get("entities") or []
        spans = [_span(e) for e in ents]
        rows.append({
            # records may carry an explicit doc_idx (the jsonl scale
            # path needs one for a global id; positional fallback
            # matches the reference's array ordering)
            "doc_idx": int(ex.get("doc_idx", base_idx + i)),
            "tokens": list(ex["tokens"]),
            "ent_texts": [e[0] for e in ents],
            "ent_types": [e[1] for e in ents],
            "ent_starts": [s for s, _ in spans],
            "ent_ends": [e for _, e in spans],
        })
    return pa.Table.from_pylist(rows, schema=EXAMPLE_SCHEMA)


def read_biaffine_json(path: str) -> rd.Dataset:
    """S5: one ``[{tokens, entities}]`` array file -> example Dataset.
    The array format forces a single-file parse (reference small-file
    compat); sharded corpora should use read_biaffine_jsonl."""
    with open(path) as f:
        data = json.load(f)
    return rd.from_arrow(_rows_from_examples(data))


def read_biaffine_jsonl(path: str) -> rd.Dataset:
    """Scale path: newline-delimited {tokens, entities} records, read
    block-parallel (read_text + per-batch json parse — the entity
    triples are heterogeneous arrays Arrow's JSON inference rejects)."""
    raw = rd.read_text(path)

    def to_rows(batch: pa.Table) -> pa.Table:
        data = [json.loads(t) for t in batch.column("text").to_pylist()
                if t.strip()]
        return _rows_from_examples(data)

    return raw.map_batches(to_rows, batch_format="pyarrow")


def collect_entity_types(examples: rd.Dataset) -> list[str]:
    """A10 train-mode side output: sorted unique entity types
    (data_utils.py:200-207 collects the set during the read)."""

    def explode(batch: pa.Table) -> pa.Table:
        out = sorted({t for row in batch.column("ent_types").to_pylist()
                      for t in row})
        return pa.table({"type": pa.array(out, pa.string())})

    parts = examples.map_batches(explode, batch_format="pyarrow")
    return sorted({r["type"] for r in parts.take_all()})


def examples_as_turns(examples: rd.Dataset,
                      conv_id: str = "biaffine") -> rd.Dataset:
    """Project {tokens} examples onto the engine's turn schema so the
    reference's own biaffine fixtures flow through the standard
    tagger/linker pipeline (conv_id, turn_idx, text)."""

    def to_turns(batch: pa.Table) -> pa.Table:
        toks = batch.column("tokens").to_pylist()
        idx = batch.column("doc_idx").to_pylist()
        return pa.table({
            "conv_id": pa.array([conv_id] * len(idx), pa.string()),
            "turn_idx": pa.array(idx, pa.int32()),
            "text": pa.array([" ".join(t) for t in toks], pa.string()),
        })

    return examples.map_batches(to_turns, batch_format="pyarrow")


def gold_spans(examples: rd.Dataset) -> rd.Dataset:
    """Explode the nested entity lists into one span row each
    (doc_idx, text, type, start, end) — word-index inclusive, as read."""

    def explode(batch: pa.Table) -> pa.Table:
        di, tx, ty, ss, ee = [], [], [], [], []
        for row in batch.to_pylist():
            for t, y, s, e in zip(row["ent_texts"], row["ent_types"],
                                  row["ent_starts"], row["ent_ends"]):
                di.append(row["doc_idx"])
                tx.append(t)
                ty.append(y)
                ss.append(s)
                ee.append(e)
        return pa.table({
            "doc_idx": pa.array(di, pa.int64()),
            "text": pa.array(tx, pa.string()),
            "type": pa.array(ty, pa.string()),
            "start": pa.array(ss, pa.int32()),
            "end": pa.array(ee, pa.int32()),
        })

    return examples.map_batches(explode, batch_format="pyarrow")


def write_biaffine_json(examples: rd.Dataset, path: str,
                        *, slice_end: bool = True) -> int:
    """K4: prediction writer — ``[{tokens, entities: [[text, type, s,
    e]]}]`` with ``e+1`` for slicing (task.py:108-115).  Streams
    example rows batch-by-batch into one array file (the reference's
    single-file output contract); returns the number of examples.
    Rows are ordered by doc_idx so output is deterministic."""
    n = 0
    with open(path, "w") as f:
        f.write("[")
        for batch in examples.sort("doc_idx").iter_batches(
                batch_format="pyarrow"):
            for row in batch.to_pylist():
                ents = [[t, y, int(s), int(e) + (1 if slice_end else 0)]
                        for t, y, s, e in zip(
                            row["ent_texts"], row["ent_types"],
                            row["ent_starts"], row["ent_ends"])]
                if n:
                    f.write(", ")
                json.dump({"tokens": list(row["tokens"]),
                           "entities": ents}, f)
                n += 1
        f.write("]")
    return n
