"""Brat `.ann` reader (SURVEY.md §2.1 S7).

Parses `T` tag lines (3/4/5-field span variants — discontinuous spans
collapse to first start / last end) and `R` relation lines, exactly as
`src/eval_scripts/brat_eval.py:99-133`.  Output: one Dataset of tag rows
and one of relation rows, both keyed by ``doc_id``.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

TAG_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tid", pa.string()),
    ("type", pa.string()),
    ("start", pa.int64()),
    ("end", pa.int64()),
    ("text", pa.string()),
])

REL_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("rid", pa.string()),
    ("rtype", pa.string()),
    ("arg1", pa.string()),
    ("arg2", pa.string()),
])


def parse_ann(doc_id: str, text: str,
              tags_to_exclude: set[str] | None = None
              ) -> tuple[list[dict], list[dict]]:
    """One .ann file -> (tag rows, relation rows).  Field-count variants
    and the exclude filter follow `brat_eval.py:105-123`."""
    tags: list[dict] = []
    rels: list[dict] = []
    excl = {t.lower() for t in (tags_to_exclude or set())}
    for line in text.split("\n"):
        line = line.strip()
        if line.startswith("T"):
            try:
                tag_id, tag_m, tag_text = line.split("\t")
            except ValueError:
                continue  # malformed: reference prints + proceeds
            fields = tag_m.split(" ")
            if len(fields) == 3:
                ttype, s, e = fields
            elif len(fields) == 4:
                ttype, s, _, e = fields
            elif len(fields) == 5:
                ttype, s, _, _, e = fields
            else:
                continue
            # discontinuous ranges carry ';' fragments: first start /
            # last end, as the reference's field positions imply
            s = s.split(";")[0]
            e = e.split(";")[-1]
            if ttype.lower() in excl:
                continue
            tags.append({
                "doc_id": doc_id, "tid": tag_id, "type": ttype,
                "start": int(s), "end": int(e), "text": tag_text.strip(),
            })
        elif line.startswith("R"):
            try:
                rid, rel_m = line.split("\t")
                rtype, a1, a2 = rel_m.split(" ")
            except ValueError:
                continue
            rels.append({
                "doc_id": doc_id, "rid": rid, "rtype": rtype,
                "arg1": a1.split(":")[1], "arg2": a2.split(":")[1],
            })
    return tags, rels


def read_brat(path: str, *, tags_to_exclude: set[str] | None = None
              ) -> tuple[rd.Dataset, rd.Dataset]:
    """Directory of .ann files -> (tags Dataset, relations Dataset)."""
    files = rd.read_binary_files(path, include_paths=True)

    def parse_tags(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for p, b in zip(batch.column("path").to_pylist(),
                        batch.column("bytes").to_pylist()):
            doc = os.path.splitext(os.path.basename(p))[0]
            tags, _ = parse_ann(doc, b.decode("utf-8"), tags_to_exclude)
            out.extend(tags)
        return (pa.Table.from_pylist(out, schema=TAG_SCHEMA)
                if out else TAG_SCHEMA.empty_table())

    def parse_rels(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for p, b in zip(batch.column("path").to_pylist(),
                        batch.column("bytes").to_pylist()):
            doc = os.path.splitext(os.path.basename(p))[0]
            _, rels = parse_ann(doc, b.decode("utf-8"), tags_to_exclude)
            out.extend(rels)
        return (pa.Table.from_pylist(out, schema=REL_SCHEMA)
                if out else REL_SCHEMA.empty_table())

    return (files.map_batches(parse_tags, batch_format="pyarrow"),
            files.map_batches(parse_rels, batch_format="pyarrow"))
