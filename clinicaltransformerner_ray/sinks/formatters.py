"""Output formatters — the reference's writer surface (SURVEY.md §2.2)
re-expressed over the mention table.

  brat_annotations   K2: per-document `.ann` text — `T{n}\\ttype s e\\ttext`
                     lines with per-doc sequential ids (A8) and the
                     newline-in-span discontinuous-offset repair (M12)
  bioc_documents     K3: the same content as minimal BioC XML passages
  bio_lines          K1: token/label rows -> blank-line-separated BIO text

All three are per-document projections: one groupby on the document key
((conv_id, turn_idx) here; note stem in the reference) with deterministic
intra-doc ordering (sort by start offset, reference
`output_format_converter.py:212-232`), emitted as one row per document so
a downstream ``write_parquet`` — or a trivial per-row file writer — lands
one artifact per document.  Cited: `output_format_converter.py:18`
(brat template), `:19-41` (BioC templates), `common_io.py:63-70` (BIO).
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from clinicaltransformerner_ray.functions.spans import discontinuous_offsets

BRAT_TEMPLATE = "T{n}\t{t} {o}\t{text}"

BIOC_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    "<collection><source>clinicaltransformerner_ray</source>\n")
BIOC_FOOTER = "</collection>\n"


def _doc_key(df: pd.DataFrame) -> pd.Series:
    return df["conv_id"].astype(str) + ":" + df["turn_idx"].astype(str)


def brat_annotations(mentions: rd.Dataset) -> rd.Dataset:
    """(conv_id, turn_idx, ann) — one brat .ann document per turn.

    Sequential T ids restart per document after an intra-doc sort by
    (start, end) — deterministic regardless of upstream block order."""

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["start", "end", "type"]).reset_index(drop=True)
        lines = []
        for n, r in enumerate(g.itertuples(), start=1):
            field, text = discontinuous_offsets(r.surface, r.start, r.end)
            lines.append(BRAT_TEMPLATE.format(n=n, t=r.type, o=field, text=text))
        return pd.DataFrame({
            "conv_id": [g["conv_id"].iloc[0]],
            "turn_idx": [g["turn_idx"].iloc[0]],
            "ann": ["\n".join(lines) + ("\n" if lines else "")],
        })

    return mentions.groupby(["conv_id", "turn_idx"]).map_groups(
        per_doc, batch_format="pandas")


def bioc_documents(mentions: rd.Dataset) -> rd.Dataset:
    """(conv_id, turn_idx, xml) — minimal BioC annotation block per turn
    (reference templates `output_format_converter.py:19-41`)."""

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["start", "end", "type"]).reset_index(drop=True)
        parts = [f'<document><id>{g["conv_id"].iloc[0]}:'
                 f'{g["turn_idx"].iloc[0]}</id><passage><offset>0</offset>']
        for n, r in enumerate(g.itertuples(), start=1):
            _field, text = discontinuous_offsets(r.surface, r.start, r.end)
            parts.append(
                f'<annotation id="{n}">'
                f'<infon key="type">{r.type}</infon>'
                f'<location offset="{r.start}" length="{r.end - r.start}"/>'
                f"<text>{text}</text></annotation>")
        parts.append("</passage></document>")
        return pd.DataFrame({
            "conv_id": [g["conv_id"].iloc[0]],
            "turn_idx": [g["turn_idx"].iloc[0]],
            "xml": ["".join(parts)],
        })

    return mentions.groupby(["conv_id", "turn_idx"]).map_groups(
        per_doc, batch_format="pandas")


def bio_lines(tokens: list[str], labels: list[str]) -> str:
    """K1: one sentence's BIO block (space-joined `word label` lines,
    `common_io.py:63-70`)."""
    return "\n".join(f"{w} {lb}" for w, lb in zip(tokens, labels))


def write_partitioned(ds: rd.Dataset, out_dir: str, *, column: str) -> None:
    """Streamed sink: one parquet directory, files sized by Ray's block
    layout — never a single giant file (resumable-output rule)."""
    ds.write_parquet(out_dir, partition_cols=None)
