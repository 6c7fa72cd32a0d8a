"""BIO text-format reader/writer (SURVEY.md §2.1 S1/S2, §2.2 K1).

The reference's interchange format: one token per line
(``word [s e ns ne] label``), blank line between sentences
(`src/transformer_ner/data_utils.py:117-171`,
`src/common_utils/common_io.py:43-70`).  Here a BIO document becomes a
Dataset of sentence rows ``(doc_id, sent_idx, tokens, offsets, labels)``
— nested Arrow list columns, one row per sentence, so window merging and
span assembly stay intra-row.

Reading is `read_binary_files` + a flat_map parser (file = shard);
writing is the inverse projection.  Malformed lines are skipped with a
count, like the reference's warning-and-skip (`data_utils.py:150-158`).
"""

from __future__ import annotations

import os

import pyarrow as pa

from clinicaltransformerner_ray.arrowutil import from_pandas_clean

import ray.data as rd

SENT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("sent_idx", pa.int32()),
    ("tokens", pa.list_(pa.string())),
    ("offsets", pa.list_(pa.list_(pa.int32()))),
    ("labels", pa.list_(pa.string())),
    ("n_malformed", pa.int32()),
])


def parse_bio_text(doc_id: str, text: str, *, test_mode: bool = False,
                   do_lower: bool = False) -> list[dict]:
    """One BIO file -> sentence rows.  ``test_mode`` forces labels 'O'
    (`data_utils.py:167-168`); ``do_lower`` lowercases the WHOLE text
    before parsing — labels included — exactly like the reference
    (`common_io.py:43-47`, used by the eval scripts where labels are
    lowercased anyway, M18)."""
    if do_lower:
        text = text.lower()
    rows: list[dict] = []
    toks: list[str] = []
    offs: list[list[int]] = []
    labs: list[str] = []
    bad = 0

    def flush():
        nonlocal toks, offs, labs, bad
        if toks:
            rows.append({
                "doc_id": doc_id,
                "sent_idx": len(rows),
                "tokens": toks,
                "offsets": offs,
                "labels": labs,
                "n_malformed": bad,
            })
        toks, offs, labs, bad = [], [], [], 0

    for line in text.split("\n"):
        line = line.rstrip("\r")
        if not line.strip():
            flush()
            continue
        parts = line.split(" ")
        if len(parts) == 2:       # word label
            word, label = parts
            off = [-1, -1]
        elif len(parts) >= 6:     # word s e ns ne label (reference offsets)
            word, label = parts[0], parts[-1]
            try:
                off = [int(parts[1]), int(parts[2])]
            except ValueError:
                bad += 1
                continue
        else:
            bad += 1              # skip-with-count (data_utils.py:150-158)
            continue
        toks.append(word)
        offs.append(off)
        labs.append("O" if test_mode else label)
    flush()
    return rows


def read_bio(path: str, *, test_mode: bool = False,
             do_lower: bool = False) -> rd.Dataset:
    """Directory (or single file) of .bio.txt -> sentence Dataset."""
    files = rd.read_binary_files(path, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for p, b in zip(batch.column("path").to_pylist(),
                        batch.column("bytes").to_pylist()):
            doc = os.path.splitext(os.path.basename(p))[0]
            out.extend(parse_bio_text(doc, b.decode("utf-8"),
                                      test_mode=test_mode,
                                      do_lower=do_lower))
        if not out:
            return SENT_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=SENT_SCHEMA)

    return files.map_batches(parse, batch_format="pyarrow")


def format_bio(sentences: rd.Dataset, *, with_offsets: bool = False) -> rd.Dataset:
    """Inverse of read_bio: (doc_id, bio_text) rows — one formatted BIO
    document per doc_id, sentences ordered by sent_idx, blank-line
    separated (`common_io.py:63-70`)."""

    def per_block(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        if df.empty:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "bio_text": pa.array([], pa.string())})
        df = df.sort_values(["doc_id", "sent_idx"])

        def render(row) -> str:
            lines = []
            for i, (w, lb) in enumerate(zip(row["tokens"], row["labels"])):
                if with_offsets and len(row["offsets"]) > i:
                    s, e = row["offsets"][i][0], row["offsets"][i][1]
                    lines.append(f"{w} {s} {e} {s} {e} {lb}")
                else:
                    lines.append(f"{w} {lb}")
            return "\n".join(lines)

        df["sent_text"] = df.apply(render, axis=1)
        out = (df.groupby("doc_id", sort=False)["sent_text"]
               .agg(lambda s: "\n\n".join(s) + "\n").reset_index()
               .rename(columns={"sent_text": "bio_text"}))
        return from_pandas_clean(out, preserve_index=False)

    return sentences.sort(["doc_id", "sent_idx"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None)


#: reference default file name per split (`data_utils.py:58-71`)
SPLIT_FILES = {"train": "train.txt", "dev": "dev.txt", "test": "test.txt"}


def read_split(data_dir: str, split: str, *, file_name: str | None = None,
               do_lower: bool = False) -> rd.Dataset:
    """S4 split-name resolution, mirroring the reference's
    ``get_{train,dev,test}_examples`` (`data_utils.py:58-71`): resolve
    ``<data_dir>/<split>.txt`` unless ``file_name`` overrides, read in
    'train' task mode for train/dev and 'test' mode for test (labels
    forced to 'O', `data_utils.py:69-70`)."""
    if split not in SPLIT_FILES:
        raise ValueError(f"unknown split {split!r}; "
                         f"expected one of {sorted(SPLIT_FILES)}")
    path = os.path.join(data_dir, file_name or SPLIT_FILES[split])
    return read_bio(path, test_mode=(split == "test"), do_lower=do_lower)
