"""CLI entry points — the reference's batch-prediction + format-
converter surface (`run_transformer_batch_prediction.py:86-115` args;
`output_format_converter.py:248-254` do_format codes) re-expressed
over the Ray pipelines, so a reference user can run today's jobs
against this engine from a shell:

  python -m clinicaltransformerner_ray predict \
      --sf-dir /root/testdata/sf0.001 --output-dir /tmp/out \
      --format brat [--decode crf] [--files] [--num-cpus 8]
  python -m clinicaltransformerner_ray kg \
      --sf-dir /root/testdata/sf0.001 --output-dir /tmp/kg

Format mapping (reference do_format): 0 = BIO token/label documents,
1 = brat .ann, 2 = BioC XML.  The default sink is PARTITIONED PARQUET
of (doc key, formatted text) — resumable and scale-safe; ``--files``
additionally renders one reference-style text file per document,
written FROM THE WORKERS (on multi-node the output dir must be shared
storage — the same caveat as the linked-table checkpoint).

Session ownership: per the driver contract only CLI entry points,
bench.py and the test fixture may init Ray — the library never does.
The init here is guarded so the CLI also composes inside an already-
initialized session (e.g. tests).
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa


def _bio_documents(mentions, turns):
    """(conv_id, turn_idx, bio_text): per-turn BIO documents — mention
    spans projected back to token labels (`labels_from_mentions`), then
    one more union/sort join to pair labels with the turn's whitespace
    tokens (the engine's standard equi-join shape)."""
    import numpy as np
    import ray.data as rd

    from clinicaltransformerner_ray.pipelines.eval_pipeline import (
        labels_from_mentions)
    from clinicaltransformerner_ray.sinks.formatters import bio_lines

    labels = labels_from_mentions(mentions, turns)

    SCHEMA = pa.schema([
        ("conv_id", pa.string()),
        ("turn_idx", pa.int64()),
        ("side", pa.string()),
        ("tokens", pa.list_(pa.string())),
        ("labels", pa.list_(pa.string())),
    ])

    def t_side(batch: pa.Table) -> pa.Table:
        from clinicaltransformerner_ray.functions.text import (
            tokenize_with_offsets)

        # the SAME tokenizer labels_from_mentions projects spans onto —
        # split(" ") would disagree on empty/multi-space turns and
        # misalign tokens with labels
        toks = [tokenize_with_offsets(t or "")[0]
                for t in batch.column("text").to_pylist()]
        return pa.table({
            "conv_id": batch.column("conv_id").cast(pa.string()),
            "turn_idx": batch.column("turn_idx").cast(pa.int64()),
            "side": pa.array(["t"] * batch.num_rows, pa.string()),
            "tokens": pa.array(toks, pa.list_(pa.string())),
            "labels": pa.array([[]] * batch.num_rows,
                               pa.list_(pa.string())),
        }, schema=SCHEMA)

    def l_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch.column("conv_id").cast(pa.string()),
            "turn_idx": batch.column("turn_idx").cast(pa.int64()),
            "side": pa.array(["l"] * batch.num_rows, pa.string()),
            "tokens": pa.array([[]] * batch.num_rows,
                               pa.list_(pa.string())),
            "labels": batch.column("labels").cast(pa.list_(pa.string())),
        }, schema=SCHEMA)

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "turn_idx": pa.array([], pa.int64()),
                             "bio_text": pa.array([], pa.string())})
        out = []
        for (cid, tix), g in df.groupby(["conv_id", "turn_idx"],
                                        sort=False):
            toks = next((r for r in g.loc[g["side"] == "t", "tokens"]),
                        None)
            if toks is None:
                continue  # label row without its turn cannot happen
            labs = next((list(r)
                         for r in g.loc[g["side"] == "l", "labels"]),
                        None)
            if labs is None:
                labs = ["O"] * len(toks)  # turn with no mentions
            out.append((cid, int(tix),
                        bio_lines(list(toks), labs) + "\n"))
        return pa.table({
            "conv_id": pa.array([c for c, _, _ in out], pa.string()),
            "turn_idx": pa.array([t for _, t, _ in out], pa.int64()),
            "bio_text": pa.array([b for _, _, b in out], pa.string()),
        })

    both = (turns.map_batches(t_side, batch_format="pyarrow")
            .union(labels.map_batches(l_side, batch_format="pyarrow")))
    # sort on (conv, turn): every turn's 1-2 rows land whole per block
    return both.sort(["conv_id", "turn_idx"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None)


def _write_files(ds, out_dir: str, col: str, ext: str) -> int:
    """Reference-parity sink: one text file per document, written from
    the workers (side-effecting map + count, the build_index feed
    precedent) — the driver never holds the corpus."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        cids = batch.column("conv_id").to_pylist()
        tixs = batch.column("turn_idx").to_pylist()
        for cid, tix, body in zip(cids, tixs,
                                  batch.column(col).to_pylist()):
            path = os.path.join(out_dir, f"{cid}_{tix}.{ext}")
            with open(path, "w") as f:
                f.write(body)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    n = ds.map_batches(dump, batch_format="pyarrow").sum("n")
    return int(n or 0)


def cmd_predict(args) -> None:
    from clinicaltransformerner_ray.pipelines.kg import detect_mentions
    from clinicaltransformerner_ray.sinks.formatters import (
        brat_annotations, bioc_files)
    from clinicaltransformerner_ray.sources.turns import (
        load_alias_rows, read_turns)

    alias_rows = load_alias_rows(args.sf_dir)
    turns = read_turns(args.sf_dir,
                       columns=["conv_id", "turn_idx", "text"])
    mentions = detect_mentions(turns, alias_rows, decode=args.decode)

    if args.format == "brat":
        ds, col, ext = brat_annotations(mentions), "ann", "ann"
    elif args.format == "bioc":
        ds, col, ext = bioc_files(mentions), "xml", "xml"
    else:  # bio (do_format 0)
        ds, col, ext = _bio_documents(mentions, turns), "bio_text", "txt"

    pq_dir = os.path.join(args.output_dir, "parquet")
    ds.write_parquet(pq_dir)
    n = "?"
    if args.files:
        n = _write_files(
            __import__("ray").data.read_parquet(pq_dir),
            os.path.join(args.output_dir, "files"), col, ext)
    print(f"predict: format={args.format} -> {pq_dir}"
          + (f" (+{n} docs as .{ext} files)" if args.files else ""))


def cmd_kg(args) -> None:
    from clinicaltransformerner_ray.pipelines.kg import kg_pipeline

    out = kg_pipeline(args.sf_dir)
    for name in ("triples", "entities"):
        d = os.path.join(args.output_dir, name)
        out[name].write_parquet(d)
        print(f"kg: {name} -> {d}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="clinicaltransformerner_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser(
        "predict",
        help="batch prediction -> BIO/brat/BioC "
             "(ref run_transformer_batch_prediction + converter)")
    pr.add_argument("--sf-dir", required=True)
    pr.add_argument("--output-dir", required=True)
    pr.add_argument("--format", choices=["bio", "brat", "bioc"],
                    default="bio")
    pr.add_argument("--decode", choices=["argmax", "crf"],
                    default="argmax")
    pr.add_argument("--files", action="store_true",
                    help="also render one text file per document")
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=cmd_predict)

    kg = sub.add_parser("kg", help="build the KG triple/entity tables")
    kg.add_argument("--sf-dir", required=True)
    kg.add_argument("--output-dir", required=True)
    kg.add_argument("--num-cpus", type=int, default=None)
    kg.set_defaults(fn=cmd_kg)
    return p


def main(argv: list[str] | None = None) -> None:
    import ray

    args = build_parser().parse_args(argv)
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local",
                 num_cpus=args.num_cpus,
                 include_dashboard=False,
                 logging_level="ERROR")
    try:
        args.fn(args)
    finally:
        if owns_session:  # never tear down a caller's session
            ray.shutdown()


if __name__ == "__main__":
    main()
