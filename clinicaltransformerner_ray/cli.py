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
    """(conv_id, turn_idx, bio_text): per-turn BIO documents —
    `labels_from_mentions(emit_tokens=True)` already joins mentions
    onto the turn token grid AND carries the tokens through its one
    union/sort, so rendering is a pure stateless map (no second
    tokenization, no second shuffle)."""
    from clinicaltransformerner_ray.pipelines.eval_pipeline import (
        labels_from_mentions)
    from clinicaltransformerner_ray.sinks.formatters import bio_lines

    def render(batch: pa.Table) -> pa.Table:
        toks = batch.column("tokens").to_pylist()
        labs = batch.column("labels").to_pylist()
        body = [bio_lines(list(t), list(l)) + "\n"
                for t, l in zip(toks, labs)]
        return pa.table({
            "conv_id": batch.column("conv_id").cast(pa.string()),
            "turn_idx": batch.column("turn_idx").cast(pa.int64()),
            "bio_text": pa.array(body, pa.string()),
        })

    return labels_from_mentions(mentions, turns,
                                emit_tokens=True).map_batches(
        render, batch_format="pyarrow")


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
    if getattr(args, "trained_model_dir", None):
        # trained-checkpoint route: the emission payload saved by the
        # `train` subcommand replaces the lexicon scorer (reference
        # lifecycle: task.py training output feeds
        # run_transformer_batch_prediction.py)
        from clinicaltransformerner_ray.pipelines.train import (
            detect_mentions_trained)
        from clinicaltransformerner_ray.state.artifacts import (
            load_latest_checkpoint)

        payload, ckpt = load_latest_checkpoint(args.trained_model_dir)
        print(f"predict: trained checkpoint {ckpt}")
        mentions = detect_mentions_trained(turns, payload)
    else:
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


def cmd_eval(args) -> None:
    """Shell eval surface (reference `new_bio_eval.py:356-368` /
    `brat_eval.py:448-496` arg shapes):

      eval --mode bio  --gold G --pred P [--beta 1.0]
      eval --mode brat --gold G --pred P [--match strict|lenient]
           [--exclude TYPE ...] [--tag-type T] [--relations]

    bio mode runs the distributed BioEval counters (span_prf) over two
    BIO files/dirs; brat mode runs the micro/macro document eval over
    two .ann dirs (``--relations`` adds relation scores — the track2
    full eval).  ``--exclude`` drops tag types at the reader, matching
    the reference's exclusion lists.  Prints one JSON object."""
    import json

    if args.mode == "bio":
        from clinicaltransformerner_ray.pipelines.eval_pipeline import (
            span_prf)
        from clinicaltransformerner_ray.sources.bio_text import read_bio

        def to_key(ds):
            def ren(batch: pa.Table) -> pa.Table:
                return pa.table({
                    "conv_id": batch.column("doc_id"),
                    "turn_idx": batch.column("sent_idx").cast(pa.int64()),
                    "labels": batch.column("labels"),
                })
            return ds.map_batches(ren, batch_format="pyarrow")

        res = span_prf(to_key(read_bio(args.gold)),
                       to_key(read_bio(args.pred)), beta=args.beta)
    else:
        from clinicaltransformerner_ray.pipelines.brat_eval_pipeline import (
            brat_full_eval, brat_span_eval)
        from clinicaltransformerner_ray.sources.brat import read_brat

        excl = set(args.exclude) if args.exclude else None
        g_tags, g_rels = read_brat(args.gold, tags_to_exclude=excl)
        s_tags, s_rels = read_brat(args.pred, tags_to_exclude=excl)
        if args.relations:
            res = brat_full_eval(g_tags, g_rels, s_tags, s_rels,
                                 mode=args.match, tag_type=args.tag_type)
        else:
            res = brat_span_eval(g_tags, s_tags, mode=args.match,
                                 tag_type=args.tag_type)
    print(json.dumps(res, sort_keys=True))


def cmd_train(args) -> None:
    """Shell training surface (reference `run_transformer_ner.sh` /
    `run_transformer_ner.py` arg shapes): read train/dev BIO splits,
    run the distributed sufficient-statistics training loop
    (`pipelines/train.py`, T6), select on dev (A6), write
    ``label2idx.json`` + retained ``checkpoint_{step}.bin`` under
    ``--new-model-dir``.  Prints one JSON summary line."""
    import json

    from clinicaltransformerner_ray.pipelines.train import (
        entity_types_from_sentences, train)
    from clinicaltransformerner_ray.sources.bio_text import read_split

    train_ds = read_split(args.data_dir, "train", do_lower=args.do_lower)
    dev_ds = read_split(args.data_dir, "dev", do_lower=args.do_lower)
    types = entity_types_from_sentences(train_ds)
    res = train(
        train_ds, dev_ds,
        entity_types=types,
        n_buckets=args.n_buckets,
        num_train_epochs=args.num_train_epochs,
        steps_per_epoch=args.steps_per_epoch,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        train_steps=args.train_steps,
        early_stop=args.early_stop,
        adversarial=args.adversarial_training_method
        if args.adversarial_training else None,
        model_selection_scoring=args.model_selection_scoring,
        model_dir=args.new_model_dir,
        max_num_checkpoints=args.max_num_checkpoints,
    )
    print(json.dumps({
        "best_score": res.best_score,
        "best_step": res.best_step,
        "global_step": res.global_step,
        "stopped_early": res.stopped_early,
        "epochs_run": len({h["epoch"] for h in res.history}),
        "entity_types": types,
        "model_dir": args.new_model_dir,
    }, sort_keys=True))


def cmd_multimodal(args) -> None:
    """Shell surface for the binary-media actor-pool stages (the
    reference's users live on the shell —
    `run_transformer_batch_prediction.sh` precedent):

      multimodal --op features  # decode -> feature vectors
      multimodal --op resize --out-w 8 --out-h 8
      multimodal --op frames --frame-ms 25 --hop-ms 10

    Input is the synthesized media table over documents.parquet (real
    WAV/BMP/PPM payloads, pure-Python codecs); output is partitioned
    parquet under --output-dir."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from clinicaltransformerner_ray.stages.multimodal import (
        extract_media_features, resize_images, sample_audio_frames,
        synth_media_table)

    docs = pq.read_table(os.path.join(args.sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    media = rd.from_arrow(synth_media_table(docs))
    if args.op == "resize":
        out = resize_images(media, out_w=args.out_w, out_h=args.out_h,
                            batch_size=args.batch_size,
                            concurrency=args.concurrency)
    elif args.op == "frames":
        out = sample_audio_frames(media, frame_ms=args.frame_ms,
                                  hop_ms=args.hop_ms,
                                  batch_size=args.batch_size,
                                  concurrency=args.concurrency)
    else:
        out = extract_media_features(media, batch_size=args.batch_size,
                                     concurrency=args.concurrency)
    out.write_parquet(args.output_dir)
    print(f"multimodal: op={args.op} -> {args.output_dir}")


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
    pr.add_argument("--trained-model-dir", default=None,
                    help="model dir written by the train subcommand; "
                         "its latest checkpoint replaces the lexicon "
                         "scorer")
    pr.add_argument("--files", action="store_true",
                    help="also render one text file per document")
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=cmd_predict)

    kg = sub.add_parser("kg", help="build the KG triple/entity tables")
    kg.add_argument("--sf-dir", required=True)
    kg.add_argument("--output-dir", required=True)
    kg.add_argument("--num-cpus", type=int, default=None)
    kg.set_defaults(fn=cmd_kg)

    ev = sub.add_parser(
        "eval",
        help="span-level eval: BIO files (ref new_bio_eval) or brat "
             ".ann dirs (ref brat_eval), JSON report to stdout")
    ev.add_argument("--mode", choices=["bio", "brat"], required=True)
    ev.add_argument("--gold", required=True,
                    help="gold BIO file/dir (bio) or .ann dir (brat)")
    ev.add_argument("--pred", required=True,
                    help="predicted BIO file/dir (bio) or .ann dir (brat)")
    ev.add_argument("--beta", type=float, default=1.0,
                    help="F-beta for bio mode (ref --beta)")
    ev.add_argument("--match", choices=["strict", "lenient"],
                    default="strict", help="brat span match mode")
    ev.add_argument("--tag-type", default=None,
                    help="brat: score only this tag type (ref key)")
    ev.add_argument("--exclude", nargs="*", default=None,
                    help="brat: tag types dropped at the reader "
                         "(ref exclusion lists)")
    ev.add_argument("--relations", action="store_true",
                    help="brat: also score relations (track2 full eval)")
    ev.add_argument("--num-cpus", type=int, default=None)
    ev.set_defaults(fn=cmd_eval)

    tr = sub.add_parser(
        "train",
        help="train the emission model on BIO splits (distributed "
             "sufficient statistics + dev model selection)")
    tr.add_argument("--data-dir", required=True,
                    help="directory holding train.txt and dev.txt")
    tr.add_argument("--new-model-dir", required=True)
    tr.add_argument("--n-buckets", type=int, default=4096)
    tr.add_argument("--num-train-epochs", type=int, default=10)
    tr.add_argument("--steps-per-epoch", type=int, default=1)
    tr.add_argument("--gradient-accumulation-steps", type=int, default=1)
    tr.add_argument("--learning-rate", type=float, default=0.5)
    tr.add_argument("--warmup-ratio", type=float, default=0.1)
    tr.add_argument("--train-steps", type=int, default=0)
    tr.add_argument("--early-stop", type=int, default=0)
    tr.add_argument("--adversarial-training", action="store_true")
    tr.add_argument("--adversarial-training-method",
                    choices=["fgm", "pgd"], default="fgm")
    tr.add_argument("--model-selection-scoring",
                    default="strict-f_score-1")
    tr.add_argument("--max-num-checkpoints", type=int, default=3)
    tr.add_argument("--do-lower", action="store_true")
    tr.add_argument("--num-cpus", type=int, default=None)
    tr.set_defaults(fn=cmd_train)

    mm = sub.add_parser(
        "multimodal",
        help="binary-media actor-pool stages: decode features, image "
             "resize, audio frame sampling -> parquet")
    mm.add_argument("--sf-dir", required=True)
    mm.add_argument("--output-dir", required=True)
    mm.add_argument("--op", choices=["features", "resize", "frames"],
                    default="features")
    mm.add_argument("--out-w", type=int, default=16,
                    help="resize: output width (pixels)")
    mm.add_argument("--out-h", type=int, default=16,
                    help="resize: output height (pixels)")
    mm.add_argument("--frame-ms", type=int, default=25,
                    help="frames: window length in ms")
    mm.add_argument("--hop-ms", type=int, default=10,
                    help="frames: hop between windows in ms")
    mm.add_argument("--batch-size", type=int, default=64,
                    help="payload rows per actor batch (heap-bounded)")
    mm.add_argument("--concurrency", type=int, default=4,
                    help="decode actor pool size")
    mm.add_argument("--num-cpus", type=int, default=None)
    mm.set_defaults(fn=cmd_multimodal)
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
