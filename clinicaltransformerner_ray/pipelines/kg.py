"""The flagship KG-construction pipeline (SURVEY.md §7.1).

    turns ──map_batches(MentionTagger actor pool)──▶ mentions
          ──map_batches(EntityLinker actor pool)──▶ linked mentions
          ──dedup+salt combiner ➜ sort(bucket) ➜ vectorized block merges──▶ evidence
          ──combine ➜ sort(subj,pred,obj) ➜ combine──▶ deduped edge table
    linked mentions ──combine ➜ sort(entity_id) ➜ finalize──▶ entity table

Shuffle inventory (SURVEY.md §7.4) — every wide op is the same shape:
batch-local vectorized COMBINE (shrinks what moves), one SORT on a
high-cardinality key (Ray's range partitioner keeps equal keys whole in
one block), then a vectorized per-block pass that completes the
aggregation.  No map_groups / Aggregate operators anywhere: per-group
and per-key machinery serializes at high group counts, and sorting a
LOW-cardinality key degenerates the range partitioner (empty partitions
plus mega-partitions) — both measured failure modes, see emit_triples.

  #1 triple emission sorts on the *salted* bucket key
     ``(hash(conv_id) + turn_idx // salt_span) % 65536`` —
     mega-conversations split across their turn spans; adjacency needs
     only ±1 turn of context, so a span-boundary turn adds a ghost copy
     to the previous span's bucket (a read-only `follows` target),
     keeping salted output byte-identical to unsalted.
  #2 triple dedup sorts (subj, pred, obj) over pre-combined partials —
     the all-to-all moves candidate triples, not mention rows.
  #3 entity canonicalization sorts entity_id over pre-combined counts.

Mention rows never take part in a wide shuffle: they flow straight from
the tagger pool into the linker pool under streaming execution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


from clinicaltransformerner_ray.sources.turns import load_alias_rows, read_turns
from clinicaltransformerner_ray.stages.linker import EntityLinker
from clinicaltransformerner_ray.stages.tagger import MentionTagger

CO_OCCURS = "co_occurs"
FOLLOWS = "follows"

#: max turns per triple-emission group; a conversation longer than this is
#: split into salted buckets with 1-turn ghost overlap (skew guard)
DEFAULT_SALT_SPAN = 512


def _auto_concurrency(frac: float, lo: int = 1) -> int:
    """Fixed actor-pool size scaled to the cluster (``frac`` of total
    CPUs).  Fixed, not autoscaling (1, N): the pool starts every actor
    immediately instead of ramping on queue pressure, and pool size must
    grow with the cluster or N->4N scaling clamps at the cap.

    Pool fractions across concurrent stages MUST sum well below 1.0 —
    actor pools reserve their CPUs for the stage lifetime, and a pool
    set that covers every CPU starves the stateless read/shuffle tasks
    feeding it (observed deadlock at num_cpus=4)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, int(cpus * frac))


def detect_mentions(
    turns: rd.Dataset,
    alias_rows: list[dict],
    *,
    max_seq_length: int = 64,
    noise_mod: int = 5,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 1024,
    decode: str = "argmax",
) -> rd.Dataset:
    """turns -> mentions via the tagger actor pool. Alias rows ship once
    per actor through a ray.put broadcast ref.  ``decode="crf"`` selects
    the Viterbi route (reference --use_crf)."""
    if concurrency is None:
        # the dominant CPU consumer: a fixed 3/4 FRACTION of the cluster
        # (not cluster-minus-constant) so the N vs 4N scaling comparison
        # gives both sizes the same resource share — capped so tagger +
        # linker + one reader never cover every CPU (starved readers
        # deadlock the pipeline; observed at num_cpus=4)
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        linker_n = max(1, cpus // 8)
        # fraction of the cluster for the tagger pool: must be EXACTLY
        # proportional at the benchmark pair (8 -> N, 32 -> 4N) so the
        # N-vs-4N comparison gives both sizes identical resource
        # shares, with enough headroom that readers, the linker pool
        # and Ray system threads don't contend the pool.  GRAFT_TAGGER_FRAC
        # tunes the share (0.5 keeps whole-actor proportionality at
        # 8/32 AND leaves 1/4+ headroom per leg for object-store and
        # system threads — see BASELINE.md scaling notes)
        import os as _os

        frac = float(_os.environ.get("GRAFT_TAGGER_FRAC", "0.625"))
        concurrency = max(1, min(int(frac * cpus), cpus - linker_n - 1))
    ref = ray.put(alias_rows)
    return turns.map_batches(
        MentionTagger,
        fn_constructor_kwargs={
            "alias_rows_ref": ref,
            "max_seq_length": max_seq_length,
            "noise_mod": noise_mod,
            "decode": decode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def detect_mentions_biaffine(
    turns: rd.Dataset,
    alias_rows: list[dict],
    *,
    max_sub_len: int = 2048,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 512,
) -> rd.Dataset:
    """turns -> mentions via the biaffine span-grid actor pool (the
    reference's second model family; stages/biaffine.py).  Same output
    schema as detect_mentions, so the whole KG suffix composes
    unchanged.  Smaller batch_size: the O(L^2 x C) grids live per
    sentence inside the actor and long turns make them large."""
    from clinicaltransformerner_ray.stages.biaffine import BiaffineTagger

    if concurrency is None:
        concurrency = _auto_concurrency(0.5)
    ref = ray.put(alias_rows)
    return turns.map_batches(
        BiaffineTagger,
        fn_constructor_kwargs={"alias_rows_ref": ref,
                               "max_sub_len": max_sub_len},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def link_mentions(
    mentions: rd.Dataset,
    alias_rows: list[dict],
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
) -> rd.Dataset:
    if concurrency is None:
        concurrency = _auto_concurrency(1 / 8)
    ref = ray.put(alias_rows)
    return mentions.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"alias_rows_ref": ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        # whole CPUs everywhere: fractional reservations let the nominal
        # N-CPU session run more than N busy processes on a bigger
        # physical host, silently inflating small-cluster throughput and
        # corrupting the N-vs-4N scaling comparison
        num_cpus=1,
    )


#: combiner coalescing width: map_batches with a large batch_size merges
#: many upstream blocks per combine call, shrinking what the sort moves
COMBINE_BATCH = 1 << 19


def _combine_sort_combine(
    ds: rd.Dataset, keys: list[str], combine, finalize=None
) -> rd.Dataset:
    """The engine's grouped-aggregation shape: an idempotent vectorized
    combiner applied (1) batch-locally pre-shuffle (coalesced batches),
    then (2) per sorted block post-shuffle.  Ray's range partitioner
    keeps equal keys in one block, so step 2 completes the aggregation
    with plain pandas groupby — no per-group invocation, no Aggregate
    operator (whose per-key machinery dominates at high key counts)."""
    partials = ds.map_batches(
        combine, batch_format="pyarrow", batch_size=COMBINE_BATCH)
    return partials.sort(keys).map_batches(
        finalize or combine, batch_format="pyarrow", batch_size=None)


def canonical_entities(linked: rd.Dataset) -> rd.Dataset:
    """Canonicalization: partial (entity_id, type, surface_norm) counts
    inside map_batches (combiner), one sort on entity_id, vectorized
    per-block finalize (canonical surface = count-desc / lexicographic
    argmax over the entity's surface variants)."""

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if "pn" not in df.columns:
            df = df[["entity_id", "type", "surface_norm"]].assign(pn=1)
        g = df.groupby(["entity_id", "type", "surface_norm"],
                       sort=False)["pn"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return pa.table({
                "entity_id": pa.array([], pa.string()),
                "type": pa.array([], pa.string()),
                "canonical_surface": pa.array([], pa.string()),
                "n_mentions": pa.array([], pa.int64()),
                "n_surfaces": pa.array([], pa.int64()),
            })
        g = df.groupby(["entity_id", "type", "surface_norm"],
                       sort=False)["pn"].sum().reset_index()
        tot = g.groupby(["entity_id", "type"], sort=False).agg(
            n_mentions=("pn", "sum"),
            n_surfaces=("surface_norm", "nunique")).reset_index()
        top = (g.sort_values(["pn", "surface_norm"],
                             ascending=[False, True])
               .drop_duplicates("entity_id")
               [["entity_id", "surface_norm"]]
               .rename(columns={"surface_norm": "canonical_surface"}))
        out = tot.merge(top, on="entity_id")
        out = out[["entity_id", "type", "canonical_surface",
                   "n_mentions", "n_surfaces"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    return _combine_sort_combine(
        linked.map_batches(
            lambda b: b.select(["entity_id", "type", "surface_norm"]),
            batch_format="pyarrow"),
        ["entity_id"], combine, finalize)


def mention_counts(mentions: rd.Dataset) -> rd.Dataset:
    """(conv_id, turn_idx, surface_norm, type) -> n_mentions via the
    combine/sort/combine aggregation shape."""
    keys = ["conv_id", "turn_idx", "surface_norm", "type"]

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if "n_mentions" not in df.columns:
            df = df[keys].assign(n_mentions=1)
        g = df.groupby(keys, sort=False)["n_mentions"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return _combine_sort_combine(mentions, keys, combine)


def _bucketed_turn_entities(
    linked: rd.Dataset, span: int, n_buckets: int
) -> rd.Dataset:
    """Batch-local distinct (combiner — idempotent, so block alignment is
    irrelevant) of (conv_id, turn_idx, entity_id), tagged with a coarse
    bucket key ``(hash(conv_id) + turn_idx // span) % n_buckets``.

    Skew salting: a mega-conversation spreads across its turn spans, so
    no single bucket inherits a whole hot conv_id.  Turns at a span
    boundary also emit a ghost copy into the *previous* span's bucket
    (right-side-only `follows` targets), keeping salted output identical
    to unsalted."""

    def dedup_and_bucket(batch: pa.Table) -> pa.Table:
        df = batch.select(["conv_id", "turn_idx", "entity_id"]).to_pandas()
        df = df.drop_duplicates()
        # ALL bucket arithmetic stays in uint64: h is uint64 and numpy
        # promotes uint64 + int64 to float64, which absorbs the span
        # offset for ~all hashes (salting silently a no-op) and can
        # round a ghost into the wrong bucket.  uint64 wraparound is
        # harmless because n_buckets divides 2**64.
        nb = np.uint64(n_buckets)
        h = pd.util.hash_pandas_object(df["conv_id"], index=False).to_numpy()
        spans = (df["turn_idx"] // span).to_numpy().astype(np.uint64)
        df["ghost"] = False
        df["bucket"] = ((h + spans) % nb).astype(np.int64)
        border_mask = (df["turn_idx"] % span == 0) & (df["turn_idx"] > 0)
        border = df[border_mask].copy()
        border["ghost"] = True
        # same uint64 expression evaluated at span-1, so the ghost lands
        # in exactly the bucket the previous span's turns computed
        border["bucket"] = (
            (h[border_mask.to_numpy()] + spans[border_mask.to_numpy()]
             - np.uint64(1)) % nb
        ).astype(np.int64)
        out = pd.concat([df, border], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    # coalesced batches: fewer, larger te blocks keep the downstream
    # sort's task count (and its fixed scheduling cost) low
    return linked.map_batches(
        dedup_and_bucket, batch_format="pyarrow", batch_size=COMBINE_BATCH)


def emit_triples(
    linked: rd.Dataset,
    *,
    salt_span: int = DEFAULT_SALT_SPAN,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Adjacency triple emission (shuffle #1) + exact dedup (shuffle #2).

    Shuffle #1 is a sort on a HIGH-cardinality salted bucket key
    ``(hash(conv_id) + turn_idx // span) % n_buckets`` — cardinality must
    far exceed the partition count or the range partitioner degenerates
    (empty partitions + mega-partitions that serialize the stage).  Ray's
    range partitioner never splits equal key values across partitions, so
    every bucket arrives whole in exactly one block, and a plain
    ``map_batches(batch_size=None)`` over sorted blocks can process ALL
    the buckets in a block with two vectorized pandas merges — co_occurs
    as a self-merge on (conv_id, turn_idx), follows as turn t against
    t+1.  No per-group invocation anywhere (the map_groups API costs a
    pandas call per group; at millions of groups that serializes).

    Output: (subj, pred, obj, n_evidence, first_conv_id, first_turn_idx).
    """
    if n_buckets is None:
        n_buckets = 65536
    te = _bucketed_turn_entities(linked, salt_span, n_buckets)

    def block_pairs(batch: pa.Table) -> pa.Table:
        g = batch.to_pandas()
        # finish the distinct the combiner started; a ghost copy and its
        # original can share a block (two spans of one conv hashing to
        # co-located buckets), so dedup IGNORES the ghost flag,
        # preferring the original (sort puts ghost=False first)
        g = (g.sort_values("ghost")
             .drop_duplicates(["conv_id", "turn_idx", "entity_id"]))
        ng = g[~g["ghost"]]
        key = ["conv_id", "turn_idx"]
        co = ng.merge(ng, on=key)
        co = co[co["entity_id_x"] < co["entity_id_y"]]
        left = ng.assign(_nt=ng["turn_idx"] + 1)
        fo = left.merge(
            g, left_on=["conv_id", "_nt"], right_on=["conv_id", "turn_idx"],
            suffixes=("_x", "_y"),
        )
        fo = fo[fo["entity_id_x"] != fo["entity_id_y"]]
        out = pd.DataFrame({
            "subj": pd.concat([co["entity_id_x"], fo["entity_id_x"]],
                              ignore_index=True),
            "pred": [CO_OCCURS] * len(co) + [FOLLOWS] * len(fo),
            "obj": pd.concat([co["entity_id_y"], fo["entity_id_y"]],
                             ignore_index=True),
            "conv_id": pd.concat([co["conv_id"], fo["conv_id"]],
                                 ignore_index=True),
            "turn_idx": pd.concat([co["turn_idx"], fo["turn_idx_x"]],
                                  ignore_index=True),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    raw = te.sort("bucket").map_batches(
        block_pairs, batch_format="pyarrow", batch_size=None)

    def triple_combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keys = ["subj", "pred", "obj"]
        if "n_evidence" in df.columns:
            g = df.groupby(keys, sort=False).agg(
                n_evidence=("n_evidence", "sum"),
                first_conv_id=("first_conv_id", "min"),
                first_turn_idx=("first_turn_idx", "min"),
            ).reset_index()
        else:
            g = df.groupby(keys, sort=False).agg(
                n_evidence=("conv_id", "size"),
                first_conv_id=("conv_id", "min"),
                first_turn_idx=("turn_idx", "min"),
            ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return _combine_sort_combine(raw, ["subj", "pred", "obj"],
                                 triple_combine)


def kg_pipeline(
    sf_dir: str,
    *,
    max_seq_length: int = 64,
    noise_mod: int = 5,
    tagger_concurrency: int | tuple[int, int] | None = None,
    salt_span: int = DEFAULT_SALT_SPAN,
    materialize_linked: bool = True,
    linked_checkpoint_dir: str | None = None,
) -> dict[str, rd.Dataset]:
    """Compose the full build; returns lazy Datasets keyed by stage.

    The linked-mention table feeds BOTH the entity and triple branches,
    so it must not re-run the tagger twice.  Two cache strategies:

    - ``materialize_linked`` (default) pins it in the object store —
      right for single-job runs where the reduction fits (spilling
      covers overflow);
    - ``linked_checkpoint_dir`` writes it as partitioned parquet from
      the workers and re-reads it for both branches — the 100 TB /
      restartable path (the full lineage-tracked version of this is
      pipelines/resume.py + state/lineage.py)."""
    alias_rows = load_alias_rows(sf_dir)
    turns = read_turns(sf_dir, columns=["conv_id", "turn_idx", "text"])
    mentions = detect_mentions(
        turns, alias_rows,
        max_seq_length=max_seq_length,
        noise_mod=noise_mod,
        concurrency=tagger_concurrency,
    )
    linked = link_mentions(mentions, alias_rows)
    if linked_checkpoint_dir is not None:
        linked.write_parquet(linked_checkpoint_dir)
        linked = rd.read_parquet(linked_checkpoint_dir)
    elif materialize_linked:
        linked = linked.materialize()
    return {
        "mentions": mentions,
        "linked": linked,
        "entities": canonical_entities(linked),
        "triples": emit_triples(linked, salt_span=salt_span),
    }
