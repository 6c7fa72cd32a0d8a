"""The flagship KG-construction pipeline (SURVEY.md §7.1).

    turns ──map_batches(MentionTagger actor pool)──▶ mentions
          ──map_batches(EntityLinker actor pool)──▶ linked mentions
          ──batch-local dedup ➜ groupby(conv bucket).map_groups──▶ triples
          ──groupby(subj,pred,obj).sum──▶ deduped edge table
    linked mentions ──partial counts ➜ groupby(entity_id)──▶ entity table

Shuffle inventory (SURVEY.md §7.4):
  #1 triple emission groups by a *salted* conversation key
     ``(conv_id, turn_idx // salt_span)`` — mega-conversations split into
     bounded buckets; adjacency needs only ±1 turn of context, so each
     bucket borrows its successor bucket's first turn as a read-only
     "ghost" row (emits nothing itself; serves only as the follows target),
     keeping the salted result byte-identical to the unsalted one.
  #2 triple dedup groups by (subj, pred, obj) over *pre-deduped* per-batch
     partials — the all-to-all moves candidate triples, not mention rows.
  #3 entity canonicalization groups by entity_id over per-batch partial
     counts (combiner before the shuffle).

Mention rows never take part in a wide shuffle: they flow straight from
the tagger pool into the linker pool under streaming execution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from clinicaltransformerner_ray.sources.turns import load_alias_rows, read_turns
from clinicaltransformerner_ray.stages.linker import EntityLinker
from clinicaltransformerner_ray.stages.tagger import MentionTagger

CO_OCCURS = "co_occurs"
FOLLOWS = "follows"

#: max turns per triple-emission group; a conversation longer than this is
#: split into salted buckets with 1-turn ghost overlap (skew guard)
DEFAULT_SALT_SPAN = 512


def _auto_concurrency(frac: float, lo: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: ``frac`` of
    total CPUs as the max.  Pools must grow with the cluster or N->4N
    scaling clamps at the pool cap."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (lo, max(2, int(cpus * frac)))


def detect_mentions(
    turns: rd.Dataset,
    alias_rows: list[dict],
    *,
    max_seq_length: int = 64,
    noise_mod: int = 5,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 1024,
) -> rd.Dataset:
    """turns -> mentions via the tagger actor pool. Alias rows ship once
    per actor through a ray.put broadcast ref.

    Default concurrency is an autoscaling (min, max) range sized to the
    cluster so the pool never deadlocks waiting for CPUs another stage
    holds and grows with added nodes."""
    if concurrency is None:
        concurrency = _auto_concurrency(0.7)
    ref = ray.put(alias_rows)
    return turns.map_batches(
        MentionTagger,
        fn_constructor_kwargs={
            "alias_rows_ref": ref,
            "max_seq_length": max_seq_length,
            "noise_mod": noise_mod,
        },
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
        concurrency = _auto_concurrency(0.25)
    ref = ray.put(alias_rows)
    return mentions.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"alias_rows_ref": ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def canonical_entities(linked: rd.Dataset) -> rd.Dataset:
    """Canonicalization groupby with a batch-local combiner: partial
    (entity_id, type, surface_norm) counts inside map_batches, tiny final
    groupby — the all-to-all moves one row per distinct key per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["entity_id", "type", "surface_norm"]).to_pandas()
        g = df.groupby(["entity_id", "type", "surface_norm"], sort=False).size()
        out = g.reset_index(name="pn")
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = linked.map_batches(partial, batch_format="pyarrow")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        by_surf = (
            g.groupby("surface_norm")["pn"].sum().reset_index()
            .sort_values(["pn", "surface_norm"], ascending=[False, True])
        )  # deterministic tie-break: count desc, then lexicographic
        return pd.DataFrame({
            "entity_id": [g["entity_id"].iloc[0]],
            "type": [g["type"].iloc[0]],
            "canonical_surface": [by_surf["surface_norm"].iloc[0]],
            "n_mentions": [int(g["pn"].sum())],
            "n_surfaces": [int(g["surface_norm"].nunique())],
        })

    return partials.groupby("entity_id").map_groups(finalize, batch_format="pandas")


def mention_counts(mentions: rd.Dataset) -> rd.Dataset:
    """(conv_id, turn_idx, surface_norm, type) -> n_mentions, with a
    batch-local combiner before the groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["conv_id", "turn_idx", "surface_norm", "type"]).to_pandas()
        g = df.groupby(["conv_id", "turn_idx", "surface_norm", "type"], sort=False).size()
        return pa.Table.from_pandas(g.reset_index(name="pn"), preserve_index=False)

    return (
        mentions.map_batches(partial, batch_format="pyarrow")
        .groupby(["conv_id", "turn_idx", "surface_norm", "type"])
        .aggregate(Sum("pn", alias_name="n_mentions"))
    )


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
        h = pd.util.hash_pandas_object(df["conv_id"], index=False).to_numpy()
        spans = (df["turn_idx"] // span).to_numpy()
        df["ghost"] = False
        df["bucket"] = ((h + spans) % n_buckets).astype(np.int64)
        border = df[(df["turn_idx"] % span == 0) & (df["turn_idx"] > 0)].copy()
        border["ghost"] = True
        border["bucket"] = (
            (pd.util.hash_pandas_object(border["conv_id"], index=False).to_numpy()
             + (border["turn_idx"] // span).to_numpy() - 1) % n_buckets
        ).astype(np.int64)
        out = pd.concat([df, border], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    return linked.map_batches(dedup_and_bucket, batch_format="pyarrow")


def emit_triples(
    linked: rd.Dataset,
    *,
    salt_span: int = DEFAULT_SALT_SPAN,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Adjacency triple emission (shuffle #1) + exact dedup (shuffle #2).

    One hash shuffle moves pre-deduped (conv, turn, entity) rows into
    ``n_buckets`` coarse buckets; inside each bucket ALL conversations
    are processed by two vectorized pandas merges (no per-conversation
    Python) — co_occurs is a self-merge on (conv_id, turn_idx),
    follows a merge of turn t against t+1.  Bucket count, not group
    count, bounds the number of per-group calls.

    Output: (subj, pred, obj, n_evidence, first_conv_id, first_turn_idx).
    """
    if n_buckets is None:
        try:
            n_buckets = max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            n_buckets = 32
    te = _bucketed_turn_entities(linked, salt_span, n_buckets)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # finish the distinct the combiner started; a ghost copy and its
        # original can share a bucket when two spans hash together, so
        # dedup IGNORES the ghost flag, preferring the original (sort
        # puts ghost=False first)
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
        return pd.DataFrame({
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

    raw = te.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    def partial_dedup(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["subj", "pred", "obj"], sort=False).agg(
            pn=("conv_id", "size"),
            pc=("conv_id", "min"),
            pt=("turn_idx", "min"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = raw.map_batches(partial_dedup, batch_format="pyarrow")
    deduped = partials.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("pn", alias_name="n_evidence"),
        Min("pc", alias_name="first_conv_id"),
        Min("pt", alias_name="first_turn_idx"),
    )
    return deduped


def kg_pipeline(
    sf_dir: str,
    *,
    max_seq_length: int = 64,
    noise_mod: int = 5,
    tagger_concurrency: int | tuple[int, int] | None = None,
    salt_span: int = DEFAULT_SALT_SPAN,
    materialize_linked: bool = True,
) -> dict[str, rd.Dataset]:
    """Compose the full build; returns lazy Datasets keyed by stage.

    ``materialize_linked`` pins the linked-mention table (the extraction is
    a large reduction of the input, so this is bounded) so the entity and
    triple branches don't re-run the tagger; at 100 TB scale the equivalent
    is a write_parquet checkpoint of the mention table re-read by both
    branches (see state/lineage.py)."""
    alias_rows = load_alias_rows(sf_dir)
    turns = read_turns(sf_dir, columns=["conv_id", "turn_idx", "text"])
    mentions = detect_mentions(
        turns, alias_rows,
        max_seq_length=max_seq_length,
        noise_mod=noise_mod,
        concurrency=tagger_concurrency,
    )
    linked = link_mentions(mentions, alias_rows)
    if materialize_linked:
        linked = linked.materialize()
    return {
        "mentions": mentions,
        "linked": linked,
        "entities": canonical_entities(linked),
        "triples": emit_triples(linked, salt_span=salt_span),
    }
