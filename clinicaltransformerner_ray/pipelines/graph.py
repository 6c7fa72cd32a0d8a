"""Iterative graph algorithms over the KG's co-occurrence edges.

  pagerank  fixed-point (integer) PageRank — ``iters`` synchronous
            rounds of r'_v = (15% of mass)/N + 85% * Σ r_u // deg_u

Why INTEGER fixed-point: float PageRank sums neighbor contributions in
engine-dependent order, so a SQL oracle could never hash-match.  With
ranks in units of 1e-12 of the total mass every operation is integer
(floor division for the per-neighbor share, integer percent damping),
sums commute exactly, and the unrolled-CTE DuckDB replica reproduces
the distributed result bit-for-bit — the same trick as the engine's
integer-cents aggregates, applied to an iterative algorithm (the
kmeans precedent: `similarity.py::_kmeans_sql` unrolls Lloyd's).

Scale shape (the kmeans pattern): the NODE state is tiny — entity
vocabulary is bounded by the lexicon, not the corpus — so ranks and
degrees broadcast into every map task, while the EDGE table streams
per iteration; each block emits integer partial sums per destination
(O(entities) rows per block) and the driver folds partials with
order-free integer addition.  Edges are materialized once (the
deduped pair list is far smaller than the corpus — iterative lineage,
the dup_clusters precedent).

Overflow: per-node sums are bounded by the total mass 1e12; the 85x
damping product peaks at 8.5e13 << 2^63.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SCALE = 10 ** 12


def pagerank(
    triples: rd.Dataset,
    *,
    iters: int = 5,
    damping_pct: int = 85,
) -> pa.Table:
    """PageRank over the undirected co-occurrence graph in the triple
    table (rows with ``pred == 'co_occurs'``; each pair is one
    undirected edge, walked in both directions).

    Output: small pa.Table (entity_id, rank_e12 BIGINT) — the rank in
    units of 1e-12 of the total mass, bit-exact vs the unrolled SQL."""

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        co = df[df["pred"] == "co_occurs"]
        src = np.concatenate([co["subj"].to_numpy(),
                              co["obj"].to_numpy()])
        dst = np.concatenate([co["obj"].to_numpy(),
                              co["subj"].to_numpy()])
        return pa.table({
            "src": pa.array(src.tolist(), pa.string()),
            "dst": pa.array(dst.tolist(), pa.string()),
        })

    # deduped pair list << corpus; iterating over it justifies the one
    # materialize (dup_clusters precedent)
    edges = triples.map_batches(
        explode, batch_format="pyarrow", batch_size=1 << 19,
    ).materialize()

    # node state is lexicon-bounded: collect degrees once (tiny)
    def deg_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("src", sort=False).size().reset_index(name="d")
        return pa.table({
            "entity_id": pa.array(g["src"].tolist(), pa.string()),
            "d": pa.array(np.asarray(g["d"], np.int64), pa.int64()),
        })

    deg: dict[str, int] = {}
    for r in edges.map_batches(deg_partial, batch_format="pyarrow",
                               batch_size=1 << 19).take_all():
        deg[r["entity_id"]] = deg.get(r["entity_id"], 0) + r["d"]
    nodes = sorted(deg)
    n = len(nodes)
    if n == 0:
        return pa.table({"entity_id": pa.array([], pa.string()),
                         "rank_e12": pa.array([], pa.int64())})

    base = (SCALE * (100 - damping_pct) // 100) // n
    ranks = {v: SCALE // n for v in nodes}

    for _ in range(iters):
        r_now = dict(ranks)  # rebind for the closure

        def contrib(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            share = np.asarray(
                [r_now[s] // deg[s] for s in df["src"]],
                dtype=np.int64)
            g = (pd.DataFrame({"dst": df["dst"].to_numpy(),
                               "s": share})
                 .groupby("dst", sort=False)["s"].sum().reset_index())
            return pa.table({
                "dst": pa.array(g["dst"].tolist(), pa.string()),
                "s": pa.array(np.asarray(g["s"], np.int64),
                              pa.int64()),
            })

        sums = {v: 0 for v in nodes}
        # integer partial sums commute — take_all order is irrelevant
        for r in edges.map_batches(contrib, batch_format="pyarrow",
                                   batch_size=1 << 19).take_all():
            sums[r["dst"]] += r["s"]
        ranks = {v: base + damping_pct * sums[v] // 100 for v in nodes}

    return pa.table({
        "entity_id": pa.array(nodes, pa.string()),
        "rank_e12": pa.array([ranks[v] for v in nodes], pa.int64()),
    })
