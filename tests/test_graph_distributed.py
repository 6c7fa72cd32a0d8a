"""Distributed (no-driver-node-state) graph paths vs broadcast folds.

VERDICT r03 §What's-wrong-3: the degree/pagerank driver folds are
scale-killers on unbounded node spaces (doc-pair graphs).  These tests
force the distributed fallbacks with ``broadcast_edges_max=0`` and
assert BIT-IDENTICAL outputs vs the default broadcast path — the
integer fixed-point contract makes the comparison exact, not
approximate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from clinicaltransformerner_ray.pipelines.graph import (
    SCALE, jaccard_links, label_propagation, pagerank)


def _dense_triples() -> pa.Table:
    """Deterministic multi-component co-occurrence graph: 30 nodes,
    formula-generated distinct edges (no RNG — the repo's
    reproducibility rule), plus a 'follows' triple that pagerank must
    ignore."""
    n = 30
    seen = set()
    subj, obj = [], []
    for i in range(n):
        for k in (3, 7, 11):
            j = (i * k + k) % n
            a, b = min(i, j), max(i, j)
            if a == b or (a, b) in seen:
                continue
            seen.add((a, b))
            subj.append(f"E{a:02d}")
            obj.append(f"E{b:02d}")
    pred = ["co_occurs"] * len(subj) + ["follows"]
    subj.append("E00")
    obj.append("E01")
    return pa.table({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(pred, pa.string()),
        "obj": pa.array(obj, pa.string()),
    })


def test_pagerank_distributed_bitwise_matches_broadcast(ray_session):
    triples = rd.from_arrow(_dense_triples()).repartition(4)
    ref = pagerank(triples, iters=4)
    assert isinstance(ref, pa.Table)  # broadcast path
    out = pagerank(triples, iters=4, broadcast_edges_max=0)
    assert isinstance(out, rd.Dataset)  # distributed path exercised
    a = (ref.to_pandas().sort_values("entity_id")
         .reset_index(drop=True))
    b = (out.to_pandas().sort_values("entity_id")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    total = int(a["rank_e12"].sum())
    assert SCALE * 0.999 < total <= SCALE  # mass conserved minus floor dust


def test_pagerank_distributed_empty_graph(ray_session):
    triples = rd.from_arrow(pa.table({
        "subj": pa.array([], pa.string()),
        "pred": pa.array([], pa.string()),
        "obj": pa.array([], pa.string()),
    }))
    out = pagerank(triples, iters=3, broadcast_edges_max=0)
    # 0 edges <= cap 0: the broadcast arm legitimately handles empty
    df = out.to_pandas()  # both pa.Table and Dataset expose to_pandas
    assert len(df) == 0
    assert set(df.columns) == {"entity_id", "rank_e12"}


def test_jaccard_links_distributed_bitwise_matches_broadcast(ray_session):
    pairs = _dense_triples().filter(
        pa.compute.equal(pa.compute.field("pred"), "co_occurs"))
    edges = rd.from_arrow(pa.table({
        "subj": pairs.column("subj"),
        "obj": pairs.column("obj"),
    })).repartition(4)
    ref = (jaccard_links(edges, min_common=2)
           .to_pandas().sort_values(["subj", "obj"])
           .reset_index(drop=True))
    assert len(ref) > 0  # the formula graph must produce survivors
    out = (jaccard_links(edges, min_common=2, broadcast_edges_max=0)
           .to_pandas().sort_values(["subj", "obj"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(ref, out)
    # inclusion-exclusion invariant holds row-wise
    assert (out["union_size"]
            == out["deg_a"] + out["deg_b"] - out["n_common"]).all()


def test_lpa_distributed_bitwise_matches_broadcast(ray_session):
    pairs = _dense_triples().filter(
        pa.compute.equal(pa.compute.field("pred"), "co_occurs"))
    edges = rd.from_arrow(pa.table({
        "subj": pairs.column("subj"),
        "obj": pairs.column("obj"),
    })).repartition(4)
    ref = label_propagation(edges, rounds=4)
    assert isinstance(ref, pa.Table)  # broadcast path
    out = label_propagation(edges, rounds=4, broadcast_edges_max=0)
    assert isinstance(out, rd.Dataset)  # distributed path exercised
    a = (ref.to_pandas().sort_values("entity_id")
         .reset_index(drop=True))
    b = (out.to_pandas().sort_values("entity_id")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["community"].nunique() < len(a)  # labels actually spread


def test_ktruss_matches_bruteforce(ray_session):
    """Fixed-round k-truss vs a plain-Python peel on the formula
    graph, for k=3 and k=4."""
    from clinicaltransformerner_ray.pipelines.graph import ktruss

    # K5 clique (edge support 3: survives k<=5) + a triangle fan off
    # node A00 (support 1: peeled at k=4, kept at k=3) + a dangling
    # chain (support 0: always peeled)
    clique = [f"A{i:02d}" for i in range(5)]
    E = sorted(
        {(a, b) for i, a in enumerate(clique)
         for b in clique[i + 1:]}
        | {("A00", "B01"), ("A00", "B02"), ("B01", "B02")}  # fan tri
        | {("B02", "C01"), ("C01", "C02")})                 # chain
    assert all(a < b for a, b in E)

    def brute(k, rounds):
        cur = set(E)
        sup = {}
        for _ in range(rounds):
            adj = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            sup = {(a, b): len(adj[a] & adj[b]) for a, b in cur}
            cur = {e for e, s in sup.items() if s >= k - 2}
        return {(a, b): sup[(a, b)] for a, b in cur}

    edges = rd.from_arrow(pa.table({
        "subj": pa.array([a for a, _ in E], pa.string()),
        "obj": pa.array([b for _, b in E], pa.string()),
    })).repartition(4)
    for k in (3, 4):
        want = brute(k, 3)
        got = ktruss(edges, k=k, rounds=3).to_pandas()  # broadcast
        assert {(r.subj, r.obj): r.support
                for r in got.itertuples()} == want, k
        dist = ktruss(edges, k=k, rounds=3,
                      broadcast_edges_max=0).to_pandas()  # distributed
        assert {(r.subj, r.obj): r.support
                for r in dist.itertuples()} == want, k
    assert brute(4, 3) != brute(3, 3)  # k actually bites
