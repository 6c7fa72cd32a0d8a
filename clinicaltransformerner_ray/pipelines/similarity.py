"""Similarity search over an embedding column (`embeddings` table).

  knn_bruteforce   exact cosine top-k: blocked matmul of every batch
                   against a small broadcast query matrix, per-batch
                   partial top-k, tiny final per-query merge
  knn_ivf          IVF-style approximate top-k: vectors bucketed by
                   nearest coarse centroid; queries probe only the
                   ``n_probe`` closest buckets

Scale shape: the data side streams — no stage holds the full vector
set.  The query matrix (and the centroid table) is the broadcast small
side, shipped once per actor via ``ray.put``.  All float math is
float64 so rankings are reproducible across backends.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from clinicaltransformerner_ray.arrowutil import from_pandas_clean

import ray
import ray.data as rd


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids, X = _batch_matrix_raw(batch)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    return ids, X


def _batch_matrix_raw(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """UNnormalized batch matrix (embedding_outliers wants raw
    magnitudes; the stored float32 values cast to float64 read the
    same bits on both engines)."""
    ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, X


def load_queries(vecs: rd.Dataset, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query set: the vectors with vec_id < n_queries.

    The predicate is applied DISTRIBUTED (per-batch pyarrow filter under
    streaming execution), so only the handful of matching rows ever
    reach the driver — the data side never materializes."""
    import pyarrow.compute as pc

    small = vecs.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"), n_queries)),
        batch_format="pyarrow",
    )
    rows = small.take_all()  # O(n_queries) rows only
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    Q = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    order = np.argsort(ids)
    return ids[order], Q[order]


def knn_bruteforce(
    vecs: rd.Dataset,
    *,
    n_queries: int = 8,
    k: int = 10,
) -> rd.Dataset:
    """Exact top-k cosine neighbors for each query vector.

    map_batches computes (B, nq) similarities and keeps only each
    query's batch-local top-k (so the shuffle moves k*nq rows per batch,
    not B*nq); the final per-query merge re-sorts the tiny candidate
    set.  Self-matches excluded.  Ties break (sim desc, vec_id asc).

    Output: (query_id, neighbor_id, rank) with rank 1-based."""
    qids, Q = load_queries(vecs, n_queries)
    qref = ray.put((qids, Q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(qref)
        ids, X = _batch_matrix(batch)
        sims = X @ Q_.T  # (B, nq)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids_)):
            s = sims[:, j]
            mask = ids != qids_[j]
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) > k:
                # exact (sim desc, neighbor_id asc) cut — the same order
                # the final merge uses, so a tie at the k boundary can
                # never drop a lower-id candidate the global top-k keeps
                order = np.lexsort((cand_ids, -cand_s))[:k]
                cand_ids, cand_s = cand_ids[order], cand_s[order]
            out_q.extend([qids_[j]] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_s.extend(cand_s.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = vecs.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk(partials, k)


def hard_negatives(
    vecs: rd.Dataset,
    *,
    n_queries: int = 8,
    k: int = 10,
) -> rd.Dataset:
    """Hard-negative mining for contrastive training: for each query
    vector, the exact top-k most-COSINE-SIMILAR vectors whose ``label``
    DIFFERS from the query's — the highest-loss negatives a contrastive
    batch builder wants (DPR / SimCSE style: random negatives are too
    easy; the near-miss wrong-label neighbors carry the gradient).

    Same scale shape as :func:`knn_bruteforce`: the query matrix (plus
    its labels) is the broadcast small side via ``ray.put``; the data
    side streams in blocked matmuls keeping only a per-batch per-query
    top-k, so the shuffle moves <= k*n_queries rows per batch.  Rank
    output only (the `ann_topk` precedent: float sims order-stable on
    both engines); ties break (sim desc, neighbor_id asc).

    Output: (query_id, neighbor_id, rank) with rank 1-based.
    """
    import pyarrow.compute as pc

    small = vecs.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"), n_queries)),
        batch_format="pyarrow",
    )
    rows = small.take_all()  # O(n_queries) rows only
    qids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    qlab = np.asarray([r["label"] for r in rows], dtype=np.int64)
    Q = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    order = np.argsort(qids)
    qids, qlab, Q = qids[order], qlab[order], Q[order]
    qref = ray.put((qids, qlab, Q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, qlab_, Q_ = ray.get(qref)
        ids, X = _batch_matrix(batch)
        labels = np.asarray(batch.column("label").to_pylist(),
                            dtype=np.int64)
        sims = X @ Q_.T  # (B, nq)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids_)):
            mask = labels != qlab_[j]  # negatives only (self excluded)
            cand_ids, cand_s = ids[mask], sims[:, j][mask]
            if len(cand_ids) > k:
                order = np.lexsort((cand_ids, -cand_s))[:k]
                cand_ids, cand_s = cand_ids[order], cand_s[order]
            out_q.extend([qids_[j]] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_s.extend(cand_s.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = vecs.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk(partials, k)


def _merge_topk(partials: rd.Dataset, k: int) -> rd.Dataset:
    """Distributed top-k-per-query merge in the engine's standard
    combine/sort/combine shape — no ``groupby().map_groups`` (per-group
    pandas calls serialize at high group counts), so ``n_queries`` can
    be a table, not a constant: each batch keeps its local per-query
    top-k (vectorized lexsort + group head), ONE sort on query_id
    co-locates the survivors (equal keys never split), and a per-block
    pass finalizes ranks.  Shuffle volume <= k rows per (query, batch).

    Output: (query_id, neighbor_id, rank), rank 1-based by
    (sim desc, neighbor_id asc)."""

    empty_partial = pa.table({
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
    })

    def _topk_frame(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-query top-k cut: global (query, sim desc,
        neighbor asc) lexsort, then keep each query's first k rows."""
        q = df["query_id"].to_numpy()
        order = np.lexsort((df["neighbor_id"].to_numpy(),
                            -df["sim"].to_numpy(), q))
        df = df.iloc[order]
        qs = df["query_id"].to_numpy()
        new_q = np.empty(len(qs), dtype=bool)
        new_q[0] = True
        new_q[1:] = qs[1:] != qs[:-1]
        grp_start = np.maximum.accumulate(
            np.where(new_q, np.arange(len(qs)), 0))
        rank = np.arange(len(qs)) - grp_start
        out = df[rank < k].copy()
        out["rank"] = (rank[rank < k] + 1).astype(np.int64)
        return out

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return empty_partial
        return from_pandas_clean(
            _topk_frame(df)[["query_id", "neighbor_id", "sim"]],
            preserve_index=False)

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            })
        out = _topk_frame(df)
        return from_pandas_clean(
            out[["query_id", "neighbor_id", "rank"]], preserve_index=False)

    return (
        partials.map_batches(combine, batch_format="pyarrow",
                             batch_size=1 << 19)
        .sort("query_id")
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# IVF (approximate)

def build_centroids(vecs: rd.Dataset, n_centroids: int = 16) -> np.ndarray:
    """Deterministic coarse centroids: one averaging pass over vectors
    seeded by ``vec_id % n_centroids`` assignment (a k-means step with a
    deterministic init — enough structure for bucket pruning)."""

    def partial_sums(batch: pa.Table) -> pa.Table:
        ids, X = _batch_matrix(batch)
        assign = ids % n_centroids
        out_c, out_v, out_n = [], [], []
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                out_c.append(c)
                out_v.append(X[m].sum(axis=0).tolist())
                out_n.append(int(m.sum()))
        return pa.table({
            "centroid": pa.array(out_c, pa.int64()),
            "vsum": pa.array(out_v, pa.list_(pa.float64())),
            "n": pa.array(out_n, pa.int64()),
        })

    rows = vecs.map_batches(partial_sums, batch_format="pyarrow").take_all()
    dim = len(rows[0]["vsum"])
    sums = np.zeros((n_centroids, dim))
    counts = np.zeros(n_centroids)
    for r in rows:
        sums[r["centroid"]] += np.asarray(r["vsum"])
        counts[r["centroid"]] += r["n"]
    counts[counts == 0] = 1.0
    C = sums / counts[:, None]
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def kmeans(
    vecs: rd.Dataset,
    *,
    k: int = 16,
    iters: int = 5,
) -> tuple[np.ndarray, rd.Dataset]:
    """Deterministic spherical k-means (Lloyd's) over the embedding
    column — the multi-iteration upgrade of build_centroids' single
    averaging step, and the real IVF training path at scale.

    Each iteration: centroids broadcast via ``ray.put`` (k x dim —
    tiny), every batch assigns its vectors by max cosine and emits
    per-centroid partial sums (the combiner), and the k-row reduction
    finalizes on the driver.  The data side streams every iteration;
    nothing driver-side ever exceeds k x dim.

    Returns (centroids, assignments Dataset of (vec_id, centroid))."""
    C = build_centroids(vecs, k)  # deterministic init (vec_id % k)

    for _ in range(iters):
        ref = ray.put(C)

        def partial_sums(batch: pa.Table) -> pa.Table:
            C_ = ray.get(ref)
            ids, X = _batch_matrix(batch)
            assign = np.argmax(X @ C_.T, axis=1)
            out_c, out_v, out_n = [], [], []
            for c in np.unique(assign):
                m = assign == c
                out_c.append(int(c))
                out_v.append(X[m].sum(axis=0).tolist())
                out_n.append(int(m.sum()))
            return pa.table({
                "centroid": pa.array(out_c, pa.int64()),
                "vsum": pa.array(out_v, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            })

        rows = vecs.map_batches(partial_sums,
                                batch_format="pyarrow").take_all()
        dim = C.shape[1]
        sums = np.zeros((k, dim))
        counts = np.zeros(k)
        for r in rows:
            sums[r["centroid"]] += np.asarray(r["vsum"])
            counts[r["centroid"]] += r["n"]
        # empty centroids keep their previous position (deterministic)
        newC = C.copy()
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz, None]
        newC = newC / np.maximum(
            np.linalg.norm(newC, axis=1, keepdims=True), 1e-12)
        if np.allclose(newC, C, atol=1e-12):
            C = newC
            break
        C = newC

    ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        C_ = ray.get(ref)
        ids, X = _batch_matrix(batch)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "centroid": pa.array(
                np.argmax(X @ C_.T, axis=1).astype(np.int64), pa.int64()),
        })

    return C, vecs.map_batches(assign, batch_format="pyarrow")


def knn_ivf(
    vecs: rd.Dataset,
    *,
    n_queries: int = 8,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> rd.Dataset:
    """IVF-bucketed approximate top-k: each vector scores only against
    queries whose ``n_probe`` nearest centroids include the vector's
    bucket.  Same output schema as knn_bruteforce; recall measured in
    tests against the exact result."""
    C = build_centroids(vecs, n_centroids)
    qids, Q = load_queries(vecs, n_queries)
    # per query: the probed centroid set
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    ref = ray.put((qids, Q, C, probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_, C_, probes_ = ray.get(ref)
        ids, X = _batch_matrix(batch)
        buckets = np.argmax(X @ C_.T, axis=1)  # (B,)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids_)):
            probe_set = probes_[j]
            m = np.isin(buckets, probe_set) & (ids != qids_[j])
            if not m.any():
                continue
            s = X[m] @ Q_[j]
            cand_ids = ids[m]
            if len(cand_ids) > k:
                order = np.lexsort((cand_ids, -s))[:k]  # tie-exact cut
                cand_ids, s = cand_ids[order], s[order]
            out_q.extend([qids_[j]] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_s.extend(s.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = vecs.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk(partials, k)


def _lsh_planes(n_planes: int, dim: int) -> np.ndarray:
    """±1 hyperplane matrix derived from md5 (process-independent;
    sign = md5_64('lsh:p:d') % 2 — the same hashing convention as
    dedup/_hash64, so DuckDB md5_number_upper reproduces it)."""
    from clinicaltransformerner_ray.pipelines.dedup import _hash64

    bits = (_hash64([f"lsh:{p}:{d}"
                     for p in range(n_planes) for d in range(dim)])
            % np.uint64(2)).astype(np.int64)
    return bits.reshape(n_planes, dim) * 2 - 1


def _lsh_codes(X_raw: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket codes over INTEGER-quantized projections:
    floor(x*1024) is exact float64 arithmetic on both engines (1024 is
    a power of two; floor is floor in numpy AND DuckDB — no //
    truncation hazard), so the code is bit-reproducible in SQL — the
    reason this LSH variant is oracle-checked while classic gaussian
    planes could flip a sign on accumulation order."""
    xq = np.floor(X_raw * 1024.0).astype(np.int64)
    proj = xq @ planes.T  # exact int64: |proj| <= dim * 2^10 * |x|max
    return ((proj >= 0).astype(np.int64)
            << np.arange(planes.shape[0], dtype=np.int64)).sum(axis=1)


def knn_lsh(
    vecs: rd.Dataset,
    *,
    n_queries: int = 8,
    k: int = 10,
    n_planes: int = 8,
    max_hamming: int = 3,
) -> rd.Dataset:
    """LSH-bucketed approximate top-k (random-hyperplane signs,
    Charikar 2002 — public algorithm): a vector is scored against a
    query only when their sign-bit codes differ in <= ``max_hamming``
    planes (multiprobe by hamming ball instead of bucket equality, so
    no candidate re-shuffle is needed — the probe test is a bitwise
    xor inside the scoring map).

    The scale path alongside IVF: codes cost one integer matmul per
    batch, no centroid training pass, and the candidate mass per query
    is ~C(n_planes,<=h)/2^n_planes of the corpus.  Same output schema
    as knn_bruteforce; recall gated in tests; and because the codes
    are integer-exact (see :func:`_lsh_codes`) the ENTIRE query —
    buckets, probes, ranks — is SQL-oracle-checked, unlike typical LSH.

    Output: (query_id, neighbor_id, rank), rank 1-based by
    (sim desc, neighbor_id asc)."""
    qids, Q = load_queries(vecs, n_queries)

    def raw_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        X = np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)
        return ids, X

    dim = Q.shape[1]
    planes = _lsh_planes(n_planes, dim)
    # query codes from RAW (unnormalized) vectors — recompute via the
    # distributed filter load (load_queries normalizes)
    import pyarrow.compute as pc
    qraw_rows = vecs.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"), n_queries)),
        batch_format="pyarrow").take_all()  # O(n_queries)
    qraw_rows.sort(key=lambda r: r["vec_id"])
    Qraw = np.asarray([r["embedding"] for r in qraw_rows],
                      dtype=np.float64)
    qcodes = _lsh_codes(Qraw, planes)
    pop = np.array([bin(i).count("1") for i in range(1 << n_planes)],
                   dtype=np.int64)
    qref = ray.put((qids, Q, qcodes, planes, pop))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_, qcodes_, planes_, pop_ = ray.get(qref)
        ids, Xr = raw_matrix(batch)
        codes = _lsh_codes(Xr, planes_)
        X = Xr / np.linalg.norm(Xr, axis=1, keepdims=True)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids_)):
            m = (pop_[np.bitwise_xor(codes, qcodes_[j])]
                 <= max_hamming) & (ids != qids_[j])
            if not m.any():
                continue
            s = X[m] @ Q_[j]
            cand_ids = ids[m]
            if len(cand_ids) > k:
                order = np.lexsort((cand_ids, -s))[:k]  # tie-exact cut
                cand_ids, s = cand_ids[order], s[order]
            out_q.extend([qids_[j]] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_s.extend(s.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = vecs.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk(partials, k)


def knn_graph(
    vecs: rd.Dataset,
    *,
    k: int = 5,
    n_chunks: int | None = None,
) -> rd.Dataset:
    """EXACT k-nearest-neighbor GRAPH over the whole embedding table
    (every vector is a query — the all-nodes generalization of
    :func:`knn_bruteforce`'s fixed query set), the similarity-graph
    construction that feeds clustering / near-dup components.

    Similarity is the INTEGER dot product of floor(x * 1024)-quantized
    vectors (the ann_lsh quantization: float32 -> float64 is exact and
    floor agrees between numpy and SQL, and quantized dots are < 2^53
    so the float64 matmul is integer-exact) — which makes the emitted
    edge WEIGHTS hash-checkable against the SQL oracle, not just the
    ranks.

    Shape: `embedding_dup_pairs`' chunk-pair co-location join (every
    unordered chunk pair meets in exactly one bucket; shuffle volume =
    n_chunks x input) with a per-bucket matmul emitting each source's
    LOCAL top-k over the partner chunk; since every (src, dst) pair
    appears in exactly one bucket, the global top-k per src is
    contained in the union of its <= n_chunks bucket-local top-ks.
    One src_id sort then finalizes ranks per block.  Ties break
    (dot_q desc, dst_id asc) at BOTH cuts, so boundary ties are exact.

    Output: (src_id, dst_id, rk, dot_q) — rk 1-based."""
    from clinicaltransformerner_ray.pipelines.dedup import _auto_n_chunks

    if n_chunks is None:
        n_chunks = _auto_n_chunks(vecs.count())

    def replicate(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        X = np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)
        Q = np.floor(X * 1024.0)  # integer-valued float64, SQL-exact
        chunk = ids % n_chunks
        out_bucket, out_id, out_chunk, out_vec = [], [], [], []
        for p in range(n_chunks):
            lo = np.minimum(chunk, p)
            hi = np.maximum(chunk, p)
            out_bucket.append(lo * n_chunks + hi)
            out_id.append(ids)
            out_chunk.append(chunk)
            out_vec.append(Q)
        return pa.table({
            "bucket": pa.array(np.concatenate(out_bucket), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "chunk": pa.array(np.concatenate(out_chunk), pa.int64()),
            "qvec": pa.array(list(np.concatenate(out_vec)),
                             pa.list_(pa.float64())),
        })

    def _local_topk(src_ids, dst_ids, dots):
        """Per-src (dot desc, dst asc) top-k over a dense (S, D) dot
        matrix; excludes nothing (caller masks self-pairs)."""
        out_s, out_d, out_q = [], [], []
        for si in range(len(src_ids)):
            row = dots[si]
            cand = dst_ids
            mask = cand != src_ids[si]
            row, cand = row[mask], cand[mask]
            if len(cand) > k:
                order = np.lexsort((cand, -row))[:k]
                row, cand = row[order], cand[order]
            out_s.extend([src_ids[si]] * len(cand))
            out_d.extend(cand.tolist())
            out_q.extend(row.astype(np.int64).tolist())
        return out_s, out_d, out_q

    def bucket_dots(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_s, out_d, out_q = [], [], []
        for bk in pd.unique(df["bucket"]):
            g = df[df["bucket"] == bk]
            lo, hi = divmod(int(bk), n_chunks)
            gi = g[g["chunk"] == lo]
            gj = g[g["chunk"] == hi]
            # emptiness FIRST (sparse vec_id residues leave one side
            # empty in off-diagonal buckets — np.stack would raise)
            if not len(gi) or not len(gj):
                continue
            Xi = np.stack(gi["qvec"].to_numpy())
            ids_i = gi["vec_id"].to_numpy()
            if lo == hi:
                dots = Xi @ Xi.T
                s, d, q = _local_topk(ids_i, ids_i, dots)
                out_s += s; out_d += d; out_q += q
            else:
                Xj = np.stack(gj["qvec"].to_numpy())
                ids_j = gj["vec_id"].to_numpy()
                dots = Xi @ Xj.T
                s, d, q = _local_topk(ids_i, ids_j, dots)
                out_s += s; out_d += d; out_q += q
                s, d, q = _local_topk(ids_j, ids_i, dots.T)
                out_s += s; out_d += d; out_q += q
        return pa.table({
            "src_id": pa.array(out_s, pa.int64()),
            "dst_id": pa.array(out_d, pa.int64()),
            "dot_q": pa.array(out_q, pa.int64()),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return pa.table({
                "src_id": pa.array([], pa.int64()),
                "dst_id": pa.array([], pa.int64()),
                "rk": pa.array([], pa.int64()),
                "dot_q": pa.array([], pa.int64()),
            })
        order = np.lexsort((df["dst_id"].to_numpy(),
                            -df["dot_q"].to_numpy(),
                            df["src_id"].to_numpy()))
        df = df.iloc[order]
        s = df["src_id"].to_numpy()
        new_s = np.empty(len(s), dtype=bool)
        new_s[0] = True
        new_s[1:] = s[1:] != s[:-1]
        grp_start = np.maximum.accumulate(
            np.where(new_s, np.arange(len(s)), 0))
        rank = np.arange(len(s)) - grp_start
        keep = rank < k
        out = df[keep]
        return pa.table({
            "src_id": pa.array(out["src_id"].to_numpy(), pa.int64()),
            "dst_id": pa.array(out["dst_id"].to_numpy(), pa.int64()),
            "rk": pa.array((rank[keep] + 1).astype(np.int64),
                           pa.int64()),
            "dot_q": pa.array(out["dot_q"].to_numpy(), pa.int64()),
        })

    return (
        vecs.map_batches(replicate, batch_format="pyarrow",
                         batch_size=1 << 16)
        .sort("bucket")
        .map_batches(bucket_dots, batch_format="pyarrow",
                     batch_size=None)
        .sort("src_id")
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def mips_topk(
    vecs: rd.Dataset,
    *,
    n_queries: int = 8,
    k: int = 10,
) -> rd.Dataset:
    """Exact top-k by MAXIMUM INNER PRODUCT (no normalization) — the
    recommendation-retrieval scoring cosine kNN can't answer (MIPS
    favors long vectors; cosine is scale-blind).  Same scale shape as
    :func:`knn_bruteforce`: broadcast raw query matrix, per-batch
    matmul + local top-k, combine/sort/combine merge.  Rank-only
    output (the ann_topk float rule); ties (dot DESC, neighbor ASC).

    Output: (query_id, neighbor_id, rank)."""
    import pyarrow.compute as pc

    small = vecs.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"), n_queries)),
        batch_format="pyarrow",
    )
    rows = small.take_all()  # O(n_queries) rows only
    qids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    Q = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(qids)
    qids, Q = qids[order], Q[order]  # RAW vectors — no normalization
    qref = ray.put((qids, Q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(qref)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        X = np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)  # raw
        dots = X @ Q_.T
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids_)):
            s = dots[:, j]
            mask = ids != qids_[j]
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) > k:
                o = np.lexsort((cand_ids, -cand_s))[:k]
                cand_ids, cand_s = cand_ids[o], cand_s[o]
            out_q.extend([qids_[j]] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_s.extend(cand_s.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = vecs.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk(partials, k)


def pq_topk(
    vecs: rd.Dataset,
    *,
    n_queries: int = 8,
    k: int = 10,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 3,
) -> rd.Dataset:
    """Product-quantization ANN (Jegou, Douze, Schmid 2011, TPAMI):
    split the (L2-normalized) embedding into ``m`` subspaces, train a
    ``k_sub``-centroid L2 codebook per subspace (Lloyd's, deterministic
    ``vec_id % k_sub`` init), encode every vector as its m nearest
    sub-centroids, and score queries by asymmetric distance — the sum
    over subspaces of dot(query_sub, assigned_sub_centroid), a LUT of
    m x k_sub dots per query instead of a full matmul.

    This is THE memory-bound scale path for ANN: each database vector
    costs m codes (bytes) instead of dim floats, and scoring reads the
    LUT, never the vector.  Driver state = m x k_sub x (dim/m) codebook
    floats (tiny, broadcast via ``ray.put``); the data side streams in
    every pass.  The output ranking is integer (rank by score DESC,
    neighbor_id ASC) — oracle-exact under the kmeans precedent as long
    as score margins dominate float noise (the synth's margins are
    ~1e-2 vs noise ~1e-14; asserted at two scales).

    DETERMINISM (r05): normalized values are quantized to
    ``floor(v * 2^20)`` (the knn_lsh precedent) BEFORE any
    accumulation, so every centroid partial sum is a sum of exact
    integers in float64 — exactly associative below 2^53, hence
    invariant to Ray's run-to-run block splits.  Without this, 1-ulp
    drift in a block-order float sum could flip a near-tie code
    assignment on the synth's unseparated subspaces and amplify
    through the Lloyd's iterations (observed once as a transient
    ann_pq hash mismatch in a 140-query sim).  Distances use an
    explicit per-centroid loop rather than one BLAS matmul so each
    row's reduction is batch-size-invariant.

    Output: (query_id, neighbor_id, rank) with rank 1-based."""
    SCALE = float(1 << 20)
    qids, Q = load_queries(vecs, n_queries)
    dim = Q.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    def sub_view(X: np.ndarray, s: int) -> np.ndarray:
        return X[:, s * dsub:(s + 1) * dsub]

    # --- train: C[s] is (k_sub, dsub); init = vec_id % k_sub means ---
    def init_partial(batch: pa.Table) -> pa.Table:
        ids, X = _batch_matrix(batch)
        X = np.floor(X * SCALE)  # exact ints: order-free partials
        assign = ids % k_sub
        out_s, out_c, out_v, out_n = [], [], [], []
        for c in range(k_sub):
            msk = assign == c
            if not msk.any():
                continue
            for s in range(m):
                out_s.append(s)
                out_c.append(c)
                out_v.append(sub_view(X, s)[msk].sum(axis=0).tolist())
                out_n.append(int(msk.sum()))
        return pa.table({
            "s": pa.array(out_s, pa.int64()),
            "c": pa.array(out_c, pa.int64()),
            "vsum": pa.array(out_v, pa.list_(pa.float64())),
            "n": pa.array(out_n, pa.int64()),
        })

    def fold(rows) -> tuple[np.ndarray, np.ndarray]:
        sums = np.zeros((m, k_sub, dsub))
        counts = np.zeros((m, k_sub))
        for r in rows:
            sums[r["s"], r["c"]] += np.asarray(r["vsum"])
            counts[r["s"], r["c"]] += r["n"]
        return sums, counts

    sums, counts = fold(vecs.map_batches(
        init_partial, batch_format="pyarrow").take_all())
    C = np.zeros((m, k_sub, dsub))
    nz = counts > 0
    C[nz] = sums[nz] / counts[nz][:, None]

    def codes_of(X: np.ndarray, C_: np.ndarray) -> np.ndarray:
        """(B, m) int64 codes: per subspace argmin L2 distance, lowest
        code on ties (np.argmin) — replicated by the SQL's
        (d2 ASC, c ASC) row_number."""
        out = np.empty((len(X), m), np.int64)
        d2 = np.empty((len(X), k_sub))
        for s in range(m):
            Xs = sub_view(X, s)
            for c in range(k_sub):
                diff = Xs - C_[s][c]
                # row-local fixed-length reduction: batch-size-invariant
                d2[:, c] = (diff * diff).sum(axis=1)
            out[:, s] = np.argmin(d2, axis=1)
        return out

    for _ in range(iters):
        ref = ray.put(C)

        def step_partial(batch: pa.Table) -> pa.Table:
            C_ = ray.get(ref)
            ids, X = _batch_matrix(batch)
            X = np.floor(X * SCALE)
            codes = codes_of(X, C_)
            out_s, out_c, out_v, out_n = [], [], [], []
            for s in range(m):
                Xs = sub_view(X, s)
                for c in np.unique(codes[:, s]):
                    msk = codes[:, s] == c
                    out_s.append(s)
                    out_c.append(int(c))
                    out_v.append(Xs[msk].sum(axis=0).tolist())
                    out_n.append(int(msk.sum()))
            return pa.table({
                "s": pa.array(out_s, pa.int64()),
                "c": pa.array(out_c, pa.int64()),
                "vsum": pa.array(out_v, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            })

        sums, counts = fold(vecs.map_batches(
            step_partial, batch_format="pyarrow").take_all())
        newC = C.copy()  # empty centroids keep their position
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz][:, None]
        C = newC

    # --- encode + ADC score + batch-local top-k ---
    cref = ray.put((C, qids, np.floor(Q * SCALE)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        C_, qids_, Q_ = ray.get(cref)
        ids, X = _batch_matrix(batch)
        X = np.floor(X * SCALE)
        codes = codes_of(X, C_)
        # LUT[s]: (nq, k_sub) dots; score = sum_s LUT[s][:, code_s]
        scores = np.zeros((len(X), len(qids_)))
        for s in range(m):
            lut = sub_view(Q_, s) @ C_[s].T          # (nq, k_sub)
            scores += lut[:, codes[:, s]].T           # (B, nq)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids_)):
            sc = scores[:, j]
            msk = ids != qids_[j]
            cand_ids, cand_s = ids[msk], sc[msk]
            if len(cand_ids) > k:
                order = np.lexsort((cand_ids, -cand_s))[:k]
                cand_ids, cand_s = cand_ids[order], cand_s[order]
            out_q.extend([qids_[j]] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_s.extend(cand_s.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = vecs.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk(partials, k)


def topk_recall(exact: rd.Dataset, approx: rd.Dataset,
                *, k: int = 10) -> rd.Dataset:
    """Retrieval-quality harness: per-query overlap between an EXACT
    top-``k`` result and an APPROXIMATE one (recall@k — the number
    every ANN index is tuned against).  Both inputs carry
    (query_id, neighbor_id, ...) rows.

    Distributed composition, not a driver join: tag each side, union,
    ONE sort on query_id (groups land whole per block), and a
    vectorized per-block pass counts neighbors present on both sides.
    Inputs are top-k tables (n_queries x k rows), so the shuffle is
    inherently tiny no matter the corpus size behind them.

    Output: (query_id, n_common, recall_bp) with recall_bp =
    n_common * 10^4 // k (exact integers)."""

    def tag(kind: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "query_id": pa.array(
                    batch.column("query_id").to_numpy(
                        zero_copy_only=False).astype(np.int64),
                    pa.int64()),
                "neighbor_id": pa.array(
                    batch.column("neighbor_id").to_numpy(
                        zero_copy_only=False).astype(np.int64),
                    pa.int64()),
                "kind": pa.array(
                    np.full(batch.num_rows, kind, np.int64), pa.int64()),
            })
        return f

    def overlap(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            "n_common": pa.array([], pa.int64()),
            "recall_bp": pa.array([], pa.int64()),
        })
        df = batch.to_pandas()
        if df.empty:
            return empty
        g = (df.groupby(["query_id", "neighbor_id"], sort=False)["kind"]
             .nunique().reset_index(name="sides"))
        both = (g[g["sides"] == 2].groupby("query_id", sort=False)
                .size())
        qs = np.sort(df["query_id"].unique()).astype(np.int64)
        n_common = both.reindex(qs, fill_value=0).to_numpy(np.int64)
        return pa.table({
            "query_id": pa.array(qs, pa.int64()),
            "n_common": pa.array(n_common, pa.int64()),
            "recall_bp": pa.array(n_common * 10_000 // k, pa.int64()),
        })

    tagged = (exact.select_columns(["query_id", "neighbor_id"])
              .map_batches(tag(1), batch_format="pyarrow")
              .union(approx.select_columns(["query_id", "neighbor_id"])
                     .map_batches(tag(2), batch_format="pyarrow")))
    return (tagged.sort("query_id")
            .map_batches(overlap, batch_format="pyarrow",
                         batch_size=None))


# ---------------------------------------------------------------------------
# MMR diversified retrieval + streaming covariance


def _quantize_rows(X: np.ndarray) -> np.ndarray:
    """Elementwise ``floor(v * 2^20)`` as int64 — the knn_lsh / kmeans
    quantization precedent: integer inputs make every downstream sum
    and comparison exactly associative and bit-replicable in SQL
    (``CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)``)."""
    return np.floor(X.astype(np.float64) * float(1 << 20)).astype(np.int64)


def mmr_topk(
    vecs: rd.Dataset,
    *,
    query_id: int = 0,
    n_candidates: int = 20,
    k: int = 5,
) -> pa.Table:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily select ``k`` results from the
    ``n_candidates`` most-query-similar vectors, each round picking the
    candidate maximizing ``lambda*sim(q,c) - (1-lambda)*max_{s in S}
    sim(c,s)`` — relevance minus redundancy, the de-dup layer every
    retrieval-augmented pipeline wants on top of raw kNN.

    Exactness: similarities are INTEGER inner products of
    ``floor(v*2^20)``-quantized raw vectors (MIPS flavor —
    normalization would reintroduce float sqrt), and with the classic
    lambda = 0.5 the MMR ordering equals the integer ordering
    ``sim_q - max_sel``, so the candidate cut and every greedy argmax
    are exact integer comparisons, bit-replicable by unrolled SQL CTE
    rounds (the kmeans-oracle pattern).  Ties break vec_id ASC.

    Scale shape: the query vector is fetched by a distributed filter
    (O(1) rows to the driver), candidate generation is a streaming
    per-batch integer-matmul top-``n_candidates`` carrying each
    survivor's embedding (<= n_candidates rows per block leave each
    task), and the greedy selection runs on the driver over the
    bounded n_candidates x n_candidates similarity grid — never over
    the corpus.

    Output pa.Table: (rank 1-based, vec_id, score) where score =
    sim_q for rank 1 and sim_q - max-selected-sim after (all int64).
    """
    import pyarrow.compute as pc

    qrows = vecs.map_batches(
        lambda b: b.filter(pc.equal(b.column("vec_id"), query_id)),
        batch_format="pyarrow",
    ).take_all()
    if not qrows:
        raise ValueError(f"query vec_id {query_id} not found")
    q = _quantize_rows(np.asarray([qrows[0]["embedding"]]))[0]
    qref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        q_ = ray.get(qref)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        X = _quantize_rows(np.asarray(batch.column("embedding")
                                      .to_pylist(), dtype=np.float64))
        mask = ids != query_id
        ids, X = ids[mask], X[mask]
        s = X @ q_  # exact int64
        if len(ids) > n_candidates:
            o = np.lexsort((ids, -s))[:n_candidates]
            ids, X, s = ids[o], X[o], s[o]
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "s": pa.array(s, pa.int64()),
            "emb": pa.array([r.tolist() for r in X],
                            pa.list_(pa.int64())),
        })

    rows = vecs.map_batches(partial, batch_format="pyarrow").take_all()
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    s = np.asarray([r["s"] for r in rows], dtype=np.int64)
    X = np.asarray([r["emb"] for r in rows], dtype=np.int64)
    o = np.lexsort((ids, -s))[:n_candidates]
    ids, s, X = ids[o], s[o], X[o]

    G = X @ X.T  # candidate-candidate integer sims (bounded grid)
    sel: list[int] = []
    out_rank, out_id, out_score = [], [], []
    remaining = np.ones(len(ids), bool)
    for r in range(min(k, len(ids))):
        idxs = np.flatnonzero(remaining)
        if not sel:
            sc = s[idxs]
        else:
            sc = s[idxs] - G[np.ix_(idxs, sel)].max(axis=1)
        # argmax with vec_id ASC tie-break, over remaining only (a
        # sentinel-and-negate scheme would wrap at INT64_MIN)
        best_local = np.lexsort((ids[idxs], -sc))[0]
        best = int(idxs[best_local])
        sel.append(best)
        remaining[best] = False
        out_rank.append(r + 1)
        out_id.append(int(ids[best]))
        out_score.append(int(sc[best_local]))
    return pa.table({
        "rank": pa.array(out_rank, pa.int64()),
        "vec_id": pa.array(out_id, pa.int64()),
        "score": pa.array(out_score, pa.int64()),
    })


def embedding_covariance(vecs: rd.Dataset) -> pa.Table:
    """Exact second-moment statistics of the embedding table in ONE
    streaming pass — the Gram matrix, per-dimension sums and the row
    count, from which mean vector / covariance / PCA axes / whitening
    all derive driver-side.  THE canonical distributed-ML fold: the
    driver state is dim x dim (bounded, independent of corpus size),
    every block contributes an integer partial, and integer partials
    are exactly associative — block-split-invariant by construction.

    Inputs quantized ``floor(v * 2^20)`` (int64); per-block partials
    ``X^T X`` via integer matmul (exact; terms ~2^46 at |v|<=32,
    dim 64 — far below 2^63), folded on the driver in Python ints
    (unbounded) and emitted as int64.

    Output pa.Table, long upper-triangle form sorted (i, j):
      (i, j,  v)  with 0 <= i <= j < dim : sum of q_i * q_j
      (i, -1, v)                         : per-dimension sum of q_i
      (-1, -1, n)                        : row count
    """

    def partials(batch: pa.Table) -> pa.Table:
        X = _quantize_rows(np.asarray(batch.column("embedding")
                                      .to_pylist(), dtype=np.float64))
        d = X.shape[1]
        G = X.T @ X  # exact int64
        iu, ju = np.triu_indices(d)
        i = np.concatenate([iu, np.arange(d), [-1]])
        j = np.concatenate([ju, np.full(d, -1, np.int64), [-1]])
        v = np.concatenate([G[iu, ju], X.sum(axis=0),
                            [np.int64(len(X))]])
        return pa.table({
            "i": pa.array(i.astype(np.int64), pa.int64()),
            "j": pa.array(j.astype(np.int64), pa.int64()),
            "v": pa.array(v.astype(np.int64), pa.int64()),
        })

    acc: dict[tuple[int, int], int] = {}
    parts = vecs.map_batches(partials, batch_format="pyarrow")
    for blk in parts.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        ii = blk.column("i").to_numpy(zero_copy_only=False)
        jj = blk.column("j").to_numpy(zero_copy_only=False)
        vv = blk.column("v").to_numpy(zero_copy_only=False)
        for a, b, c in zip(ii.tolist(), jj.tolist(), vv.tolist()):
            acc[(a, b)] = acc.get((a, b), 0) + c
    ks = sorted(acc)
    return pa.table({
        "i": pa.array([a for a, _ in ks], pa.int64()),
        "j": pa.array([b for _, b in ks], pa.int64()),
        "v": pa.array([acc[kk] for kk in ks], pa.int64()),
    })


def embedding_outliers(vecs: rd.Dataset, *, k: int = 20,
                       q_bits: int = 10) -> pa.Table:
    """Embedding-space outliers: the ``k`` vectors farthest from the
    corpus centroid — the standard embedding-QA sweep for corrupt /
    mislabeled / degenerate vectors before any ANN index is built.

    Exactness trick: with ``xq = floor(v * 2^q_bits)`` (the engine's
    quantize-before-accumulate rule) and ``S_d = Σ xq_d``, ``n`` the
    vector count, the integer score ``Σ_d (n*xq_d - S_d)²`` equals
    ``n² · ‖xq - mean(xq)‖²`` — the same ORDER as distance-to-centroid
    with no float division ever happening, so the ranking is
    deterministic and block-split-invariant on both engines.  Bound:
    |n*xq| < n·2^q_bits must stay under ~2^31 for the squared sum to
    fit int64 — at 2^10 that holds to ~2M vectors; rescale q_bits
    down as n grows.

    Shape: pass 1 folds (n, S) on the driver (O(blocks x dim) rows);
    pass 2 streams blocked score computation keeping each block's
    local top-k by (score DESC, vec_id ASC); the driver merges
    O(blocks x k).  Zero wide ops.

    Output pa.Table (vec_id, score, rank), rank 1-based."""
    import ray

    scale = float(1 << q_bits)

    def sum_partial(batch: pa.Table) -> pa.Table:
        ids, X = _batch_matrix_raw(batch)
        if not len(ids):
            return pa.table({"d": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        Xq = np.floor(X * scale).astype(np.int64)
        dims = np.arange(Xq.shape[1], dtype=np.int64)
        return pa.table({
            "d": pa.array(dims, pa.int64()),
            "s": pa.array(Xq.sum(axis=0), pa.int64()),
            "n": pa.array(np.full(len(dims), len(ids), np.int64),
                          pa.int64()),
        })

    S: dict[int, int] = {}
    n = 0
    seen_dims = False
    for r in vecs.map_batches(sum_partial,
                              batch_format="pyarrow").take_all():
        S[int(r["d"])] = S.get(int(r["d"]), 0) + int(r["s"])
        if int(r["d"]) == 0:
            n += int(r["n"])
        seen_dims = True
    if not seen_dims or n == 0:
        z = pa.array([], pa.int64())
        return pa.table({"vec_id": z, "score": z, "rank": z})
    Sv = np.asarray([S[d] for d in sorted(S)], np.int64)
    ref = ray.put((n, Sv))

    def local_topk(batch: pa.Table) -> pa.Table:
        n_, S_ = ray.get(ref)
        ids, X = _batch_matrix_raw(batch)
        if not len(ids):
            z = pa.array([], pa.int64())
            return pa.table({"vec_id": z, "score": z})
        Xq = np.floor(X * scale).astype(np.int64)
        diff = n_ * Xq - S_[None, :]
        score = (diff * diff).sum(axis=1)
        order = np.lexsort((ids, -score))[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "score": pa.array(score[order], pa.int64()),
        })

    rows = vecs.map_batches(local_topk,
                            batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-int(r["score"]), int(r["vec_id"])))
    rows = rows[:k]
    return pa.table({
        "vec_id": pa.array([int(r["vec_id"]) for r in rows],
                           pa.int64()),
        "score": pa.array([int(r["score"]) for r in rows],
                          pa.int64()),
        "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
    })


def embedding_coverage(docs: rd.Dataset,
                       vecs: rd.Dataset) -> pa.Table:
    """Embedding-coverage audit by source: which fraction of each
    domain's documents actually HAS an embedding row — the
    partial-coverage check the hybrid_rerank incident institutionalized
    (the round-3 rule: never assume a doc_id ⋈ vec_id join covers),
    promoted to a first-class data-QA table.

    Shape: union (doc side carrying source | vec-id side), ONE sort on
    the shared id (equal ids land whole per block), per-block
    per-source integer partials, bounded driver fold.  Coverage is an
    exact integer per-mille floor.

    Output pa.Table (source, n_docs, n_with_vec, cov_per_mille),
    sorted by source."""

    def d_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": batch.column("doc_id").cast(pa.int64()),
            "kind": pa.array(np.zeros(batch.num_rows, np.int64),
                             pa.int64()),
            "source": batch.column("source"),
        })

    def v_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": batch.column("vec_id").cast(pa.int64()),
            "kind": pa.array(np.ones(batch.num_rows, np.int64),
                             pa.int64()),
            "source": pa.array([""] * batch.num_rows, pa.string()),
        })

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        d = df[df["kind"] == 0]
        if d.empty:
            z = pa.array([], pa.int64())
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": z, "n_with_vec": z})
        vids = set(df[df["kind"] == 1]["id"].tolist())
        has = d["id"].isin(vids).astype(np.int64)
        g = (pd.DataFrame({"source": d["source"], "has": has})
             .groupby("source", sort=False)["has"]
             .agg(["size", "sum"]).reset_index())
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "n_docs": pa.array(g["size"].to_numpy(np.int64),
                               pa.int64()),
            "n_with_vec": pa.array(g["sum"].to_numpy(np.int64),
                                   pa.int64()),
        })

    unioned = (docs.map_batches(d_rows, batch_format="pyarrow")
               .union(vecs.map_batches(v_rows,
                                       batch_format="pyarrow"))
               .sort("id")
               .map_batches(per_block, batch_format="pyarrow",
                            batch_size=None))
    acc: dict[str, list] = {}
    for r in unioned.take_all():  # O(blocks x sources)
        a = acc.setdefault(r["source"], [0, 0])
        a[0] += int(r["n_docs"])
        a[1] += int(r["n_with_vec"])
    ks = sorted(acc)
    return pa.table({
        "source": pa.array(ks, pa.string()),
        "n_docs": pa.array([acc[k][0] for k in ks], pa.int64()),
        "n_with_vec": pa.array([acc[k][1] for k in ks], pa.int64()),
        "cov_per_mille": pa.array(
            [acc[k][1] * 1000 // max(acc[k][0], 1) for k in ks],
            pa.int64()),
    })
