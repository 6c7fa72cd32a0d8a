"""Sharded in-memory dedup index — the engine's one SHARED MUTABLE
INDEX, the pattern the Dataset API genuinely can't express (per-record
transforms never need raw actors; a cross-corpus membership set does).

  build_index     fold a base corpus's content hashes into K
                  hash-sharded `DedupIndexShard` actors (add-only)
  filter_unseen   stream a new corpus through the index READ-ONLY and
                  keep only documents whose text never appeared in the
                  base corpus

Determinism contract: mutation (build) and lookup (filter) are separate
phases, so the result is independent of batch scheduling order — a
check-and-add single phase would make intra-run duplicate ownership
racy, which is why new-corpus internal duplicates are left to a
subsequent `dedup.exact_dedup` pass instead.

Scale shape: the index holds raw sha1 digests (20 B + set overhead per
distinct base text) sharded by 64 bits of the digest mod K, so memory
splits K ways and each map task issues ONE batched RPC per shard per
batch (digests travel, never text).  Growth path: raise
``n_shards`` and/or spill each shard's set to a sorted on-disk run —
the actor boundary localizes that change.

Reference parity note: the reference has no incremental corpus state;
this is a beyond-reference training-data op (SURVEY.md §2.11) for the
daily-crawl-vs-historical-corpus dedup every production pipeline runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


# num_cpus=0: the shards do trivial set ops and must never reserve
# CPUs for their lifetime — reserving K*0.25 CPUs on a small cluster
# starves the feed/probe map tasks (the CLAUDE.md pool-deadlock rule).
@ray.remote(num_cpus=0)
class DedupIndexShard:
    """One shard of the content-hash membership set."""

    def __init__(self) -> None:
        self._seen: set[bytes] = set()

    def add(self, digests: list[bytes]) -> int:
        before = len(self._seen)
        self._seen.update(digests)
        return len(self._seen) - before

    def contains(self, digests: list[bytes]) -> list[bool]:
        seen = self._seen
        return [d in seen for d in digests]

    def size(self) -> int:
        return len(self._seen)


def _digests(batch: pa.Table) -> list[bytes]:
    return [hashlib.sha1((t or "").encode()).digest()
            for t in batch.column("text").to_pylist()]


def _shard_of(digests: list[bytes], n_shards: int) -> np.ndarray:
    # 64 bits of the digest mod n_shards: uniform for ANY shard count
    # (a single-byte slot would leave shards >=256 empty and skew
    # non-power-of-two counts).
    return np.asarray(
        [int.from_bytes(d[:8], "little") % n_shards for d in digests],
        dtype=np.int64)


def build_index(base: rd.Dataset, *, n_shards: int = 8):
    """Fold the base corpus into ``n_shards`` index actors; returns the
    handles.  One batched `add` RPC per shard per batch; the Dataset
    drains through a side-effecting map (the canonical way to drive
    actor mutation from a stream — block payloads stay on workers)."""
    shards = [DedupIndexShard.remote() for _ in range(n_shards)]

    def feed(batch: pa.Table) -> pa.Table:
        digs = _digests(batch)
        slot = _shard_of(digs, n_shards)
        refs = []
        for s in range(n_shards):
            part = [d for d, sl in zip(digs, slot) if sl == s]
            if part:
                refs.append(shards[s].add.remote(part))
        ray.get(refs)  # barrier per batch: build must finish before use
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    # consume fully (sum of tiny per-batch counter rows)
    base.map_batches(feed, batch_format="pyarrow",
                     batch_size=1 << 14).count()
    return shards


def filter_unseen(new: rd.Dataset, shards) -> rd.Dataset:
    """Documents of ``new`` whose text hash is NOT in the index —
    read-only lookups, so output is scheduling-order independent.
    Output: (doc_id, text)."""
    n_shards = len(shards)

    def probe(batch: pa.Table) -> pa.Table:
        digs = _digests(batch)
        slot = _shard_of(digs, n_shards)
        keep = np.ones(len(digs), dtype=bool)
        # launch every shard's lookup first, gather ONCE — serial
        # ray.get per shard would multiply batch latency by n_shards
        idxs, refs = [], []
        for s in range(n_shards):
            idx = np.flatnonzero(slot == s)
            if not len(idx):
                continue
            idxs.append(idx)
            refs.append(shards[s].contains.remote(
                [digs[i] for i in idx]))
        for idx, hit in zip(idxs, ray.get(refs)):
            keep[idx[np.asarray(hit, dtype=bool)]] = False
        t = batch.select(["doc_id", "text"]).filter(pa.array(keep))
        return t

    return new.map_batches(probe, batch_format="pyarrow",
                           batch_size=1 << 14)
