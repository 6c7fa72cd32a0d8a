"""Per-partition lineage records + checkpoint-resume (north rule).

Layout under ``out_dir``::

    part-0000.parquet          one output partition per INPUT shard
    ...
    _lineage/part-0000.json    {input, fingerprint, rows_in, rows_out,
                                n_quarantined, wall_s, status}

Resume = anti-join against finished lineage records: a partition whose
lineage says ``status == "done"`` AND whose input fingerprint still
matches is skipped; everything else is (re)computed.  This is the
reference's per-file try/except-skip fault isolation
(`src/run_transformer_batch_prediction.py:57-72`) upgraded to durable,
restart-safe bookkeeping.

The checkpoint boundary is the *linked mentions* table — the map-only
prefix of the KG build (read -> tag -> link) that is embarrassingly
shard-parallel.  The wide suffix (entities groupby, triple emission +
dedup) is cheap relative to extraction and recomputes from the
checkpoint, which is how a 100 TB run restarts without re-running the
model stage.

Partition files are written atomically (tmp + rename) so a crash
mid-write never yields a partition that lineage considers done.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow.parquet as pq

import ray.data as rd


def shard_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{int(st.st_mtime)}"


def _lineage_path(out_dir: str, idx: int) -> str:
    return os.path.join(out_dir, "_lineage", f"part-{idx:04d}.json")


def _part_path(out_dir: str, idx: int) -> str:
    return os.path.join(out_dir, f"part-{idx:04d}.parquet")


def load_lineage(out_dir: str) -> dict[int, dict]:
    """All lineage records currently on disk, keyed by partition index."""
    ldir = os.path.join(out_dir, "_lineage")
    out: dict[int, dict] = {}
    if not os.path.isdir(ldir):
        return out
    for name in os.listdir(ldir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(ldir, name)) as f:
                rec = json.load(f)
            out[int(name[5:-5])] = rec
    return out


def pending_shards(shards: list[str], out_dir: str) -> list[int]:
    """Indices still to process: no lineage, failed, or stale fingerprint."""
    done = load_lineage(out_dir)
    todo = []
    for i, shard in enumerate(shards):
        rec = done.get(i)
        if (rec is None or rec.get("status") != "done"
                or rec.get("fingerprint") != shard_fingerprint(shard)
                or not os.path.exists(_part_path(out_dir, i))):
            todo.append(i)
    return todo


def run_resumable(
    shards: list[str],
    build,                      # Callable[[rd.Dataset], rd.Dataset]
    out_dir: str,
    *,
    metrics_fn=None,            # Callable[[pa.Table], dict] extra metrics
) -> dict:
    """Process every not-yet-done input shard through ``build`` and write
    one output partition + lineage record each.  Returns a summary.

    Per-shard failures are quarantined in the lineage record (status
    "failed") and do NOT abort the run — the reference's skip-but-report
    semantics; a later invocation retries exactly the failed shards.
    """
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    todo = pending_shards(shards, out_dir)
    n_done_prior = len(shards) - len(todo)
    results = {"skipped": n_done_prior, "processed": 0, "failed": 0}
    for i in todo:
        shard = shards[i]
        rec = {
            "input": shard,
            "fingerprint": shard_fingerprint(shard),
            "status": "running",
        }
        t0 = time.perf_counter()
        try:
            ds = rd.read_parquet(shard)
            rows_in = ds.count()
            out = build(ds)
            tbl = out.to_arrow_refs()
            import pyarrow as pa
            import ray

            tables = [t for t in (ray.get(r) for r in tbl) if t.num_rows]
            if tables:
                full = pa.concat_tables(tables)
            else:  # empty partition: keep the schema so readers still work
                full = out.schema().base_schema.empty_table()
            tmp = _part_path(out_dir, i) + ".tmp"
            pq.write_table(full, tmp)
            os.replace(tmp, _part_path(out_dir, i))
            rec.update({
                "status": "done",
                "rows_in": rows_in,
                "rows_out": full.num_rows,
                "wall_s": round(time.perf_counter() - t0, 3),
            })
            if metrics_fn is not None:
                rec["metrics"] = metrics_fn(full)
            results["processed"] += 1
        except Exception as ex:  # quarantine, don't abort the job
            rec.update({
                "status": "failed",
                "error": repr(ex)[:500],
                "wall_s": round(time.perf_counter() - t0, 3),
            })
            results["failed"] += 1
        tmp = _lineage_path(out_dir, i) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, _lineage_path(out_dir, i))
    return results


def read_checkpoint(out_dir: str) -> rd.Dataset:
    """Dataset over all done partitions of a checkpointed stage."""
    done = load_lineage(out_dir)
    paths = [_part_path(out_dir, i) for i, rec in sorted(done.items())
             if rec.get("status") == "done"]
    return rd.read_parquet(paths)
