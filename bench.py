"""Benchmark harness (driver contract).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the flagship KG pipeline twice in FRESH subprocesses
(num_cpus=8 then num_cpus=32) over the same input and reports throughput
at both plus scaling efficiency = (T8/T32)/4 — the sandbox substitute for
the north rule's N vs 4N node criterion.

Internal flag ``--_single CPUS`` is the subprocess entry used by
``--scaling``; it prints a tiny JSON line with wall time + triple count.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _num_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )


def _count(ds) -> int:
    """Consume a Dataset without pulling rows to the driver."""
    return ds.count()


def _run_kg(sf_dir: str) -> dict:
    """Flagship: full KG build. Returns wall time + output cardinalities."""
    from clinicaltransformerner_ray.pipelines.kg import kg_pipeline
    from clinicaltransformerner_ray.synth import ensure_synth

    ensure_synth(sf_dir)  # synth outside the timed region
    t0 = time.perf_counter()
    out = kg_pipeline(sf_dir)
    n_triples = _count(out["triples"])
    n_entities = _count(out["entities"])
    wall = time.perf_counter() - t0
    import glob

    import pyarrow.parquet as pq

    n_turns = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(ensure_synth(sf_dir)["turns_sql"]))
    return {
        "sec": wall,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "n_entities": n_entities,
        "turns_per_sec": n_turns / wall,
        "triples_per_sec": n_triples / wall,
    }


def _bench_queries(sf_dir: str) -> dict[str, float]:
    """Time every __ray_entry__ queries() pipeline (consumed via count)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as e

    import ray.data as rd

    times: dict[str, float] = {}
    for name, fn in e.queries().items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if isinstance(res, rd.Dataset):
            res.count()  # consume the stream; rows stay off the driver
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def main() -> None:
    sf_dir = _sf_dir()

    if "--_single" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--_single") + 1])
        _init_ray(cpus)
        r = _run_kg(sf_dir)
        import ray

        ray.shutdown()
        print(json.dumps({"num_cpus": cpus, **r}))
        return

    if "--scaling" in sys.argv:
        # bigger synth input so fixed overheads don't mask scaling
        sf_dir = os.environ.get("GRAFT_SCALING_SF", "sf3")
        # N and 4N worker slots; 4->16 by default so the 4N run still fits
        # the host with headroom (at 32 busy processes a single box hits
        # memory-bandwidth contention that real 4N-node clusters don't)
        pair = tuple(int(x) for x in
                     os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(","))
        # repeat each leg and keep the fastest run: wall time on this
        # shared host varies ~±20% with external load, and the minimum
        # is the least-interfered measurement of the engine itself
        reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
        results = {}
        all_secs: dict[int, list[float]] = {}
        for cpus in pair:
            best = None
            all_secs[cpus] = []
            for _ in range(reps):
                env = dict(os.environ, GRAFT_SF_DIR=sf_dir)
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--_single", str(cpus)],
                    capture_output=True, text=True, env=env,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                line = proc.stdout.strip().splitlines()[-1]
                r = json.loads(line)
                all_secs[cpus].append(round(r["sec"], 3))
                if best is None or r["sec"] < best["sec"]:
                    best = r
            results[cpus] = best
        lo, hi = pair
        t_lo, t_hi = results[lo]["sec"], results[hi]["sec"]
        factor = hi / lo
        efficiency = (t_lo / t_hi) / factor
        print(json.dumps({
            "metric": "kg_scaling",
            "value": round(efficiency, 4),
            "unit": "efficiency",
            "sf": sf_dir,
            "runs": {
                f"cpus{lo}": {"sec": round(t_lo, 3),
                              "turns_per_sec": round(results[lo]["turns_per_sec"], 1),
                              "triples_per_sec": round(results[lo]["triples_per_sec"], 1)},
                f"cpus{hi}": {"sec": round(t_hi, 3),
                              "turns_per_sec": round(results[hi]["turns_per_sec"], 1),
                              "triples_per_sec": round(results[hi]["triples_per_sec"], 1)},
            },
            f"speedup_{lo}_to_{hi}": round(t_lo / t_hi, 3),
            "scaling_efficiency": round(efficiency, 4),
            # full distribution across reps (best-of-N picks the
            # least-interfered sample on this shared host, but report
            # every sample so the spread is visible)
            "all_runs_sec": {f"cpus{c}": v for c, v in all_secs.items()},
        }))
        return

    num_cpus = _num_cpus()
    _init_ray(num_cpus)
    kg = _run_kg(sf_dir)
    qtimes = _bench_queries(sf_dir)
    total = round(kg["sec"] + sum(qtimes.values()), 3)
    print(json.dumps({
        "metric": "kg_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": {"kg_flagship": round(kg["sec"], 3), **qtimes},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_turns": kg["n_turns"],
        "n_triples": kg["n_triples"],
        "turns_per_sec": round(kg["turns_per_sec"], 1),
        "triples_per_sec": round(kg["triples_per_sec"], 1),
    }))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
