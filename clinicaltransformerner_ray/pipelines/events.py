"""Windowed / sessionized aggregates over the `events` stream table —
the "streaming window" custom-operator family (beyond the reference's
batch-only surface; SURVEY.md §2.7 notes the reference has none).

  windowed_counts   tumbling time-window aggregate per (user, window):
                    event counts + exact value sums (integer cents, so
                    the result is hash-comparable across engines)
  sessionize        gap-based sessionization: a >30-min silence starts a
                    new session — the canonical stateful scan, expressed
                    as one sort on user_id (equal keys arrive whole per
                    block) + a vectorized per-block pass

Skew note: `sessionize` sorts on user_id alone, so one hyperactive user
lands in one block.  The 100 TB path salts the key with a coarse time
bucket and stitches sessions across bucket boundaries with 1-event ghost
overlap — same construction as the KG triple emitter's salted buckets
(pipelines/kg.py); not needed at test scale and kept out of the oracle
path for exact SQL parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SESSION_GAP_US = 30 * 60 * 1_000_000


def _round_half_away(v: np.ndarray) -> np.ndarray:
    """Round half away from zero (DuckDB round() semantics), int64."""
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def windowed_counts(events: rd.Dataset, *, window: str = "hour") -> rd.Dataset:
    """(user_id, window_start, n_events, sum_value_cents) via the
    combine/sort/combine aggregation shape (no Aggregate operator)."""
    assert window == "hour"

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if "window_start" not in df.columns:
            ts = pd.to_datetime(df["ts"])
            df = pd.DataFrame({
                "user_id": df["user_id"],
                "window_start": ts.dt.floor("h"),
                "n_events": 1,
                # exact integer-cents sum: float accumulation order would
                # differ between engines and break value-hash comparison.
                # Half-away-from-zero, matching DuckDB round() — np.round
                # is half-to-even and diverges on exact .5 cents
                "sum_value_cents": _round_half_away(
                    df["value"].to_numpy() * 100),
            })
        g = df.groupby(["user_id", "window_start"], sort=False).agg(
            n_events=("n_events", "sum"),
            sum_value_cents=("sum_value_cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events.map_batches(combine, batch_format="pyarrow",
                           batch_size=1 << 19)
        .sort(["user_id", "window_start"])
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
    )


def sessionize(events: rd.Dataset, *, gap_us: int = SESSION_GAP_US) -> rd.Dataset:
    """(user_id, session_idx, n_events, start_ts, end_ts) — sessions are
    maximal event runs per user with inter-event gaps <= ``gap_us``.
    Ties order by (ts, event_id), matching the SQL oracle's window."""

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_ts": pa.array([], pa.timestamp("us")),
                "end_ts": pa.array([], pa.timestamp("us")),
            })
        df = df.sort_values(["user_id", "ts", "event_id"])
        ts = df["ts"].astype("int64")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = ts.diff() > gap_us
        df["session_idx"] = (new_user | gap).groupby(
            df["user_id"]).cumsum().astype("int64") - 1
        g = df.groupby(["user_id", "session_idx"], sort=False).agg(
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return events.sort("user_id").map_batches(
        per_block, batch_format="pyarrow", batch_size=None)
