"""Transcript table source.

Reads the synthesized `turns` Parquet (schema per BASELINE.json
input_hint) with column pruning at the read — only the columns a stage
needs leave storage.  Alias broadcast rows load driver-side once.
"""

from __future__ import annotations

import pyarrow.parquet as pq

import ray.data as rd

from clinicaltransformerner_ray.synth import ensure_synth

TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_turns(sf_dir: str, columns: list[str] | None = None) -> "rd.Dataset":
    paths = ensure_synth(sf_dir)
    return rd.read_parquet(paths["turns"], columns=columns or TURN_COLUMNS)


def load_alias_rows(sf_dir: str) -> list[dict]:
    """Small side table (the linker broadcast) — loaded driver-side,
    shipped to actors via one ray.put."""
    paths = ensure_synth(sf_dir)
    return pq.read_table(paths["aliases"]).to_pylist()
