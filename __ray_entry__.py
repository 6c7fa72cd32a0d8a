"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

Each ``queries()`` entry has a matching ``oracle_sql()`` ANSI-SQL string
runnable by DuckDB over the same inputs.  The KG queries read the
deterministic synthetic `turns`/`aliases` parquet (BASELINE.json
input_hint schema) cached under /tmp/graft_data/<sf>/ — the SQL oracles
reference those files via read_parquet, so Ray and DuckDB see identical
bytes.  Non-SQL-expressible ops are suffixed ``_rowsonly``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_ORACLE_SF_DIR = "/root/testdata/sf0.01"  # driver runs oracles at sf=0.01


# ---------------------------------------------------------------------------
# helpers

def _paths(sf_dir: str) -> dict[str, str]:
    from clinicaltransformerner_ray.synth import ensure_synth

    return ensure_synth(sf_dir)


def _kg(sf_dir: str):
    from clinicaltransformerner_ray.pipelines.kg import kg_pipeline

    return kg_pipeline(sf_dir)


# ---------------------------------------------------------------------------
# driver surface

def entry() -> Any:
    """Flagship KG pipeline at sf0.001: returns the deduped triple table."""
    out = _kg("/root/testdata/sf0.001")
    return out["triples"]


def _q_kg_mentions(sf_dir: str):
    from clinicaltransformerner_ray.pipelines.kg import mention_counts
    from clinicaltransformerner_ray.pipelines.kg import detect_mentions
    from clinicaltransformerner_ray.sources.turns import load_alias_rows, read_turns

    alias_rows = load_alias_rows(sf_dir)
    turns = read_turns(sf_dir, columns=["conv_id", "turn_idx", "text"])
    mentions = detect_mentions(turns, alias_rows)
    return mention_counts(mentions)


def _q_kg_entities(sf_dir: str):
    return _kg(sf_dir)["entities"]


def _q_kg_triples(sf_dir: str):
    return _kg(sf_dir)["triples"]


def _q_kg_turn_entities(sf_dir: str):
    from clinicaltransformerner_ray.pipelines.kg import detect_mentions, link_mentions
    from clinicaltransformerner_ray.sources.turns import load_alias_rows, read_turns
    import pyarrow as pa

    alias_rows = load_alias_rows(sf_dir)
    turns = read_turns(sf_dir, columns=["conv_id", "turn_idx", "text"])
    linked = link_mentions(detect_mentions(turns, alias_rows), alias_rows)

    def dedup(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.select(["conv_id", "turn_idx", "entity_id"]).to_pandas()
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    # batch-local dedup then exact distinct via groupby-first
    import pandas as pd

    return (
        linked.map_batches(dedup, batch_format="pyarrow")
        .groupby(["conv_id", "turn_idx", "entity_id"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def _q_kg_mention_spans_rowsonly(sf_dir: str):
    """Full mention table with char offsets (windowing/decode/span route);
    offsets are checked against the sequential oracle in pytest, not SQL."""
    from clinicaltransformerner_ray.pipelines.kg import detect_mentions
    from clinicaltransformerner_ray.sources.turns import load_alias_rows, read_turns

    alias_rows = load_alias_rows(sf_dir)
    turns = read_turns(sf_dir, columns=["conv_id", "turn_idx", "text"])
    return detect_mentions(turns, alias_rows)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_mentions": _q_kg_mentions,
        "kg_entities": _q_kg_entities,
        "kg_triples": _q_kg_triples,
        "kg_turn_entities": _q_kg_turn_entities,
        "kg_mention_spans_rowsonly": _q_kg_mention_spans_rowsonly,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (sf0.01)

_MENTION_CTE = """
WITH t AS (
    SELECT conv_id, turn_idx,
           ' ' || regexp_replace(lower(text), '\\s+', ' ', 'g') || ' ' AS ntext
    FROM read_parquet('{turns}')
), m AS (
    SELECT t.conv_id, t.turn_idx, a.alias AS surface_norm, a.type, a.entity_id,
           CAST((len(t.ntext) - len(replace(t.ntext, ' ' || a.alias || ' ', ' ')))
                / (len(a.alias) + 1) AS BIGINT) AS n
    FROM t CROSS JOIN read_parquet('{aliases}') a
), mm AS (
    SELECT * FROM m WHERE n > 0
)
"""


def oracle_sql() -> dict[str, str]:
    return oracle_sql_for(_ORACLE_SF_DIR)


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    p = _paths(sf_dir)
    cte = _MENTION_CTE.format(turns=p["turns_sql"], aliases=p["aliases"])
    return {
        "kg_mentions": cte + """
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   surface_norm, type, n AS n_mentions
            FROM mm
        """,
        "kg_entities": cte + """
            , e AS (
                SELECT entity_id, min(type) AS type, surface_norm, SUM(n) AS sn
                FROM mm GROUP BY entity_id, surface_norm
            ), ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY entity_id ORDER BY sn DESC, surface_norm ASC) AS rk
                FROM e
            ), tot AS (
                SELECT entity_id, min(type) AS type,
                       CAST(SUM(sn) AS BIGINT) AS n_mentions,
                       CAST(COUNT(DISTINCT surface_norm) AS BIGINT) AS n_surfaces
                FROM e GROUP BY entity_id
            )
            SELECT tot.entity_id, tot.type, r.surface_norm AS canonical_surface,
                   tot.n_mentions, tot.n_surfaces
            FROM tot JOIN ranked r ON r.entity_id = tot.entity_id AND r.rk = 1
        """,
        "kg_triples": cte + """
            , te AS (SELECT DISTINCT conv_id, turn_idx, entity_id FROM mm)
            , co AS (
                SELECT a.entity_id AS subj, 'co_occurs' AS pred, b.entity_id AS obj,
                       a.conv_id, a.turn_idx
                FROM te a JOIN te b
                  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
                 AND a.entity_id < b.entity_id
            ), fo AS (
                SELECT a.entity_id AS subj, 'follows' AS pred, b.entity_id AS obj,
                       a.conv_id, a.turn_idx
                FROM te a JOIN te b
                  ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
                 AND a.entity_id <> b.entity_id
            )
            SELECT subj, pred, obj,
                   CAST(COUNT(*) AS BIGINT) AS n_evidence,
                   MIN(conv_id) AS first_conv_id,
                   CAST(MIN(turn_idx) AS BIGINT) AS first_turn_idx
            FROM (SELECT * FROM co UNION ALL SELECT * FROM fo)
            GROUP BY subj, pred, obj
        """,
        "kg_turn_entities": cte + """
            SELECT DISTINCT conv_id, turn_idx, entity_id FROM mm
        """,
    }
