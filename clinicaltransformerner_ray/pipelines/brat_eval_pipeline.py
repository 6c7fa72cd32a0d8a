"""Brat-style strict/lenient span evaluation with micro/macro document
aggregation (SURVEY.md §2.5 J4, §2.6 A5).

Per-document matching replicates `src/eval_scripts/brat_eval.py` exactly:

  - strict equal: same (start, end) and type (`ClinicalConcept.equals`,
    brat_eval.py:32-47); lenient: interval overlap and type,
  - the greedy pare-down: iterate system tags in order; a system tag
    whose matching gold was already claimed is dropped from the system
    set — no break after a match, exactly as `brat_eval.py:232-244`,
  - per-doc tp/fp/fn, then micro (summed counts) and macro (averaged
    per-doc P/R/F1) across documents (`MultipleEvaluator.track2`,
    brat_eval.py:317-364).

Distribution: the per-doc evaluator is the canonical two-phase
aggregate — gold and system tags union into one Dataset, one sort on
doc_id co-locates each document, per-block passes evaluate every doc in
the block, and the tiny (tp, fp, fn, p, r, f1)-per-doc table reduces
driver-side.  Unpaired documents (present on one side only) surface in
the result, replacing the reference's file-set intersection report
(`brat_eval.py:448-469`, §2.8 D1).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd


def _equals(g_start, g_end, g_type, s_start, s_end, s_type, mode: str) -> bool:
    if g_type != s_type:
        return False
    if mode == "strict":
        return g_start == s_start and g_end == s_end
    return (g_end > s_start and g_start < s_end) or \
           (g_start < s_end and s_start < g_end)


def doc_counts(gol: list[tuple], sys: list[tuple], mode: str) -> tuple[int, int, int]:
    """(tp, fp, fn) for one document.  ``gol``/``sys`` are lists of
    (tid, start, end, type); iteration order = file order, as in the
    reference (dict preserves insertion order)."""
    gol_matched: list[int] = []
    sys_check = list(range(len(sys)))
    for si, s in enumerate(sys):
        for gi, g in enumerate(gol):
            if _equals(g[1], g[2], g[3], s[1], s[2], s[3], mode):
                if gi not in gol_matched:
                    gol_matched.append(gi)
                else:
                    if si in sys_check:
                        sys_check.remove(si)
    kept = [sys[i] for i in sys_check]
    tp = len({s[0] for s in kept for g in gol
              if _equals(g[1], g[2], g[3], s[1], s[2], s[3], mode)})
    fp = len({s[0] for s in kept}) - tp
    fn = len(gol) - tp
    return tp, fp, fn


def _prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if (tp + fp) else 0.0
    r = tp / (tp + fn) if (tp + fn) else 0.0
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f


def brat_span_eval(
    gold_tags: rd.Dataset,
    sys_tags: rd.Dataset,
    *,
    mode: str = "strict",
    tag_type: str | None = None,
) -> dict:
    """Micro/macro tag scores over paired documents.

    Returns {"micro": {...}, "macro": {...}, "tp/fp/fn": ...,
    "n_docs": int, "unpaired_gold"/"unpaired_sys": [...]}."""
    assert mode in ("strict", "lenient")

    def tag_side(side):
        def add(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array([side] * batch.num_rows, pa.string()))
        return add

    both = (gold_tags.map_batches(tag_side("g"), batch_format="pyarrow")
            .union(sys_tags.map_batches(tag_side("s"), batch_format="pyarrow")))

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for doc, g in df.groupby("doc_id", sort=False):
            # side presence comes from the group BEFORE the tag_type
            # filter (pairing is per document, not per type); the group
            # already holds every row of the doc, so no full-block scan
            has_g = (g["side"] == "g").any()
            has_s = (g["side"] == "s").any()
            if tag_type is not None:
                g = g[g["type"] == tag_type]
            gol = [(r.tid, r.start, r.end, r.type)
                   for r in g[g["side"] == "g"].itertuples()]
            sys = [(r.tid, r.start, r.end, r.type)
                   for r in g[g["side"] == "s"].itertuples()]
            if not (has_g and has_s):
                rows.append({"doc_id": doc, "paired": False,
                             "has_gold": bool(has_g),
                             "tp": 0, "fp": 0, "fn": 0,
                             "p": 0.0, "r": 0.0, "f1": 0.0})
                continue
            tp, fp, fn = doc_counts(gol, sys, mode)
            p, r, f1 = _prf(tp, fp, fn)
            rows.append({"doc_id": doc, "paired": True, "has_gold": True,
                         "tp": tp, "fp": fp, "fn": fn,
                         "p": p, "r": r, "f1": f1})
        return pa.Table.from_pandas(pd.DataFrame(rows)) if rows else pa.table({
            "doc_id": pa.array([], pa.string()),
            "paired": pa.array([], pa.bool_()),
            "has_gold": pa.array([], pa.bool_()),
            "tp": pa.array([], pa.int64()),
            "fp": pa.array([], pa.int64()),
            "fn": pa.array([], pa.int64()),
            "p": pa.array([], pa.float64()),
            "r": pa.array([], pa.float64()),
            "f1": pa.array([], pa.float64()),
        })

    per_doc = (both.sort("doc_id")
               .map_batches(per_block, batch_format="pyarrow",
                            batch_size=None)
               .to_pandas())  # O(#docs) — small result
    paired = per_doc[per_doc["paired"]]
    tp, fp, fn = int(paired["tp"].sum()), int(paired["fp"].sum()), int(paired["fn"].sum())
    mp, mr, mf = _prf(tp, fp, fn)
    n = max(len(paired), 1)
    return {
        "n_docs": len(paired),
        "tp": tp, "fp": fp, "fn": fn,
        "micro": {"precision": mp, "recall": mr, "f1": mf},
        "macro": {"precision": paired["p"].sum() / n,
                  "recall": paired["r"].sum() / n,
                  "f1": paired["f1"].sum() / n},
        "unpaired_gold": sorted(
            per_doc[~per_doc["paired"] & per_doc["has_gold"]]["doc_id"]),
        "unpaired_sys": sorted(
            per_doc[~per_doc["paired"] & ~per_doc["has_gold"]]["doc_id"]),
    }
