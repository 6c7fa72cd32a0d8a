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

from clinicaltransformerner_ray.arrowutil import from_pandas_clean

import ray.data as rd


def _equals(g_start, g_end, g_type, s_start, s_end, s_type, mode: str) -> bool:
    if g_type != s_type:
        return False
    if mode == "strict":
        return g_start == s_start and g_end == s_end
    return (g_end > s_start and g_start < s_end) or \
           (g_start < s_end and s_start < g_end)


def _greedy_counts(gol: list, sys: list, match, key) -> tuple[int, int, int]:
    """The reference's greedy pare-down + count shape shared by tags and
    relations (`brat_eval.py:232-249,272-296`): iterate system items in
    order; a system item whose matching gold was already claimed is
    dropped from the system set — no break after a match.  ``key``
    extracts the identity used for distinct-counting (tag id for tags,
    row index for relations — the reference counts distinct objects)."""
    gol_matched: list[int] = []
    sys_check = list(range(len(sys)))
    for si, s in enumerate(sys):
        for gi, g in enumerate(gol):
            if match(g, s):
                if gi not in gol_matched:
                    gol_matched.append(gi)
                else:
                    if si in sys_check:
                        sys_check.remove(si)
    kept = [(i, sys[i]) for i in sys_check]
    tp = len({key(i, s) for i, s in kept for g in gol if match(g, s)})
    fp = len({key(i, s) for i, s in kept}) - tp
    fn = len(gol) - tp
    return tp, fp, fn


def doc_counts(gol: list[tuple], sys: list[tuple], mode: str) -> tuple[int, int, int]:
    """(tp, fp, fn) for one document's tags.  ``gol``/``sys`` are lists
    of (tid, start, end, type); iteration order = file order, as in the
    reference (dict preserves insertion order)."""
    return _greedy_counts(
        gol, sys,
        match=lambda g, s: _equals(g[1], g[2], g[3],
                                   s[1], s[2], s[3], mode),
        key=lambda i, s: s[0],
    )


def _rel_equals(g: tuple, s: tuple, mode: str) -> bool:
    """Relation.equals (`brat_eval.py:65-72`): both args match as
    concepts (type + strict/lenient span) and the relation types agree.
    Tuples: (rid, rtype, a1s, a1e, a1t, a2s, a2e, a2t)."""
    return (g[1] == s[1]
            and _equals(g[2], g[3], g[4], s[2], s[3], s[4], mode)
            and _equals(g[5], g[6], g[7], s[5], s[6], s[7], mode))


def rel_doc_counts(gol: list[tuple], sys: list[tuple], mode: str) -> tuple[int, int, int]:
    """(tp, fp, fn) for one document's relations — same greedy pare-down,
    distinct-object counting (`brat_eval.py:272-296`)."""
    return _greedy_counts(
        gol, sys,
        match=lambda g, s: _rel_equals(g, s, mode),
        key=lambda i, s: i,
    )


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
        return from_pandas_clean(pd.DataFrame(rows)) if rows else pa.table({
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


def _resolve_relations(rels: pd.DataFrame, tags: pd.DataFrame) -> list[tuple]:
    """J5 relation-arg resolution (`brat_eval.py:124-132`): look up each
    arg tid in the document's tag table; relations with an unresolvable
    arg are dropped (the reference would KeyError — we quarantine)."""
    if rels.empty:
        return []
    by_tid = {r.tid: (r.start, r.end, r.type) for r in tags.itertuples()}
    out = []
    for r in rels.itertuples():
        a1 = by_tid.get(r.arg1)
        a2 = by_tid.get(r.arg2)
        if a1 is None or a2 is None:
            continue
        out.append((r.rid, r.rtype, *a1, *a2))
    return out


def brat_full_eval(
    gold_tags: rd.Dataset,
    gold_rels: rd.Dataset,
    sys_tags: rd.Dataset,
    sys_rels: rd.Dataset,
    *,
    mode: str = "strict",
    tag_type: str | None = None,
) -> dict:
    """A5 complete: tag AND relation micro/macro scores over paired
    documents, replicating `MultipleEvaluator.track2`
    (`brat_eval.py:317-364`).  ``tag_type`` filters tags by type and
    relations by rtype, like SingleEvaluator's ``key``.

    Same distribution shape as brat_span_eval: all four annotation sets
    union into one Dataset (side x kind columns), one sort on doc_id
    co-locates every annotation of a document, a vectorized per-block
    pass scores each doc (args resolved against the in-block tag table),
    and the tiny per-doc count table reduces driver-side.  Pairing is
    per document across tags∪relations (the reference pairs .ann FILES;
    identical whenever every file has at least one annotation)."""
    assert mode in ("strict", "lenient")

    def tag_cols(side, kind):
        def add(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            for c, v in [("tid", None), ("type", None), ("start", -1),
                         ("end", -1), ("rid", None), ("rtype", None),
                         ("arg1", None), ("arg2", None)]:
                if c not in df.columns:
                    df[c] = v
            df["side"] = side
            df["kind"] = kind
            cols = ["doc_id", "side", "kind", "tid", "type", "start",
                    "end", "rid", "rtype", "arg1", "arg2"]
            return from_pandas_clean(df[cols], preserve_index=False)
        return add

    both = (
        gold_tags.map_batches(tag_cols("g", "tag"), batch_format="pyarrow")
        .union(sys_tags.map_batches(tag_cols("s", "tag"),
                                    batch_format="pyarrow"))
        .union(gold_rels.map_batches(tag_cols("g", "rel"),
                                     batch_format="pyarrow"))
        .union(sys_rels.map_batches(tag_cols("s", "rel"),
                                    batch_format="pyarrow"))
    )

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for doc, g in df.groupby("doc_id", sort=False):
            has_g = (g["side"] == "g").any()
            has_s = (g["side"] == "s").any()
            row = {"doc_id": doc, "paired": bool(has_g and has_s),
                   "has_gold": bool(has_g)}
            if row["paired"]:
                for side, pre in (("g", "g_"), ("s", "s_")):
                    tags = g[(g["side"] == side) & (g["kind"] == "tag")]
                    rels = g[(g["side"] == side) & (g["kind"] == "rel")]
                    ftags = (tags if tag_type is None
                             else tags[tags["type"] == tag_type])
                    frels = _resolve_relations(
                        rels if tag_type is None
                        else rels[rels["rtype"] == tag_type],
                        tags)  # args resolve against ALL tags
                    row[pre + "tags"] = [
                        (r.tid, r.start, r.end, r.type)
                        for r in ftags.itertuples()]
                    row[pre + "rels"] = frels
                t_tp, t_fp, t_fn = doc_counts(
                    row.pop("g_tags"), row.pop("s_tags"), mode)
                r_tp, r_fp, r_fn = rel_doc_counts(
                    row.pop("g_rels"), row.pop("s_rels"), mode)
            else:
                t_tp = t_fp = t_fn = r_tp = r_fp = r_fn = 0
            row.update(tag_tp=t_tp, tag_fp=t_fp, tag_fn=t_fn,
                       rel_tp=r_tp, rel_fp=r_fp, rel_fn=r_fn)
            rows.append(row)
        cols = ["doc_id", "paired", "has_gold", "tag_tp", "tag_fp",
                "tag_fn", "rel_tp", "rel_fp", "rel_fn"]
        if not rows:
            return pa.table({
                "doc_id": pa.array([], pa.string()),
                "paired": pa.array([], pa.bool_()),
                "has_gold": pa.array([], pa.bool_()),
                **{c: pa.array([], pa.int64()) for c in cols[3:]},
            })
        return from_pandas_clean(pd.DataFrame(rows)[cols],
                                    preserve_index=False)

    per_doc = (both.sort("doc_id")
               .map_batches(per_block, batch_format="pyarrow",
                            batch_size=None)
               .to_pandas())  # O(#docs) — small result
    paired = per_doc[per_doc["paired"]]
    n = max(len(paired), 1)
    out: dict = {"n_docs": len(paired), "mode": mode}
    for target, pre in (("tags", "tag_"), ("relations", "rel_")):
        tp = int(paired[pre + "tp"].sum())
        fp = int(paired[pre + "fp"].sum())
        fn = int(paired[pre + "fn"].sum())
        mp, mr, mf = _prf(tp, fp, fn)
        prf = paired.apply(
            lambda r: _prf(r[pre + "tp"], r[pre + "fp"], r[pre + "fn"]),
            axis=1, result_type="expand") if len(paired) else pd.DataFrame(
                columns=[0, 1, 2])
        out[target] = {
            "tp": tp, "fp": fp, "fn": fn,
            "micro": {"precision": mp, "recall": mr, "f1": mf},
            "macro": {"precision": prf[0].sum() / n,
                      "recall": prf[1].sum() / n,
                      "f1": prf[2].sum() / n},
        }
    out["unpaired_gold"] = sorted(
        per_doc[~per_doc["paired"] & per_doc["has_gold"]]["doc_id"])
    out["unpaired_sys"] = sorted(
        per_doc[~per_doc["paired"] & ~per_doc["has_gold"]]["doc_id"])
    return out
