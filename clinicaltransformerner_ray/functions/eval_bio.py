"""Strict/relax span-level P/R/F evaluation as mergeable counters (A1-A4).

Pure per-sentence-pair counting with the exact matching semantics of the
reference's BioEval (`src/common_utils/bio_prf_eval.py:192-283`):

  - labels are lowercased before processing (`bio_prf_eval.py:287-318`),
  - gold/pred spans are maximal ``b-t, i-t*`` runs; the scan treats any
    non-excluded label as a span start (`:240-253`),
  - strict match: same start with ``b-`` in both, token-wise equality over
    the span, and the gold must not continue past the predicted end
    (`__strict_match`, :194-204),
  - relax match: any in-span token position where gold and pred share the
    span's type (`__relax_match`, :206-214),
  - a relax-matched span that overlaps an already-consumed gold span counts
    neither true nor false (the double-count guard, `:216-226`).

Counters are plain dicts keyed by category so they sum across sentences,
batches and blocks — the distributed aggregate is
``map_batches(partial counts) -> groupby(category).sum()`` with a tiny
driver-side finalize (SURVEY.md §2.6 A3/A4).
"""

from __future__ import annotations

from collections import defaultdict
from math import pow as _pow

#: counter field names (per category)
FIELDS = ("gs", "strict_true", "strict_false", "relax_true", "relax_false")


def _spans(labels: list[str], excluded: set[str]) -> list[tuple[str, int, int]]:
    """Maximal (category, start, end_exclusive) runs (bio_prf_eval.py:240-253)."""
    out = []
    n = len(labels)
    i = 0
    while i < n:
        if labels[i].strip() in excluded:
            i += 1
            continue
        s = i
        cate = labels[s].strip().split("-")[-1]
        e = s + 1
        while e < n and labels[e].strip() == f"i-{cate}":
            e += 1
        out.append((cate, s, e))
        i = e
    return out


def _strict_match(gs, pred, s, e, cate) -> bool:
    if e < len(gs) and gs[e] == f"i-{cate}":
        return False
    if gs[s] != f"b-{cate}" or pred[s] != f"b-{cate}":
        return False
    return all(gs[i] == pred[i] for i in range(s, e))


def _relax_match(gs, pred, s, e, cate) -> bool:
    for i in range(s, e):
        if gs[i].split("-")[-1] == cate and pred[i].split("-", 1)[-1] == cate:
            return True
    return False


def load_exclude_tags(path: str) -> set[str]:
    """Tags-not-for-eval file: one tag per line, stripped, lowercased.
    The reference reads the file raw (`new_bio_eval.py:356-362`) but every
    consumer lowercases before comparing (`bio_prf_eval.py:101-103`,
    `brat_eval.py:491-496`), and :func:`eval_sentence_pair` matches against
    lowercased labels — so lowercasing here IS the effective reference
    behavior.  Feed the result to ``eval_sentence_pair(excluded=...)`` /
    ``sources.brat.read_brat(tags_to_exclude=...)``."""
    with open(path) as f:
        return {ln.strip().lower() for ln in f if ln.strip()}


def eval_sentence_pair(
    gs_labels: list[str],
    pred_labels: list[str],
    excluded: set[str] | None = None,
) -> dict:
    """Counters for one (gold, pred) sentence pair.

    Returns ``{"acc_true": int, "acc_false": int, "cat": {category: [gs,
    strict_true, strict_false, relax_true, relax_false]}}``.
    """
    excluded = excluded if excluded is not None else {"o"}
    gs = [x.lower() for x in gs_labels]
    pred = [x.lower() for x in pred_labels]

    acc_true = sum(1 for a, b in zip(gs, pred) if a == b)
    acc_false = len(gs) - acc_true

    cat: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    gs_budget: dict[tuple[str, int, int], int] = defaultdict(int)
    for cate, s, e in _spans(gs, excluded):
        cat[cate][0] += 1
        gs_budget[(cate, s, e)] += 1  # exclusive end, exactly as stored at :251

    for cate, s, e in _spans(pred, excluded):
        if _strict_match(gs, pred, s, e, cate):
            cat[cate][1] += 1
            cat[cate][3] += 1
        elif _relax_match(gs, pred, s, e, cate):
            # double-count guard (bio_prf_eval.py:216-226): overlap with a
            # gold span of same category; if its budget is exhausted, skip.
            # NOTE: the reference compares *exclusive* ends as if inclusive
            # (:222 `not (e < start_idx or s > end_idx)`), so spans touching
            # at a boundary count as overlapping — replicated verbatim.
            skipped = False
            for (c, gs_s, gs_e), budget in gs_budget.items():
                if c == cate and not (gs_e < s or gs_s > e):
                    if budget == 0:
                        skipped = True
                    else:
                        gs_budget[(c, gs_s, gs_e)] -= 1
                    break
            if skipped:
                continue
            cat[cate][2] += 1
            cat[cate][3] += 1
        else:
            cat[cate][2] += 1
            cat[cate][4] += 1

    return {"acc_true": acc_true, "acc_false": acc_false, "cat": dict(cat)}


def merge_counters(counters: list[dict]) -> dict:
    """Sum sentence counters (associative/commutative — safe as a
    distributed partial+final aggregate)."""
    acc_t = acc_f = 0
    cat: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for c in counters:
        acc_t += c["acc_true"]
        acc_f += c["acc_false"]
        for k, v in c["cat"].items():
            for i in range(5):
                cat[k][i] += v[i]
    return {"acc_true": acc_t, "acc_false": acc_f, "cat": dict(cat)}


def _prf(tp: int, fp: int, gold: int, beta: float) -> dict:
    """F-beta finalize (bio_prf_eval.py:105-115)."""
    pre = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    rec = tp / gold if gold > 0 else 0.0
    b2 = _pow(beta, 2)
    f = (1 + b2) * pre * rec / (b2 * pre + rec) if (pre + rec) > 0 else 0.0
    return {"precision": pre, "recall": rec, "f_score": f}


def performance(merged: dict, beta: float = 1.0) -> dict:
    """The reference's nested performance dict (bio_prf_eval.py:2-22,117-157)."""
    total = merged["acc_true"] + merged["acc_false"]
    perf = {
        "overall": {"acc": round(merged["acc_true"] / total, 4) if total else 0.0},
        "category": {"strict": {}, "relax": {}},
    }
    g = st = sf = rt = rf = 0
    for k, v in merged["cat"].items():
        g += v[0]; st += v[1]; sf += v[2]; rt += v[3]; rf += v[4]
        perf["category"]["strict"][k] = _prf(v[1], v[2], v[0], beta)
        perf["category"]["relax"][k] = _prf(v[3], v[4], v[0], beta)
    perf["overall"]["strict"] = _prf(st, sf, g, beta)
    perf["overall"]["relax"] = _prf(rt, rf, g, beta)
    return perf


def counts(merged: dict) -> dict:
    """The reference's counts dict (bio_prf_eval.py:24-35,159-190)."""
    out = {"expect": {"overall": 0}, "prediction": {"strict": {}, "relax": {}}}
    g = st = sf = rt = rf = 0
    for k, v in merged["cat"].items():
        out["expect"][k] = v[0]
        g += v[0]; st += v[1]; sf += v[2]; rt += v[3]; rf += v[4]
        out["prediction"]["strict"][k] = {"total": v[1] + v[2], "true": v[1], "false": v[2]}
        out["prediction"]["relax"][k] = {"total": v[3] + v[4], "true": v[3], "false": v[4]}
    out["expect"]["overall"] = g
    out["prediction"]["strict"]["overall"] = {"total": st + sf, "true": st, "false": sf}
    out["prediction"]["relax"]["overall"] = {"total": rt + rf, "true": rt, "false": rf}
    return out
