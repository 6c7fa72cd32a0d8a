"""Sequential reference-semantics extractor — the conformance oracle.

Mirrors the reference's production inference lifecycle
(`src/run_transformer_batch_prediction.py:57-82`: load-once model state,
loop documents, emit spans) as a direct, single-threaded implementation
with NO Ray and NO shared code path with the pipeline's BIO machinery:
mentions come straight from greedy lexicon matching over (token, offset)
pairs, not from the windowing/decode stack.  Tests assert the Ray pipeline
(full subword→window→score→decode→repair→span route) reproduces this
oracle's output exactly (the BASELINE.md P/R≥0.95 gate; exact equality
expected for the deterministic tagger).
"""

from __future__ import annotations

from collections import defaultdict

from clinicaltransformerner_ray.functions.text import normalize_surface, tokenize_with_offsets

CO_OCCURS = "co_occurs"
FOLLOWS = "follows"


def extract_mentions_turn(text: str, lexicon) -> list[dict]:
    """Greedy longest-match mentions with char offsets for one turn."""
    tokens, offsets = tokenize_with_offsets(text)
    norm = [normalize_surface(t) for t in tokens]
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        cands = lexicon.by_head.get(norm[i])
        step = 1
        if cands:
            for alias, etype, eid in cands:
                L = len(alias)
                if i + L <= n and tuple(norm[i:i + L]) == alias:
                    out.append({
                        "surface": " ".join(tokens[i:i + L]),
                        "surface_norm": " ".join(alias),
                        "start": offsets[i][0],
                        "end": offsets[i + L - 1][1],
                        "type": etype,
                        "entity_id": eid,
                    })
                    step = L
                    break
        i += step
    return out


def extract_all(turn_rows: list[dict], lexicon) -> dict:
    """Run the whole KG build sequentially over plain dict rows.

    Returns {'mentions': [...], 'entities': {eid: n_mentions},
             'triples': {(subj, pred, obj): n_evidence}}.
    """
    turn_rows = sorted(turn_rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    mentions = []
    per_turn_entities: dict[tuple[str, int], set[str]] = defaultdict(set)
    entities: dict[str, int] = defaultdict(int)
    for row in turn_rows:
        ms = extract_mentions_turn(row["text"], lexicon)
        for m in ms:
            m2 = dict(m)
            m2["conv_id"] = row["conv_id"]
            m2["turn_idx"] = row["turn_idx"]
            mentions.append(m2)
            entities[m["entity_id"]] += 1
            per_turn_entities[(row["conv_id"], row["turn_idx"])].add(m["entity_id"])

    triples: dict[tuple[str, str, str], int] = defaultdict(int)
    for (conv, t), ents in per_turn_entities.items():
        es = sorted(ents)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                triples[(es[i], CO_OCCURS, es[j])] += 1
        nxt = per_turn_entities.get((conv, t + 1))
        if nxt:
            for a in es:
                for b in sorted(nxt):
                    if a != b:
                        triples[(a, FOLLOWS, b)] += 1
    return {"mentions": mentions, "entities": dict(entities), "triples": dict(triples)}
