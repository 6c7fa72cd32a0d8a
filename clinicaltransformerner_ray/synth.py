"""Deterministic synthetic transcript corpus (the `turns` input table).

`BASELINE.json` input_hint mandates the input shape
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` but no such table exists in /root/testdata, so this
module synthesizes it deterministically (seed fixed, content-derived — no
wall clock, no global RNG) at a scale keyed to the sf directory name.

Construction invariants the oracle SQL and the mock tagger both rely on:

  - alias lexicon words are globally unique across aliases and disjoint
    from filler words  ⇒  an alias phrase occurs in a turn iff it was
    injected; no alias is a sub-phrase of another,
  - at least one filler token separates consecutive injected entities
    ⇒  greedy longest-match tagging == word-boundary substring counting,
    and the deterministic B→I tag perturbation is net-neutral after BIO
    repair,
  - turn_idx is 0-based contiguous per conv_id; row order is shuffled so
    the stable-ordering sort is actually exercised (FIXTURES.md §1),
  - one mega-conversation holds ~5% of all turns (skew salting exercise),
  - a few empty-text turns and ~1% long turns (forcing window chunking).

Outputs are cached under /tmp/graft_data/<sfname>/ with atomic
write-then-rename so concurrent callers (driver query vs oracle) are safe.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
CACHE_ROOT = "/tmp/graft_data/v2"
ENTITY_TYPES = ["problem", "treatment", "test", "drug"]
N_ENTITIES = 120          # 30 per type
EMBED_DIM = 16
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "retrieve", "calc", "chart_lookup"]

_SYLL = ["ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
         "pa", "qui", "ro", "su", "ti", "vo", "wa", "xe", "yo", "zu"]


def _word(rng: np.random.RandomState, taken: set[str], n_syll: int) -> str:
    for attempt in range(40):
        w = "".join(rng.choice(_SYLL) for _ in range(n_syll))
        if attempt >= 20:  # short-word pool exhausted: extend deterministically
            w += rng.choice(_SYLL)
        if w not in taken:
            taken.add(w)
            return w
    # deterministic last resort: numbered suffix keeps global uniqueness
    i = len(taken)
    while f"{w}{i}" in taken:
        i += 1
    w = f"{w}{i}"
    taken.add(w)
    return w


def build_lexicon() -> list[dict]:
    """Deterministic alias table rows: alias, type, entity_id, embedding.
    1-2 aliases per entity; alias word sets globally disjoint."""
    rng = np.random.RandomState(SEED)
    taken: set[str] = set()
    rows = []
    for k in range(N_ENTITIES):
        etype = ENTITY_TYPES[k % len(ENTITY_TYPES)]
        eid = f"E{k:04d}"
        n_alias = 1 + (k % 3 == 0)
        for _a in range(n_alias):
            n_words = int(rng.randint(1, 4))
            words = [_word(rng, taken, int(rng.randint(2, 4))) for _ in range(n_words)]
            emb = rng.normal(size=EMBED_DIM).astype(np.float32)
            emb /= np.linalg.norm(emb)
            rows.append({
                "alias": " ".join(words),
                "type": etype,
                "entity_id": eid,
                "embedding": emb.tolist(),
            })
    return rows


def build_fillers(exclude: set[str], n: int = 400) -> list[str]:
    rng = np.random.RandomState(SEED + 1)
    taken = set(exclude)
    return [_word(rng, taken, int(rng.randint(1, 4))) for _ in range(n)]


def sf_from_dir(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> 'sf0.01' (also accepts a bare 'sf0.01')."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return name if name.startswith("sf") else "sf0.01"


def n_turns_for(sfname: str) -> int:
    sf = float(sfname[2:])
    return max(1000, int(round(sf * 1_000_000)))


def generate_turns(sfname: str) -> tuple[pa.Table, pa.Table]:
    """Build (turns, aliases) Arrow tables, fully deterministic."""
    lex_rows = build_lexicon()
    aliases = [r["alias"].split(" ") for r in lex_rows]
    fillers = build_fillers({w for a in aliases for w in a})
    n_total = n_turns_for(sfname)
    rng = np.random.RandomState(SEED + n_total % 99991)

    # conversation sizes: one mega-conv with ~5% of turns, rest lognormal
    mega = max(50, n_total // 20)
    sizes = [mega]
    remaining = n_total - mega
    while remaining > 0:
        s = int(min(remaining, max(2, rng.lognormal(2.2, 0.8))))
        sizes.append(s)
        remaining -= s

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    base_ts = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
    filler_arr = np.asarray(fillers, dtype=object)
    n_alias = len(aliases)

    for c, size in enumerate(sizes):
        cid = f"c{c:07d}"
        conv_start = base_ts + c * 3_600_000_000
        for t in range(size):
            r = rng.random_sample()
            if r < 0.005:
                text = ""
            else:
                if r < 0.015:
                    n_words = int(rng.randint(200, 500))   # long turn -> many windows
                else:
                    n_words = int(rng.randint(3, 40))
                toks = list(filler_arr[rng.randint(0, len(filler_arr), size=n_words)])
                # inject entities with >=1 filler between them
                k = rng.poisson(1.2) if n_words >= 3 else 0
                if k > 0:
                    slots = sorted(rng.choice(max(1, n_words - 1), size=min(k, max(1, n_words // 3)), replace=False).tolist(), reverse=True)
                    prev_slot = None
                    for s_pos in slots:
                        if prev_slot is not None and prev_slot - s_pos < 2:
                            continue  # keep a filler between injections
                        a = aliases[int(rng.randint(0, n_alias))]
                        words = [w.capitalize() if rng.random_sample() < 0.3 else w for w in a]
                        toks[s_pos:s_pos] = words
                        prev_slot = s_pos
                # occasional newline instead of space
                if rng.random_sample() < 0.05 and len(toks) > 4:
                    j = int(rng.randint(1, len(toks) - 1))
                    text = " ".join(toks[:j]) + "\n" + " ".join(toks[j:])
                else:
                    text = " ".join(toks)
            role = ROLES[2] if rng.random_sample() < 0.08 else ROLES[t % 2]
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(TOOLS[int(rng.randint(0, len(TOOLS)))] if role == "tool" else "")
            tss.append(conv_start + t * 7_000_000)

    # deterministic shuffle of row order (stable-ordering sort must do work)
    perm = np.random.RandomState(SEED + 7).permutation(len(conv_ids))
    turns = pa.table({
        "conv_id": pa.array(np.asarray(conv_ids, dtype=object)[perm], type=pa.string()),
        "turn_idx": pa.array(np.asarray(turn_idxs, dtype=np.int32)[perm], type=pa.int32()),
        "role": pa.array(np.asarray(roles, dtype=object)[perm], type=pa.string()),
        "text": pa.array(np.asarray(texts, dtype=object)[perm], type=pa.string()),
        "tool": pa.array(np.asarray(tools, dtype=object)[perm], type=pa.string()),
        "ts": pa.array(np.asarray(tss, dtype=np.int64)[perm], type=pa.timestamp("us")),
    })
    alias_tbl = pa.table({
        "alias": pa.array([r["alias"] for r in lex_rows], type=pa.string()),
        "type": pa.array([r["type"] for r in lex_rows], type=pa.string()),
        "entity_id": pa.array([r["entity_id"] for r in lex_rows], type=pa.string()),
        "embedding": pa.array([r["embedding"] for r in lex_rows], type=pa.list_(pa.float32())),
    })
    return turns, alias_tbl


def ensure_synth(sf_dir: str) -> dict[str, str]:
    """Idempotently materialize turns/aliases parquet for an sf dir.

    The turns table is SHARDED into multiple files with small row groups
    so the distributed read starts one task per file instead of one
    serial reader — the 100 TB layout in miniature.

    Returns {'turns': dir_path (ray/pyarrow), 'turns_sql': glob (duckdb),
    'aliases': path, 'dir': cache_dir}."""
    sfname = sf_from_dir(sf_dir)
    out_dir = os.path.join(CACHE_ROOT, sfname)
    turns_d = os.path.join(out_dir, "turns")
    alias_p = os.path.join(out_dir, "aliases.parquet")
    if not (os.path.isdir(turns_d) and os.path.exists(alias_p)):
        tmp = out_dir + f".tmp.{os.getpid()}"
        os.makedirs(os.path.join(tmp, "turns"), exist_ok=True)
        turns, alias_tbl = generate_turns(sfname)
        n = turns.num_rows
        n_shards = min(64, max(4, n // 8192))
        per = -(-n // n_shards)
        for i in range(n_shards):
            shard = turns.slice(i * per, per)
            if shard.num_rows == 0:
                break
            pq.write_table(
                shard, os.path.join(tmp, "turns", f"part-{i:04d}.parquet"),
                row_group_size=4096)
        pq.write_table(alias_tbl, os.path.join(tmp, "aliases.parquet"))
        try:
            os.rename(tmp, out_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner exists
    return {
        "turns": turns_d,
        "turns_sql": os.path.join(turns_d, "*.parquet"),
        "aliases": alias_p,
        "dir": out_dir,
    }
