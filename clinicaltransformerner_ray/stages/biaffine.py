"""Biaffine span-grid NER stage (SURVEY.md §2.3 M13-M17, §2.4 T4).

The reference's second model family scores every (start, end) subtoken
pair on an L x L x C grid (`src/transformer_biaffine_ner/model.py:38-75`)
and decodes spans by ``argmax(log_softmax)`` + mask + ``np.argwhere``
(`task_utils.py:22-63`).  This stage reproduces that lifecycle on Ray
with the deterministic lexicon stand-in for the trained model:

  featurize (M13): subword expand with 1-based per-subtoken word ids
    (``sub_indexing``, `transformer_biaffine_ner/data_utils.py:210-243`),
    entity word spans remapped to subtoken spans +1 for [CLS]
    (`:245-255`)
  score (T4): mock grid logits — peak at true span cells, floor noise
    elsewhere — shaped exactly like the model head's output
  decode (M14): argmax over the class axis after log_softmax, upper-
    triangle validity mask, argwhere of nonzero cells
  remap (M15): invert sub_indexing to word spans via the first/last
    subtoken map (`task_utils.py:128-190`); unmappable spans dropped
    with a count, as the reference warns-and-drops
  project (M16/M17): word spans -> BIO labels / char-offset mentions

O(L²) grids NEVER enter Arrow — they live only inside the actor per
sentence (SURVEY.md §7.5 hard-part #5); rows carry spans, not grids.
Sentences longer than ``max_sub_len`` subtokens are truncated, matching
the reference's fixed ``max_seq_len`` featurization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clinicaltransformerner_ray.functions.lexicon import Lexicon
from clinicaltransformerner_ray.functions.subword import MockWordpieceTokenizer
from clinicaltransformerner_ray.functions.text import (
    normalize_surface,
    tokenize_with_offsets,
)
from clinicaltransformerner_ray.stages.tagger import MENTION_SCHEMA, _maybe_get


class BiaffineTagger:
    """Actor-pool stage: turns -> mentions via the span-grid route.
    Same output schema as MentionTagger, so every downstream KG stage
    (linker, canonicalization, triples) composes unchanged."""

    def __init__(self, alias_rows_ref, max_sub_len: int = 128,
                 noise_floor: bool = True):
        alias_rows = _maybe_get(alias_rows_ref)
        self.lexicon = Lexicon(
            (tuple(r["alias"].split(" ")), r["type"], r["entity_id"])
            for r in alias_rows)
        self.types = sorted({r["type"] for r in alias_rows})
        self.type2id = {t: i + 1 for i, t in enumerate(self.types)}  # 0 = none
        self.tokenizer = MockWordpieceTokenizer()
        self.max_sub_len = max_sub_len
        self.noise_floor = noise_floor
        self.n_dropped = 0  # unmappable spans (task_utils.py:178-183 warn path)

    # -- M13: featurize ----------------------------------------------------
    def _sub_indexing(self, words: list[str]) -> list[int]:
        """1-based word id per subtoken (+[CLS] slot 0 handled by the +1
        grid offset), truncated at max_sub_len."""
        out: list[int] = []
        for i, w in enumerate(words):
            for _ in self.tokenizer.tokenize(w):
                out.append(i + 1)
                if len(out) >= self.max_sub_len:
                    return out
        return out

    def _true_spans(self, norm_words: list[str]) -> list[tuple[int, int, int]]:
        """(word_s, word_e_incl, type_id) from greedy lexicon match —
        the stand-in for annotated training spans."""
        tags = self.lexicon.tag_words(norm_words)
        spans = []
        i = 0
        while i < len(tags):
            if tags[i].startswith("B-"):
                t = tags[i][2:]
                j = i + 1
                while j < len(tags) and tags[j] == f"I-{t}":
                    j += 1
                spans.append((i, j - 1, self.type2id[t]))
                i = j
            else:
                i += 1
        return spans

    # -- T4 + M14: score and decode one sentence ---------------------------
    def _score_and_decode(
        self, sub_idx: list[int], true_sub_spans: list[tuple[int, int, int]]
    ) -> list[tuple[int, int, int]]:
        """Grid logits -> argmax(log_softmax) -> mask -> argwhere.
        Returns (sub_s, sub_e, type_id) predictions (CLS-offset space)."""
        L = len(sub_idx) + 1  # +1 for the [CLS] slot, data_utils.py:253
        C = len(self.types) + 1
        logits = np.zeros((L, L, C), dtype=np.float32)
        if self.noise_floor:
            pos = np.arange(L)
            floor = ((pos[:, None] * 31 + pos[None, :] * 17) % 97) / 970.0
            logits[..., 0] = 4.0 + floor  # 'none' wins except at peaks
        else:
            logits[..., 0] = 4.0
        for s, e, tid in true_sub_spans:
            if e < L and s <= e:
                logits[s, e, tid] = 8.0
        # the reference decodes argmax over log_softmax
        # (task_utils.py:22-33); log_softmax subtracts the same scalar
        # from every class of a cell, so argmax(log_softmax(logits)) ==
        # argmax(logits) — decode on raw logits and skip the exp/log
        # over the full L x L x C grid (the per-turn hot op)
        pred = logits.argmax(axis=-1)  # (L, L)
        mask = np.triu(np.ones((L, L), dtype=bool))  # valid s <= e cells
        mask[0, :] = mask[:, 0] = False              # [CLS] row/col invalid
        cells = np.argwhere(np.where(mask, pred, 0))
        return [(int(s), int(e), int(pred[s, e])) for s, e in cells]

    # -- M15: subtoken span -> word span -----------------------------------
    def _remap(self, sub_idx: list[int], sub_spans) -> list[tuple[int, int, int]]:
        first: dict[int, int] = {}
        last: dict[int, int] = {}
        for pos, wid in enumerate(sub_idx):
            # +1: grid coordinates include the [CLS] offset
            p = pos + 1
            first.setdefault(wid, p)
            last[wid] = p
        inv_first = {p: w for w, p in first.items()}
        inv_last = {p: w for w, p in last.items()}
        out = []
        for s, e, tid in sub_spans:
            ws = inv_first.get(s)
            we = inv_last.get(e)
            if ws is None or we is None:
                self.n_dropped += 1  # drop-with-warning (task_utils.py:178-183)
                continue
            out.append((ws - 1, we - 1, tid))  # back to 0-based word idx
        return out

    # -- batch entry -------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        cols = {k: [] for k in ("conv_id", "turn_idx", "ment_id", "surface",
                                "surface_norm", "start", "end", "type")}
        for cid, ti, text in zip(conv, tidx, texts):
            tokens, offsets = tokenize_with_offsets(text or "")
            if not tokens:
                continue
            norm = [normalize_surface(t) for t in tokens]
            sub_idx = self._sub_indexing(tokens)
            covered = sub_idx[-1] if sub_idx else 0  # words inside the window
            word_spans = [(s, e, tid) for s, e, tid in self._true_spans(norm)
                          if e < covered]
            # word span -> subtoken span, +1 CLS offset (data_utils.py:245-255)
            first_sub: dict[int, int] = {}
            last_sub: dict[int, int] = {}
            for pos, wid in enumerate(sub_idx):
                first_sub.setdefault(wid, pos + 1)
                last_sub[wid] = pos + 1
            true_sub = [(first_sub[s + 1], last_sub[e + 1], tid)
                        for s, e, tid in word_spans]
            pred_sub = self._score_and_decode(sub_idx, true_sub)
            for mid, (ws, we, tid) in enumerate(self._remap(sub_idx, pred_sub)):
                surf = " ".join(tokens[ws:we + 1])
                cols["conv_id"].append(cid)
                cols["turn_idx"].append(ti)
                cols["ment_id"].append(mid)
                cols["surface"].append(surf)
                cols["surface_norm"].append(normalize_surface(surf))
                cols["start"].append(offsets[ws][0])
                cols["end"].append(offsets[we][1])
                cols["type"].append(self.types[tid - 1])
        return pa.table({
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "ment_id": pa.array(cols["ment_id"], pa.int32()),
            "surface": pa.array(cols["surface"], pa.string()),
            "surface_norm": pa.array(cols["surface_norm"], pa.string()),
            "start": pa.array(cols["start"], pa.int32()),
            "end": pa.array(cols["end"], pa.int32()),
            "type": pa.array(cols["type"], pa.string()),
        }, schema=MENTION_SCHEMA)
