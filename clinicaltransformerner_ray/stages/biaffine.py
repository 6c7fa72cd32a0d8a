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

from pathlib import Path

import numpy as np
import pyarrow as pa

from clinicaltransformerner_ray.functions.lexicon import Lexicon
from clinicaltransformerner_ray.functions.subword import MockWordpieceTokenizer
from clinicaltransformerner_ray.functions.text import (
    normalize_surface,
    tokenize_with_offsets,
)
from clinicaltransformerner_ray.stages.tagger import (
    MENTION_SCHEMA,
    _import_hf,
    _maybe_get,
)


def latest_checkpoint(model_dir: str) -> str | None:
    """The reference's checkpoint selection (`task_utils.py:456-474`):
    among ``checkpoint_<step>.bin`` files in the model dir, the one
    with the HIGHEST step wins (sorted by the integer stem suffix, not
    mtime).  Returns None when no checkpoint exists — the caller then
    keeps the randomly-initialised head (train-from-scratch shape)."""
    files = [p for p in Path(model_dir).glob("*.bin")
             if "checkpoint_" in p.name
             and p.stem.split("_")[-1].isdigit()]
    if not files:
        return None
    files.sort(key=lambda p: int(p.stem.split("_")[-1]))
    return str(files[-1])


def _build_real_model(torch, transformers, config):
    """Re-derivation of the reference's custom biaffine head
    (`src/transformer_biaffine_ner/model.py:11-75,111-185`): start/end
    MLP projections over the encoder's last hidden states, then the
    bilinear grid score ``einsum('bxi,ioj,byj->bxyo')`` with bias-
    augmented inputs.  Attribute names deliberately mirror the
    reference's module tree (``lm``, ``biaffine.ffnns.weight.N``,
    ``biaffine.biaffine.U``) so ``load_state_dict`` accepts a
    checkpoint the reference trained — that naming is the checkpoint
    wire format, not borrowed code.  Inference-only: no loss path."""
    nn = torch.nn

    class _MLP(nn.Module):
        def __init__(self, in_dim, out_dim, hidden_dim=0, n_hidden=0):
            super().__init__()
            act = nn.GELU()
            if n_hidden and hidden_dim:
                layers = []
                for i in range(n_hidden):
                    layers.append(nn.Linear(in_dim if i == 0 else hidden_dim,
                                            hidden_dim))
                    layers.append(act)
                layers += [nn.Linear(hidden_dim, out_dim), act,
                           nn.Dropout(0.1)]
            else:
                layers = [nn.Linear(in_dim, out_dim), act, nn.Dropout(0.1)]
            self.weight = nn.Sequential(*layers)

        def forward(self, x):
            return self.weight(x)

    class _BiaffineGrid(nn.Module):
        def __init__(self, dim, n_out):
            super().__init__()
            self.U = nn.Parameter(torch.empty(dim + 1, n_out, dim + 1))
            nn.init.xavier_normal_(self.U)

        def forward(self, x, y):
            pad = lambda t: torch.cat(  # noqa: E731 - bias channel
                [t, torch.ones_like(t[..., :1])], dim=-1)
            return torch.einsum("bxi,ioj,byj->bxyo",
                                pad(x), self.U, pad(y))

    class _Head(nn.Module):
        def __init__(self, cfg):
            super().__init__()
            out = cfg.mlp_dim if getattr(cfg, "mlp_dim", 0) > 0 \
                else cfg.hidden_size
            hid = getattr(cfg, "mlp_hidden_dim", 0)
            nh = getattr(cfg, "mlp_layers", 0)
            self.ffnns = _MLP(cfg.hidden_size, out, hid, nh)
            self.ffnne = _MLP(cfg.hidden_size, out, hid, nh)
            self.biaffine = _BiaffineGrid(out, cfg.num_labels)

        def forward(self, x):
            return self.biaffine(self.ffnns(x), self.ffnne(x))

    class _Model(nn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.lm = transformers.AutoModel.from_config(cfg)
            self.biaffine = _Head(cfg)
            self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

        def forward(self, input_ids, attention_mask=None,
                    token_type_ids=None):
            h = self.lm(input_ids, attention_mask=attention_mask,
                        token_type_ids=token_type_ids)[0]
            return self.biaffine(self.dropout(h))

    return _Model(config)


class BiaffineTagger:
    """Actor-pool stage: turns -> mentions via the span-grid route.
    Same output schema as MentionTagger, so every downstream KG stage
    (linker, canonicalization, triples) composes unchanged."""

    def __init__(self, alias_rows_ref, max_sub_len: int = 128,
                 noise_floor: bool = True, model_dir: str | None = None,
                 device: str = "cpu", forward_sentence_batch: int = 16):
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
        # real-checkpoint scorer (T4 parity, import-guarded): the
        # reference's biaffine model is a CUSTOM head over AutoModel —
        # AutoModelFor* cannot load it, so the head is re-derived in
        # `_build_real_model` and the newest `checkpoint_<step>.bin`
        # state dict applied (`task_utils.py:456-474`).  Loaded ONCE
        # per actor; model_dir=None keeps the deterministic mock and
        # imports nothing.
        self.model = None
        self.device = device
        self.forward_sentence_batch = forward_sentence_batch
        if model_dir is not None:
            torch, transformers = _import_hf()
            self._torch = torch
            config = transformers.AutoConfig.from_pretrained(model_dir)
            self.hf_tokenizer = transformers.AutoTokenizer.from_pretrained(
                model_dir, use_fast=False)
            self.model = _build_real_model(torch, transformers, config)
            ckpt = latest_checkpoint(model_dir)
            if ckpt is not None:
                state = torch.load(ckpt, map_location="cpu")
                self.model.load_state_dict(state)
            self.model.to(device).eval()
            # the checkpoint's frozen train-time label vocab replaces
            # the alias-synthesized type ids (the reference persists
            # idx2label on the config, task.py:57-59); grid class 0
            # stays 'none'
            idx2label = getattr(config, "idx2label", None)
            if idx2label:
                pairs = sorted((int(k), str(v))
                               for k, v in dict(idx2label).items()
                               if int(k) > 0)
                self.types = [t for _, t in pairs]
                self.type2id = {t: i for i, t in pairs}

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
        return self._decode_grid(logits, L)

    def _decode_grid(self, logits: np.ndarray, L: int):
        """M14 decode shared by mock and real scorers: the reference
        decodes argmax over log_softmax (task_utils.py:22-33);
        log_softmax subtracts the same scalar from every class of a
        cell, so argmax(log_softmax(logits)) == argmax(logits) —
        decode on raw logits and skip the exp/log over the full
        L x L x C grid (the per-turn hot op)."""
        pred = logits[:L, :L].argmax(axis=-1)  # (L, L)
        mask = np.triu(np.ones((L, L), dtype=bool))  # valid s <= e cells
        mask[0, :] = mask[:, 0] = False              # [CLS] row/col invalid
        cells = np.argwhere(np.where(mask, pred, 0))
        return [(int(s), int(e), int(pred[s, e])) for s, e in cells]

    # -- T4 real-checkpoint forward ----------------------------------------
    def _featurize_real(self, words: list[str]) -> tuple[list[int], list[int]]:
        """HF-tokenizer twin of `_sub_indexing`: 1-based word id AND
        vocab id per subtoken (word-by-word featurize, the reference's
        `data_utils.py:210-243`), truncated at max_sub_len."""
        tok = self.hf_tokenizer
        out_idx: list[int] = []
        out_ids: list[int] = []
        for i, w in enumerate(words):
            subs = tok.tokenize(w) or [tok.unk_token]
            for sid in tok.convert_tokens_to_ids(subs):
                out_idx.append(i + 1)
                out_ids.append(int(sid))
                if len(out_idx) >= self.max_sub_len:
                    return out_idx, out_ids
        return out_idx, out_ids

    def _score_real_batch(self, sent_sub_ids: list[list[int]]) -> list[np.ndarray]:
        """Batched real forward: stack ALL the batch's sentences as
        [CLS] subs [SEP] rows, run the encoder + biaffine head in
        bounded sub-batches (one forward per `forward_sentence_batch`
        sentences, the tagger's `_forward_real` precedent), return one
        (Lmax, Lmax, C) grid per sentence.  Grids never enter Arrow —
        they are decoded to span tuples inside the actor."""
        torch = self._torch
        tok = self.hf_tokenizer
        pad_id = tok.pad_token_id or 0
        n = len(sent_sub_ids)
        lmax = max(len(s) for s in sent_sub_ids) + 2
        ids = np.full((n, lmax), pad_id, np.int64)
        att = np.zeros((n, lmax), np.int64)
        for i, s in enumerate(sent_sub_ids):
            row = [tok.cls_token_id] + list(s) + [tok.sep_token_id]
            ids[i, : len(row)] = row
            att[i, : len(row)] = 1
        grids: list[np.ndarray] = []
        step = self.forward_sentence_batch
        with torch.no_grad():
            for i in range(0, n, step):
                out = self.model(
                    input_ids=torch.as_tensor(ids[i:i + step],
                                              device=self.device),
                    attention_mask=torch.as_tensor(att[i:i + step],
                                                   device=self.device),
                ).detach().cpu().numpy()
                grids.extend(out)
        return grids

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
        # pass 1: featurize every turn (mock: lexicon true spans; real:
        # HF vocab ids), so the real path can run ONE batched forward
        # over all the batch's sentences instead of per-turn calls
        sents = []  # (cid, ti, tokens, offsets, sub_idx, true_sub|sub_ids)
        for cid, ti, text in zip(conv, tidx, texts):
            tokens, offsets = tokenize_with_offsets(text or "")
            if not tokens:
                continue
            if self.model is not None:
                sub_idx, sub_ids = self._featurize_real(tokens)
                if not sub_idx:
                    continue
                sents.append((cid, ti, tokens, offsets, sub_idx, sub_ids))
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
            sents.append((cid, ti, tokens, offsets, sub_idx, true_sub))
        if self.model is not None and sents:
            grids = self._score_real_batch([s[5] for s in sents])
        # pass 2: decode + remap + emit
        for si, (cid, ti, tokens, offsets, sub_idx, aux) in enumerate(sents):
            if self.model is not None:
                pred_sub = self._decode_grid(grids[si], len(sub_idx) + 1)
            else:
                pred_sub = self._score_and_decode(sub_idx, aux)
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
