"""Mention-detection actor stage (T1+T2+M1-M11 fused).

One callable class = one Ray actor pool via
``ds.map_batches(MentionTagger, concurrency=N, batch_format="pyarrow")``.
All load-once state (tokenizer with caches, lexicon, label vocab) is built
in ``__init__`` — the Ray analog of the reference's load-model-once,
stream-files production loop (`src/run_transformer_batch_prediction.py:32-69`).

Per batch the stage runs the full reference inference lifecycle:

  word tokenize (offsets) -> subword expand + guards -> window chunking
  ([next]/NEXT_GUARD) -> batched mock-model forward (stacked numpy logits,
  the contract of `src/transformer_ner/task.py:359-432`) -> argmax over
  log_softmax (M7) -> guard-walk decode merging continuation windows (M6)
  -> system-label fix (M8) -> BIO repair (M9) -> span assembly (M11).

The decode here is the vectorized equivalent of the reference's guard walk:
for BERT-family framing, positions with ``guard > 0`` and
``guard != previous guard`` are exactly the first subtokens of words, in
order, and NEXT_GUARD/pad/special positions all carry ``guard <= 0`` —
equivalence with the sequential walk is asserted by
tests/test_kg_pipeline.py::test_vectorized_decode_equals_reference_walk.

Per-turn failures are quarantined, not fatal (the reference's per-file
try/except-skip-but-LOG, `run_transformer_batch_prediction.py:70-72`):
bad rows are counted per actor (``n_failed``), every batch with
failures emits one WARNING naming the turns, and when
``quarantine_dir`` is set each actor also writes the failed keys +
error strings as a parquet side table (one small file per failing
batch) that `read_quarantine` loads back as a Dataset.

MULTI-NODE NOTE: actors write with local-filesystem calls, so on a
real cluster ``quarantine_dir`` must be a path every node mounts (NFS
etc.); a driver-local /tmp path collects only driver-node failures.
Single-node (this sandbox) is unaffected.
"""

from __future__ import annotations

import logging
import os
import uuid

import numpy as np
import pyarrow as pa

import ray

_LOG = logging.getLogger(__name__)

from clinicaltransformerner_ray.labels import (
    build_label_vocab,
    invert,
    system_labels,
)
from clinicaltransformerner_ray.functions.decode import (
    argmax_decode,
    decode_windows,
    fix_bio,
    fix_system_labels,
)
from clinicaltransformerner_ray.functions.lexicon import (
    Lexicon,
    ids_to_logits,
    perturb_tags,
)
from clinicaltransformerner_ray.functions.spans import tag2entity_turn
from clinicaltransformerner_ray.functions.subword import tokenizer_for_family
from clinicaltransformerner_ray.functions.text import (
    normalize_surface,
    tokenize_with_offsets,
)
from clinicaltransformerner_ray.functions.windowing import FAMILIES, make_windows

MENTION_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("ment_id", pa.int32()),
    ("surface", pa.string()),
    ("surface_norm", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("type", pa.string()),
])

#: ``emit="labels"`` output: one row per turn with the decoded BIO
#: label sequence (the training-data assembly surface, T6).
LABELS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int64()),
    ("tokens", pa.list_(pa.string())),
    ("labels", pa.list_(pa.string())),
])


def read_quarantine(quarantine_dir: str):
    """Load the quarantine side table written by MentionTagger actors
    as a Dataset (conv_id, turn_idx, stage, error); empty Dataset if no
    turn ever failed."""
    import glob

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(quarantine_dir,
                                          "part-*.parquet")))
    if not files:
        return rd.from_arrow(pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "stage": pa.array([], pa.string()),
            "error": pa.array([], pa.string()),
        }))
    return rd.read_parquet(files)


def _maybe_get(ref):
    """Broadcast pattern: constructor receives a ``ray.put`` ObjectRef
    (shipped once per actor, not per batch); plain values pass through for
    tests without Ray."""
    if isinstance(ref, ray.ObjectRef):
        return ray.get(ref)
    return ref


def _import_hf():
    """Import-guarded torch/transformers for the real-checkpoint scorer
    path.  This sandbox ships neither, so the guard raises a pointed
    error instead of a bare ModuleNotFoundError; every default path
    (mock scorer) never reaches this."""
    try:
        import torch
        import transformers
    except ImportError as exc:  # pragma: no cover - no torch here
        raise ImportError(
            "MentionTagger(model_dir=...) needs torch + transformers "
            "installed on every Ray worker; install them or drop "
            "model_dir to use the deterministic mock scorer"
        ) from exc
    return torch, transformers


class MentionTagger:
    def __init__(
        self,
        alias_rows_ref,
        max_seq_length: int = 64,
        noise_mod: int = 5,
        fast_decode: bool = True,
        decode: str = "argmax",
        family: str = "bert",
        label2idx: dict[str, int] | None = None,
        quarantine_dir: str | None = None,
        model_dir: str | None = None,
        device: str = "cpu",
        forward_window_batch: int = 64,
        emit: str = "mentions",
    ):
        # emit="labels": per-turn (tokens, BIO labels) rows instead of
        # the span table — the fix_bio'd y_pred round-trips exactly to
        # spans_to_bio(tag2entity_turn(y_pred)), so this is the same
        # decode with the mention projection skipped (zero extra wide
        # ops for training-data assembly, pipelines/train.py)
        assert emit in ("mentions", "labels"), emit
        self.emit = emit
        alias_rows = _maybe_get(alias_rows_ref)
        self.lexicon = Lexicon(
            (tuple(r["alias"].split(" ")), r["type"], r["entity_id"]) for r in alias_rows
        )
        types = sorted({r["type"] for r in alias_rows})
        # a persisted label2idx.json (state/artifacts.load_label_vocab,
        # the reference's frozen train-time vocab, task.py:556-577) can
        # replace the synthesized vocab; the keyset must agree — the
        # resume discipline of check_resume_vocab
        if label2idx is not None:
            from clinicaltransformerner_ray.state.artifacts import (
                check_resume_vocab)

            self.label2idx = check_resume_vocab(
                build_label_vocab(types), label2idx)
        else:
            self.label2idx = build_label_vocab(types)
        # real-checkpoint scorer (T1/T2 parity, import-guarded): load
        # tokenizer + token-classification head ONCE per actor — the
        # Ray analog of the reference's load-model-once production loop
        # (`src/transformer_ner/task.py:75-98`: config/tokenizer/model
        # from the checkpoint dir, plus the added [next] token,
        # `task.py:646-651`).  Absent torch/transformers (this
        # sandbox), model_dir=None keeps the deterministic mock and
        # nothing below imports anything.
        self.model = None
        self.device = device
        self.forward_window_batch = forward_window_batch
        if model_dir is not None:
            torch, transformers = _import_hf()
            self._torch = torch
            self.hf_tokenizer = transformers.AutoTokenizer.from_pretrained(
                model_dir, use_fast=False)
            from clinicaltransformerner_ray.labels import NEXT_TOKEN

            self.hf_tokenizer.add_tokens(NEXT_TOKEN)
            self.model = (transformers.AutoModelForTokenClassification
                          .from_pretrained(model_dir))
            self.model.resize_token_embeddings(len(self.hf_tokenizer))
            self.model.to(device).eval()
            if label2idx is None:
                # the checkpoint's frozen train-time vocab replaces the
                # alias-synthesized one (the reference persists and
                # reloads label2idx the same way, task.py:556-577)
                self.label2idx = {str(k): int(v) for k, v in
                                  self.model.config.label2id.items()}
        self.idx2label = invert(self.label2idx)
        self.system_labels = system_labels(self.label2idx)
        self.n_labels = len(self.label2idx)
        # tokenizer-family strategy (M3/M5/M19 variance): framing,
        # padding side, continuation-label policy and partial-token
        # convention all come from one strategy object
        self.family = FAMILIES[family]
        # the windowing layer needs exactly tokenize(word) +
        # convert_tokens_to_ids(tokens) — the HF slow-tokenizer
        # interface — so a real checkpoint tokenizer drops in where the
        # deterministic mock otherwise sits (same word-by-word loop as
        # the reference featurizer, data_utils.py:287-299)
        self.tokenizer = (self.hf_tokenizer if self.model is not None
                          else tokenizer_for_family(family))
        self.max_seq_length = max_seq_length
        self.noise_mod = noise_mod
        self.fast_decode = fast_decode
        # decode route: "argmax" (M7) or "crf" (T3) — the reference's
        # --use_crf model option (`src/run_transformer_ner.py`,
        # `src/common_utils/model_utils.py:582-657`); CRF runs Viterbi
        # over emissions + a fixed BIO transition matrix built once here
        assert decode in ("argmax", "crf"), decode
        self.decode = decode
        if decode == "crf":
            from clinicaltransformerner_ray.functions.crf import bio_transitions

            self.transitions = bio_transitions(self.label2idx)
        self.n_failed = 0
        self.quarantine_dir = quarantine_dir

    def _report_failures(self, failures: list[tuple]) -> None:
        """Surface quarantined turns — never silently drop (reference
        logs the traceback before skipping a file)."""
        if not failures:
            return
        self.n_failed += len(failures)
        _LOG.warning(
            "MentionTagger: quarantined %d turn(s) in batch "
            "(actor total %d): %s",
            len(failures), self.n_failed,
            [(c, t, err.splitlines()[0][:120]) for c, t, _st, err
             in failures[:5]])
        if self.quarantine_dir is not None:
            os.makedirs(self.quarantine_dir, exist_ok=True)
            tbl = pa.table({
                "conv_id": pa.array([str(f[0]) for f in failures],
                                    pa.string()),
                "turn_idx": pa.array([int(f[1]) for f in failures],
                                     pa.int32()),
                "stage": pa.array([f[2] for f in failures], pa.string()),
                "error": pa.array([f[3] for f in failures], pa.string()),
            })
            import pyarrow.parquet as pq

            pq.write_table(tbl, os.path.join(
                self.quarantine_dir, f"part-{uuid.uuid4().hex}.parquet"))

    # -- model stand-in ----------------------------------------------------
    def _forward(self, label_id_mat: np.ndarray,
                 mask: np.ndarray | None = None) -> np.ndarray:
        """Batched mock forward: (n_windows, L) target ids -> (n_windows, L)
        predicted ids via real logits + argmax(log_softmax), or Viterbi
        DP when the CRF route is selected (task.py:390-391: CRF skips
        the log_softmax/argmax and decodes inside the model)."""
        logits = ids_to_logits(label_id_mat, self.n_labels)
        if self.decode == "crf":
            from clinicaltransformerner_ray.functions.crf import viterbi_decode

            return viterbi_decode(logits, self.transitions, mask)
        return argmax_decode(logits)

    def _forward_real(self, input_ids: np.ndarray, mask: np.ndarray,
                      segment_ids: np.ndarray) -> np.ndarray:
        """Real-checkpoint batched forward (task.py:359-432): stack ALL
        the batch's windows, run them through the token-classification
        head in bounded sub-batches, argmax the logits (argmax over
        log_softmax == argmax over logits) — or Viterbi over the real
        emissions when the CRF route is selected."""
        torch = self._torch
        outs = []
        step = self.forward_window_batch
        with torch.no_grad():
            for i in range(0, len(input_ids), step):
                kwargs = {
                    "input_ids": torch.as_tensor(
                        input_ids[i:i + step], dtype=torch.long,
                        device=self.device),
                    "attention_mask": torch.as_tensor(
                        mask[i:i + step], dtype=torch.long,
                        device=self.device),
                }
                if self.family.uses_token_type_ids:
                    kwargs["token_type_ids"] = torch.as_tensor(
                        segment_ids[i:i + step], dtype=torch.long,
                        device=self.device)
                outs.append(self.model(**kwargs).logits
                            .detach().cpu().numpy())
        logits = np.concatenate(outs, axis=0)
        if self.decode == "crf":
            from clinicaltransformerner_ray.functions.crf import viterbi_decode

            return viterbi_decode(logits, self.transitions, mask)
        return argmax_decode(logits)

    # -- per-turn featurize ------------------------------------------------
    def _featurize_turn(self, text: str):
        """Tokenize/window one turn; returns (tokens, offsets, wins,
        guards_mat, first, target) or None for empty turns.  The model
        forward is NOT run here — windows of the whole batch stack into
        one forward/Viterbi call (the reference batches the same way:
        DataLoader batches windows regardless of sentence,
        data_utils.py:356-389)."""
        tokens, offsets = tokenize_with_offsets(text)
        if not tokens:
            return None
        # featurize with all-'O' labels (predict mode, data_utils.py:167-168)
        wins = make_windows(tokens, ["O"] * len(tokens), self.tokenizer,
                            self.max_seq_length, self.label2idx,
                            family=self.family)
        guards_mat = np.asarray([w.guards for w in wins], dtype=np.int32)
        first = np.empty_like(guards_mat, dtype=bool)
        first[:, 0] = True
        first[:, 1:] = guards_mat[:, 1:] != guards_mat[:, :-1]
        mask_mat = np.asarray([w.attention_mask for w in wins],
                              dtype=np.int8)
        if self.model is not None:
            # real checkpoint: the model scores the windows itself — no
            # lexicon-derived target ids exist (the checkpoint vocab
            # need not cover the alias types at all)
            return tokens, offsets, wins, guards_mat, first, None, mask_mat
        norm = [normalize_surface(t) for t in tokens]
        word_tags = self.lexicon.tag_words(norm)
        if self.noise_mod:
            word_tags = perturb_tags(norm, word_tags, mod=self.noise_mod)
        # what a trained model would emit per subtoken: word tag on first
        # piece, X on continuations (XLNet: the tag again), O on specials
        tag_ids = np.asarray(
            [self.label2idx[t] for t in word_tags] + [self.label2idx["O"]],
            dtype=np.int32,
        )
        word_pos = np.clip(guards_mat - 1, 0, len(word_tags) - 1)
        cont = (tag_ids[word_pos]
                if self.family.repeat_label_on_continuation
                else self.label2idx["X"])
        target = np.where(
            guards_mat <= 0,
            self.label2idx["O"],
            np.where(first, tag_ids[word_pos], cont),
        )
        return tokens, offsets, wins, guards_mat, first, target, mask_mat

    def _predict_bio(self, feat, preds: np.ndarray) -> list[str]:
        """preds: this turn's (n_windows, L) predicted label ids ->
        the repaired per-word BIO sequence."""
        tokens, offsets, wins, guards_mat, first, _target, _mask = feat
        if self.fast_decode:
            sel = (guards_mat > 0) & first
            y_pred = [self.idx2label[int(p)] for p in preds[sel]]
        else:
            masks = [w.attention_mask for w in wins]
            y_pred = decode_windows(masks, preds.tolist(),
                                    guards_mat.tolist(), self.idx2label,
                                    skip_masked=self.family.pre_pad)
        y_pred = fix_system_labels(y_pred, self.system_labels)
        return fix_bio(y_pred)

    def _decode_turn(self, feat, preds: np.ndarray):
        tokens, offsets = feat[0], feat[1]
        y_pred = self._predict_bio(feat, preds)
        spans = tag2entity_turn(tokens, offsets, y_pred)
        return [(surf, normalize_surface(surf), s, e, t)
                for surf, s, e, t in spans]

    @staticmethod
    def _labels_table(rows: list[tuple], empties: list[tuple]) -> pa.Table:
        """emit="labels" output builder — explicit types so empty blocks
        never infer a `null` column (CLAUDE.md round-3 rule 3)."""
        all_rows = rows + [(cid, ti, [], []) for cid, ti in empties]
        return pa.table({
            "conv_id": pa.array([r[0] for r in all_rows], pa.string()),
            "turn_idx": pa.array([int(r[1]) for r in all_rows], pa.int64()),
            "tokens": pa.array([r[2] for r in all_rows],
                               pa.list_(pa.string())),
            "labels": pa.array([r[3] for r in all_rows],
                               pa.list_(pa.string())),
        }, schema=LABELS_SCHEMA)

    # -- batch entry -------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        o_conv, o_tidx, o_mid, o_surf, o_norm, o_s, o_e, o_type = ([] for _ in range(8))

        # phase 1: featurize every turn; collect windows for ONE stacked
        # model call (argmax is cheap either way; Viterbi's DP loop is
        # overhead-dominated per call, so batching is a ~5x win)
        feats = []
        failures: list[tuple] = []
        empties: list[tuple] = []
        for cid, ti, text in zip(conv, tidx, texts):
            try:
                feat = self._featurize_turn(text or "")
            except Exception as exc:
                # poison-row quarantine, reference skip semantics
                # (run_transformer_batch_prediction.py:70-72)
                failures.append((cid, ti, "featurize", repr(exc)))
                continue
            if feat is not None:
                feats.append((cid, ti, feat))
            elif self.emit == "labels":
                empties.append((cid, ti))
        if not feats:
            self._report_failures(failures)
            if self.emit == "labels":
                return self._labels_table([], empties)
            return MENTION_SCHEMA.empty_table()

        if self.model is not None:
            wins_all = [w for f in feats for w in f[2][2]]
            input_ids = np.asarray([w.input_ids for w in wins_all],
                                   dtype=np.int64)
            mask_mat = np.concatenate([f[2][6] for f in feats], axis=0)
            seg_mat = np.asarray([w.segment_ids for w in wins_all],
                                 dtype=np.int64)
            preds_all = self._forward_real(input_ids, mask_mat, seg_mat)
        else:
            targets = np.concatenate([f[2][5] for f in feats], axis=0)
            masks = (np.concatenate([f[2][6] for f in feats], axis=0)
                     if self.decode == "crf" else None)
            preds_all = self._forward(targets, masks)

        # phase 2: split predictions back per turn and decode
        if self.emit == "labels":
            rows = []
            pos = 0
            for cid, ti, feat in feats:
                n_wins = feat[3].shape[0]
                preds = preds_all[pos:pos + n_wins]
                pos += n_wins
                try:
                    y_pred = self._predict_bio(feat, preds)
                except Exception as exc:
                    failures.append((cid, ti, "decode", repr(exc)))
                    continue
                rows.append((cid, ti, list(feat[0]), y_pred))
            self._report_failures(failures)
            return self._labels_table(rows, empties)

        pos = 0
        for cid, ti, feat in feats:
            n_wins = feat[3].shape[0]
            preds = preds_all[pos:pos + n_wins]
            pos += n_wins
            try:
                spans = self._decode_turn(feat, preds)
            except Exception as exc:
                failures.append((cid, ti, "decode", repr(exc)))
                continue
            for mid, (surf, snorm, s, e, t) in enumerate(spans):
                o_conv.append(cid)
                o_tidx.append(ti)
                o_mid.append(mid)
                o_surf.append(surf)
                o_norm.append(snorm)
                o_s.append(s)
                o_e.append(e)
                o_type.append(t)
        self._report_failures(failures)
        return pa.table({
            "conv_id": pa.array(o_conv, pa.string()),
            "turn_idx": pa.array(o_tidx, pa.int32()),
            "ment_id": pa.array(o_mid, pa.int32()),
            "surface": pa.array(o_surf, pa.string()),
            "surface_norm": pa.array(o_norm, pa.string()),
            "start": pa.array(o_s, pa.int32()),
            "end": pa.array(o_e, pa.int32()),
            "type": pa.array(o_type, pa.string()),
        }, schema=MENTION_SCHEMA)
