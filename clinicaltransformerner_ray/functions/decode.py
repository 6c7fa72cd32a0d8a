"""Decode: logits -> per-word BIO labels (M6-M9).

  - ``argmax_decode`` — argmax over log_softmax (M7,
    `src/transformer_ner/task.py:391-393`),
  - ``decode_windows`` — guard-walk realignment merging the continuation
    windows of one sentence (M6, `src/transformer_ner/task.py:406-429`):
    stop at first mask==0, skip guard 0 and repeated guards (continuation
    subtokens), a NEXT_GUARD chains the next window onto the same sentence,
  - ``fix_system_labels`` — predictions in {X, PAD, CLS} (ids below 'O')
    map to 'O' (M8, `src/transformer_ner/task.py:497-501`),
  - ``fix_bio`` — BIO repair of illegal transitions (M9,
    `src/transformer_ner/task.py:467-491`).
"""

from __future__ import annotations

import numpy as np

from clinicaltransformerner_ray.labels import NEXT_GUARD, O


def argmax_decode(logits: np.ndarray) -> np.ndarray:
    """argmax(log_softmax(logits)) over the last axis (task.py:391-393).
    log_softmax is order-preserving; computed anyway for parity with the
    reference's non-CRF decode path."""
    shifted = logits - logits.max(axis=-1, keepdims=True)
    logsumexp = np.log(np.exp(shifted).sum(axis=-1, keepdims=True))
    return np.argmax(shifted - logsumexp, axis=-1)


def decode_windows(
    masks: list[list[int]] | np.ndarray,
    pred_ids: list[list[int]] | np.ndarray,
    guards: list[list[int]] | np.ndarray,
    idx2label: dict[int, str],
    *,
    skip_masked: bool = False,
) -> list[str]:
    """M6 guard-walk over the windows of ONE sentence (task.py:406-429).

    The reference carries ``prev_gd`` and a ``connect_sent_flag`` across
    dataloader rows; because our windows are nested per sentence row, the
    carried state here is a plain local variable.  ``skip_masked``
    selects the XLNet behavior at mask==0 (continue past pre-padding,
    task.py:411-414) instead of the post-pad early break.
    """
    y_pred: list[str] = []
    prev_gd = 0
    for mks, lgt, gds in zip(masks, pred_ids, guards):
        for mk, p, gd in zip(mks, lgt, gds):
            if mk == 0:
                if skip_masked:
                    continue  # xlnet pre-padding precedes real tokens
                break  # all further positions are pad (post-pad families)
            if gd == 0 or prev_gd == gd:
                continue
            if gd == NEXT_GUARD:
                break  # continuation: next window extends this sentence
            y_pred.append(idx2label[int(p)])
            prev_gd = gd
    return y_pred


def fix_system_labels(labels: list[str], system: set[str]) -> list[str]:
    """M8: control-label predictions become 'O' (task.py:497-501)."""
    return [O if lb in system else lb for lb in labels]


def fix_bio(bios: list[str]) -> list[str]:
    """M9: repair illegal BIO transitions (task.py:467-491).

    leading I-x -> B-x;  O,I-x -> O,B-x;  I-y after x!=y -> B-y.
    Comparisons use the *repaired* previous label, as in the reference.
    """
    fixed: list[str] = []
    prev: str | None = None
    for i, bio in enumerate(bios):
        if i == 0:
            prev = "B-" + bio.split("-")[-1] if bio.startswith("I-") else bio
        else:
            if bio.startswith("I-"):
                s = bio.split("-", 1)[1]
                if prev == O:
                    prev = "B-" + s
                else:
                    ps = prev.split("-", 1)[1] if "-" in prev else prev
                    prev = "B-" + s if ps != s else bio
            else:
                prev = bio
        fixed.append(prev)
    return fixed
