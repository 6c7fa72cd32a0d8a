"""BIO label vocabulary.

Reproduces the reference's label-vocab discipline
(`src/transformer_ner/data_utils.py:74-107`): control labels
PAD/CLS/X get ids strictly below id('O') (`:86`), dataset labels are
appended sorted by their type suffix (`:103`).  The control-id<O
invariant is what makes the system-label fix (M8,
`src/transformer_ner/task.py:497-501`) expressible as ``id < id('O')``.
"""

from __future__ import annotations

PAD = "PAD"
CLS = "CLS"
X = "X"
O = "O"

NEXT_TOKEN = "[next]"  # continuation control token (data_utils.py:16)
NEXT_GUARD = -2        # guard value marking [next]   (data_utils.py:17)


def build_label_vocab(entity_types: list[str]) -> dict[str, int]:
    """label2idx with {'O': 3, 'X': 2, 'PAD': 0, 'CLS': 1} seed and
    B-/I- tags appended sorted by type suffix (data_utils.py:86,103)."""
    label2idx = {PAD: 0, CLS: 1, X: 2, O: 3}
    tags = [f"{b}-{t}" for t in entity_types for b in ("B", "I")]
    for lb in sorted(tags, key=lambda s: s.split("-")[-1]):
        if lb not in label2idx:
            label2idx[lb] = len(label2idx)
    return label2idx


def invert(label2idx: dict[str, int]) -> dict[int, str]:
    return {v: k for k, v in label2idx.items()}


def dev_label_gap(train_labels: set[str], dev_labels: set[str]) -> set[str]:
    """D2: labels in the dev set that never appear in train — warned,
    not fatal (`src/transformer_ner/data_utils.py:99-101`)."""
    import logging

    missing = set(dev_labels) - set(train_labels)
    if missing:
        logging.getLogger(__name__).warning(
            "dev set has label (%s) not appeared in train set.", missing)
    return missing


def system_labels(label2idx: dict[str, int]) -> set[str]:
    """Labels whose id is below id('O') — the set the prediction fix maps
    to 'O' (src/transformer_ner/task.py:497-498)."""
    o_id = label2idx[O]
    return {lb for lb, i in label2idx.items() if i < o_id}
