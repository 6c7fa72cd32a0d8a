"""Word-level tokenization with character offsets, and surface normalization.

The reference consumes pre-tokenized BIO files whose token rows carry two
char-offset pairs into the source text (`src/transformer_ner/data_utils.py:149-163`,
format documented at `/root/reference/README.md:117-139`).  Our engine starts
from raw turn text, so this module produces the same (token, start, end)
triples the reference expects as its input contract; we set the
"preprocessed" offset pair equal to the original one (the documented
no-preprocessing convention, data_utils.py:154-155).
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"\S+")
_WS_RE = re.compile(r"\s+")


def tokenize_with_offsets(text: str) -> tuple[list[str], list[tuple[int, int]]]:
    """Whitespace tokenization; offsets are [start, end) char spans into
    ``text``. Deterministic, no normalization."""
    tokens: list[str] = []
    offsets: list[tuple[int, int]] = []
    for m in _WORD_RE.finditer(text):
        tokens.append(m.group(0))
        offsets.append((m.start(), m.end()))
    return tokens, offsets


def normalize_surface(surface: str) -> str:
    """Canonicalization key: lowercase + collapse internal whitespace.
    Used for alias lookup and the canonicalization groupby."""
    return _WS_RE.sub(" ", surface.strip().lower())
