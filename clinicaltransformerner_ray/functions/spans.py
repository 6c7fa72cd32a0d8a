"""BIO label runs -> entity spans, and brat-style formatting helpers.

``tag2entity_turn`` reproduces the reference's stateful span-assembly scan
(M11, `src/common_utils/output_format_converter.py:156-191`): B starts a
span, I extends only if the type matches (else close+reopen), O closes;
surface text is the space-join of member tokens; start/end come from the
first/last member's char offsets.

``discontinuous_offsets`` is the newline-in-span repair (M12,
`output_format_converter.py:217-222`): if the raw text slice contains a
newline, the brat offset field becomes a discontinuous range and the
newline is replaced by a space in the surface.
"""

from __future__ import annotations


def tag2entity_turn(
    tokens: list[str],
    offsets: list[tuple[int, int]],
    labels: list[str],
) -> list[tuple[str, int, int, str]]:
    """Assemble (surface, start, end, type) spans from one sentence's BIO run.

    The scan is per-sentence with no cross-row state, so it vectorizes as a
    per-row map over nested token columns (SURVEY.md §2.3 M11).
    """
    entities: list[tuple[str, int, int, str]] = []
    term: list[str] = []
    start = end = -1
    sem: str | None = None
    prev = "O"
    for text, (w_s, w_e), tag in zip(tokens, offsets, labels):
        if tag == "O":
            if prev != "O":
                entities.append((" ".join(term), start, end, sem))
                term, start, end, sem = [], -1, -1, None
        else:
            boundary, ttype = tag.split("-", 1)
            if boundary == "B":
                if prev != "O":
                    entities.append((" ".join(term), start, end, sem))
                    term = []
                term.append(text)
                start, end, sem = w_s, w_e, ttype
            elif boundary == "I":
                if sem == ttype:
                    term.append(text)
                    end = w_e
                else:
                    if prev != "O":
                        entities.append((" ".join(term), start, end, sem))
                        term = []
                    term.append(text)
                    start, end, sem = w_s, w_e, ttype
            else:
                raise ValueError(f"BIO scheme supports B/I but got {tag}")
        prev = tag
    if term:
        entities.append((" ".join(term), start, end, sem))
    return entities


def spans_to_bio(n_tokens: int, spans: list[tuple[int, int, str]]) -> list[str]:
    """Inverse projection: word-index spans [s, e) -> a BIO label array
    (reference analog: `src/common_utils/output_format_converter.py:56-93`).
    Spans with s >= e are skipped, as in the reference."""
    labels = ["O"] * n_tokens
    for s, e, ttype in spans:
        if s >= e or s < 0 or e > n_tokens:
            continue
        labels[s] = f"B-{ttype}"
        for i in range(s + 1, e):
            labels[i] = f"I-{ttype}"
    return labels


def discontinuous_offsets(raw_text: str, offset_s: int, offset_e: int) -> tuple[str, str]:
    """M12 newline repair: returns (brat offset field, display text).
    Single newline handling matches `output_format_converter.py:217-222`
    (first newline splits the range; remaining newlines become spaces)."""
    if "\n" in raw_text:
        i = raw_text.index("\n")
        field = f"{offset_s} {offset_s + i};{offset_s + i + 1} {offset_e}"
        return field, raw_text.replace("\n", " ")
    return f"{offset_s} {offset_e}", raw_text
