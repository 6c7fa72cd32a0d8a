"""Text-analysis operators over the `documents` table.

  doc_stats        per-doc token counts, uniques, stopword ratio,
                   mean token length, language-ID heuristic
  doc_fingerprint  per-doc winnowing-style fingerprint: min md5 over
                   word 5-gram shingles (content-derived, stable)
  token_vocab      corpus-level token frequency table via a BPE-ish
                   regex tokenizer — batch-local partial counts then
                   one grouped sum (the combiner keeps the all-to-all
                   proportional to vocabulary, not corpus, size)

All per-doc work is a pure projection (map_batches, no shuffle).  The
only wide operation is token_vocab's final groupby.  Ratios divide
int64 counts in float64 so DuckDB and numpy produce bit-identical
doubles.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray.data as rd

#: tiny function-word lexicon for the language-ID heuristic
STOPWORDS = ("a", "the")

#: BPE-ish pre-tokenizer: letter runs | digit runs | single punct.
#: The punct class excludes exactly space/tab/newline — NOT \s — so the
#: Python and SQL tokenizers agree byte-for-byte on \r, \f, \v and
#: unicode spaces (those count as punct tokens on both sides).
TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]")

#: SQL twin of TOKEN_RE (identical character classes)
TOKEN_RE_SQL = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def stats_columns(batch: pa.Table) -> pa.Table:
    """Vectorized per-doc shape/quality kernel shared by
    :func:`doc_stats` and :func:`curate_corpus`."""
    import pyarrow.compute as pc

    text = pc.fill_null(batch.column("text"), "")
    # `"".split(" ") == [""]` -> every doc has spaces+1 tokens, and
    # token chars = chars - spaces; both are single Arrow kernels.
    n_spaces = pc.cast(pc.count_substring(text, " "), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tok = pc.add(n_spaces, 1)
    tok_chars = pc.subtract(n_chars, n_spaces)
    # uniques + stopword hits need per-token identity: one explode,
    # then C++ grouped aggregation (every row has >= 1 token, so the
    # group keys cover 0..n-1; sort restores positional alignment).
    toks = pc.split_pattern(text, " ")
    flat = pa.table({
        "i": pc.list_parent_indices(toks),
        "tok": pc.list_flatten(toks),
    })
    flat = flat.append_column(
        "is_stop", pc.cast(pc.is_in(flat.column("tok"),
                                    value_set=pa.array(STOPWORDS)),
                           pa.int64()))
    agg = (flat.group_by("i")
           .aggregate([("tok", "count_distinct"), ("is_stop", "sum")])
           .sort_by("i"))
    n_uniq = agg.column("tok_count_distinct")
    n_stop = agg.column("is_stop_sum")
    denom = np.maximum(n_tok.to_numpy(), 1)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": n_tok,
        "n_uniq_tokens": pc.cast(n_uniq, pa.int64()),
        "stop_ratio": pa.array(n_stop.to_numpy() / denom, pa.float64()),
        "mean_tok_len": pa.array(tok_chars.to_numpy() / denom,
                                 pa.float64()),
        "lang_pred": pc.if_else(pc.greater(n_stop, 0), "en", "unk"),
    })


def doc_stats(docs: rd.Dataset) -> rd.Dataset:
    """Per-document shape/quality columns.

    Output: (doc_id, n_tokens, n_uniq_tokens, stop_ratio, mean_tok_len,
    lang_pred) — `stop_ratio` is the stopword-hit fraction, `lang_pred`
    the n-gram-free language-ID heuristic ('en' iff any stopword hit)."""
    return docs.map_batches(stats_columns, batch_format="pyarrow")


def curate_corpus(
    docs: rd.Dataset,
    *,
    min_tokens: int = 15,
    require_lang: str | None = "en",
) -> rd.Dataset:
    """The canonical training-data cleanup pass — quality gate +
    keep-one exact dedup + shape columns — in ONE shuffle.

    Semantics: a document survives iff it passes the quality gate
    (`lang_pred == require_lang` and `n_tokens >= min_tokens`) AND it is
    the minimum ``doc_id`` of its identical-text group among survivors.
    Identical text implies identical stats, so gating before the dedup
    is exact (a whole duplicate group passes or fails together).

    Output: (doc_id, n_tokens, n_uniq_tokens, stop_ratio, mean_tok_len,
    n_copies) for each retained document.

    Scale shape: the gate + batch-local combine runs before the shuffle,
    so the sort moves one row of (sha1, stats) per distinct surviving
    text per batch — never the text bytes.  Same combine/sort/combine
    pattern as `dedup.exact_dedup`."""

    stat_cols = ["n_tokens", "n_uniq_tokens", "stop_ratio", "mean_tok_len"]

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if "h" not in df.columns:
            stats = stats_columns(batch).to_pandas()
            keep = stats["n_tokens"] >= min_tokens
            if require_lang is not None:
                keep &= stats["lang_pred"] == require_lang
            stats = stats[keep.to_numpy()]
            df = df[keep.to_numpy()]
            stats["h"] = [hashlib.sha1((t or "").encode()).hexdigest()
                          for t in df["text"]]
            stats["n_copies"] = 1
            df = stats
        g = df.groupby("h", sort=False).agg(
            doc_id=("doc_id", "min"),
            n_copies=("n_copies", "sum"),
            **{c: (c, "first") for c in stat_cols},
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        docs.map_batches(combine, batch_format="pyarrow",
                         batch_size=1 << 17)
        .sort("h")
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
    )
    return agg.select_columns(["doc_id", *stat_cols, "n_copies"])


def doc_fingerprints(docs: rd.Dataset, *, n: int = 5) -> rd.Dataset:
    """Rolling-hash document fingerprint: the minimum md5 hex digest
    over word ``n``-gram shingles (winnowing with window = whole doc).
    Identical near-copy prefixes collide; stable across processes.

    Output: (doc_id, fingerprint)."""

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            toks = (t or "").split(" ")
            if len(toks) < n:
                grams = [" ".join(toks)]
            else:
                grams = [" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)]
            out.append(min(hashlib.md5(g.encode()).hexdigest()
                           for g in grams))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "fingerprint": pa.array(out, pa.string()),
        })

    return docs.map_batches(fp, batch_format="pyarrow")


def token_vocab(docs: rd.Dataset) -> rd.Dataset:
    """Corpus token-frequency table under the BPE-ish regex tokenizer.

    Output: (token, n).  The classic combiner-before-shuffle wordcount
    in the engine's combine/sort/combine shape — the shuffle moves one
    row per distinct token per batch, and a million-token vocabulary
    never hits per-key Aggregate machinery."""

    def combine(batch: pa.Table) -> pa.Table:
        if "n" in batch.column_names:
            df = batch.to_pandas()
            g = df.groupby("token", sort=False)["n"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for tok in TOKEN_RE.findall(t or ""):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({
            "token": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        })

    return (
        docs.map_batches(combine, batch_format="pyarrow",
                         batch_size=1 << 17)
        .sort("token")
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
    )
