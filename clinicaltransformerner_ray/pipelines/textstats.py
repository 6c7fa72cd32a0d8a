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


def doc_stats(docs: rd.Dataset) -> rd.Dataset:
    """Per-document shape/quality columns.

    Output: (doc_id, n_tokens, n_uniq_tokens, stop_ratio, mean_tok_len,
    lang_pred) — `stop_ratio` is the stopword-hit fraction, `lang_pred`
    the n-gram-free language-ID heuristic ('en' iff any stopword hit)."""

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_tok, n_uniq, n_stop, tok_chars = [], [], [], []
        for t in texts:
            toks = (t or "").split(" ")
            n_tok.append(len(toks))
            n_uniq.append(len(set(toks)))
            n_stop.append(sum(1 for w in toks if w in STOPWORDS))
            tok_chars.append(sum(len(w) for w in toks))
        n_tok = np.asarray(n_tok, dtype=np.int64)
        n_stop = np.asarray(n_stop, dtype=np.int64)
        tok_chars = np.asarray(tok_chars, dtype=np.int64)
        denom = np.maximum(n_tok, 1)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
            "stop_ratio": pa.array(n_stop / denom, pa.float64()),
            "mean_tok_len": pa.array(tok_chars / denom, pa.float64()),
            "lang_pred": pa.array(
                ["en" if s > 0 else "unk" for s in n_stop], pa.string()),
        })

    return docs.map_batches(stats, batch_format="pyarrow")


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
