"""Readers for the driver-provided testdata tables (documents,
embeddings) with column pruning at the read — only the columns a
pipeline needs leave storage."""

from __future__ import annotations

import os

import ray.data as rd


def read_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=columns or ["doc_id", "text"],
    )


def read_embeddings(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=columns or ["vec_id", "embedding"],
    )
