"""Multimodal (image/audio) columns as opaque binary + typed metadata.

The engine treats media as ``payload: binary`` columns with sidecar
metadata (``media_type``, ``width/height`` or ``sample_rate`` …) and runs
decode / feature-extraction as actor-pool ``map_batches`` stages — the
same load-once-state pattern as the NER scorer (SURVEY.md §2.4 T2).

The actual codec libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the decode kernel is STUBBED: ``DecodeStub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic content-derived pseudo-decode (stable hash statistics).
Everything around the kernel — schema handling, Arrow binary plumbing,
batch sizing, actor signature, output layout — is real and tested, so a
real codec drops in by replacing one method.

Scale notes: binary payloads dominate block size; callers should pass a
small ``batch_size`` (e.g. 32-64 for images) so batch x concurrency fits
the worker heap, and keep ``DataContext.target_max_block_size`` at the
default 128 MiB so blocks with large payloads split early.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),     # "image" | "audio"
    ("payload", pa.binary()),
    ("meta_width", pa.int32()),      # image: pixels; audio: 0
    ("meta_height", pa.int32()),
    ("meta_sample_rate", pa.int32()),  # audio: Hz; image: 0
])

FEATURE_DIM = 32


def synth_media_table(docs: pa.Table) -> pa.Table:
    """Deterministic fake media rows derived from document text bytes —
    the test stand-in for a real binary-column Parquet source."""
    ids, types, payloads, ws, hs, srs = [], [], [], [], [], []
    for did, text in zip(docs.column("doc_id").to_pylist(),
                         docs.column("text").to_pylist()):
        b = (text or "").encode()
        ids.append(did)
        if did % 2 == 0:
            types.append("image")
            ws.append(64 + (did % 8) * 16)
            hs.append(64)
            srs.append(0)
        else:
            types.append("audio")
            ws.append(0)
            hs.append(0)
            srs.append(16000)
        payloads.append(b)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_width": pa.array(ws, pa.int32()),
        "meta_height": pa.array(hs, pa.int32()),
        "meta_sample_rate": pa.array(srs, pa.int32()),
    }, schema=MEDIA_SCHEMA)


class DecodeStub:
    """Actor-pool decode/feature stage.

    __init__ is the load-once slot (a real implementation loads PIL /
    torchaudio / an ONNX feature model here).  __call__ is per batch.

    With ``fake=True`` the decode is a deterministic pseudo-decode:
    a blake2b stream expanded from the payload, reshaped per media type.
    With ``fake=False`` it raises NotImplementedError — the clearly
    marked stub boundary for the missing codec libraries.
    """

    def __init__(self, fake: bool = True, feature_dim: int = FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim

    # -- the stubbed kernel ------------------------------------------------
    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media codecs (PIL/torchaudio) are not available in this "
                "environment; construct DecodeStub(fake=True) or drop in "
                "a real decoder here")
        # deterministic pseudo-decode: expand a content hash to a float
        # stream (stands in for pixel/sample values)
        h = hashlib.blake2b(payload or b"\x00", digest_size=32).digest()
        raw = np.frombuffer(
            (h * ((4 * self.feature_dim) // 32 + 1))[: 4 * self.feature_dim],
            dtype=np.uint32,
        )
        return (raw % 1000).astype(np.float32) / 1000.0

    # -- the real plumbing -------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.empty((batch.num_rows, self.feature_dim), dtype=np.float32)
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ok = []
        for i, (mid, mt, pl) in enumerate(zip(ids, types, payloads)):
            try:
                feats[i] = self._decode(pl, mt)
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats[i] = 0.0
                ok.append(False)  # poison-row quarantine, not fatal
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "feature": pa.array(
                [row.tolist() for row in feats], pa.list_(pa.float32())),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


def extract_media_features(
    media: rd.Dataset,
    *,
    batch_size: int = 64,
    concurrency: int = 4,
    fake: bool = True,
) -> rd.Dataset:
    """Binary payloads -> feature vectors via the decode actor pool.
    Small batches by design: payload bytes x batch x concurrency must fit
    the worker heap (see module docstring)."""
    return media.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
