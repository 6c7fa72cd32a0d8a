"""Multimodal (image/audio) columns as opaque binary + typed metadata.

The engine treats media as ``payload: binary`` columns with sidecar
metadata (``media_type``, ``width/height`` or ``sample_rate`` …) and runs
decode / feature-extraction as actor-pool ``map_batches`` stages — the
same load-once-state pattern as the NER scorer (SURVEY.md §2.4 T2).

The decode kernel is REAL for the container-decodable formats: WAV
(PCM), BMP (24-bit), PPM (P6) via the pure-Python codecs in
``functions/codecs.py`` — genuine bytes to genuine samples/pixels to
features, no external libraries.  Formats that require codec libraries
absent from this environment (JPEG/PNG/MP3/video) hit a clearly marked
``NotImplementedError`` boundary; corrupt payloads of a KNOWN format
are quarantined per row (``decode_ok=False``), not fatal — the
reference's skip-but-report semantics.

``fake=True`` selects the legacy deterministic pseudo-decode (content
hash expanded to a float stream), kept for synthetic pipelines that
need features for arbitrary bytes.

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

from clinicaltransformerner_ray.functions import codecs

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
    """Deterministic REAL media rows derived from document text — WAV
    sine mixes for odd doc_ids, BMP/PPM gradient images for even ones;
    every 25th row is a deliberately corrupt payload so decode_ok has
    both values in any realistic run."""
    ids, types, payloads, ws, hs, srs = [], [], [], [], [], []
    for did, text in zip(docs.column("doc_id").to_pylist(),
                         docs.column("text").to_pylist()):
        seed = int.from_bytes(
            hashlib.blake2b((text or "").encode(), digest_size=8).digest(),
            "little")
        ids.append(did)
        if did % 2 == 0:
            w = 32 + (did % 8) * 8
            h = 24
            types.append("image")
            ws.append(w)
            hs.append(h)
            srs.append(0)
            xx, yy = np.meshgrid(np.arange(w), np.arange(h))
            img = np.stack([
                (xx * (1 + seed % 7)) % 256,
                (yy * (1 + seed % 5)) % 256,
                (xx + yy + seed) % 256,
            ], axis=-1).astype(np.uint8)
            enc = codecs.encode_bmp if did % 4 == 0 else codecs.encode_ppm
            payloads.append(enc(img))
        else:
            sr = 8000
            types.append("audio")
            ws.append(0)
            hs.append(0)
            srs.append(sr)
            t = np.arange(sr // 4) / sr           # 250 ms
            f = 200 + (seed % 1000)
            wave_ = (0.6 * np.sin(2 * np.pi * f * t)
                     + 0.3 * np.sin(2 * np.pi * 2.1 * f * t))
            payloads.append(codecs.encode_wav(wave_, sr))
        if did % 25 == 7:
            # corrupt a known-format payload: right magic, torn header
            # (24 bytes keeps RIFF/BM/P6 sniffable but unparseable —
            # WAV bodies merely truncate without error, headers do not)
            payloads[-1] = payloads[-1][:24]
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_width": pa.array(ws, pa.int32()),
        "meta_height": pa.array(hs, pa.int32()),
        "meta_sample_rate": pa.array(srs, pa.int32()),
    }, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool decode/feature stage.

    __init__ is the load-once slot (a heavier implementation would load
    an ONNX feature model here).  __call__ is per batch.

    Real path (``fake=False``, the default): sniff the container (WAV /
    BMP / PPM), decode with `functions/codecs.py`, then extract a
    ``feature_dim`` vector — images: grayscale histogram (fraction of
    pixels per bin); audio: per-window RMS energy.  Unknown containers
    raise NotImplementedError (the codec-library boundary); corrupt
    payloads of a known container yield ``decode_ok=False``.
    """

    def __init__(self, fake: bool = False, feature_dim: int = FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim

    # -- kernels -----------------------------------------------------------
    def _fake_decode(self, payload: bytes) -> np.ndarray:
        """Deterministic pseudo-decode: expand a content hash to a float
        stream (stands in for pixel/sample values)."""
        h = hashlib.blake2b(payload or b"\x00", digest_size=32).digest()
        raw = np.frombuffer(
            (h * ((4 * self.feature_dim) // 32 + 1))[: 4 * self.feature_dim],
            dtype=np.uint32,
        )
        return (raw % 1000).astype(np.float32) / 1000.0

    def _image_features(self, img: np.ndarray) -> np.ndarray:
        gray = img.astype(np.float32).mean(axis=-1)
        hist, _ = np.histogram(gray, bins=self.feature_dim, range=(0, 256))
        return (hist / max(1, gray.size)).astype(np.float32)

    def _audio_features(self, samples: np.ndarray) -> np.ndarray:
        n = self.feature_dim
        L = len(samples)
        if L == 0:
            return np.zeros(n, dtype=np.float32)
        pad = (-L) % n
        x = np.pad(samples, (0, pad)).reshape(n, -1)
        return np.sqrt((x.astype(np.float64) ** 2).mean(axis=1)).astype(
            np.float32)

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.fake:
            return self._fake_decode(payload)
        kind = codecs.sniff(payload or b"")
        if kind == "wav":
            samples, _rate = codecs.decode_wav(payload)
            return self._audio_features(samples)
        if kind == "bmp":
            return self._image_features(codecs.decode_bmp(payload))
        if kind == "ppm":
            return self._image_features(codecs.decode_ppm(payload))
        raise NotImplementedError(
            "unrecognized media container (only WAV/BMP/PPM decode "
            "without codec libraries); drop a real decoder into "
            "MediaDecoder._decode or construct MediaDecoder(fake=True)")

    # -- the plumbing ------------------------------------------------------
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


class DecodeStub(MediaDecoder):
    """Stub-era name AND contract: defaults to the deterministic
    pseudo-decode (``fake=True``), so legacy callers feeding arbitrary
    bytes keep getting features instead of container sniffing.  Use
    :class:`MediaDecoder` for the real WAV/BMP/PPM codecs."""

    def __init__(self, fake: bool = True, feature_dim: int = FEATURE_DIM):
        super().__init__(fake=fake, feature_dim=feature_dim)


def extract_media_features(
    media: rd.Dataset,
    *,
    batch_size: int = 64,
    concurrency: int = 4,
    fake: bool = False,
) -> rd.Dataset:
    """Binary payloads -> feature vectors via the decode actor pool.
    Small batches by design: payload bytes x batch x concurrency must fit
    the worker heap (see module docstring)."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
