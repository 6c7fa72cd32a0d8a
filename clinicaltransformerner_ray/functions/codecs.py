"""Pure-Python media codecs — WAV (PCM), BMP (24-bit BI_RGB), PPM (P6).

No external codec libraries exist in this environment, but these three
formats are fully decodable with stdlib + numpy, which turns the
multimodal stage from scaffolding into a real capability: genuine bytes
in, genuine samples/pixels out.  Formats that genuinely need a codec
library (JPEG/PNG/MP3/video) remain behind the stage's documented
NotImplementedError boundary (`stages/multimodal.py`).

Encoders exist so synthesis and tests can produce real payloads
deterministically; they are byte-for-byte round-trip-tested against the
decoders.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF PCM) via the stdlib wave module

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (mono) -> 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono samples in [-1, 1], sample_rate).
    Handles 8/16/32-bit PCM; multi-channel is averaged to mono."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit BI_RGB, the universally parseable subset

def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "RGB only"
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):          # bottom-up row order
        bgr = img[r, :, ::-1]               # BGR on disk
        body += bgr.tobytes() + b"\x00" * pad
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB (handles bottom-up
    and top-down row order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _fsz, _r1, _r2, offset) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    img = rows[:, :, ::-1]                   # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# PPM (P6 binary)

def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 binary PPM -> (H, W, 3) uint8 RGB.  Handles comments and
    arbitrary whitespace in the header per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":     # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(payload[start:pos]))
    pos += 1                                  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported (got {maxval})")
    need = w * h * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(payload, dtype=np.uint8, count=need,
                         offset=pos).reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------

def sniff(payload: bytes) -> str:
    """Best-effort container sniff: 'wav' | 'bmp' | 'ppm' | 'unknown'."""
    if not payload:
        return "unknown"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    return "unknown"
