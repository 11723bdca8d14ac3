"""Pure-numpy image codecs + integrity metrics for the image payload
columns (BASELINE.json input_hint: bytes/w/h/fmt + PSNR≥40dB invariant).

Formats (all self-contained, no PIL in the sandbox):
- ``bmp``   : standard 24-bit bottom-up BGR BMP (lossless, byte-exact)
- ``raw``   : trivial header + RGB888 (lossless)
- ``jpegq`` : synthetic lossy format — per-channel uniform quantization
  to 6 bits (deterministic); decode dequantizes to mid-bin. Max error
  per sample is 2 (of 255) → PSNR ≈ 20*log10(255/~1.1) ≫ 40 dB, so the
  pipeline invariant is measurable and non-trivial.

phash: 64-bit perceptual hash (8×8 mean-threshold of the grayscale
image, row-major bits) — deterministic, numpy-only.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_image", "decode_image", "psnr", "phash64"]

_RAW_MAGIC = b"OSRW"
_JQ_MAGIC = b"OSJQ"
_JQ_BITS = 6


def _encode_bmp(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    bgr = pix[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        rows.append(bgr[y].tobytes() + pad)
    return header + info + b"".join(rows)


def _decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack("<I", data[10:14])[0]
    w, h = struct.unpack("<ii", data[18:26])[0:2]
    bpp = struct.unpack("<H", data[28:30])[0]
    if bpp != 24:
        raise ValueError("only 24-bit BMP supported")
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    arr = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    return arr[::-1, :, ::-1].copy()          # bottom-up BGR → top-down RGB


def _encode_raw(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    return _RAW_MAGIC + struct.pack("<II", w, h) + pix.tobytes()


def _decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != _RAW_MAGIC:
        raise ValueError("not OSRW raw")
    w, h = struct.unpack("<II", data[4:12])
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=12) \
        .reshape(h, w, 3).copy()


def _encode_jpegq(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    q = (pix.astype(np.uint16) >> (8 - _JQ_BITS)).astype(np.uint8)
    return _JQ_MAGIC + struct.pack("<II", w, h) + q.tobytes()


def _decode_jpegq(data: bytes) -> np.ndarray:
    if data[:4] != _JQ_MAGIC:
        raise ValueError("not OSJQ")
    w, h = struct.unpack("<II", data[4:12])
    q = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=12) \
        .reshape(h, w, 3).astype(np.uint16)
    # dequantize to bin midpoint
    deq = (q << (8 - _JQ_BITS)) | (1 << (8 - _JQ_BITS - 1))
    return np.clip(deq, 0, 255).astype(np.uint8)


_ENCODERS = {"bmp": _encode_bmp, "raw": _encode_raw, "jpegq": _encode_jpegq}
_DECODERS = {"bmp": _decode_bmp, "raw": _decode_raw, "jpegq": _decode_jpegq}


def encode_image(pix: np.ndarray, fmt: str) -> bytes:
    """pix: uint8 array (h, w, 3) RGB."""
    return _ENCODERS[fmt](np.ascontiguousarray(pix, dtype=np.uint8))


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def phash64(pix: np.ndarray) -> int:
    """64-bit mean-threshold hash on an 8×8 downsample of the grayscale
    image (deterministic, signed int64 for parquet storage)."""
    gray = pix.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            ylo, yhi = ys[i], max(ys[i + 1], ys[i] + 1)
            xlo, xhi = xs[j], max(xs[j + 1], xs[j] + 1)
            blocks[i, j] = gray[ylo:yhi, xlo:xhi].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = np.uint64(0)
    for bit in bits:
        v = (v << np.uint64(1)) | np.uint64(bool(bit))
    return int(v.astype(np.int64))
