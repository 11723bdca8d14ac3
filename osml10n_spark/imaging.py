"""Pure-numpy image codecs + integrity metrics for the image payload
columns (BASELINE.json input_hint: bytes/w/h/fmt + PSNR≥40dB invariant).

Formats (all self-contained, no PIL in the sandbox):
- ``bmp``   : standard 24-bit bottom-up BGR BMP (lossless, byte-exact)
- ``raw``   : trivial header + RGB888 (lossless)
- ``jpegq`` : synthetic lossy format — per-channel uniform quantization
  to 6 bits (deterministic); decode dequantizes to mid-bin. Max error
  per sample is 2 (of 255) → PSNR ≈ 20*log10(255/~1.1) ≫ 40 dB, so the
  pipeline invariant is measurable and non-trivial.
- ``png``   : REAL spec-conformant PNG, 8-bit truecolor (color type
  2): signature + CRC-checked chunk walk, zlib IDAT, and full
  scanline unfiltering (all five filter types 0–4 incl. Paeth — the
  encoder emits filter 0, the decoder inverts any conformant stream).
  Pure stdlib zlib + numpy, lossless.
- ``jpeg``/``jpg`` : REAL baseline sequential JFIF (jpegcodec.py):
  Annex-K-quantized 8×8 DCT + canonical Huffman entropy coding, full
  marker stream, restart-interval support.  Lossy — default quality
  keeps round-trip PSNR ≥ 40dB even on uniform noise.

phash: 64-bit perceptual hash (8×8 mean-threshold of the grayscale
image, row-major bits) — deterministic, numpy-only.
"""
from __future__ import annotations

import struct
import zlib

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def _encode_png(pix: np.ndarray) -> bytes:
    """8-bit truecolor PNG (color type 2), filter 0 on every scanline."""
    h, w, _ = pix.shape
    raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(data: bytes) -> np.ndarray:
    """Chunk-walking PNG decoder for 8-bit truecolor, no interlace:
    CRC-verified chunks, concatenated IDAT inflate, and the full filter
    inverse (None/Sub/Up/Average/Paeth) per scanline."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(data):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        typ = data[pos + 4:pos + 8]
        # bounds-check BEFORE slicing: a truncated chunk would give a
        # <4-byte CRC slice and struct.unpack would raise struct.error,
        # escaping callers that treat ValueError as "corrupt payload"
        if pos + 12 + ln > len(data):
            raise ValueError("truncated PNG chunk")
        payload = data[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])[0]
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = \
                struct.unpack(">IIBBBBB", payload)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit truecolor non-interlaced "
                                 "PNG supported")
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            seen_iend = True
            break
        pos += 12 + ln
    else:
        seen_iend = False
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if not seen_iend:
        raise ValueError("truncated PNG: no IEND chunk")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=y * (stride + 1) + 1)
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:                       # Up — vectorized
            out[y] = line + prev
        elif f == 1:                       # Sub — sequential in x
            cur = out[y]
            cur[:bpp] = line[:bpp]
            for x in range(bpp, stride):
                cur[x] = (int(line[x]) + int(cur[x - bpp])) & 0xFF
        elif f == 3:                       # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:                       # Paeth
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) \
                    & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.reshape(h, w, 3).copy()


def _encode_jpeg(pix: np.ndarray) -> bytes:
    from .jpegcodec import encode_jpeg
    return encode_jpeg(pix)


def _decode_jpeg(data: bytes) -> np.ndarray:
    from .jpegcodec import decode_jpeg
    return decode_jpeg(data)


_ENCODERS = {"bmp": _encode_bmp, "raw": _encode_raw, "jpegq": _encode_jpegq,
             "png": _encode_png, "jpeg": _encode_jpeg, "jpg": _encode_jpeg}
_DECODERS = {"bmp": _decode_bmp, "raw": _decode_raw, "jpegq": _decode_jpegq,
             "png": _decode_png, "jpeg": _decode_jpeg, "jpg": _decode_jpeg}


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
