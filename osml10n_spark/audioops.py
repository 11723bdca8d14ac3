"""Pure-numpy audio codec + fingerprint for the audio payload columns —
the audio leg of the image/audio/video multimodal triangle.

Format: ``wav`` — standard RIFF/WAVE PCM16 (the one real-world audio
container that needs no library: plain struct parsing), mono or
interleaved stereo.  Compressed formats (mp3/ogg/flac/aac) stay
declared stubs in operators.multimodal, same policy as jpeg/png for
images: the Arrow plumbing is the tested surface, the decoder swap is
one function.

fingerprint64: energy-delta sign hash — split the (mono-mixed) signal
into 65 equal windows, bit b = 1 iff energy(window b+1) > energy(window
b), plus a leading overall-loudness bit.  Robust to small additive
noise and re-encoding (energy ordering of adjacent windows rarely
flips), discriminative across clips (window energies follow the clip's
amplitude envelope) — the audio analogue of the image phash, feeding
the same banded-Hamming dedup join (operators.dedup.hash_dup_pairs).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "fingerprint64"]


def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """(n,) or (n, ch) int16 → RIFF/WAVE PCM16 bytes."""
    pcm = np.asarray(samples, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = np.ascontiguousarray(pcm).tobytes()
    byte_rate = sr * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sr, byte_rate,
                      ch * 2, 16)
    head = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data),
                       b"WAVE")
    return head + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → ((n, ch) int16 samples, sample_rate).
    Walks the chunk list (so extra chunks like LIST/INFO are skipped),
    accepts only format tag 1 (PCM) at 16 bits."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, ch, pcm = 12, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding tag={tag} "
                                 f"bits={bits}")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    if sr is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(pcm, dtype="<i2")
    return arr.reshape(-1, ch), int(sr)


def fingerprint64(samples: np.ndarray) -> int:
    """64-bit energy-delta fingerprint (signed int64 for parquet
    storage).  Bit 63 = overall loudness above int16 1% full scale;
    bits 62..0 = sign of the energy delta between windows b+1 and b of
    a 64-window split of the mono mix."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = mono.shape[0]
    if n < 64:
        mono = np.pad(mono, (0, 64 - n))
        n = 64
    edges = np.linspace(0, n, 65).astype(int)
    energy = np.add.reduceat(mono * mono, edges[:-1]) / np.maximum(
        np.diff(edges), 1)
    v = np.uint64(1 if np.sqrt(energy.mean()) > 327.68 else 0)
    for b in range(63):
        v = (v << np.uint64(1)) | np.uint64(bool(energy[b + 1] > energy[b]))
    return int(v.astype(np.int64))
