"""Multimodal column operators: decode / feature-extract over opaque
binary payload columns with typed metadata.

The Spark-side plumbing (schema, Arrow batch shape, partitioning) is
real and tested against the engine's own pure-numpy codecs (bmp / raw /
jpegq).  Real-world codecs (jpeg/png/webp, audio, video) are STUBBED —
the sandbox has no PIL/ffmpeg — behind ``NotImplementedError`` with the
exact same UDF signature, so swapping a real decoder in changes one
function, not the plan.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..imaging import decode_image, phash64, psnr

__all__ = ["image_features", "verify_payload", "FEATURES_DDL"]

FEATURES_DDL = ("image_id string, fmt string, mean_r double, mean_g double, "
                "mean_b double, brightness double, phash_check long, "
                "decoded boolean")

_REAL_WORLD_FMTS = {"jpeg", "jpg", "png", "webp", "gif", "mp3", "wav", "mp4"}


def _decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt in _REAL_WORLD_FMTS:
        # STUB: sandbox has no image/audio libraries; the Arrow plumbing
        # around this call is the tested surface.
        raise NotImplementedError(f"no decoder for '{fmt}' in this sandbox")
    return decode_image(data, fmt)


def image_features(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Decode + per-channel stats + phash recomputation via mapInPandas
    (Arrow batches; one decode per row, vectorized stats)."""
    cols = [id_col, "bytes", "fmt"]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, data, fmt in zip(pdf[id_col], pdf["bytes"], pdf["fmt"]):
                try:
                    pix = _decode(bytes(data), fmt)
                    means = pix.reshape(-1, 3).mean(axis=0)
                    out.append((rid, fmt, float(means[0]), float(means[1]),
                                float(means[2]), float(means.mean()),
                                phash64(pix), True))
                except NotImplementedError:
                    out.append((rid, fmt, None, None, None, None, None, False))
            yield pd.DataFrame(out, columns=["image_id", "fmt", "mean_r",
                                             "mean_g", "mean_b", "brightness",
                                             "phash_check", "decoded"])

    return df.select(*cols).mapInPandas(extract, schema=FEATURES_DDL)


def verify_payload(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Integrity audit: decoded phash must equal the stored phash for
    lossless formats; jpegq rows must decode with PSNR-compatible shape.
    Returns (image_id, fmt, ok)."""
    feats = image_features(df, id_col)
    src = df.select(F.col(id_col), F.col("phash"), F.col("w"), F.col("h"),
                    F.col("fmt").alias("src_fmt"))
    joined = feats.join(src, id_col)
    ok = (F.col("decoded") & ((F.col("fmt") == "jpegq")
                              | (F.col("phash_check") == F.col("phash"))))
    return joined.select(id_col, "fmt", ok.alias("ok"))
