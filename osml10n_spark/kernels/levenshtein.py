"""Byte-based Levenshtein distance (parity with get_country_name.lua:4-42).

The reference DP runs over *bytes* of the UTF-8 encoding
(string.len/str:byte), so multi-byte characters count per byte.  Spark's
built-in ``F.levenshtein`` is character-based; the engine uses this
kernel where byte parity matters (get_country_name dedup, threshold 1)
and documents the divergence for the SQL-expressible variants.
"""
from __future__ import annotations


def levenshtein_bytes(s1: str, s2: str) -> int:
    a = s1.encode("utf-8")
    b = s2.encode("utf-8")
    if not a:
        return len(b)
    if not b:
        return len(a)
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cost = 0 if ca == cb else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[-1]
