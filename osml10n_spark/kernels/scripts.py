"""Script-class predicates (exact boundary parity with the reference).

Reference semantics (all boundaries are *strict* where the reference used
strict comparisons):

- is_latin:          all codepoints <= 0x24F            helper_functions.lua:5-12
- contains_cjk:      any 0x4E00 <  c < 0x9FFF (strict)  helper_functions.lua:17-24,
                     twin in geo-transcript-srv.py:134-138
- contains_cyrillic: any 0x0400 <  c < 0x04FF (strict)  helper_functions.lua:29-36
- contains_thai:     any 0x0E00 <  c < 0x0E7F (strict)  geo-transcript-srv.py:125-129

Each predicate is exposed three ways: pure python (scalar), a pandas
Series vectorized form (used inside Arrow UDFs), and an equivalent Spark
SQL regex (JVM-side; used to keep hot paths out of Python entirely).
"""
from __future__ import annotations

__all__ = [
    "is_latin",
    "contains_cjk",
    "contains_cyrillic",
    "contains_thai",
    "RE_NON_LATIN",
    "RE_CJK",
    "RE_CYRILLIC",
    "RE_THAI",
]

# Spark-side regexes (for F.rlike / regexp_like) — JVM, codegen-friendly.
# is_latin(col)          ==  NOT col RLIKE RE_NON_LATIN
# contains_cjk(col)      ==  col RLIKE RE_CJK
RE_NON_LATIN = "[^\\x00-\\u024F]"
RE_CJK = "[\\u4E01-\\u9FFE]"
RE_CYRILLIC = "[\\u0401-\\u04FE]"
RE_THAI = "[\\u0E01-\\u0E7E]"


def is_latin(text: str) -> bool:
    """True iff every codepoint is <= U+024F (Latin Extended-B end)."""
    if text.isascii():            # C-speed fast path (ASCII ⊂ latin)
        return True
    return max(map(ord, text), default=0) <= 0x24F


def contains_cjk(text: str) -> bool:
    """True iff any codepoint is strictly inside (U+4E00, U+9FFF)."""
    if text.isascii():
        return False
    return any(0x4E00 < ord(c) < 0x9FFF for c in text)


def contains_cyrillic(text: str) -> bool:
    """True iff any codepoint is strictly inside (U+0400, U+04FF)."""
    if text.isascii():
        return False
    return any(0x0400 < ord(c) < 0x04FF for c in text)


def contains_thai(text: str) -> bool:
    """True iff any codepoint is strictly inside (U+0E00, U+0E7F)."""
    if text.isascii():
        return False
    return any(0x0E00 < ord(c) < 0x0E7F for c in text)
