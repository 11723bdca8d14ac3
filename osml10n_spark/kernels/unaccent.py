"""Accent stripping (libunac parity).

Reference: lua_unac/lua_unac.c:18-33 calls unac_string("UTF-8", ...),
which is decomposition-based: each character is replaced by its Unicode
canonical decomposition with combining marks dropped.  Notably this means
``ß`` is preserved (no decomposition) and ``ü`` → ``u`` (NOT ``ue``).

Unlike Python's blanket NFD+strip-Mn, libunac's table holds only the
UnicodeData.txt decompositions, so two classes of characters pass
through UNCHANGED:

- Hangul syllables (decomposition is algorithmic, not tabled);
- standalone combining marks that are not part of any decomposition
  (e.g. Myanmar ASAT/virama in ဘုရားကိုင်လမ်း — proven by the combined-name
  golden at runtests.lua:258-262, which only matches if unaccent leaves
  the marks in place).

We replicate that: per character, if it has a canonical decomposition,
replace it with the decomposition minus combining marks; otherwise keep
it verbatim.

Goldens: lua_osml10/tests/runtests.lua:102-104
  Besançon → Besancon, München → Munchen, Brüssel → Brussel.
"""
from __future__ import annotations

import unicodedata

__all__ = ["unaccent"]


def _is_hangul_syllable(c: str) -> bool:
    return 0xAC00 <= ord(c) <= 0xD7A3


def unaccent(text: str) -> str:
    """Strip accents/diacritics via canonical decomposition, dropping
    combining marks; Hangul syllables are preserved (libunac parity)."""
    if text is None:
        return None
    if text.isascii():          # fast path: nothing to decompose
        return text
    out = []
    for c in text:
        if _is_hangul_syllable(c):
            out.append(c)
            continue
        d = unicodedata.normalize("NFD", c)
        if d == c:
            out.append(c)          # no decomposition → verbatim (incl. bare marks)
        else:
            for dc in d:
                if not unicodedata.combining(dc):
                    out.append(dc)
    return "".join(out)
