"""Transliteration kernels — the engine's replacement for the reference
transcription daemon (transcription-daemon/geo-transcript-srv.py).

The daemon's per-record TCP round trip is eliminated: these are pure
functions invoked inside Arrow-batched pandas UDFs; the country routing
(`transcript`, mirroring geo-transcript-srv.py:160-179) and the
CJK/Thai gate (:268-275) are replicated exactly.

Library replacements (pykakasi/tltk/pinyin_jyutping_sentence/PyICU are
not available): deterministic table-driven kernels in translit_data.py,
golden-checked against lua_osml10/tests/runtests.lua:146-173,230-250.
"""
from __future__ import annotations

import unicodedata

from .scripts import contains_cjk, contains_thai
from .translit_data import (
    CYRILLIC,
    GEORGIAN,
    GREEK,
    HAN_PINYIN,
    JP_WORDS,
    JYUTPING,
    KANA,
    THAI_WORDS,
    _JP_MAX_WORD,
    _THAI_MAX_WORD,
    hangul_to_latin,
    kana_to_romaji,
)

__all__ = [
    "split_by_alphabet",
    "generic_transliterate",
    "kanji_transcript",
    "thai_transcript",
    "cantonese_transcript",
    "transcript",
    "BOUNDARY_CCS",
]

# Countries with special transliterators (= the reference boundary set;
# tw is in the set but routes to the generic path, geo-transcript-srv.py:174).
BOUNDARY_CCS = frozenset({"hk", "jp", "mo", "th", "tw"})


def _alphabet(c: str) -> str:
    """First word of the Unicode character name (geo-transcript-srv.py:75)."""
    return unicodedata.name(c).split(" ")[0]


def split_by_alphabet(s: str) -> list[str]:
    """Split into runs of same leading-unicodedata-name word.

    Parity with geo-transcript-srv.py:72-86 — raises ValueError for
    unnamed characters exactly like ``unicodedata.name`` does there
    (the daemon's per-request handler turns that into an '' reply).
    """
    runs: list[str] = []
    target = s[0]
    old = _alphabet(s[0])
    for c in s[1:]:
        a = _alphabet(c)
        if a == old:
            target += c
        else:
            runs.append(target)
            target = c
        old = a
    runs.append(target)
    return runs


def _is_kana(c: str) -> bool:
    return 0x3040 <= ord(c) <= 0x30FF


def _is_han(c: str) -> bool:
    cp = ord(c)
    return 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF


def generic_transliterate(s: str) -> str:
    """ICU `Any-Latin` + NFC replacement (geo-transcript-srv.py:144,174-176).

    Per-character table mapping: Cyrillic/Greek via lookup, kana runs via
    romaji kernel, Han runs as space-joined pinyin; anything unmapped is
    passed through; combining marks survive and NFC recomposes (so
    Москва́ → Moskvá).
    """
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in CYRILLIC:
            out.append(CYRILLIC[c])
            i += 1
        elif c in GREEK:
            out.append(GREEK[c])
            i += 1
        elif _is_kana(c):
            j = i
            while j < n and _is_kana(s[j]):
                j += 1
            out.append(kana_to_romaji(s[i:j]))
            i = j
        elif _is_han(c):
            j = i
            while j < n and _is_han(s[j]):
                j += 1
            run = [HAN_PINYIN.get(ch, ch) for ch in s[i:j]]
            out.append(" ".join(run))
            i = j
        elif 0xAC00 <= ord(c) <= 0xD7A3:
            out.append(hangul_to_latin(c))
            i += 1
        elif c in GEORGIAN:
            out.append(GEORGIAN[c])
            i += 1
        else:
            out.append(c)
            i += 1
    return unicodedata.normalize("NFC", "".join(out))


def _jp_tokenize(s: str) -> list[str]:
    """Fake-pykakasi tokenizer: dictionary longest-match for kanji,
    kana runs as single romaji tokens, non-Japanese runs passed through
    as single tokens (so ' 100 abc' stays one token and survives
    ``str.capitalize`` unchanged, matching geo-transcript-srv.py:151-158).
    """
    tokens: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if _is_kana(c):
            j = i
            while j < n and _is_kana(s[j]):
                j += 1
            tokens.append(kana_to_romaji(s[i:j]))
            i = j
        elif _is_han(c):
            matched = False
            for ln in range(min(_JP_MAX_WORD, n - i), 0, -1):
                w = s[i:i + ln]
                if w in JP_WORDS:
                    tokens.extend(JP_WORDS[w])
                    i += ln
                    matched = True
                    break
            if not matched:
                tokens.append(c)
                i += 1
        else:
            j = i
            while j < n and not _is_kana(s[j]) and not _is_han(s[j]):
                j += 1
            tokens.append(s[i:j])
            i = j
    return tokens


def kanji_transcript(s: str) -> str:
    """pykakasi-replacement (geo-transcript-srv.py:151-158): per token
    strip + capitalize + space-join."""
    out = ""
    for w in _jp_tokenize(s):
        h = w.strip()
        if h:
            out += h.capitalize() + " "
    return out.strip()


def _thai_run_to_roman(run: str) -> str:
    """Fake tltk.nlp.th2roman: longest-match word segmentation,
    space-joined (already '<s/>'-stripped)."""
    parts: list[str] = []
    i = 0
    n = len(run)
    while i < n:
        matched = False
        for ln in range(min(_THAI_MAX_WORD, n - i), 0, -1):
            w = run[i:i + ln]
            if w in THAI_WORDS:
                parts.append(THAI_WORDS[w])
                i += ln
                matched = True
                break
        if not matched:
            parts.append(run[i])
            i += 1
    # join word-level outputs with spaces, collapsing single leftovers
    out: list[str] = []
    for p in parts:
        if out and len(out[-1]) == 1 and len(p) == 1:
            out[-1] += p
        else:
            out.append(p)
    return " ".join(out)


def thai_transcript(s: str) -> str:
    """Parity with geo-transcript-srv.py:88-103 — THAI runs romanized,
    other runs pass through, concatenated without extra separators."""
    latin = ""
    for run in split_by_alphabet(s):
        if _alphabet(run[0]) == "THAI":
            latin += _thai_run_to_roman(run)
        else:
            latin += run
    return latin


def cantonese_transcript(s: str) -> str:
    """Parity with geo-transcript-srv.py:105-120 — CJK runs become
    space-joined jyutping syllables."""
    latin = ""
    for run in split_by_alphabet(s):
        if _alphabet(run[0]) == "CJK":
            latin += " ".join(JYUTPING.get(c, c) for c in run)
        else:
            latin += run
    return latin


def transcript(rec_id: str, cc: str, name: str) -> str:
    """Country-routed transliteration (geo-transcript-srv.py:160-179).

    cc='jp' → kanji; 'th' → thai; 'mo'/'hk' → cantonese; anything else
    (including 'tw', '' and unknown ccs) → generic Any-Latin + NFC.
    Per-record errors yield '' like the daemon's handler (:291-293).
    """
    if name == "":
        return ""
    try:
        if cc in BOUNDARY_CCS:
            if cc == "jp":
                return kanji_transcript(name)
            if cc == "th":
                return thai_transcript(name)
            if cc in ("mo", "hk"):
                return cantonese_transcript(name)
        return generic_transliterate(name)
    except Exception:
        return ""


def gate_cc(name: str, resolve_cc) -> str:
    """The daemon's XY gate (geo-transcript-srv.py:268-275): spatial
    lookup only for CJK names; Thai charset short-circuits to 'th';
    everything else skips geometry entirely."""
    if contains_cjk(name):
        return resolve_cc()
    if contains_thai(name):
        return "th"
    return ""
