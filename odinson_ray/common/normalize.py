"""Unicode normalization shared by fixture generation, indexing and matching.

Mirrors the semantics the reference applies on BOTH the index side and the
query side (reference: core/.../lucene/index/OdinsonIndexWriter.scala:243,252-253
and compiler/QueryCompiler.scala:414-421, via ai.lum.common StringUtils):

- ``normalize_unicode``              -> NFKC canonical/compat normalization
- ``normalize_unicode_aggressively`` -> NFKC + casefold + strip diacritics

The same function must be applied to the stored token and to the query term,
otherwise terms won't line up (documented in the reference's metadata docs).
"""

from __future__ import annotations

import unicodedata

# whitespace-only tokens are replaced with this character at index time
# (reference: OdinsonIndexWriter.scala:312-325, reference.conf:116)
INVALID_CHARACTER_REPLACEMENT = "�"

# plain dict caches: lru_cache wrappers pickle by reference, which breaks
# shipping the package by value to Ray workers
_NORM_CACHE: dict = {}
_AGG_CACHE: dict = {}


def normalize_unicode(s: str) -> str:
    """NFKC normalization (non-aggressive)."""
    v = _NORM_CACHE.get(s)
    if v is None:
        v = unicodedata.normalize("NFKC", s)
        if len(_NORM_CACHE) < 1_000_000:
            _NORM_CACHE[s] = v
    return v


# ASCII folding applied by the aggressive normalizer (quotes, dashes,
# bullets, ligatures, arrows, trademark signs, fraction slash), matching
# the reference's normalizeUnicodeAggressively behavior
_FOLD_MULTI = {
    "™": "(TM)",  # ™
    "®": "(R)",
    "©": "(C)",
    "œ": "oe",  # œ
    "Œ": "OE",
    "æ": "ae",
    "Æ": "AE",
    "½": "1/2",
    "¼": "1/4",
    "¾": "3/4",
    "←": "<-",
    "→": "->",
    "⇐": "<=",
    "⇒": "=>",
    "↔": "<->",
    "…": "...",
}
_FOLD_SINGLE = str.maketrans(
    {
        "‘": "'",
        "’": "'",
        "‚": "'",
        "‛": "'",
        "“": '"',
        "”": '"',
        "„": '"',
        "–": "-",
        "—": "-",
        "―": "-",
        "•": "-",  # bullet
        "·": "-",
        "⁄": "/",  # fraction slash
        " ": " ",
    }
)


def _ascii_fold(s: str) -> str:
    for k, v in _FOLD_MULTI.items():
        if k in s:
            s = s.replace(k, v)
    return s.translate(_FOLD_SINGLE)


def normalize_unicode_aggressively(s: str) -> str:
    """ASCII-fold + NFKC + casefold + strip combining marks (diacritics)."""
    v = _AGG_CACHE.get(s)
    if v is None:
        t = _ascii_fold(s)
        t = unicodedata.normalize("NFKC", t)
        t = _ascii_fold(t)  # NFKC can reintroduce foldable chars (fractions)
        t = t.casefold()
        t = unicodedata.normalize("NFKD", t)
        t = "".join(c for c in t if not unicodedata.combining(c))
        v = unicodedata.normalize("NFKC", t)
        if len(_AGG_CACHE) < 1_000_000:
            _AGG_CACHE[s] = v
    return v


def sanitize_token(tok: str) -> str:
    """Replace whitespace-only tokens with the replacement char and strip
    control characters, as the reference index writer does
    (OdinsonIndexWriter.scala:312-325)."""
    # fast path: printable ASCII needs no per-char scan
    if tok and tok.isascii() and tok.isprintable():
        return tok
    if tok.strip() == "":
        return INVALID_CHARACTER_REPLACEMENT
    return "".join(INVALID_CHARACTER_REPLACEMENT if unicodedata.category(c) == "Cc" else c for c in tok)
