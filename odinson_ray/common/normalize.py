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


def normalize_unicode_aggressively(s: str) -> str:
    """NFKC + casefold + strip combining marks (diacritics)."""
    v = _AGG_CACHE.get(s)
    if v is None:
        t = unicodedata.normalize("NFKC", s)
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
