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
from functools import lru_cache

# whitespace-only tokens are replaced with this character at index time
# (reference: OdinsonIndexWriter.scala:312-325, reference.conf:116)
INVALID_CHARACTER_REPLACEMENT = "�"


@lru_cache(maxsize=65536)
def normalize_unicode(s: str) -> str:
    """NFKC normalization (non-aggressive)."""
    return unicodedata.normalize("NFKC", s)


@lru_cache(maxsize=65536)
def normalize_unicode_aggressively(s: str) -> str:
    """NFKC + casefold + strip combining marks (diacritics)."""
    s = unicodedata.normalize("NFKC", s)
    s = s.casefold()
    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return unicodedata.normalize("NFKC", s)


def sanitize_token(tok: str) -> str:
    """Replace whitespace-only tokens with the replacement char and strip
    control characters, as the reference index writer does
    (OdinsonIndexWriter.scala:312-325)."""
    if tok.strip() == "":
        return INVALID_CHARACTER_REPLACEMENT
    return "".join(INVALID_CHARACTER_REPLACEMENT if unicodedata.category(c) == "Cc" else c for c in tok)
