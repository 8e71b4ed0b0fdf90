"""Text normalization applied before scoring (never to output).

Faithful to the reference ``preprocess`` closure at
/root/reference/nmalign/lib/align.py:54-59: each regex of the normalization
map is applied with Python-``re`` semantics in dict insertion order, then
Unicode NFKC.  Kept in Python (not ``regexp_replace``) on purpose: Java-regex
semantics differ from Python ``re`` (inline flags, ``\\w`` Unicode classes),
and byte-identical extraction requires exact ``re`` behavior — SURVEY.md §2.2
P1 / §7 hard-part (iii).  Inside Spark this runs vectorized per Arrow batch
(one Python call per string, zero per-row Spark overhead).
"""

from __future__ import annotations

import re
import unicodedata

__all__ = ["make_preprocessor", "DEFAULT_NORMALIZATION"]

# realistic normalization map exercised by the reference test suite
# (/root/reference/tests/test_all.py:16-26): long-s, combining umlauts,
# line-join removal, de-hyphenation
DEFAULT_NORMALIZATION = {
    " *\n": " ",
    "ſ": "s",
    "aͤ": "ä",
    "oͤ": "ö",
    "uͤ": "ü",
    "Aͤ": "Ä",
    "Oͤ": "Ö",
    "Uͤ": "Ü",
    "([^\\\\W\\s])(\\\\w)": "\\\\1 \\\\2",
}


def make_preprocessor(normalization: dict[str, str] | None):
    """Build the per-string preprocess function (align.py:54-59).

    Patterns are pre-compiled once per task (the reference re-compiles per
    call via ``re.sub``'s cache; results are identical, this is just cheaper
    inside a long-lived executor).
    """
    compiled = None
    if isinstance(normalization, dict):
        compiled = [(re.compile(p), r) for p, r in normalization.items()]

    def preprocess(s: str) -> str:
        if compiled is not None:
            for pattern, replacement in compiled:
                s = pattern.sub(replacement, s)
        return unicodedata.normalize("NFKC", s)

    return preprocess
