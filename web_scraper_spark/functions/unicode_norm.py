"""Unicode text normalization — the canonicalization pass that runs
before any text keyed operation (exact dedup, fingerprints, n-gram
shingles): visually-identical strings must hash identically.

Three composable steps, matching what CCNet-style pipelines run:

- **NFC**: compose combining sequences ('e' + U+0301 → 'é') so byte
  comparisons see one spelling per glyph;
- **accent strip**: NFD-decompose then drop combining marks (Mn) —
  'é' ≡ 'e' for dedup keys (opt-in; destructive for display text);
- **lowercase** + whitespace collapse.

Spark has no Unicode-normalization builtin, so this is one of the
package's few Arrow stages (a vectorized ``pandas_udf`` over
``unicodedata`` — batch-transferred, never per-row pickled; same
discipline as extraction). The DuckDB oracle uses its native
``nfc_normalize`` / ``strip_accents`` / ``lower`` — an independent ICU
implementation, so the ``text_normalize`` battery row cross-checks two
unrelated Unicode stacks agreeing byte-for-byte.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = ["nfc", "strip_accents", "normalize_text"]


@F.pandas_udf(StringType())
def _nfc_udf(s):  # type: ignore[no-untyped-def]
    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


@F.pandas_udf(StringType())
def _strip_accents_udf(s):  # type: ignore[no-untyped-def]
    def one(x):
        if x is None:
            return None
        return "".join(
            ch
            for ch in unicodedata.normalize("NFD", x)
            if unicodedata.category(ch) != "Mn"
        )

    return s.map(one)


def nfc(col: Column) -> Column:
    """Canonical composition (NFC)."""
    return _nfc_udf(col)


def strip_accents(col: Column) -> Column:
    """NFD-decompose and drop combining marks (Unicode category Mn).
    Output is NOT recomposed — base letters have nothing left to
    compose with (DuckDB ``strip_accents`` parity)."""
    return _strip_accents_udf(col)


def normalize_text(
    col: Column,
    lowercase: bool = True,
    accents: bool = False,
    collapse_ws: bool = True,
) -> Column:
    """Dedup-key normalization: NFC, then optional accent strip /
    lowercase / whitespace collapse (+trim). Lowercase and whitespace
    stay native (JVM-side); only the Unicode-table steps pay the Arrow
    hop."""
    out = nfc(col)
    if accents:
        out = strip_accents(out)
    if lowercase:
        out = F.lower(out)
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out
