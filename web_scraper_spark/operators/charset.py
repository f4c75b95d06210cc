"""Charset detection + decoding: raw fetched ``html: binary`` → text.

Real crawls cannot assume UTF-8: ~5% of the web still serves legacy
8-bit encodings, and mislabeled bytes poison every downstream text op
(dedup keys, LM scores, extraction). The decode policy here is the
WHATWG-encoding-standard subset browsers actually apply:

1. **BOM wins**: ``EF BB BF`` → UTF-8 (BOM stripped);
2. **declared charset**: ``<meta charset=...>`` /
   ``<meta http-equiv="Content-Type" content="...charset=...">``
   scanned in the first 1024 bytes (the standard's prescan window),
   ASCII-superset-safe;
3. **sniff**: strict UTF-8 attempt, on failure **windows-1252** (the
   standard's fallback for unlabeled legacy bytes — a superset of
   printable latin-1, and every byte sequence decodes under it, so
   the stage can never throw on arbitrary crawl bytes).

Implemented as one Arrow-batched ``mapInPandas`` stage (binary→str is
codec work Spark has no builtin for); input columns pass through, the
binary column is REPLACED by ``text`` + ``charset`` so the wide bytes
stop at this stage — same pruning-by-construction contract as
``extract_pages``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

__all__ = ["decode_html", "detect_and_decode"]

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)|"""
    rb"""content\s*=\s*["'][^"']*charset=([A-Za-z0-9_\-]+))""",
    re.IGNORECASE,
)

# WHATWG Encoding Standard label table (subset): iso-8859-1 / latin1 /
# ascii are all LABELS FOR windows-1252 — browsers decode pages labeled
# latin-1 with cp1252 so the 0x80-0x9F range yields curly quotes and
# em-dashes, not C1 control characters. windows-1252 is a superset of
# printable latin-1, so correctly-labeled latin-1 pages decode
# identically.
_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    # deliberate WHATWG deviation: ascii labels get a strict UTF-8
    # attempt first (UTF-8 is an ASCII superset, so correctly-labeled
    # pages decode identically; the common "ascii"-labeled-but-UTF-8
    # mislabel is recovered instead of mojibake'd), falling through to
    # the cp1252 sniff on failure
    "us-ascii": "utf-8",
    "ascii": "utf-8",
}


def detect_and_decode(blob: bytes) -> tuple[str, str]:
    """(text, charset_used) for one page's bytes. Never raises:
    windows-1252 decodes any byte sequence."""
    if blob[:3] == b"\xef\xbb\xbf":
        return blob[3:].decode("utf-8", errors="replace"), "utf-8-bom"
    m = _META_RE.search(blob[:1024])
    if m:
        raw = (m.group(1) or m.group(2)).decode("ascii", "replace").lower()
        enc = _ALIASES.get(raw)
        if enc is not None:
            try:
                return blob.decode(enc), enc
            except UnicodeDecodeError:
                pass  # mislabeled page → fall through to sniffing
    try:
        return blob.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return blob.decode("windows-1252", errors="replace"), "windows-1252"


def decode_html(
    pages: DataFrame, html_col: str = "html"
) -> DataFrame:
    """(… html binary …) → (… text string, charset string); other
    columns pass through, ``html`` is dropped after this stage."""
    import pandas as pd

    keep = [f for f in pages.schema.fields if f.name != html_col]
    out_schema = StructType(
        list(keep)
        + [
            StructField("text", StringType(), True),
            StructField("charset", StringType(), True),
        ]
    )
    keep_names = [f.name for f in keep]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            texts: list[str | None] = []
            charsets: list[str | None] = []
            for blob in pdf[html_col]:
                if blob is None:
                    texts.append(None)
                    charsets.append(None)
                else:
                    t, c = detect_and_decode(bytes(blob))
                    texts.append(t)
                    charsets.append(c)
            out = pdf[keep_names].copy()
            out["text"] = texts
            out["charset"] = charsets
            yield out

    return pages.mapInPandas(run, out_schema)
