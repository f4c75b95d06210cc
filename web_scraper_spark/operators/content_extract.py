"""Main-content extraction (boilerplate removal) — the canonical
webtext op between "fetch HTML" and "feed the LM pipeline".

The reference extracts *structured fields* from portal pages
(nausys_tracker.py:268-296); a training-data pipeline additionally
needs the jusText / Arc90-readability class of extraction: split a
page into text blocks, score each block, keep prose, drop chrome
(navigation, footers, link farms, share bars). This module implements
the deterministic core of that family:

1. **Block segmentation.** An event-driven parse (same stdlib
   ``HTMLParser`` discipline as ``operators/html_parse``) cuts the
   page into blocks at block-level element boundaries (``p``, ``div``,
   ``h1-h6``, ``li``, ``td``, ``blockquote``, ``pre``, …), decoding
   entities, dropping script/style/comment content, and counting, per
   block, the characters that sit inside ``<a>`` subtrees.
2. **Block scoring** (``classify_blocks``): a block is CONTENT iff it
   has at least ``min_content_chars`` visible characters AND its link
   density (anchor chars / total chars) is below ``max_link_density``,
   and it is not inside a structural-boilerplate container
   (``nav/header/footer/aside/form``). Headings (``h1-h6``) are kept
   by PROMOTION: a short low-link-density heading survives iff a
   content block follows it later in the document — the jusText
   "near-good headline" rule, deterministic version.
3. ``extract_main_content``: the Arrow ``mapInPandas`` stage — one
   pass, html enters Python exactly once (the same stage budget as
   ``operators/extract.py``), no shuffle, wide bytes never leave the
   stage. Output: ``main_text`` (kept blocks joined by ``\\n``) plus
   per-document block statistics for corpus-quality gating.

Scale shape: per-row work only — a 100 TB corpus pays one Arrow stage,
and every downstream filter (content_ratio thresholds, length gates)
is a native Column over the small typed outputs.

The pure-Python core (``segment_blocks`` / ``classify_blocks``) IS the
oracle twin: battery fixtures assemble pages natively from hand-written
templates whose expected main text is known by construction, so the
DuckDB oracle states expectations directly (same pattern as
``extract_adversarial``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass
from html.parser import HTMLParser
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

__all__ = [
    "Block",
    "segment_blocks",
    "classify_blocks",
    "extract_main_content_py",
    "extract_main_content",
]

# block-level elements: entering/leaving one closes the current block
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li dt dd td th blockquote pre article "
    "section main figure figcaption table ul ol dl tr form nav header "
    "footer aside br".split()
)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
# structural containers whose whole subtree is chrome
_BOILER_CONTAINERS = frozenset({"nav", "header", "footer", "aside", "form"})
_SKIP_CONTENT = frozenset({"script", "style", "noscript", "template", "title"})
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_WS_RE = re.compile(r"\s+")

MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 1.0 / 3.0
MIN_HEADING_CHARS = 3


@dataclass
class Block:
    text: str  # whitespace-collapsed visible text
    link_chars: int  # characters inside <a> subtrees
    heading: bool  # opened under an h1-h6
    boiler_container: bool  # inside nav/header/footer/aside/form

    @property
    def chars(self) -> int:
        return len(self.text)

    @property
    def link_density(self) -> float:
        return self.link_chars / self.chars if self.chars else 0.0


class _BlockSegmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._a_depth = 0
        self._skip_depth = 0
        self._boiler_depth = 0
        self._heading_depth = 0

    def _flush(self) -> None:
        text = _WS_RE.sub(" ", "".join(self._parts)).strip()
        if text:
            self.blocks.append(
                Block(
                    text=text,
                    link_chars=min(self._link_chars, len(text)),
                    heading=self._heading_depth > 0,
                    boiler_container=self._boiler_depth > 0,
                )
            )
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BOILER_CONTAINERS:
                self._boiler_depth += 1
            if tag in _HEADING_TAGS:
                self._heading_depth += 1
        elif tag == "a":
            self._a_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BOILER_CONTAINERS:
                self._boiler_depth = max(0, self._boiler_depth - 1)
            if tag in _HEADING_TAGS:
                self._heading_depth = max(0, self._heading_depth - 1)
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._a_depth:
            # count collapsed-visible chars, same normalization as text
            self._link_chars += len(_WS_RE.sub(" ", data).strip(" "))

    def handle_comment(self, data):
        pass

    def finish(self) -> list[Block]:
        self._flush()
        return self.blocks


def segment_blocks(html: str) -> list[Block]:
    """Page → ordered visible-text blocks with per-block link stats."""
    p = _BlockSegmenter()
    try:
        p.feed(html)
        p.close()
    except Exception:  # tag soup must never kill a task
        pass
    return p.finish()


def classify_blocks(
    blocks: list[Block],
    min_content_chars: int = MIN_CONTENT_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> list[bool]:
    """True = content. Core rule: long enough + low link density +
    not inside a structural chrome container. Headings are promoted iff
    a content block follows them later in document order."""
    kept = []
    for b in blocks:
        kept.append(
            not b.boiler_container
            and b.chars >= min_content_chars
            and b.link_density < max_link_density
        )
    # heading promotion (single reverse pass)
    any_content_after = False
    for i in range(len(blocks) - 1, -1, -1):
        b = blocks[i]
        if (
            not kept[i]
            and b.heading
            and not b.boiler_container
            and b.chars >= MIN_HEADING_CHARS
            and b.link_density < max_link_density
            and any_content_after
        ):
            kept[i] = True
        elif kept[i] and not b.heading:
            any_content_after = True
    return kept


def extract_main_content_py(
    html: str,
    min_content_chars: int = MIN_CONTENT_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> tuple[str, int, int, int, int]:
    """(main_text, n_blocks, n_content_blocks, content_chars,
    total_chars) — the pure-Python twin used by tests and fixtures."""
    blocks = segment_blocks(html)
    kept = classify_blocks(blocks, min_content_chars, max_link_density)
    content = [b.text for b, k in zip(blocks, kept) if k]
    return (
        "\n".join(content),
        len(blocks),
        sum(kept),
        sum(len(t) for t in content),
        sum(b.chars for b in blocks),
    )


_CONTENT_SCHEMA_FIELDS = [
    StructField("main_text", StringType(), True),
    StructField("n_blocks", IntegerType(), False),
    StructField("n_content_blocks", IntegerType(), False),
    StructField("content_chars", IntegerType(), False),
    StructField("total_chars", IntegerType(), False),
    StructField("content_ratio", DoubleType(), False),
]


def extract_main_content(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_content_chars: int = MIN_CONTENT_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> DataFrame:
    """Arrow-batched main-content extraction: one ``mapInPandas`` pass
    over (id, html) → (id, main_text, block stats). ``html`` may be
    string or binary (binary is decoded utf-8/replace — pair with
    ``operators/charset.decode_html`` upstream for real archives).
    ``content_ratio`` = content_chars / max(1, total_chars), the
    standard corpus-quality gate column."""
    import pandas as pd  # noqa: F811

    id_field = [f for f in pages.schema.fields if f.name == id_col][0]
    out_schema = StructType([id_field] + _CONTENT_SCHEMA_FIELDS)
    is_binary = dict(pages.dtypes)[html_col] == "binary"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "main_text", "n_blocks", "n_content_blocks",
                "content_chars", "total_chars", "content_ratio",
            )}
            for i, raw in zip(pdf[id_col], pdf[html_col]):
                if raw is None:
                    html = ""
                elif is_binary:
                    html = bytes(raw).decode("utf-8", errors="replace")
                else:
                    html = raw
                text, nb, nc, cc, tc = extract_main_content_py(
                    html, min_content_chars, max_link_density
                )
                rows[id_col].append(i)
                rows["main_text"].append(text if text else None)
                rows["n_blocks"].append(nb)
                rows["n_content_blocks"].append(nc)
                rows["content_chars"].append(cc)
                rows["total_chars"].append(tc)
                rows["content_ratio"].append(round(cc / max(1, tc), 6))
            yield pd.DataFrame(rows)

    src = pages.select(F.col(id_col), F.col(html_col))
    return src.mapInPandas(run, schema=out_schema)
