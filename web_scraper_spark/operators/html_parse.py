"""General (real-world) HTML extraction — the non-synthetic parse path.

The reference extracts fields with lxml XPaths over arbitrary portal
HTML (nausys_tracker.py:268-296) and discovers links from the DOM
(nausys_tracker.py:149-173). The synthetic fixture pages are covered by
the fast span-grammar regex in ``operators/extract.py``; THIS module is
the path for HTML the fixture did not render: malformed nesting,
attributes in any order/quoting, character entities, comments, CDATA,
``<script>``/``<style>`` blocks.

Two implementations of one hand-written spec:

- ``parse_html_py`` — stdlib ``html.parser.HTMLParser``; always
  available, the tested path in this sandbox;
- ``parse_html_lxml`` — the same tree walk over ``lxml.html`` when lxml
  is importable (it is not in this sandbox); same output contract, so
  the two are interchangeable the day the lib is present.

Output contract (shared with the grammar path):

- ``text``: visible page text — every tag boundary becomes a single
  space, entities decoded, comment/CDATA/script/style content dropped,
  whitespace collapsed, trimmed. On entity-free pages this is
  byte-identical to the grammar stripper (``_TAG_RE.sub(' ', html)`` +
  collapse) — pinned by tests over the whole fixture world.
- ``fields``: for each schema field, the ``text_content().strip()`` of
  the FIRST element (document order) whose ``id`` is
  ``<id_prefix><field>`` — raw concatenation of the subtree's text, no
  space injection (exact lxml ``text_content()`` semantics); missing
  element → None (nausys_tracker.py:293-295).
- ``outlinks``: ``href`` of every ``<a>``, document order, any
  quoting/attribute order, entity-decoded.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from ..sources.fixtures import FIELDS

try:  # pragma: no cover - lxml is not installed in this sandbox
    import lxml.html as _lxml_html
except ImportError:
    _lxml_html = None

__all__ = [
    "DEFAULT_ID_PREFIX",
    "parse_html",
    "parse_html_py",
    "parse_html_lxml",
    "HAVE_LXML",
]

DEFAULT_ID_PREFIX = "yachtReservationDialogForm:tabView:"
HAVE_LXML = _lxml_html is not None

_WS_RE = re.compile(r"\s+")

# content of these elements is never visible text
_SKIP_CONTENT = frozenset({"script", "style", "noscript", "template"})
# HTML void elements: no content, never on the open stack
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _DocParser(HTMLParser):
    """Event-driven extractor tolerant of real-world tag soup.

    Text chunks are split exactly at tag boundaries (contiguous
    ``handle_data`` calls are merged so incremental feeding can never
    inject a phantom boundary). Elements carrying an ``id`` record the
    [start, end) chunk span of their subtree; an unmatched end tag is
    ignored, a missing end tag is closed by ancestor recovery or EOF —
    the id span still covers exactly the chunks emitted while the
    element was open.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.links: list[str] = []
        # (open_seq, id, chunk_start, chunk_end)
        self.id_spans: list[tuple[int, str, int, int]] = []
        self._stack: list[tuple[str, str | None, int, int]] = []
        self._skip = 0
        self._open_seq = 0
        self._last_was_data = False

    # -- helpers ----------------------------------------------------------
    def _boundary(self) -> None:
        self._last_was_data = False

    def _open_element(self, tag: str, attrs: list, self_closing: bool) -> None:
        self._boundary()
        hidden = self._skip > 0  # inside noscript/template etc.
        a = {}
        for k, v in attrs:  # first occurrence of a duplicated attr wins
            a.setdefault(k, v)
        if tag == "a" and not hidden:
            href = a.get("href")
            if href:
                self.links.append(href)
        el_id = a.get("id") if not hidden else None
        seq = self._open_seq
        self._open_seq += 1
        if self_closing or tag in _VOID:
            if el_id is not None:
                n = len(self.parts)
                self.id_spans.append((seq, el_id, n, n))
            return
        if tag in _SKIP_CONTENT:
            self._skip += 1
        self._stack.append((tag, el_id, seq, len(self.parts)))

    def _close_to(self, i: int) -> None:
        """Pop stack down to (and including) index i, recording id spans
        for every implicitly-closed element above it."""
        end = len(self.parts)
        for tag, el_id, seq, start in self._stack[i:]:
            if el_id is not None:
                self.id_spans.append((seq, el_id, start, end))
            if tag in _SKIP_CONTENT and self._skip:
                self._skip -= 1
        del self._stack[i:]

    # -- HTMLParser events -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._open_element(tag, attrs, self_closing=False)

    def handle_startendtag(self, tag, attrs):
        self._open_element(tag, attrs, self_closing=True)

    def handle_endtag(self, tag):
        self._boundary()
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                self._close_to(i)
                return
        # unmatched end tag (e.g. misnested '</i>' already recovered): ignore

    def handle_data(self, data):
        if self._skip or not data:
            return
        if self._last_was_data:
            self.parts[-1] += data
        else:
            self.parts.append(data)
            self._last_was_data = True

    def handle_comment(self, data):
        self._boundary()

    def handle_decl(self, decl):
        self._boundary()

    def unknown_decl(self, data):  # <![CDATA[ ... ]]> in HTML: not text
        self._boundary()

    def handle_pi(self, data):
        self._boundary()

    def finish(self) -> None:
        self.close()
        self._close_to(0)


def parse_html_py(
    html: str, id_prefix: str = DEFAULT_ID_PREFIX
) -> tuple[dict[str, str | None], str, list[str]]:
    """Stdlib implementation of the spec → (fields, text, outlinks)."""
    p = _DocParser()
    p.feed(html)
    p.finish()
    text = _WS_RE.sub(" ", " ".join(p.parts)).strip()
    # first element (document order = open_seq) per id wins
    id_text: dict[str, str] = {}
    for seq, el_id, start, end in sorted(p.id_spans):
        if el_id not in id_text:
            id_text[el_id] = "".join(p.parts[start:end]).strip()
    fields = {f: id_text.get(id_prefix + f) for f in FIELDS}
    return fields, text, p.links


def _lxml_walk(
    el, parts: list[str], id_spans: list, links: list[str], seq: list[int]
) -> None:
    """Document-order walk mirroring _DocParser's chunking: each text/
    tail node is one chunk; script/style/comment subtrees (and the ids/
    links inside them) contribute nothing; elements with ids record
    their subtree chunk span."""
    if not isinstance(el.tag, str):  # comment / PI node: skip text, keep tail
        return
    tag = el.tag.lower()
    el_id = el.get("id")
    my_seq = seq[0]
    seq[0] += 1
    start = len(parts)
    if tag == "a" and el.get("href"):
        links.append(el.get("href"))
    if tag not in _SKIP_CONTENT:
        if el.text:
            parts.append(el.text)
        for child in el:
            _lxml_walk(child, parts, id_spans, links, seq)
            if child.tail:
                parts.append(child.tail)
    if el_id is not None:
        id_spans.append((my_seq, el_id, start, len(parts)))


def parse_html_lxml(
    html: str, id_prefix: str = DEFAULT_ID_PREFIX
) -> tuple[dict[str, str | None], str, list[str]]:  # pragma: no cover
    """lxml implementation of the same spec (requires lxml)."""
    if _lxml_html is None:
        raise ImportError("lxml is not installed")
    doc = _lxml_html.fromstring(html)
    parts: list[str] = []
    id_spans: list[tuple[int, str, int, int]] = []
    links: list[str] = []
    _lxml_walk(doc, parts, id_spans, links, [0])
    text = _WS_RE.sub(" ", " ".join(parts)).strip()
    id_text: dict[str, str] = {}
    for s, el_id, a, b in sorted(id_spans):
        if el_id not in id_text:
            id_text[el_id] = "".join(parts[a:b]).strip()
    fields = {f: id_text.get(id_prefix + f) for f in FIELDS}
    return fields, text, links


# the general-path dispatcher: lxml when available, stdlib otherwise —
# both implement the identical spec above
parse_html = parse_html_lxml if HAVE_LXML else parse_html_py
