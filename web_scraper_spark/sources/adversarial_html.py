"""Adversarial real-world-HTML spec fixtures.

Each case is a hand-written (html, expected_text, expected_fields,
expected_outlinks) quadruple — the EXPECTATIONS are derived by hand from
the extraction spec in ``operators/html_parse.py`` (visible text with
tag-boundary spaces + whitespace collapse; fields as first-element
``text_content().strip()``; ``<a href>`` outlinks), NOT by running the
extractor, so they pin the spec rather than echo the implementation.

``{ID}`` is a per-document marker substituted on both sides; the
``extract_adversarial`` battery entry builds these pages from
``events.event_id`` and the DuckDB oracle SQL is assembled mechanically
from the same expectation strings (single-source, still independent of
the engine code path under test).

Covered hostile shapes (the reference's lxml XPath extraction,
nausys_tracker.py:268-296, tolerates all of these): attribute
reordering/quoting, character/numeric entities, comments containing
markup, script/style with inner angle brackets, misnested and unclosed
tags, uppercase tags/attrs, duplicate ids, markup nested inside a field
element, DOCTYPE/PI/CDATA, whitespace variants + void elements,
noscript/template hidden content, href edge cases.
"""

from __future__ import annotations

PFX = "yachtReservationDialogForm:tabView:"

# (name, html_template, text_template, {field: value_template}, [outlink_templates])
SPEC: list[tuple[str, str, str, dict[str, str], list[str]]] = [
    (
        "attr_order_quoting",
        "<html><body><p>doc{ID} start</p>"
        "<a class='nav' href='https://ex.com/a?x=1'>A</a>"
        "<a href=plain>B</a>"
        '<span class="v" id="' + PFX + 'yacht_name">Blue {ID}</span>'
        "</body></html>",
        "doc{ID} start A B Blue {ID}",
        {"yacht_name": "Blue {ID}"},
        ["https://ex.com/a?x=1", "plain"],
    ),
    (
        "entities",
        "<html><body><p>A&amp;B &lt;tag&gt; &#65;&quot;q&quot; doc{ID}</p>"
        '<span id="' + PFX + 'company_name">C&amp;o {ID}</span>'
        '<a href="/p?a=1&amp;b=2">l</a></body></html>',
        'A&B <tag> A"q" doc{ID} C&o {ID} l',
        {"company_name": "C&o {ID}"},
        ["/p?a=1&b=2"],
    ),
    (
        "comments_with_markup",
        '<html><body><!-- <span id="' + PFX + 'yacht_name">bogus</span> hidden -->'
        "<p>doc{ID} visible</p><!--[if IE]>junk<![endif]--></body></html>",
        "doc{ID} visible",
        {},
        [],
    ),
    (
        "script_style_brackets",
        "<html><head><style>body{color:red} a>b{}</style>"
        '<script>if(a<b){document.write("<span id=\'' + PFX + "deposit'>no</span>\");}</script>"
        "</head><body><p>doc{ID} real</p>"
        '<span id="' + PFX + 'deposit">1.500,00</span></body></html>',
        "doc{ID} real 1.500,00",
        {"deposit": "1.500,00"},
        [],
    ),
    (
        "misnested_unclosed",
        "<html><body><b><i>doc{ID} bold-italic</b> tail</i>"
        '<div><span id="' + PFX + 'port_from">Fethiye</span>'
        "<p>unclosed para<div>next {ID}</div></body></html>",
        "doc{ID} bold-italic tail Fethiye unclosed para next {ID}",
        {"port_from": "Fethiye"},
        [],
    ),
    (
        "uppercase_duplicate_ids",
        '<HTML><BODY><SPAN ID="' + PFX + 'yacht_name">First {ID}</SPAN>'
        '<span id="' + PFX + 'yacht_name">Second</span>'
        '<A HREF="HTTPS://EX.COM/UP">U</A></BODY></HTML>',
        "First {ID} Second U",
        {"yacht_name": "First {ID}"},
        ["HTTPS://EX.COM/UP"],
    ),
    (
        "markup_inside_field",
        '<html><body><span id="' + PFX + 'total_price"><b>1.234</b>,56 &euro;</span>'
        "<p>doc{ID}</p></body></html>",
        # page text gets a space at every tag boundary; the FIELD is raw
        # text_content concatenation (no injected space)
        "1.234 ,56 € doc{ID}",
        {"total_price": "1.234,56 €"},
        [],
    ),
    (
        "doctype_pi_cdata",
        '<!DOCTYPE html><?xml-stylesheet href="x"?><html><body>'
        "<![CDATA[ not text ]]><p>doc{ID} after</p></body></html>",
        "doc{ID} after",
        {},
        [],
    ),
    (
        "whitespace_void_elements",
        "<html><body>\n  <p>line1\n   line2</p><br><hr/>\n"
        '<img src="i.png" id="' + PFX + 'discount"> '
        '<span id="' + PFX + 'commission">7%</span>  doc{ID}\n</body></html>',
        "line1 line2 7% doc{ID}",
        # void element WITH the id exists → empty string, not None
        {"discount": "", "commission": "7%"},
        [],
    ),
    (
        "noscript_template_hidden",
        '<html><body><noscript><a href="/hidden">h</a>'
        '<span id="' + PFX + 'deposit">999</span></noscript>'
        "<template><p>tpl</p></template><p>doc{ID} shown</p></body></html>",
        "doc{ID} shown",
        {},
        [],
    ),
    (
        "href_edge_cases",
        '<html><body><a name="top">anchor</a><a href="">e</a>'
        '<a href="/x{ID}"><span>go</span></a><p>doc{ID}</p></body></html>',
        "anchor e go doc{ID}",
        {},
        ["/x{ID}"],
    ),
    (
        "jsf_portal_table",
        "<html><head><title>Yacht &ndash; doc{ID}</title></head><body>"
        '<div class="ui-dialog" id="yachtReservationDialogForm"><table><tbody>'
        '<tr><td class="label">yacht_name</td>'
        '<td><span style="font-weight:bold" id="' + PFX + 'yacht_name">Gulet {ID}</span></td></tr>'
        "<tr><td>list_price</td>"
        '<td><span id="' + PFX + 'list_price">12.500,00 &euro;</span></td></tr>'
        '</tbody></table></div><a target="_blank" href="/yacht/{ID}/details">more</a>'
        "</body></html>",
        "Yacht – doc{ID} yacht_name Gulet {ID} list_price 12.500,00 € more",
        {"yacht_name": "Gulet {ID}", "list_price": "12.500,00 €"},
        ["/yacht/{ID}/details"],
    ),
]

N_CASES = len(SPEC)


def render_case(idx: int, doc_id: str) -> str:
    """The adversarial page for case ``idx`` with the marker filled in."""
    return SPEC[idx][1].replace("{ID}", doc_id)


def expected_case(
    idx: int, doc_id: str
) -> tuple[str, dict[str, str], list[str]]:
    """Hand-written (text, fields, outlinks) expectation for case idx."""
    _, _, text_t, fields_t, links_t = SPEC[idx]
    return (
        text_t.replace("{ID}", doc_id),
        {k: v.replace("{ID}", doc_id) for k, v in fields_t.items()},
        [u.replace("{ID}", doc_id) for u in links_t],
    )


def _sql_quote(template: str) -> str:
    """Expectation template → DuckDB expression concatenating event_id
    at each {ID} site (single quotes doubled)."""
    pieces = template.split("{ID}")
    lits = ["'" + p.replace("'", "''") + "'" for p in pieces]
    return " || event_id || ".join(lits)


def oracle_case_sql(column: str) -> str:
    """CASE expressions over ``event_id % N_CASES`` for the battery
    oracle: column in {'text', 'yacht_name', 'n_outlinks'}."""
    whens = []
    for i, (_, _, text_t, fields_t, links_t) in enumerate(SPEC):
        if column == "text":
            expr = _sql_quote(text_t)
        elif column == "yacht_name":
            v = fields_t.get("yacht_name")
            expr = _sql_quote(v) if v is not None else "NULL"
        elif column == "n_outlinks":
            expr = str(len(links_t))
        else:
            raise ValueError(column)
        whens.append(f"WHEN {i} THEN {expr}")
    return f"CASE (event_id % {N_CASES}) " + " ".join(whens) + " END"
