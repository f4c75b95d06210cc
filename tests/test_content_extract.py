"""Main-content extraction (boilerplate removal): block segmentation,
link-density scoring, heading promotion, chrome-container drops, and
the Arrow stage contract."""

from __future__ import annotations

from web_scraper_spark.operators.content_extract import (
    classify_blocks,
    extract_main_content,
    extract_main_content_py,
    segment_blocks,
)

PAGE = """<html><head><title>T</title><style>p{color:red}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/x">Contact</a></nav>
<div id="page">
<h1>The Article Title</h1>
<p>This is the first real paragraph of the article, long enough to count
as content and containing <a href="/ref">one inline link</a> only.</p>
<p>Second paragraph with plenty of prose so that the length gate is
comfortably satisfied on every run.</p>
<div class="share"><a>like</a> <a>share</a> <a>tweet</a> <a>pin</a></div>
<p>ok</p>
</div>
<footer><a href="/privacy">Privacy</a> &copy; 2025 Example Corp</footer>
</body></html>"""


def test_main_content_drops_chrome_keeps_prose():
    text, nb, nc, cc, tc = extract_main_content_py(PAGE)
    lines = text.split("\n")
    assert lines[0] == "The Article Title"  # heading promoted
    assert lines[1].startswith("This is the first real paragraph")
    assert lines[2].startswith("Second paragraph")
    assert len(lines) == 3
    # chrome never leaks
    assert "Home" not in text and "Privacy" not in text
    assert "like" not in text and "Example Corp" not in text
    assert "ok" not in text  # below the length gate
    assert nc == 3 and nb > nc and cc == sum(len(l) for l in lines)
    assert 0 < cc <= tc


def test_heading_not_promoted_without_following_content():
    html = "<h2>Lonely heading</h2><nav><a href='/'>Home</a></nav>"
    text, _, nc, _, _ = extract_main_content_py(html)
    assert text == "" and nc == 0
    # same heading WITH following prose is promoted
    html2 = html + "<p>" + "prose " * 10 + "</p>"
    text2, _, nc2, _, _ = extract_main_content_py(html2)
    assert text2.split("\n")[0] == "Lonely heading" and nc2 == 2


def test_link_density_gate():
    # long but almost entirely anchor text → boilerplate
    links = "".join(f"<a href='/{i}'>category link {i}</a> " for i in range(12))
    html = f"<div>{links}</div><p>{'word ' * 20}</p>"
    text, _, nc, _, _ = extract_main_content_py(html)
    assert nc == 1 and text.startswith("word")


def test_tag_soup_and_entities_never_raise():
    cases = [
        "",
        "<p>unclosed <div><b>mess",
        "<p>&amp; &lt;tag&gt; &#233;</p>" + "x" * 30,
        "<script>var a = '<p>not text</p>';</script><p>" + "y " * 20 + "</p>",
        "<!-- <p>comment markup</p> --><p>" + "z " * 20 + "</p>",
        "\x00\xff<p" ,
    ]
    for c in cases:
        text, *_ = extract_main_content_py(c)
        assert "not text" not in text and "comment markup" not in text


def test_nested_boiler_container_subtree_dropped():
    html = (
        "<footer><div><p>" + "legal boilerplate " * 5 + "</p></div></footer>"
        "<p>" + "actual prose " * 5 + "</p>"
    )
    text, _, nc, _, _ = extract_main_content_py(html)
    assert nc == 1 and text.startswith("actual prose")


def test_blocks_and_classification_shapes():
    blocks = segment_blocks("<p>aaa</p><li>bbb</li>text tail")
    assert [b.text for b in blocks] == ["aaa", "bbb", "text tail"]
    kept = classify_blocks(blocks, min_content_chars=3)
    assert kept == [True, True, True]


def test_extract_main_content_stage(spark):
    rows = [(1, PAGE), (2, "<p>tiny</p>"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in extract_main_content(df).collect()}
    assert got[1].main_text.split("\n")[0] == "The Article Title"
    assert got[1].n_content_blocks == 3
    assert got[2].main_text is None and got[2].n_blocks == 1
    assert got[3].main_text is None and got[3].total_chars == 0
    assert abs(got[1].content_ratio - got[1].content_chars / got[1].total_chars) < 1e-6
    # binary input path (archive bytes)
    bdf = spark.createDataFrame(
        [(1, PAGE.encode())], "doc_id long, html binary"
    )
    got_b = extract_main_content(bdf).collect()[0]
    assert got_b.main_text == got[1].main_text
