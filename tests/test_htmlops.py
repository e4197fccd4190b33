"""HTML -> text extraction + link harvesting (operators/htmlops.py) —
the crawl-pipeline front door: golden extractions, the RE2-restatable
whitespace contract (DuckDB differential), malformed-input behavior,
the frontier composition (links -> canonicalize -> registered domain),
and the Spark plumbing (Arrow batches, NULL passthrough, injected
extractor, zero-shuffle plan)."""

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.htmlops import (
    extract_links,
    extract_links_html,
    extract_text_html,
    html_to_text,
)

_DOC = """<!DOCTYPE html><html><head><title>My Page</title>
<style>body { color: red }</style>
<script>var x = "<p>not text</p>";</script></head>
<body><h1>Header &amp; More</h1>
<p>First   paragraph
spanning lines.</p><p>Second <b>bold</b> and <i>italic</i> text.</p>
<ul><li>one</li><li>two</li></ul>
<div>block<br>break</div>
<noscript>enable js</noscript><template><p>ghost</p></template>
<svg><text>vector</text></svg>
<table><tr><td>a</td><td>b</td></tr></table>
<a href="/rel">link text</a>
</body></html>"""


def test_golden_extraction():
    t = html_to_text(_DOC)
    lines = t.split("\n")
    assert lines[0] == "Header & More"              # entity decoded
    assert "First paragraph spanning lines." in lines
    assert "Second bold and italic text." in lines  # inline flow joins
    assert ["one", "two"] == lines[lines.index("one"):lines.index("one") + 2]
    assert "block" in lines and "break" in lines    # <br> breaks
    # dropped subtrees: script/style/noscript/template/svg and title
    for junk in ("var x", "color", "enable js", "ghost", "vector", "My Page"):
        assert junk not in t, junk
    assert html_to_text(_DOC, keep_title=True).split("\n")[0] == "My Page"
    assert "link text" in t                         # anchor TEXT is content


def test_whitespace_contract_duckdb_differential():
    """The per-line collapse uses the explicit ASCII class so an
    oracle can restate it in RE2 SQL: a single-<p> wrap of arbitrary
    ASCII text must extract to exactly DuckDB's
    trim(regexp_replace(text, '[ \\t\\r\\n\\f\\v]+', ' ', 'g'))."""
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "g", "delta42", ""]
    ws = [" ", "\t", "\n", "\r", "\f", "\v", "  ", " \n\t "]
    docs = []
    for i in range(40):
        n = rng.randint(0, 12)
        parts = []
        for _ in range(n):
            parts.append(words[rng.randint(len(words))])
            parts.append(ws[rng.randint(len(ws))])
        docs.append((i, "".join(parts)))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i int, txt varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?)", docs)
    want = dict(
        con.sql(
            "SELECT i, trim(regexp_replace(txt, '[ \t\r\n\f\v]+', ' ', 'g')) FROM t"
        ).fetchall()
    )
    for i, txt in docs:
        got = html_to_text(f"<p>{txt}</p>")
        assert got == want[i], (i, repr(txt), repr(got), repr(want[i]))


def test_unicode_whitespace_left_to_normalize_text():
    # NBSP is NOT in the ASCII collapse class — it survives extraction
    # (normalize_text owns unicode whitespace)
    assert html_to_text("<p>a&nbsp;b</p>") == "a\xa0b"
    assert html_to_text("<p>café   au\tlait</p>") == "café au lait"


def test_malformed_html_is_harmless():
    # unbalanced tags: extraction keys on tag names, not tree balance
    assert "ok" in html_to_text("<p>ok</div></p><b>bold")
    # unclosed script swallows the tail (browser CDATA behavior, documented)
    assert html_to_text("<p>seen</p><script>var x=1; rest") == "seen"
    assert html_to_text("") == ""
    with pytest.raises(ValueError, match="doc is None"):
        html_to_text(None)
    with pytest.raises(ValueError, match="doc is None"):
        extract_links(None)


def test_extract_links_and_resolution():
    h = (
        '<a href="/a">x</a><a href="#frag">y</a><a href="mailto:z@z">m</a>'
        '<a href="javascript:void(0)">j</a><a href="data:text/plain,x">d</a>'
        '<a href="http://e.com/b?q=1">z</a><a href="c.html"/>'
        '<a name="anchor-no-href">n</a><a href="/a">dup kept</a>'
    )
    assert extract_links(h) == ["/a", "http://e.com/b?q=1", "c.html", "/a"]
    assert extract_links(h, base_url="http://site.org/dir/page.html") == [
        "http://site.org/a",
        "http://e.com/b?q=1",
        "http://site.org/dir/c.html",
        "http://site.org/a",
    ]


def test_spark_extraction_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [(1, _DOC), (2, "<p>tiny</p>"), (3, None)],
        "doc_id long, html string",
    )
    out = {r.doc_id: r.text for r in extract_text_html(df).collect()}
    assert out[2] == "tiny" and out[3] is None
    assert out[1].split("\n")[0] == "Header & More"

    # injected extractor wins (the selectolax/lxml seam)
    inj = {
        r.doc_id: r.text
        for r in extract_text_html(df, extractor=lambda h: f"len={len(h)}").collect()
    }
    assert inj[2] == "len=11" and inj[3] is None

    # zero shuffle, one Arrow eval
    plan = (
        extract_text_html(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_spark_frontier_composition(spark):
    """The crawl-frontier chain: extract links per page, resolve
    against the page URL, explode, canonicalize, registered-domain —
    all existing textops operators compose downstream."""
    from zeek_duckdb_spark.operators.textops import (
        canonicalize_url,
        registered_domain,
        url_host,
    )

    df = spark.createDataFrame(
        [
            (1, "http://news.example.org/world/",
             '<a href="story.html?utm_source=x&id=2">s</a>'
             '<a href="HTTP://Other.COM:80/p#top">o</a>'),
            (2, "http://blog.example.com/", None),
        ],
        "doc_id long, url string, html string",
    )
    links = extract_links_html(df, base_url_col="url")
    rows = (
        links.select("doc_id", F.explode("links").alias("link"))
        .withColumn("canon", canonicalize_url(F.col("link")))
        .withColumn("dom", registered_domain(url_host(F.col("canon"))))
        .collect()
    )
    got = {(r.doc_id, r.canon, r.dom) for r in rows}
    assert (1, "http://news.example.org/world/story.html?id=2",
            "example.org") in got
    assert (1, "http://other.com/p", "other.com") in got
    # NULL html row contributes no links
    assert all(r.doc_id == 1 for r in rows)


def test_composes_with_clean_corpus(spark):
    """End-to-end crawl shape: HTML in, extracted text through the
    existing cleaning pipeline (dedup sees the EXTRACTED text, so two
    pages differing only in markup collapse as exact dups)."""
    from zeek_duckdb_spark.operators.pipeline import clean_corpus

    body = "the quick brown fox jumps over the lazy dog " * 3
    pages = [
        (1, f"<html><body><p>{body}</p></body></html>"),
        (2, f"<html><body><div>{body}</div><script>x()</script></body></html>"),
        (3, "<p>" + "completely different content here now " * 4 + "</p>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    text = extract_text_html(df).drop("html")
    survivors = {
        r.doc_id for r in clean_corpus(text, min_tokens=5).collect()
    }
    # 1 and 2 extract to the SAME text -> exact dup, min id survives
    assert survivors == {1, 3}


def test_collapse_class_is_exactly_the_documented_six(spark=None):
    """\\x1c-\\x1f are NOT in the collapse class (str.split(None)
    would eat them and diverge from the RE2 restatement; round-12):
    behavior must not depend on unrelated non-ASCII bytes in the
    line."""
    assert html_to_text("<p>a\x1cb</p>") == "a\x1cb"
    assert html_to_text("<p>a\x1cb\xa0</p>") == "a\x1cb\xa0"
    assert html_to_text("<p>a \x1c b</p>") == "a \x1c b"


def test_stray_close_tags_cannot_leak_skip_subtrees():
    """The skip scope is a STACK keyed on tag names: a stray close of
    a different skip tag inside an open one must not terminate it
    (round-12 — a shared counter leaked template/svg content)."""
    assert html_to_text("<template></style><p>ghost</p></template>") == ""
    assert html_to_text("<svg></title><text>vector</text></svg>") == ""
    assert html_to_text("<script></template>var x;</script><p>ok</p>") == "ok"
    # balanced nesting still closes correctly
    assert html_to_text("<svg><svg></svg></svg><p>after</p>") == "after"
    # a stray close with NOTHING open is harmless
    assert html_to_text("</style><p>fine</p>") == "fine"


def test_unclosed_foreign_content_breaks_out_at_html_tags():
    """An UNCLOSED <svg>/<math> must not swallow the rest of the
    document: per the HTML standard's foreign-content rules, a start
    tag like <p>/<div> auto-closes the foreign scope (round-13 — the
    r12 stack kept the scope open to EOF, losing all later text and
    metadata on one common malformation)."""
    assert (
        html_to_text("<svg><circle r=1><p>real text</p>") == "real text"
    )
    assert html_to_text("<math><mi>x</mi><div>after</div>") == "after"
    # svg-internal elements do NOT break out: the tooltip stays gone
    assert html_to_text("<svg><text>vector label</text><p>yes</p>") == "yes"
    # template is not foreign content: no breakout, inert to EOF
    assert html_to_text("<template><p>ghost</p>") == ""
    # nested foreign scopes all pop at one breakout tag
    assert html_to_text("<svg><math><p>deep</p>") == "deep"
    # the breakout applies to SELF-CLOSING start tags too (XHTML-style
    # <br/>/<img/> are common in crawled HTML)
    assert html_to_text("<svg><circle r=1><br/>real text") == "real text"
    assert html_to_text("<svg><circle r=1><img src=x />caption") == "caption"
    # <font> breaks out ONLY with color/face/size (SVG has its own
    # <font> element that stays foreign content)
    assert html_to_text("<svg><font><glyph/>inner</font></svg><p>ok</p>") == "ok"
    assert html_to_text("<svg><font color=red>styled</font> after") \
        == "styled after"


def test_escape_wrap_oracle_is_sound_for_markupish_text():
    """The tx_html_extract wrap pre-escapes &/</> so the full-value
    oracle holds for ANY corpus text: extraction of the escaped wrap
    returns the raw text whitespace-collapsed (round-12)."""
    tricky = [
        "a &amp; b",
        "use <b> tags &copy; now",
        "5 < 6 > 4 & more",
        "&#65; numeric ref",
    ]
    for t in tricky:
        esc = t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        assert html_to_text(f"<p>{esc}</p>") == " ".join(t.split(" ")), t


def test_link_density_filter_drops_navigation():
    """max_link_density (jusText/boilerpipe heuristic): nav bars,
    footers and tag clouds are ~100% anchor text and drop; prose with
    inline links survives; None keeps everything."""
    h = (
        '<nav><a href="/">Home</a> <a href="/a">About</a> '
        '<a href="/c">Contact</a></nav>'
        "<p>A real paragraph of body prose that happens to mention "
        '<a href="/x">one link</a> among many ordinary words.</p>'
        '<footer><a href="/p">Privacy</a> | <a href="/t">Terms</a></footer>'
    )
    full = html_to_text(h)
    assert "Home About Contact" in full and "Privacy | Terms" in full
    main = html_to_text(h, max_link_density=0.5)
    assert "Home About Contact" not in main
    assert "Privacy" not in main
    assert "A real paragraph of body prose" in main
    assert "one link" in main            # the inline link's TEXT stays
    # threshold 1.0 keeps even pure-link lines (ratio <= 1)
    assert "Home About Contact" in html_to_text(h, max_link_density=1.0)
    with pytest.raises(ValueError, match="max_link_density"):
        html_to_text(h, max_link_density=1.5)
    # the '|' separator in the footer is NON-anchor text, so the
    # footer's ratio is just under 1 — pin it still dies at 0.5
    # (12 anchor chars of 13 non-ws)


def test_extract_text_html_link_density_spark(spark):
    from zeek_duckdb_spark.operators.htmlops import extract_text_html

    h = ('<nav><a href="/">Home</a><a href="/a">About</a></nav>'
         "<p>Body text with many plain words here.</p>")
    df = spark.createDataFrame([(1, h)], "doc_id long, html string")
    out = extract_text_html(df, max_link_density=0.5).collect()[0].text
    assert out == "Body text with many plain words here."
    with pytest.raises(ValueError, match="max_link_density"):
        extract_text_html(df, max_link_density=-0.1)


def test_unclosed_anchor_does_not_poison_link_density():
    """Crawled HTML is full of unclosed <a> tags (HTMLParser does no
    HTML5 tree repair): the anchor state must reset at block
    boundaries, or one missing </a> marks the whole rest of the page
    as anchor text and the density filter drops everything
    (round-12)."""
    h = ('<ul><li><a href="/">Home</li></ul>'
         "<p>A real paragraph of plain body prose with many words.</p>")
    out = html_to_text(h, max_link_density=0.5)
    assert "A real paragraph of plain body prose" in out
    # anchors inside SKIPPED subtrees must not leak state either
    h2 = ('<template><a href="x">t</template>'
          "<p>Plain prose paragraph with ordinary words here.</p>")
    assert "Plain prose paragraph" in html_to_text(h2, max_link_density=0.5)


def test_link_density_denominator_uses_ascii_class():
    """The density denominator counts non-whitespace per the SAME
    6-char ASCII class as the collapse: NBSP is page CONTENT (it stays
    in the text), so it must count — a 4-anchor-char line padded with
    ten NBSPs is 4/14, not 4/4 (round-12)."""
    h = '<p><a href="/">Home</a>' + "&nbsp;" * 10 + "</p>"
    assert html_to_text(h, max_link_density=0.5) != ""


def test_charset_decode_non_text_codec_fallback(spark):
    """codecs.lookup resolves bytes transforms (hex/base64/zlib/rot13)
    that are NOT text encodings — a page declaring charset=hex must
    fall back to utf-8-replace, not abort the batch (round-12)."""
    from zeek_duckdb_spark.sources.warc import body_text_col

    df = spark.createDataFrame(
        [(1, bytearray(b"plain page"), "text/html; charset=hex"),
         (2, bytearray(b"ok"), "text/html; charset=rot13")],
        "doc_id long, body binary, content_type string",
    )
    got = {
        r.doc_id: r.text
        for r in df.select("doc_id", body_text_col().alias("text")).collect()
    }
    assert got == {1: "plain page", 2: "ok"}


def test_extract_meta_reference():
    from zeek_duckdb_spark.operators.htmlops import extract_meta

    h = """<html lang="en-US"><head><title>My  Article</title>
<meta name="description" content="A summary.">
<meta property="og:description" content="ignored, description won">
<link rel="CANONICAL stylesheet" href=" https://orig.example.com/post/1 ">
<meta name="robots" content="NOINDEX, nofollow"></head>
<body><p>x</p></body></html>"""
    assert extract_meta(h) == {
        "title": "My Article",
        "description": "A summary.",
        "lang": "en-US",
        "canonical": "https://orig.example.com/post/1",
        "noindex": True,
    }
    # og:description serves when plain description is absent
    h2 = '<meta property="og:description" content="og only"/>'
    assert extract_meta(h2)["description"] == "og only"
    assert extract_meta("<p>no head</p>") == {
        "title": None, "description": None, "lang": None,
        "canonical": None, "noindex": False,
    }
    with pytest.raises(ValueError, match="doc is None"):
        extract_meta(None)
    # FIRST title element wins (browser rule): an svg tooltip <title>
    # later in the page must not append to the document title
    h3 = ("<title>Doc Title</title><body>"
          "<svg><title>svg tooltip</title><circle/></svg></body>")
    assert extract_meta(h3)["title"] == "Doc Title"
    # ...and an svg tooltip that PRECEDES (or substitutes for) the
    # head title must not become the document title either — the
    # skip stack covers svg/math/template subtrees (round-13)
    h4 = ("<body><svg><title>svg tooltip</title><circle/></svg>"
          "<p>x</p></body><title>Late Title</title>")
    assert extract_meta(h4)["title"] == "Late Title"
    h5 = "<svg><title>only tooltip</title></svg><p>body</p>"
    assert extract_meta(h5)["title"] is None
    # metadata inside an inert <template> is not document metadata,
    # and a stray </style> inside it must not end the template scope
    h6 = ("<template></style><meta name=description content=no>"
          "<title>T</title><link rel=canonical href=http://t/>"
          "</template><title>Real</title>"
          '<meta name="description" content="yes">')
    m6 = extract_meta(h6)
    assert m6["title"] == "Real"
    assert m6["description"] == "yes"
    assert m6["canonical"] is None
    # self-closing <svg/> opens no scope
    assert extract_meta("<svg/><title>After</title>")["title"] == "After"
    # UNCLOSED svg/math: a breakout start tag (HTML foreign-content
    # rule) repairs the scope so later metadata is not swallowed...
    h7 = ('<svg><circle r=1><p>content</p><title>Real</title>'
          '<meta name="description" content="d">')
    m7 = extract_meta(h7)
    assert m7["title"] == "Real" and m7["description"] == "d"
    # ...but a title DIRECTLY inside the unclosed svg is still the
    # tooltip (title is legal foreign content — no breakout)
    assert extract_meta("<svg><circle r=1><title>tip</title>")["title"] is None
    # template never breaks out (browsers parse it inertly to </template>)
    assert extract_meta("<template><p>x</p><title>T</title>")["title"] is None


def test_native_extractor_seam():
    """native_extractor resolves an installed native parser for the
    extractor= seam, or raises a NAMING ImportError when none is
    installed (this sandbox) — callers must get an honest skip, not a
    silent stdlib fallback.  When a parser IS present, the callback
    must drop the same non-content subtrees and collapse whitespace."""
    from zeek_duckdb_spark.operators.htmlops import native_extractor

    with pytest.raises(ValueError, match="unknown parser"):
        native_extractor(prefer=("beautifulsoup",))

    try:
        fn = native_extractor()
    except ImportError as exc:
        assert "selectolax" in str(exc) and "lxml" in str(exc)
        pytest.skip("no native HTML parser installed")
    out = fn(
        "<html><head><script>junk()</script><style>p{}</style></head>"
        "<body><p>real   content</p><svg><title>tip</title></svg>"
        "<p>more text</p></body></html>"
    )
    assert "junk" not in out and "p{}" not in out and "tip" not in out
    assert "real content" in out and "more text" in out


def test_extract_meta_html_canonical_dedup(spark):
    """The canonical-URL dedup composition: syndicated copies declare
    the SAME <link rel=canonical>, so grouping on
    coalesce(meta.canonical, url) collapses them BEFORE any content
    hashing — and noindex pages filter out."""
    from zeek_duckdb_spark.operators.htmlops import extract_meta_html

    art = '<link rel="canonical" href="https://orig.example/a"><p>story</p>'
    rows = [
        (1, "https://orig.example/a", art),
        (2, "https://mirror-one.example/copy", art),
        (3, "https://other.example/b", "<p>different article</p>"),
        (4, "https://spam.example/x",
         '<meta name="robots" content="noindex"><p>thin page</p>'),
        (5, "https://null.example/n", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    out = extract_meta_html(df)
    kept = out.filter(
        ~F.coalesce(F.col("meta.noindex"), F.lit(False))
        & F.col("html").isNotNull()
    ).withColumn("dedup_key", F.coalesce(F.col("meta.canonical"), F.col("url")))
    groups = {
        r.dedup_key: set(r.ids)
        for r in kept.groupBy("dedup_key")
        .agg(F.collect_set("doc_id").alias("ids")).collect()
    }
    assert groups["https://orig.example/a"] == {1, 2}   # syndication collapses
    assert groups["https://other.example/b"] == {3}
    assert 4 not in {i for s in groups.values() for i in s}  # noindex dropped
    # NULL html -> NULL struct
    nulls = {r.doc_id: r.meta for r in out.collect()}
    assert nulls[5].title is None and nulls[5].noindex is None
    # zero shuffle on the extraction itself
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
