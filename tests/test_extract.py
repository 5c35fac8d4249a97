"""t0 unit tests: canonical extractor + url normalization (FIXTURES.md §1.2)."""

from __future__ import annotations

from linkgraph.extract import extract_links, extract_text, normalize_url


def test_extract_text_strips_tags_scripts_styles():
    html = (
        b"<html><head><title>T</title><script>var x = '<p>no</p>';</script>"
        b"<style>p {color: red}</style></head>"
        b"<body><p>hello   world</p><div>again</div></body></html>"
    )
    assert extract_text(html) == "T hello world again"


def test_extract_text_whitespace_collapse_and_strip():
    assert extract_text(b"  <b>a</b>\n\n<i>b</i>\t c  ") == "a b c"


def test_extract_text_invalid_utf8_replaced():
    assert extract_text(b"<p>ok \xff\xfe</p>") == "ok ��"


def test_extract_text_none_and_empty():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_normalize_url():
    assert normalize_url("HTTPS://Site0.Example/P1#frag") == "https://site0.example/P1"
    assert normalize_url("http://a.b/p?q=1#x") == "http://a.b/p?q=1"
    assert normalize_url("ftp://x.y/z") is None
    assert normalize_url("mailto:a@b.c") is None


def test_extract_links_absolutize_and_order():
    html = (
        b'<a href="https://other.example/p2">x</a>'
        b'<a href="/p9">rel</a>'
        b'<a href="https://dup.example/">d</a>'
        b'<a href="https://dup.example/">d</a>'
        b'<a href="ftp://no.example/">skip</a>'
        b'<a href="https://frag.example/p#sec">f</a>'
    )
    links = extract_links(html, "https://site1.example/p1")
    assert links == [
        "https://other.example/p2",
        "https://site1.example/p9",
        "https://dup.example/",
        "https://dup.example/",  # duplicates preserved (dedup is in the build)
        "https://frag.example/p",
    ]


def test_extract_links_udf_matches_pure(spark):
    from pyspark.sql import functions as F

    from linkgraph.extract import extract_links_udf, extract_text_udf
    from linkgraph.synth import gen_pages_pdf

    pdf = gen_pages_pdf(60)
    sdf = spark.createDataFrame(pdf)
    out = sdf.select(
        "url",
        "html",
        extract_text_udf(F.col("html")).alias("t2"),
        extract_links_udf(F.col("html"), F.col("url")).alias("links"),
        "text",
    ).toPandas()
    # byte-identity invariant (BASELINE.json input_hint)
    assert (out["t2"] == out["text"]).all()
    for _, row in out.iterrows():
        assert list(row["links"]) == extract_links(row["html"], row["url"])


def test_extract_links_attribute_suffix_and_malformed_href():
    """Two extraction hazards from real-web HTML: (1) an attribute whose
    NAME merely ends in 'href' (data-href, xlink:href) must not shadow the
    tag's real href — the lazy prefix match used to capture the tracker
    URL and drop the genuine link; (2) a malformed href that urljoin
    itself cannot split ('http://[bad' — invalid IPv6 bracket) must be
    dropped, not raise out of the Arrow batch and kill the task."""
    from linkgraph.extract import extract_links

    html = (
        b'<a data-href="http://tracker.example/x" href="http://real.example/y">r</a>'
        b'<a href="http://[bad">broken</a>'
        b'<a href="/rel">rel</a>'
    )
    got = extract_links(html, "http://base.example/dir/page")
    assert got == ["http://real.example/y", "http://base.example/rel"]
