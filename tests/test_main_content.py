"""Link-density main-content classification (DOM heuristics)."""

from nmalign_spark.sources.segments import (extract_blocks,
                                            extract_main_content,
                                            main_content_df)

HTML = b"""<html><head><title>x</title><script>nav()</script></head><body>
<nav><a href=/>Home</a> <a href=/a>About</a> <a href=/c>Contact</a></nav>
<div class=teaser><a href=/1>Read this great related article now</a></div>
<p>This is the real article body with substantial prose and no links at all.</p>
<p>Another paragraph of genuine content, see <a href=/ref>one reference</a>
among much longer text that dominates the block easily.</p>
<div><a href=/x>Share</a> <a href=/y>Tweet</a> <a href=/z>Pin</a></div>
<footer><a href=/imprint>Imprint</a> &copy; 2025</footer></body></html>"""


def test_blocks_track_link_chars():
    blocks = extract_blocks(HTML)
    by_text = {t: (n, link) for t, n, link in blocks}
    nav = by_text["Home About Contact"]
    assert nav[1] / nav[0] > 0.8                      # nav is link-dominated
    body = by_text["This is the real article body with substantial "
                   "prose and no links at all."]
    assert body[1] == 0


def test_main_content_keeps_prose_drops_boilerplate():
    segs = extract_main_content(HTML)
    assert len(segs) == 2
    assert all("article" in s or "genuine content" in s for s in segs)
    # nav, teaser, share bar, footer all gone
    assert not any("Home" in s or "Share" in s or "Imprint" in s for s in segs)


def test_link_chars_never_exceed_text():
    blocks = extract_blocks(b"<p><a href=/>x</a>&nbsp;</p>")
    for _, n, link in blocks:
        assert 0 <= link <= n


def test_degenerate_inputs():
    assert extract_main_content(None) == []
    assert extract_main_content(b"") == []
    assert extract_main_content(b"no tags at all but a long enough line") \
        == ["no tags at all but a long enough line"]


def test_main_content_df_spark(spark):
    pages = spark.createDataFrame([("u1", HTML)], "url string, html binary")
    pdf = main_content_df(pages).toPandas()
    assert len(pdf) == 2
    assert list(pdf["seq_no"]) == [0, 1]
    assert (pdf["link_density"] <= 0.4).all()


def test_content_equal_to_tag_name_survives():
    """Positional (not value-based) split: a block whose text equals a tag
    name must not vanish."""
    segs = extract_main_content(b"<p>blockquote</p><p>Real content here.</p>")
    assert "blockquote" in segs
    assert "Real content here." in segs
