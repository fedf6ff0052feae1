"""S1 extraction: byte-identical gate + determinism/idempotence
(SURVEY §5.2 item 1)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dbpedia_spotlight_spark.functions.extraction import strip_html


def test_basic_strip():
    html = b"<html><body><p>Hello &amp; goodbye</p><p>Second  line</p></body></html>"
    assert strip_html(html) == "Hello & goodbye\nSecond line"


def test_script_style_dropped():
    html = "<p>keep</p><script>var x = '<p>no</p>';</script><style>p{}</style><p>tail</p>"
    assert strip_html(html) == "keep\ntail"


def test_nested_skip_tags():
    html = "<p>a</p><script>x<script>y</script>z</script><p>b</p>"
    out = strip_html(html)
    assert "a" in out and "b" in out and "x" not in out


def test_inline_tags_preserve_spacing():
    html = "<p>one <b>two</b> <i>three</i> four</p>"
    assert strip_html(html) == "one two three four"


def test_entities_unescaped():
    assert strip_html("<p>a &lt; b &amp;&amp; c &gt; d</p>") == "a < b && c > d"


def test_malformed_total():
    assert isinstance(strip_html("<p>open<div <<< &bogus; <b"), str)
    assert strip_html(b"\xff\xfe<p>x</p>")  # undecodable bytes degrade, not crash


def test_bytes_and_str_agree():
    h = "<p>héllo wörld</p>"
    assert strip_html(h) == strip_html(h.encode("utf-8"))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_idempotent_when_no_markup_remains(s):
    # True idempotence only holds when the first pass left no '<' (a
    # stripped page can legitimately contain literal '<' from &lt;).
    once = strip_html(s)
    if "<" not in once and "&" not in once:
        assert strip_html(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="<>&\x00"), max_size=300))
def test_escaped_roundtrip(s):
    """escape → wrap → strip reproduces the whitespace-normalized text."""
    esc = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    out = strip_html(f"<p>{esc}</p>")
    norm = "\n".join(
        line for line in (" ".join(l.split()) for l in s.split("\n")) if line
    )
    assert out == norm


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="<>&"), max_size=300))
def test_deterministic(s):
    html = f"<p>{s}</p>"
    assert strip_html(html) == strip_html(html)


def test_corpus_column_is_byte_identical(corpus):
    """The generated corpus' text column equals strip_html(html) exactly —
    the per-row invariant from BASELINE.json input_hint."""
    web_pages, _ = corpus
    for _, row in web_pages.iterrows():
        assert strip_html(row["html"]) == row["text"]


# ---------------------------------------------------------------------------
# charset sniffing (functions/charset.py)
# ---------------------------------------------------------------------------

def test_sniff_charset_cascade_branches():
    from dbpedia_spotlight_spark.functions.charset import sniff_charset
    assert sniff_charset(b"\xef\xbb\xbf<html>hi") == "utf-8-sig"
    assert sniff_charset(b"\xff\xfeh\x00i\x00") == "utf-16-le"
    assert sniff_charset(b"\xfe\xff\x00h\x00i") == "utf-16-be"
    assert sniff_charset(b"<meta charset=utf-8>x") == "utf-8"
    assert sniff_charset(b"<meta charset=windows-1252>x") == "windows-1252"
    assert sniff_charset(b"<meta charset=iso-8859-1>x") == "iso-8859-1"
    assert sniff_charset(b"plain ascii") == "utf-8"
    assert sniff_charset("café".encode()) == "utf-8"   # valid multibyte
    assert sniff_charset(b"caf\xe9") == "windows-1252"      # invalid utf-8


def test_sniff_charset_bom_beats_meta_and_head_window():
    from dbpedia_spotlight_spark.functions.charset import (
        HEAD_BYTES, sniff_charset)
    # BOM wins over a contradicting declaration
    assert sniff_charset(
        b"\xef\xbb\xbf<meta charset=windows-1252>") == "utf-8-sig"
    # declaration beyond the head window is ignored
    late = b"x" * HEAD_BYTES + b"<meta charset=windows-1252>"
    assert sniff_charset(late) == "utf-8"
    # menu priority is fixed, not document order
    both = b"<meta charset=windows-1252><meta charset=utf-8>"
    assert sniff_charset(both) == "utf-8"


def test_decode_html_roundtrips_each_codec():
    from dbpedia_spotlight_spark.functions.charset import decode_html
    assert decode_html("héllo".encode("utf-8-sig")) == "héllo"
    assert decode_html("héllo".encode("utf-16")) == "héllo"
    assert decode_html(b"caf\xe9 \x93q\x94") == "café “q”"
    meta = b"<p charset=iso-8859-1>caf\xe9"
    assert decode_html(meta) == "<p charset=iso-8859-1>café"
    # undecodable bytes degrade, never raise
    assert "�" in decode_html(b"\xff\xfe\x00")  # odd utf-16 tail


def test_detect_charset_dataframe_op(spark):
    import pandas as pd
    from dbpedia_spotlight_spark.functions.charset import (
        decode_pages, detect_charset)
    rows = pd.DataFrame({
        "url": ["a", "b", "c"],
        "html": [b"\xef\xbb\xbfx", b"ascii only", b"caf\xe9"],
    })
    df = spark.createDataFrame(rows)
    got = {r["url"]: r["charset"]
           for r in detect_charset(df).collect()}
    assert got == {"a": "utf-8-sig", "b": "ascii only" and "utf-8",
                   "c": "windows-1252"}
    texts = {r["url"]: r["text"] for r in decode_pages(df).collect()}
    assert texts["c"] == "café"


# ---------------------------------------------------------------------------
# Fast-path scanner ≡ stock html.parser (byte-identity of the frozen spec)
# ---------------------------------------------------------------------------


NASTY_HTML = [
    '<p>a<b>c', '<p >x</p >', '<a href="a>b">t</a>', "<a href='a<b'>t</a>",
    '<br/><BR/><P>up</P>', '<script>1<2</script>after',
    '<script>x</scripty></script>ok', '<script x>1</script>z',
    '<!-- c -- >text', '<!doctype html><p>d</p>', '<?pi?>x', '<p>a < b</p>',
    '<p>&amp;&lt;&gt;&#65;&unknown;</p>', 'a&ampb', '&amp', '<>x', '< p>y',
    '<noscript><p>hid</p></noscript>vis', '<template>z</template>q',
    '<NoScript>a</NOSCRIPT>b', '<div a=b/>t', '<div a=b/ >u',
    '<p class=>e</p>', '<p\tclass="x">f</p>', '<a b="c" d>g</a>',
    '<style>.a{}</style>tail', '<p>truncated<', '<p>end<!',
    '<ul><li>1<li>2</ul>', '<p><p><p>', '</p stray>x', '<p@ x=1>y',
    '<script></SCRIPT>v', '<script>a</ script>w', '<em>inline</em> ok',
    '<a ="x">q', '<a "b>">r', '<a b=c/>s', '<noscript><p>x</noscript>',
    '<script><p></script>done', '<!bogus>t', '<![CDATA[x]]>u',
    '<a b="x>y">z', "<a b='x>y'>z", '<a b = "x">w', '<a b=="x">v',
    '<p b=>k', '<script src="a>b">x</script>tail2',
]


def test_fast_path_matches_stock_on_nasty_battery():
    """Every handcrafted adversarial input: the fast path either
    answers byte-identically to the stock parser or abstains (None),
    never answers differently."""
    from dbpedia_spotlight_spark.functions.extraction import (
        _strip_fast, _strip_stock)

    abstained = 0
    for h in NASTY_HTML:
        fast = _strip_fast(h)
        if fast is None:
            abstained += 1
        else:
            assert fast == _strip_stock(h), h
    # the subset is real: most of the battery IS inside it
    assert abstained < len(NASTY_HTML) // 2


def test_fast_path_covers_the_synthetic_corpus(corpus):
    """The benchmark corpus must ride the fast path (no fallback) and
    stay byte-identical to the golden text column."""
    from dbpedia_spotlight_spark.functions.extraction import _strip_fast

    pages = corpus[0] if isinstance(corpus, tuple) else corpus
    for h, t in zip(pages["html"], pages["text"]):
        fast = _strip_fast(bytes(h).decode("utf-8", errors="replace"))
        assert fast is not None and fast == t


def test_fast_path_differential_fuzz_seeded():
    """120k seeded random HTML-ish strings: fast path never disagrees
    with the stock parser (it may abstain)."""
    import random

    from dbpedia_spotlight_spark.functions.extraction import (
        _strip_fast, _strip_stock)

    rng = random.Random(7)
    alphabet = list("<>/!?&;ab c\"'=-\npP") + [
        "<p>", "</p>", "<script>", "</script>", "&amp;", "<!--", "-->",
        "<b>", '="x"', "='y>z'", 'href="a>b"', "<a ", "<div", "/>",
        "<!doctype html>", "<?pi?>", "<style>", "</style>",
        "<noscript>", "</noscript>"]
    for _ in range(120000):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 40)))
        fast = _strip_fast(s)
        if fast is not None:
            assert fast == _strip_stock(s), repr(s)


@given(st.lists(
    st.sampled_from(list("<>/!?&;ab c\"'=-\npP") + [
        "<p>", "</p>", "<script>", "</script>", "&amp;", "<!--",
        "-->", '="x"', 'href="a>b"']),
    max_size=30).map("".join))
@settings(max_examples=400, deadline=None)
def test_fast_path_differential_property(s):
    from dbpedia_spotlight_spark.functions.extraction import (
        _strip_fast, _strip_stock)

    fast = _strip_fast(s)
    if fast is not None:
        assert fast == _strip_stock(s)
