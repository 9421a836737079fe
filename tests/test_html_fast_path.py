"""Differential gate for the regex fast path in html_text.

The fast scanner may only ever return a result PROVEN byte-identical to
the ``html.parser`` path (the reference-contract implementation); for
anything outside its subset it must return None and let the parser rule.
These tests pin that equivalence on the synthetic corpus (where the fast
path must also actually engage — the speedup is the point) and on an
adversarial fragment fuzz.
"""

import random

from temporal_knowledge_graphs_ray.functions import html_text as H
from temporal_knowledge_graphs_ray.sources.synth import make_page


def parser_path(html: str) -> str:
    p = H._TextExtractor()
    p.feed(html)
    p.close()
    text = "\n".join(p.parts)
    return "\n".join(ln.strip() for ln in text.splitlines() if ln.strip())


def test_fast_path_identical_and_engaged_on_corpus():
    hits = 0
    for i in range(0, 2000, 7):
        h = make_page(i)["html"]
        if isinstance(h, (bytes, bytearray)):
            h = bytes(h).decode("utf-8", "replace")
        f = H._extract_fast(h)
        assert parser_path(h) == H.extract_text_from_html(h)
        if f is not None:
            assert f == parser_path(h)
            hits += 1
    # the synthetic pages are exactly the simple subset: every one must
    # take the fast path or the optimization has silently died
    assert hits == len(range(0, 2000, 7))


ADVERSARIAL = [
    "<div / >x</div>",
    "<script foo=bar/>alert(1)</script>after",
    "<script/>visible</script>after",
    "<SCRIPT>hidden</SCRIPT>ok",
    '<script>var a="</notscript>";</script>tail',
    "<script>x</ script >y",
    '<a title="a>b">t</a>',
    "<a title='a>b'>t</a>",
    "<!-- c -->text",
    "<!DOCTYPE html><p>x</p>",
    "<?pi?>y",
    "a < b > c",
    "x &amp; y",
    "x &notanentity y",
    "x &#65; y",
    "&amp",
    "<p>line1\nline2</p>",
    "<br/>a<br />b<br>c",
    "<div class=>e</div>",
    "<div class=x>y</div>",
    "<div a=\"1\" b='2'>z</div>",
    "<p>t",
    "<style>p{}</style>s",
    "<style>a</style",
    "<script>never closed",
    '<div\tx="1">q</div>',
    "</div junk>k",
    "<3 hearts",
    "<p>&</p>",
    "<p >sp</p >",
    '<div foo="b/">v</div>',
    "<div/ >w</div>",
    '<x y="a&amp;b">amp-in-attr</x>',
    # end tags whose name merely EXTENDS the cdata element: html.parser
    # emits them as data and stays in CDATA mode until the exact name
    "<script>a</scripty>visible</script>after",
    "<style>x</styler>y</style>z",
    "<script>a</scripty",
    "<script>a</scripty></scripty></script>done",
    "<STYLE>q</STYLEX>r</STYLE>s",
]


def test_fast_path_adversarial_cases():
    for c in ADVERSARIAL:
        f = H._extract_fast(c)
        if f is not None:
            assert f == parser_path(c), c


def test_fast_path_fragment_fuzz():
    random.seed(1337)
    frags = [
        "<div>", "</div>", '<p class="a">', "<script>", "</script>",
        "<style>", "</style>", "text ", " more\n", "&amp;", "&",
        "&lt;x&gt;", "&#65;", "&notreal;", "<", ">", '"', "'", "/",
        "<br/>", "<br />", '<a href="http://x/y">', "</a>", "<!-- x -->",
        "<b foo=bar>", "<i foo=bar/>", "\n", "Ü東", "&amp", "&#x41;",
        "&nbsp;", "</scripty>", "</styler>",
    ]
    n_fast = 0
    for _ in range(5000):
        doc = "".join(random.choices(frags, k=random.randint(1, 12)))
        f = H._extract_fast(doc)
        if f is not None:
            n_fast += 1
            assert f == parser_path(doc), doc
    # the subset isn't vacuous: a healthy share of fuzz docs qualifies
    assert n_fast > 1000
