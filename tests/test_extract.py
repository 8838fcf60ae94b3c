"""HTML->text extraction byte-identity vectors (FIXTURES.md §3; the
north-rule invariant from BASELINE.json input_hint)."""

import pytest

from gencore_ray.corpus import generate_pages
from gencore_ray.extract import extract_text

VECTORS = [
    # (html, expected text)
    ("<html><body><p>hello world</p></body></html>", "hello world"),
    ("<p>one</p><p>two</p>", "one\n\ntwo"),
    ("<p>  spaced   out  </p>", "spaced out"),
    ("<p>a\nb\t c</p>", "a b c"),
    ("<script>var x = '<p>not text</p>';</script><p>real</p>", "real"),
    ("<style>p { color: red }</style><p>styled</p>", "styled"),
    ("<head><title>skip me</title></head><body><p>keep</p></body>", "keep"),
    ("<p>AT&amp;T &lt;3 &gt;2 &quot;q&quot;</p>", 'AT&T <3 >2 "q"'),
    ("<p>caf&eacute; &#233;t&#xE9;</p>", "café été"),
    ("<nav><a href='/'>Home</a></nav><p>content</p>", "content"),
    ("<footer>© 2024</footer><p>body text</p>", "body text"),
    ("<div>block a</div><div>block b</div>", "block a\n\nblock b"),
    ("<p>line<br>break</p>", "line\n\nbreak"),
    ("<ul><li>x</li><li>y</li></ul>", "x\n\ny"),
    ("<p></p><p>only</p><p>  </p>", "only"),
    ("<p>unicode ✓ ümlaut</p>", "unicode ✓ ümlaut"),
    ("", ""),
    ("just bare text", "just bare text"),
    ("<!-- comment --><p>after</p>", "after"),
]


@pytest.mark.parametrize("html,expected", VECTORS)
def test_extract_vectors(html, expected):
    assert extract_text(html) == expected


def test_extract_bytes_input():
    assert extract_text("<p>bytes ümlaut</p>".encode("utf-8")) == "bytes ümlaut"


def test_corpus_byte_identity():
    """Every generated page's html must extract to its text column,
    byte-for-byte (BASELINE.json: 'byte-identical extracted text per url')."""
    pages = generate_pages(250, seed=42)
    for h, t in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text(h) == t


def test_corpus_deterministic():
    a = generate_pages(100, seed=42)
    b = generate_pages(100, seed=42)
    assert a.equals(b)
    c = generate_pages(100, seed=43)
    assert not a.equals(c)
