"""HTML → text extraction (r14): the documented block/inline/drop
rules, entity decoding, tag-soup recovery, and the integer quality
signals. The Spark-side pass sits under the x11_html_extract oracle
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import random
import string
import time

from wwwision_importservice_spark.operators.htmltext import extract_text


def test_html_block_inline_and_drop_rules():
    html = (
        "<html><head><title>My &amp; Title</title><script>var x=1;"
        "</script><style>.a{}</style><meta name='d' content='x'></head>"
        "<body><h1>Head line</h1><p>First para with <b>bold</b> and "
        '<a href="u">a link</a>.</p><div>Second<br/>third</div>'
        "<script>skip()</script><ul><li>one</li><li>two</li></ul>"
        "tail</body></html>"
    )
    m = extract_text(html)
    assert m["text"] == (
        "Head line\nFirst para with bold and a link .\n"
        "Second\nthird\none\ntwo\ntail"
    )
    assert m["title"] == "My & Title"
    assert m["n_links"] == 1 and m["link_text_len"] == len("a link")
    assert m["text_len"] == len(m["text"])
    assert m["html_len"] == len(html)


def test_html_entities_and_whitespace_collapse():
    m = extract_text("<p>a&nbsp;&lt;b&gt;   c\n\t d &#65;</p>")
    # &nbsp; decodes to U+00A0 which \s matches — collapsed like space
    assert m["text"] == "a <b> c d A"
    # head noise outside title is not body text
    m2 = extract_text(
        "<head><title>t</title>stray</head><body>real</body>")
    assert m2["text"] == "real" and m2["title"] == "t"


def test_html_tag_soup_never_raises():
    cases = [
        "",                       # empty
        "no tags at all",
        "<p>unclosed",
        "</div></div>text",       # stray closers
        "<a href='x>broken<p>ok", # unterminated attribute
        "<script>never closed",   # dropped to EOF
        "<<<>>><p>&bogus; &#xZZ; fine</p>",
    ]
    for src in cases:
        m = extract_text(src)
        assert isinstance(m["text"], str), src
    assert extract_text("no tags at all")["text"] == "no tags at all"
    # script content dropped even when the tag never closes
    assert extract_text("<script>never closed")["text"] == ""


def test_html_link_density_signals():
    html = ('<body><p><a href="1">one</a> <a href="2">two</a></p>'
            "<p>plain body text here</p></body>")
    m = extract_text(html)
    assert m["n_links"] == 2
    assert m["link_text_len"] == len("one") + len("two")
    # nav-heavy page: link chars dominate — the signal downstream
    # filters divide
    assert m["link_text_len"] / m["text_len"] < 0.5


def test_html_fuzz_linear_and_total():
    """Random tag soup: extraction never raises and stays fast."""
    rng = random.Random(0x4714)
    alphabet = string.ascii_letters + "<>/&;#\"' ="
    start = time.perf_counter()
    for _ in range(300):
        src = "".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 400)))
        m = extract_text(src)
        assert m["html_len"] == len(src)
    assert time.perf_counter() - start < 10.0
