"""HTML → text extraction: the curation step between WARC ingestion
and text analysis, pure-stdlib (``html.parser``), one Arrow pass.

After :mod:`operators.warc` splits a crawl into HTTP bodies, the next
operator every LLM pipeline runs is "turn the HTML into training
text": drop script/style/template content, keep visible text, insert
block boundaries, and record the structural signals quality filters
consume (link density, text/markup ratio). This module is that step
with DETERMINISTIC, documented rules — the point is not to match any
specific extractor bit-for-bit (trafilatura/jusText are judgment
calls) but to have ONE exactly-specified extraction whose output an
oracle can restate:

- Content of ``script``, ``style``, ``noscript``, ``template``,
  ``svg``, and ``head`` (except ``title``) is dropped entirely.
- Text nodes are entity-decoded (``&amp;`` etc., numeric refs),
  whitespace-collapsed, and stripped; empty nodes vanish.
- BLOCK elements (``p div h1-h6 li ul ol table tr td th br article
  section header footer blockquote pre``) separate text runs with a
  single ``\\n``; inline elements (``a b i em strong span code``)
  join with a single space.
- ``title`` is captured separately (not part of the body text).
- Signals: ``n_links`` (``<a>`` count), ``link_text_len`` (visible
  chars inside anchors — the numerator of link density),
  ``text_len``/``html_len`` (the text-to-markup ratio every
  boilerplate heuristic keys on).

Malformed HTML never raises — ``html.parser`` is a recovering
tokenizer and crawl curation must not die on tag soup; the worst
input degrades to its visible text. Cost is linear in the input.

Scale shape: :func:`html_extract` is one ``mapInPandas`` pass (the
``media_metadata`` posture) — per-document CPU, no shuffle.

Reference parallel: none (records-in/records-out); training-data
extension surface (SURVEY §2 X11 family, with `operators/warc.py`).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame

_DROP = frozenset({"script", "style", "noscript", "template", "svg"})
_BLOCK = frozenset({
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "br", "article", "section", "header",
    "footer", "blockquote", "pre", "hr", "form",
})
_WS = re.compile(r"\s+")


class _Extractor(HTMLParser):
    """One-pass visible-text collector with the module's block/inline
    rules. ``convert_charrefs=True`` (the default) hands us decoded
    entities in ``handle_data`` directly."""

    def __init__(self) -> None:
        super().__init__()
        self.parts: list[str] = []   # text runs, "\n" markers between
        self.title_parts: list[str] = []
        self.drop_depth = 0
        self.in_head = False
        self.in_title = False
        self.anchor_depth = 0
        self.n_links = 0
        self.link_text_len = 0

    def _block_break(self) -> None:
        if self.parts and self.parts[-1] != "\n":
            self.parts.append("\n")

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self.drop_depth += 1
            return
        if tag == "head":
            self.in_head = True
        elif tag == "title":
            self.in_title = True
        elif tag == "a":
            self.n_links += 1
            self.anchor_depth += 1
        if tag in _BLOCK:
            self._block_break()

    def handle_startendtag(self, tag, attrs):
        # <br/> and friends: a block boundary, never a dropper push
        if tag in _BLOCK:
            self._block_break()
        elif tag == "a":
            self.n_links += 1

    def handle_endtag(self, tag):
        if tag in _DROP:
            self.drop_depth = max(0, self.drop_depth - 1)
            return
        if tag == "head":
            self.in_head = False
        elif tag == "title":
            self.in_title = False
        elif tag == "a":
            self.anchor_depth = max(0, self.anchor_depth - 1)
        if tag in _BLOCK:
            self._block_break()

    def handle_data(self, data):
        if self.drop_depth:
            return
        text = _WS.sub(" ", data).strip()
        if not text:
            return
        if self.in_title:
            self.title_parts.append(text)
            return
        if self.in_head:
            return  # meta/link noise outside title is not body text
        if self.anchor_depth:
            self.link_text_len += len(text)
        self.parts.append(text)


def extract_text(html_src: str) -> dict:
    """One HTML document → ``{"text", "title", "n_links",
    "link_text_len", "text_len", "html_len"}`` under the module's
    documented rules. Never raises on tag soup."""
    p = _Extractor()
    try:
        p.feed(html_src)
        p.close()
    except Exception:  # html.parser recovers internally; belt+braces
        pass
    out: list[str] = []
    pending_break = False
    for part in p.parts:
        if part == "\n":
            pending_break = bool(out)
            continue
        if pending_break:
            out.append("\n")
            pending_break = False
        elif out:
            out.append(" ")
        out.append(part)
    text = "".join(out)
    title = " ".join(p.title_parts)
    return {
        "text": text,
        "title": title or None,
        "n_links": p.n_links,
        "link_text_len": p.link_text_len,
        "text_len": len(text),
        "html_len": len(html_src),
    }


def html_extract(
    df: DataFrame, id_col: str, html_col: str = "html"
) -> DataFrame:
    """One Arrow pass over ``(id, html)`` → one typed row per document:

    ``(id, text, title, n_links, link_text_len, text_len, html_len)``

    The downstream quality filter divides ``link_text_len/text_len``
    (link density) and ``text_len/html_len`` (text ratio) itself —
    integers ship, ratios don't, so the row stays oracle-exact."""
    out_schema = (
        f"{id_col} long, text string, title string, n_links int, "
        "link_text_len int, text_len int, html_len int"
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, src in zip(pdf[id_col], pdf[html_col]):
                m = extract_text(str(src))
                rows.append((int(rid), m["text"], m["title"],
                             m["n_links"], m["link_text_len"],
                             m["text_len"], m["html_len"]))
            yield pd.DataFrame(rows, columns=[
                id_col, "text", "title", "n_links", "link_text_len",
                "text_len", "html_len",
            ])

    return df.select(id_col, html_col).mapInPandas(batches, schema=out_schema)


__all__ = ["extract_text", "html_extract"]
