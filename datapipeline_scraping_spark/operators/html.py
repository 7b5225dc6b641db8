"""Lenient HTML detail extraction — the engine form of the reference's
lxml-based detail parser (``src/scrapers/detail_parser.py:18-91``:
parse malformed HTML, take a field's text content or attribute, apply
an optional regex post-capture, absolutize link URLs, de-dup).

lxml is not in this container; the stdlib ``html.parser`` is equally
lenient about real-world tag soup (unclosed/uppercase tags, unquoted
attributes) and needs no codec. Parsing runs in an Arrow-batched
``mapInPandas`` seam — the same seam shape as the LLM backend and
media decode: per-row Python work batched by Arrow, never a
row-at-a-time UDF.

Scale: the parse is embarrassingly row-parallel; the blob/html column
is projected away immediately after extraction so no shuffle ever
carries raw HTML. At 100 TB the only knob that matters is input split
size (html bodies are big rows — lower
``spark.sql.files.maxPartitionBytes`` if a scrape corpus has MB-size
pages).
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# block-level tags that implicitly terminate an unclosed <h1>, the way
# lxml/libxml2 auto-close headings at block boundaries — without this,
# tag soup like '<h1>Title<p>body...' (no </h1>) would swallow the
# whole document into the title
_H1_CLOSERS = frozenset(
    "h1 h2 h3 h4 h5 h6 p div section article table ul ol li form "
    "footer header main aside".split()
)


class _DetailExtractor(HTMLParser):
    """First <h1> text content, every <a href>, and the full document
    text — the three primitives the reference's field specs compose
    (text_content / attr / regex-over-full-text)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.links: list[str] = []
        self.text_parts: list[str] = []
        self._in_h1 = 0
        self._h1_done = False

    def _close_h1(self) -> None:
        if self._in_h1:
            self._in_h1 = 0
            self._h1_done = True

    def handle_starttag(self, tag, attrs):
        if tag == "h1":
            if self._in_h1:
                self._close_h1()  # nested/h1-in-h1 soup: close the first
            elif not self._h1_done:
                self._in_h1 += 1
        elif self._in_h1 and tag in _H1_CLOSERS:
            self._close_h1()  # implicit close at a block boundary
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v.strip())

    def handle_endtag(self, tag):
        if tag == "h1" and self._in_h1:
            self._close_h1()

    def handle_data(self, data):
        self.text_parts.append(data)
        if self._in_h1 and not self._h1_done:
            self.title_parts.append(data)


def _extract_one(body: str) -> tuple[str, list[str], str]:
    p = _DetailExtractor()
    p.feed(body or "")
    p.close()
    return (
        "".join(p.title_parts).strip(),
        p.links,
        "".join(p.text_parts),
    )


def parse_html_details(df: DataFrame, html_col: str, id_col: str) -> DataFrame:
    """(id, title, links, full_text) extracted from malformed HTML via
    the lenient stdlib parser. Regex post-capture / URL absolutization
    compose downstream as ordinary column expressions (the reference's
    ``regex`` and ``urljoin`` steps, P5/P17)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            titles, links, texts = [], [], []
            for body in pdf[html_col]:
                t, ls, tx = _extract_one(body)
                titles.append(t)
                links.append(ls)
                texts.append(tx)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "title": titles,
                    "links": links,
                    "full_text": texts,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    # project to (id, html) first (r16, guide §4.1): mapInPandas is
    # opaque to column pruning — any extra caller columns would cross
    # the Arrow boundary and be dropped by the output schema anyway
    df = df.select(F.col(id_col), F.col(html_col))
    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} {id_type}, title string, links array<string>, "
            "full_text string"
        ),
    )
