"""Vectorized HTML → text extraction.

Reproduces the reference's ``parser_html_code_udf`` semantics
(``/root/reference/tlhop/library.py:494-537``) without BeautifulSoup
(not installed here): bs4's ``'html.parser'`` builder wraps Python's
stdlib ``html.parser.HTMLParser``, so we implement the same traversal
directly on the stdlib parser:

- ``body`` = text of the FIRST ``<body>`` element, i.e. the stripped
  text nodes inside it joined with a single space —
  ``body[0].get_text(" ", strip=True)`` (``library.py:511-515``);
  missing body → ``""``; falsy/undecodable input → NULL.
- ``description`` / ``keywords`` = leading-space-concatenated ``content``
  of ``<meta>`` tags whose ``name`` contains description/keywords, then
  ``strip()``; empty → NULL (``library.py:520-535``).
- ``code-length`` = len of the raw html with ``(\\s+|\\n+)`` collapsed
  to single spaces (``library.py:517``); ``body-length`` = len(body).

Unlike the reference (a scalar ``@F.udf`` crossing JVM↔Python per row),
this ships as Arrow-batched ``pandas_udf`` columns — the north rule's
"no per-row Python" requirement. The HTML parse itself is inherently
per-string; the win is the Arrow batch transfer + zero pickling.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_WS_RE = re.compile(r"(\s+|\n+)")

HTML_INFO_SCHEMA = StructType(
    [
        StructField("preview_body", StringType(), True),
        StructField("code_length", IntegerType(), True),
        StructField("body_length", IntegerType(), True),
        StructField("keywords", StringType(), True),
        StructField("description", StringType(), True),
    ]
)


class _BodyTextParser(HTMLParser):
    """Collects text nodes of the first <body> element + meta tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.body_depth = 0
        self.seen_body = False
        self.body_done = False
        self.chunks: list[str] = []
        self.meta_description = ""
        self.meta_keywords = ""

    def handle_starttag(self, tag, attrs):
        if tag == "meta":
            d = dict(attrs)
            name = d.get("name") or ""
            if "description" in name:
                self.meta_description += " " + (d.get("content") or "")
            elif "keywords" in name:
                self.meta_keywords += " " + (d.get("content") or "")
        if tag == "body" and not self.body_done:
            if self.body_depth == 0:
                self.seen_body = True
            self.body_depth += 1

    def handle_endtag(self, tag):
        if tag == "body" and self.body_depth > 0:
            self.body_depth -= 1
            if self.body_depth == 0:
                self.body_done = True

    def handle_data(self, data):
        if self.body_depth > 0 and not self.body_done:
            s = data.strip()
            if s:
                self.chunks.append(s)


def parse_html_info(raw: str | None) -> tuple | None:
    """Pure-Python single-doc parse → (preview_body, code_length,
    body_length, keywords, description); None when input is falsy or
    unparseable (reference's NULL-on-failure, ``library.py:505-509``)."""
    if not raw:
        return None
    try:
        p = _BodyTextParser()
        p.feed(raw)
        p.close()
    except Exception:
        return None
    body = " ".join(p.chunks) if p.seen_body else ""
    code_size = _WS_RE.sub(" ", raw)
    desc = p.meta_description.strip() or None
    kw = p.meta_keywords.strip() or None
    return (body, len(code_size), len(body), kw, desc)


def extract_body_text(raw: str | None) -> str | None:
    info = parse_html_info(raw)
    return None if info is None else info[0]


def _decode(b) -> str | None:
    if b is None:
        return None
    if isinstance(b, (bytes, bytearray)):
        try:
            return bytes(b).decode("utf-8")
        except UnicodeDecodeError:
            return None
    return b


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary/string html → extracted body text (Arrow-batched)."""
    return html.map(lambda b: extract_body_text(_decode(b)))


@F.pandas_udf(HTML_INFO_SCHEMA)
def html_info_udf(html: pd.Series) -> pd.DataFrame:
    """binary/string html → full parser_html_code struct (Arrow-batched)."""
    rows = []
    for b in html:
        info = parse_html_info(_decode(b))
        rows.append(
            (None, None, None, None, None) if info is None else info
        )
    return pd.DataFrame(
        rows,
        columns=[
            "preview_body",
            "code_length",
            "body_length",
            "keywords",
            "description",
        ],
    )
