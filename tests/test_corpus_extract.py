"""Byte-identity invariant: engine extraction(html) == generator text.

Mirrors the reference's ``parser_html_code_udf`` semantics
(/root/reference/tlhop/library.py:494-537); the generator computes
``text`` by independent construction, so this is a real cross-check.
"""

import pandas as pd
from pyspark.sql import functions as F

from tlhop_library_spark.corpus import generate_corpus
from tlhop_library_spark.extract import (
    extract_body_text,
    extract_text_udf,
    html_info_udf,
    parse_html_info,
)


def test_extract_invariant_pure_python():
    c = generate_corpus(400)
    for h, t in zip(c["html"], c["text"]):
        raw = h.decode("utf-8") if h is not None else None
        assert extract_body_text(raw) == t


def test_extract_reference_edge_semantics():
    # falsy input → NULL (library.py:505)
    assert parse_html_info(None) is None
    assert parse_html_info("") is None
    # no body → "" (library.py:514-515)
    assert extract_body_text("<html><p>x</p></html>") == ""
    # meta description/keywords accumulate with leading space then strip
    info = parse_html_info(
        '<html><head><meta name="description" content="a">'
        '<meta name="og:description" content="b">'
        '<meta name="keywords" content="k1, k2"></head>'
        "<body>hi</body></html>"
    )
    assert info[0] == "hi"
    assert info[4] == "a b"  # both names contain "description"
    assert info[3] == "k1, k2"
    # empty meta → None (library.py:527-535)
    info2 = parse_html_info("<html><body>x</body></html>")
    assert info2[3] is None and info2[4] is None
    # code-length: whitespace collapsed (library.py:517)
    raw = "<html>\n\n<body>a  b</body>\n</html>"
    info3 = parse_html_info(raw)
    import re
    assert info3[1] == len(re.sub(r"(\s+|\n+)", " ", raw))
    assert info3[2] == len("a  b")


def test_extract_invariant_spark(spark, corpus_df):
    got = corpus_df.select(
        "doc_id",
        "text",
        extract_text_udf(F.col("html")).alias("extracted"),
    ).toPandas()
    mism = got[
        ~(
            (got["text"].isna() & got["extracted"].isna())
            | (got["text"] == got["extracted"])
        )
    ]
    assert len(mism) == 0, mism.head()


def test_html_info_struct_spark(spark, corpus_df):
    row = (
        corpus_df.where(F.col("doc_id") == 5)
        .select(html_info_udf(F.col("html")).alias("info"))
        .collect()[0]["info"]
    )
    assert row["preview_body"] is not None
    assert row["body_length"] == len(row["preview_body"])
    assert row["description"] is not None


def test_corpus_determinism():
    a = generate_corpus(100)
    b = generate_corpus(100)
    assert a == b


def test_corpus_edge_rows():
    c = generate_corpus(50)
    assert c["html"][0] is None and c["text"][0] is None
    assert c["text"][1] == ""  # no body
    assert c["text"][2] == ""  # empty body
    assert "broken page unclosed" in c["text"][3]
    assert "página" in c["text"][4]
