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


def test_vocab_extension_deterministic_and_disjoint():
    """Sizes > 5000 extend the frozen head without perturbing it;
    extension words are unique and collision-free by construction."""
    from tlhop_library_spark.corpus import build_vocab, heaps_vocab_size

    big = build_vocab(20_000)
    assert big[:5000] == build_vocab(5000)
    assert len(set(big)) == len(big) == 20_000
    assert all(w.startswith("z") for w in big[5000:])
    assert not any("z" in w or "q" in w for w in big[:5000])
    assert big == build_vocab(20_000)  # deterministic
    assert heaps_vocab_size(1_000_000) > 100_000  # the realistic regime
    assert heaps_vocab_size(100) == 5000  # floor for tiny corpora


def test_fast_corpus_writer(tmp_path):
    """Vectorized stress generator: schema-identical to the loop path,
    deterministic, extraction invariant holds, hapax tail present."""
    import pyarrow.parquet as pq

    from tlhop_library_spark.analyzer import py_tokens
    from tlhop_library_spark.corpus import (
        CORPUS_ARROW_SCHEMA,
        write_corpus_parquet_fast,
    )

    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    info = write_corpus_parquet_fast(p1, 3000, vocab_size=30_000)
    write_corpus_parquet_fast(p2, 3000, vocab_size=30_000)
    t = pq.read_table(p1)
    assert t.schema.equals(CORPUS_ARROW_SCHEMA)
    assert t.num_rows == 3000
    assert t.equals(pq.read_table(p2))  # byte-deterministic
    texts = t.column("text").to_pylist()
    htmls = t.column("html").to_pylist()
    # hapax tail: df=1 except where the 1% duplicate-body injection
    # cloned a doc (then the extra occurrences are identical texts)
    by_term: dict[str, list[str]] = {}
    for s in texts:
        for w in s.split():
            if w.startswith("q"):
                by_term.setdefault(w, []).append(s)
    assert len(by_term) > 300
    assert all(len(set(v)) == 1 for v in by_term.values())
    assert sum(len(v) == 1 for v in by_term.values()) > 300  # true df=1
    # extraction invariant on a sample (html carries the same text)
    for h, s in list(zip(htmls, texts))[:50]:
        assert extract_body_text(h.decode("utf-8")) == s
    # analyzer keeps every generated token (all ≥ 3 word chars)
    assert py_tokens(texts[0]) == texts[0].split()
    # include_html=False writes NULL html; text stream is unchanged
    # for the same (n_docs, batch_rows) since html consumes no rng
    p3 = str(tmp_path / "c.parquet")
    write_corpus_parquet_fast(p3, 3000, vocab_size=30_000,
                              include_html=False)
    t3 = pq.read_table(p3)
    assert t3.column("html").null_count == 3000
    assert t3.column("text").to_pylist() == texts
    assert info["vocab_size"] == 30_000


def test_fast_corpus_burstiness(tmp_path):
    """Burst events give torso terms a rare heavy-tailed within-doc tf
    (the Church–Gale burstiness real webtext carries): a few docs are
    ABOUT a term and repeat it many times, while its other postings
    stay tf≈1. This is the distribution block-max pruning exists for —
    iid Zipf draws make every block max flat and unprunable."""
    import collections

    import pyarrow.parquet as pq

    from tlhop_library_spark.corpus import (
        build_vocab,
        write_corpus_parquet_fast,
    )

    vocab = build_vocab(30_000)
    head = set(vocab[:50])  # burst pool starts past the stopword head

    def max_nonhead_tf(path):
        texts = pq.read_table(path).column("text").to_pylist()
        per_term: dict[str, int] = {}
        for s in texts:
            for t, m in collections.Counter(s.split()).items():
                if t not in head and not t.startswith("q"):
                    per_term[t] = max(per_term.get(t, 0), m)
        return per_term

    p = str(tmp_path / "bursty.parquet")
    write_corpus_parquet_fast(p, 2000, vocab_size=30_000)
    bursty = max_nonhead_tf(p)
    big = {t for t, m in bursty.items() if m >= 15}
    assert max(bursty.values()) >= 30  # P(m>=k)=1/k tail reaches deep
    assert len(big) >= 10              # ...across many distinct terms
    pool = set(vocab[50:])
    assert big <= pool                 # bursts respect the pool band
    # bursts off → pure iid Zipf: non-head tf stays Binomial-small
    p0 = str(tmp_path / "iid.parquet")
    write_corpus_parquet_fast(p0, 2000, vocab_size=30_000,
                              bursts_per_doc=0)
    assert max(max_nonhead_tf(p0).values()) < 15
