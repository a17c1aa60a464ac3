"""Operator-library tests over driver testdata + synthetic corpus."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tlhop_library_spark.operators import (
    dedup,
    fingerprints,
    multimodal,
    relational,
    similarity,
)
from tlhop_library_spark.operators import text as text_ops


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_frequency_top(spark, docs):
    out = relational.frequency(docs, "lang", top=3).collect()
    assert len(out) == 3
    assert out[0]["count"] >= out[1]["count"] >= out[2]["count"]


def test_cdf_pdf_sums_to_one(spark, docs):
    out = relational.cdf_pdf(docs, "lang").orderBy("lang").collect()
    assert abs(sum(r["pdf"] for r in out) - 1.0) < 1e-2
    assert abs(out[-1]["cdf"] - 1.0) < 1e-3


def test_cdf_pdf_partitioned_matches_global_at_high_cardinality(spark):
    """10^5-distinct axis: the range-partitioned two-level prefix sum
    must equal the global-window cdf_pdf value for value, and its plan
    must keep the heavy window PARTITIONED (hashpartitioning /
    rangepartitioning) — the single-partition exchange may only carry
    the <=num_partitions offset rows (round-2 verdict #7)."""
    n = 100_000
    df = spark.range(3 * n).select(
        (F.col("id") % n).alias("v")  # 10^5 distinct, 3 rows each
    )
    got = relational.cdf_pdf_partitioned(df, "v", num_partitions=32)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the intra-partition running sum must NOT be a global window
    assert "Window [sum(n)" not in plan or "__pid" in plan
    assert "rangepartitioning" in plan
    exp = relational.cdf_pdf(df, "v")
    a = {r["v"]: (r["n"], r["pdf"], r["cdf"]) for r in got.collect()}
    b = {r["v"]: (r["n"], r["pdf"], r["cdf"]) for r in exp.collect()}
    assert len(a) == n
    assert a == b


def test_null_profile(spark, docs):
    row = relational.null_profile(docs).collect()[0]
    assert row["doc_id"] == docs.count()


def test_top1_per_group_deterministic(spark, docs):
    out = relational.top1_per_group(
        docs.select("lang", "doc_id", "n_chars"), ["lang"], "n_chars", "doc_id"
    )
    pdf = out.toPandas()
    assert pdf["lang"].is_unique


def test_exact_dedup_consistency(spark, docs):
    base = docs.where(F.col("text").isNotNull())
    kept = dedup.dedup_exact(docs).count()
    n_distinct_hash = base.select(F.md5("text")).distinct().count()
    assert kept == n_distinct_hash


def test_jaccard_pairs_symmetric_bounds(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1).collect()
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert 0.1 <= r["jaccard"] <= 1.0


def test_minhash_lsh_contains_exact_dups(spark):
    # identical texts share all bands → must appear as candidates
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon zeta",
                "totally different words here now folks",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    cand = dedup.minhash_lsh_candidates(df, n=3).collect()
    assert any(
        r["doc_a"] == 1 and r["doc_b"] == 2 and r["n_bands"] == dedup.LSH_BANDS
        for r in cand
    )


def test_simhash_identical_and_distinct(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta",
                "alpha beta gamma delta",
                "omega psi chi phi",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    pairs = dedup.simhash_near_dup_pairs(df, max_hamming=0).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]


def test_cosine_topk_self_similarity(spark, emb):
    first = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    out = similarity.cosine_topk(emb, [float(x) for x in first], k=3).collect()
    assert out[0]["vec_id"] == 0
    assert out[0]["cosine"] == pytest.approx(1.0, abs=1e-3)


def test_knn_join_matches_cosine_topk(spark, emb):
    first = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    kn = similarity.knn_join(emb, [(7, first)], k=5).collect()
    ct = similarity.cosine_topk(emb, first, k=5).collect()
    assert [r["vec_id"] for r in kn] == [r["vec_id"] for r in ct]


def test_winnowing_fingerprint_properties(spark):
    """Winnowing guarantees: identical docs → identical sets; a shared
    run of ≥ k+window-1 tokens → ≥1 shared fingerprint; short docs →
    empty set."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, shared + " unique one two three"),
            (2, "other prefix words here " + shared),
            (3, shared + " unique one two three"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: set(r["fingerprints"])
        for r in text_ops.winnowing_fingerprint(df, k=4, window=5).collect()
    }
    assert out[1] == out[3]  # deterministic, content-addressed
    assert out[1] & out[2]   # shared 8-token run ≥ k+window-1
    assert out[4] == set()   # below minimum length


def test_ivf_topk_probe_all_is_exact(spark, emb):
    """Probing every cell must reduce IVF to the exact scorer; the
    query's own cell must recall the self-match at n_probe=1."""
    first = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    exact = similarity.cosine_topk(emb, first, k=5).collect()
    allp = similarity.ivf_topk(
        emb, first, k=5, n_centroids=8, n_probe=8
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in allp] == [
        (r["vec_id"], r["cosine"]) for r in exact
    ]
    one = similarity.ivf_topk(
        emb, first, k=5, n_centroids=8, n_probe=1
    ).collect()
    assert one[0]["vec_id"] == 0  # self lands in the probed cell


def test_ivf_assign_covers_all_cells_boundedly(spark, emb):
    """Cell histogram sanity: every vector assigned exactly once, and
    no cell degenerates to holding (almost) everything."""
    cells = similarity.ivf_assign(emb, n_centroids=8).collect()
    n = len(cells)
    assert n == emb.count()
    from collections import Counter

    hist = Counter(r["cell"] for r in cells)
    assert max(hist.values()) < 0.6 * n


def test_lang_id_markers(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat and the dog ran for this house with that toy",
                "não vou para casa com uma pessoa que por mais",
                "xyzzy plugh foobar",
            ],
        }
    )
    out = {
        r["doc_id"]: r["lang_pred"]
        for r in text_ops.lang_id(spark.createDataFrame(pdf)).collect()
    }
    assert out[1] == "en"
    assert out[2] == "pt"
    assert out[3] == "und"


def test_fingerprints_expr_vs_arrow(spark, docs):
    pats = fingerprints.DEFAULT_PATTERNS
    a = fingerprints.match_expr(
        docs.select("doc_id", "text"), "text", pats
    ).select("doc_id", "fingerprints")
    b = fingerprints.match_arrow(docs, "text", pats)
    pa = {
        r["doc_id"]: sorted(x["name"] for x in r["fingerprints"])
        for r in a.collect()
    }
    pb = {
        r["doc_id"]: sorted(x["name"] for x in r["fingerprints"])
        for r in b.collect()
    }
    assert pa == pb
    assert any(pa.values())  # some docs match something


def test_ranked_topk_equals_window_rank(spark):
    """limit-then-rank must equal rank-then-filter under a total order
    (the substitution every top-k shape now relies on)."""
    from pyspark.sql.window import Window

    df = spark.range(500).select(
        F.col("id"),
        (F.pmod(F.col("id") * 37, F.lit(100))).alias("score"),
    )
    order = [F.desc("score"), F.asc("id")]
    got = relational.ranked_topk(df, order, 17).collect()
    w = Window.orderBy(*order)
    want = (
        df.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 17)
        .collect()
    )
    key = lambda rows: sorted((r["rank"], r["id"], r["score"]) for r in rows)
    assert key(got) == key(want)
    assert len(got) == 17


def test_fingerprints_weighted_confidence(spark):
    """difflib weighting parity (ref fingerprints.py:258-261): the
    weight is the SequenceMatcher matching-block size between the
    cleaned pattern and the matched substring; hits sort by weight
    desc; matches ≤ 2 chars are dropped."""
    import difflib

    df = spark.createDataFrame(
        [
            (1, "the spark engine does stream work"),
            (2, "no"),  # length guard
            (3, "vector pipelines"),
        ],
        "doc_id long, text string",
    )
    pats = [
        ("spark", r"\bspark\b", 0.9),
        ("streamish", r"stream\w*", 0.7),
        ("vec", r"\bvector\b", 0.7),
    ]
    out = {
        r["doc_id"]: r["fingerprints"]
        for r in fingerprints.match_arrow_weighted(df, "text", pats).collect()
    }
    assert out[2] == []
    names1 = [x["name"] for x in out[1]]
    assert set(names1) == {"spark", "streamish"}
    # exact difflib weight for the spark hit: clean pattern "bsparkb"
    # vs matched "spark" → matching block "spark" (size 5)
    spark_hit = next(x for x in out[1] if x["name"] == "spark")
    seq = difflib.SequenceMatcher(None, "bsparkb", "spark")
    assert spark_hit["weight"] == float(
        sum(b.size for b in seq.get_matching_blocks())
    )
    # sorted by weight descending
    weights = [x["weight"] for x in out[1]]
    assert weights == sorted(weights, reverse=True)
    assert [x["name"] for x in out[3]] == ["vec"]


def test_multimodal_features_deterministic(spark):
    media = multimodal.make_media_df(spark, 16)
    f1 = multimodal.extract_features(media).orderBy("media_id").collect()
    f2 = multimodal.extract_features(media).orderBy("media_id").collect()
    assert [r["feature"] for r in f1] == [r["feature"] for r in f2]
    assert all(r["payload_bytes"] > 0 for r in f1)


def test_multimodal_bmp_roundtrip_stats(spark):
    """The oracle-gated generator→decoder round trip: closed-form
    per-image stats, including the top-left pixel that pins BMP's
    bottom-up row order (a sum alone is order-invariant)."""
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: (
            r["width"], r["height"], r["sum_px"], r["top_px"]
        )
        for r in multimodal.media_decode_stats(
            multimodal.synth_bmp_media(docs, limit=30)
        ).collect()
    }
    assert len(got) == 30
    for d in range(30):
        w, h = d % 13 + 1, d % 9 + 1
        s = 3 * w * sum((d + r) % 251 for r in range(h))
        assert got[d] == (w, h, s, d % 251)


def test_multimodal_decode_contract_without_decoder():
    """The decode stub's failure mode is explicit and typed."""
    if multimodal.REAL_DECODE:
        pytest.skip("real decoder installed — covered by the real test")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG fake")


def test_multimodal_resize_plumbing(spark):
    """Resize plumbing works decoder-or-not: image rows only, dims
    clamped to max_side with aspect preserved (metadata path)."""
    media = multimodal.make_media_df(spark, 12)
    out = multimodal.resize_images(
        media, max_side=64, use_real_decode=False
    ).collect()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(out) == n_images > 0
    src_dims = {
        r["media_id"]: (r["width"], r["height"])
        for r in media.where(F.col("kind") == "image").collect()
    }
    for r in out:
        assert max(r["width"], r["height"]) <= 64
        w0, h0 = src_dims[r["media_id"]]
        if max(w0, h0) > 64 and min(w0, h0) > 1:
            # aspect preserved within integer truncation
            assert abs(r["width"] / r["height"] - w0 / h0) < 0.25
        assert len(bytes(r["payload"])) > 0


def _solid_payload(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """A solid-color image every decode tier reads: PNG when PIL is
    installed (exercises the fast path), P6 PPM otherwise (exercises
    the vendored pure codec)."""
    import numpy as np

    from tlhop_library_spark.operators import imagecodec

    arr = np.tile(np.array(rgb, dtype=np.uint8), (h, w, 1))
    if multimodal.REAL_DECODE:
        import io

        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()
    return imagecodec.encode_ppm(arr)


def test_multimodal_real_resize(spark):
    """Real pixel path, decoder-agnostic: PIL thumbnail+PNG when PIL
    exists, pure-Python PPM decode → nearest resize → PPM otherwise."""
    media = spark.createDataFrame(
        [(0, "image", _solid_payload(640, 320, (0, 255, 0)), "image/png",
          640, 320, None)],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.resize_images(media, max_side=128).collect()[0]
    assert (r["width"], r["height"]) == (128, 64)
    arr = multimodal.decode_image(bytes(r["payload"]))
    assert arr.shape == (64, 128, 3)
    assert (arr == [0, 255, 0]).all()


def test_multimodal_real_decode_path(spark):
    """Real decode feeds the featurizer through the identical
    mapInPandas plumbing (no skip: the pure codec covers no-PIL)."""
    media = spark.createDataFrame(
        [(0, "image", _solid_payload(8, 8, (255, 0, 0)), "image/png",
          8, 8, None)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.extract_features(
        media, use_real_decode=True
    ).collect()
    assert rows and len(rows[0]["feature"]) == 16
    # solid red: channel means are exactly (1, 0, 0)
    feat = rows[0]["feature"]
    assert feat[2:8] == [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]


def test_imagecodec_roundtrips():
    """Vendored codec: PPM and BMP round-trip bit-exactly, including
    BMP row padding (odd width), top-down BMP, and nearest resize."""
    import numpy as np

    from tlhop_library_spark.operators import imagecodec as ic

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # odd W → pad
    assert (ic.decode_ppm(ic.encode_ppm(arr)) == arr).all()
    assert (ic.decode_bmp(ic.encode_bmp(arr)) == arr).all()
    # PPM with comments + non-255 maxval
    ppm = b"P6\n# a comment\n2 1\n# another\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    assert ic.decode_ppm(ppm).tolist() == [[[1, 2, 3], [4, 5, 6]]]
    # top-down BMP (negative height) decodes to the same pixels
    import struct

    bmp = bytearray(ic.encode_bmp(arr))
    h = struct.unpack_from("<i", bmp, 22)[0]
    struct.pack_into("<i", bmp, 22, -h)
    rows = np.frombuffer(bytes(bmp[54:]), dtype=np.uint8).reshape(5, -1)
    flipped = bytes(bmp[:54]) + rows[::-1].tobytes()
    assert (ic.decode_bmp(flipped) == arr).all()
    # nearest resize: aspect preserved, never upscales
    big = rng.integers(0, 256, size=(320, 640, 3), dtype=np.uint8)
    small = ic.resize_nearest(big, 128)
    assert small.shape == (64, 128, 3)
    assert ic.resize_nearest(small, 4096).shape == small.shape
    with pytest.raises(ValueError):
        ic.decode_any(b"\x89PNG not a supported pure format")


def test_extension_accessor(spark, docs):
    from tlhop_library_spark.extension import install

    install()
    out = docs.tlhop.frequency("lang", top=2).collect()
    assert len(out) == 2
    topk = docs.tlhop.bm25_topk("spark join", k=5).collect()
    assert len(topk) == 5
    # cleaning accessors route to operators/cleaning.py
    rep = docs.tlhop.gopher_repetition().columns
    assert rep == ["doc_id", "top_ngram_char_frac", "dup_ngram_char_frac"]
    assert "keep" in docs.tlhop.gopher_quality().columns
    assert "n_lines_kept" in docs.tlhop.c4_clean(
        require_terminal_punct=False, min_words_per_line=1, min_lines=1
    ).columns
    assert "n_lines_dropped" in docs.tlhop.line_dedup().columns
    assert docs.tlhop.dup_span_stats(w=3).columns == [
        "doc_id", "n_tokens", "n_dup_windows", "n_covered", "dup_frac",
    ]
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    assert emb.tlhop.semantic_dedup(
        threshold=0.9, n_centroids=2, dim=2
    ).count() == 2
    # web-curation accessors route to operators/web.py + cleaning
    urls = spark.createDataFrame(
        [(1, "https://www.ex.com/p?utm_source=a"), (2, "https://ex.com/p")],
        "doc_id long, url string",
    )
    assert "domain" in urls.tlhop.url_features().columns
    assert urls.tlhop.url_dedup().count() == 1
    assert urls.tlhop.domain_topk(k=1).collect()[0]["domain"] == "ex.com"
    blocked = spark.createDataFrame([("ex.com",)], "domain string")
    assert urls.tlhop.domain_blocklist(blocked).count() == 0
    assert urls.tlhop.domain_temperature_sample(alpha=1.0).count() == 2
    # percolator accessor routes to operators/percolate.py
    pq = spark.createDataFrame(
        [(1, "spark join", None)],
        "query_id long, query_text string, msm int",
    )
    assert docs.tlhop.percolate(pq).columns == [
        "doc_id", "query_id", "matched", "required",
    ]
    assert "text_redacted" in docs.tlhop.redact_pii().columns
    # PQ accessors route to operators/pq.py
    emb4 = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, float(-i)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    cbk = emb4.tlhop.pq_train(m=2, k=2, iters=3, sample_n=6)
    assert cbk.shape == (2, 2, 2)
    enc4 = emb4.tlhop.pq_encode(cbk)
    assert enc4.columns == ["vec_id", "codes"]
    assert enc4.tlhop.pq_topk(cbk, [0.0, 0.0, 1.0, 0.0], k=3).columns \
        == ["rank", "vec_id", "adc_dist"]


def test_webpage_stats_classes(spark):
    from tlhop_library_spark.extension import install

    install()
    df = spark.createDataFrame(
        [
            (1, b"<html>x</html>", "a title"),
            (2, b"<html>x</html>", ""),
            (3, b"", "a title"),
            (4, b"", ""),
            (5, None, None),
        ],
        "doc_id long, html binary, title string",
    )
    got = {
        r["doc_id"]: r["webpage_stats"]
        for r in df.tlhop.describe_html("html", "title").collect()
    }
    assert got == {
        1: "CODE_AND_TITLE", 2: "ONLY_CODE", 3: "ONLY_TITLE",
        4: "BOTH_EMPTY", 5: "BOTH_EMPTY",
    }


def test_screenshot_wrappers(spark):
    from tlhop_library_spark.extension import install

    install()
    opts_json = (
        '{"screenshot": {"labels": ["login"], "mime": "image/png",'
        ' "data": "aGVs\\nbG8="}}'
    )
    df = spark.createDataFrame(
        [(1, opts_json), (2, '{"other": 1}')], "doc_id long, opts string"
    )
    kept = df.tlhop.filter_banners_with_screenshot().collect()
    assert [r["doc_id"] for r in kept] == [1]
    row = df.tlhop.filter_banners_with_screenshot().tlhop.extract_screenshot(
    ).collect()[0]
    assert row["screenshot_labels"] == ["login"]
    # newline stripped from the base64 body, reference tag shape
    assert row["screenshot_img"] == (
        '<img src="data:image/png;base64,aGVsbG8=" >'
    )
    html = df.tlhop.to_html(size=1)
    assert "<table" in html and "doc_id" in html


def test_filter_valid_html_page_and_lang(spark):
    from tlhop_library_spark.extension import install

    install()
    df = spark.createDataFrame(
        [
            (1, "abc123", "200_HTTP_OK", "<html lang='pt-BR'>"),
            (2, "0", "200_HTTP_OK", "<html>"),
            (3, None, "200_HTTP_OK", "<html>"),
            (4, "abc", "404_NOT_FOUND", "<html>"),
        ],
        "doc_id long, html_hash string, http_code string, html string",
    )
    assert [
        r["doc_id"] for r in df.tlhop.filter_valid_html_page().collect()
    ] == [1]
    langs = {
        r["doc_id"]: r["html_lang"]
        for r in df.tlhop.get_html_lang().collect()
    }
    assert langs[1] == "Portuguese" and langs[2] is None


def test_fingerprints_grouped_equals_per_pattern(spark, docs):
    """The per-confidence-class combined-alternation prefilter must be
    a pure optimization: grouped and per-pattern paths return
    IDENTICAL output (including per-row pattern-DB hit order), and a
    non-composable pattern (global inline flag) falls back cleanly."""
    pats = fingerprints.DEFAULT_PATTERNS + [
        ("upper-or-lower", r"(?i)THE\b", 0.5),  # global flag: may not
        # compose into (?:...)|(?:...) — exercises the fallback
        ("digits", r"\d{2,}", 0.9),
    ]
    a = fingerprints.match_arrow(docs, "text", pats, grouped=True)
    b = fingerprints.match_arrow(docs, "text", pats, grouped=False)
    ka = {
        r["doc_id"]: [(x["name"], x["confidence"]) for x in r["fingerprints"]]
        for r in a.collect()
    }
    kb = {
        r["doc_id"]: [(x["name"], x["confidence"]) for x in r["fingerprints"]]
        for r in b.collect()
    }
    assert ka == kb
    assert any(ka.values())
