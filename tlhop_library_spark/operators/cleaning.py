"""Web-corpus cleaning operators for a training-data pipeline:
Gopher-style repetition statistics, Gopher-style per-rule quality
flags, and cross-document boilerplate line removal (CCNet-style
paragraph dedup).

References (public): Rae et al., "Scaling Language Models: Methods,
Analysis & Insights from Training Gopher" (arXiv:2112.11446, App. A
repetition/quality filters); Wenzek et al., "CCNet" (arXiv:1911.00359,
paragraph-level dedup); Raffel et al., "C4" (arXiv:1910.10683, line
rules). The reference engine has no equivalent — these extend the
training-data-prep surface mandated by the build brief.

All plans are declarative DataFrame expressions (pure JVM, no Python
on the hot path), each with a line-for-line DuckDB oracle in
``__spark_entry__.oracle_sql()``.

Scale shapes:
- ngram repetition: one posexplode → per-(doc, ngram) hash agg → one
  per-doc agg; the dup-position pass joins (doc_id, pos) keys that
  are co-partitioned by doc_id. Windows are PARTITIONED by doc_id —
  never global.
- quality flags: stateless per-row expressions over the scan; no
  shuffle at all.
- line dedup: line-hash doc-frequency agg (map-side partial) →
  broadcast-or-shuffle semi-join back, per-doc reassembly agg. The
  boilerplate side (lines with df ≥ min_df) is vocabulary-sized, not
  corpus-sized, so at 100 TB it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tlhop_library_spark.analyzer import tokens_col

ROUND = 4


def ngram_repetition_stats(
    docs: DataFrame, n_top: int = 2, n_dup: int = 5
) -> DataFrame:
    """Gopher repetition statistics per document (arXiv:2112.11446
    Table A1 rows 4-13, re-expressed over the library analyzer).

    Returns (doc_id, top_ngram_char_frac, dup_ngram_char_frac):

    - ``top_ngram_char_frac``: fraction of token characters covered
      by the single most-covering ``n_top``-gram, i.e.
      ``max_g count(g) * chars(g) / total_chars`` where ``chars(g)``
      is the summed token length of the gram and ``total_chars`` the
      summed length of all tokens. (Gopher's "fraction of characters
      in the most frequent n-gram"; maximizing coverage directly
      makes ties deterministic.)
    - ``dup_ngram_char_frac``: fraction of token characters at
      positions covered by any ``n_dup``-gram that occurs more than
      once in the document (Gopher's "fraction of characters in
      duplicated n-grams", with the standard position-union overlap
      rule).

    Documents with fewer than ``n`` tokens have no n-grams: the
    corresponding fraction is 0.0. Fractions are rounded to 4
    decimals. Plan shape: tokenize → posexplode once per pass →
    doc-partitioned aggs; every shuffle is keyed by doc_id (or
    (doc_id, ngram) which refines it), so a 1000-executor run scales
    with the corpus, not the vocabulary.
    """
    toks = docs.where(F.col("text").isNotNull()).select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    base = toks.select(
        "doc_id",
        "toks",
        F.aggregate(
            F.transform("toks", lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )

    def grams(n: int) -> DataFrame:
        # (doc_id, pos, gram, gram_chars) for every n-gram, pos 0-based
        g = base.where(F.size("toks") >= n).select(
            "doc_id",
            "total_chars",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.slice("toks", i + 1, n),
                )
            ).alias("pos", "gram_toks"),
        )
        return g.select(
            "doc_id",
            "total_chars",
            "pos",
            F.array_join("gram_toks", " ").alias("gram"),
            F.aggregate(
                F.transform("gram_toks", lambda t: F.length(t)),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("gram_chars"),
        )

    top = (
        grams(n_top)
        .groupBy("doc_id", "gram", "gram_chars", "total_chars")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max(F.col("c") * F.col("gram_chars"))
                / F.max("total_chars"),
                ROUND,
            ).alias("top_ngram_char_frac")
        )
    )

    gd = grams(n_dup)
    w = Window.partitionBy("doc_id", "gram")
    covered = (
        gd.withColumn("c", F.count("*").over(w))
        .where(F.col("c") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n_dup - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    toklens = base.select(
        "doc_id",
        "total_chars",
        F.posexplode(F.transform("toks", lambda t: F.length(t))).alias(
            "tpos", "tlen"
        ),
    )
    dup = (
        covered.join(toklens, ["doc_id", "tpos"])
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("tlen") / F.max("total_chars"), ROUND).alias(
                "dup_ngram_char_frac"
            )
        )
    )

    return (
        base.select("doc_id")
        .join(top, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top_ngram_char_frac", F.lit(0.0)).alias(
                "top_ngram_char_frac"
            ),
            F.coalesce("dup_ngram_char_frac", F.lit(0.0)).alias(
                "dup_ngram_char_frac"
            ),
        )
    )


def gopher_quality_flags(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.80,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style per-rule quality flags (arXiv:2112.11446 A1.1),
    over whitespace words (Gopher filters pre-tokenizer text, so this
    intentionally does NOT use the index analyzer).

    Returns one row per input doc:
    (doc_id, n_words, mean_word_len, alpha_word_frac, stopword_hits,
    ok_n_words, ok_word_len, ok_alpha, ok_stopwords, keep) where
    ``keep`` is the conjunction of the four rule flags. Gopher's
    bullet/ellipsis line-level rules are line-structure dependent and
    live in :func:`line_dedup` territory; symbol-ratio is subsumed by
    ``alpha_word_frac`` for the corpora this library targets.

    Plan shape: stateless per-row expressions over the scan — no
    shuffle, no Python; filters compose with partition pruning.
    """
    from tlhop_library_spark.operators.text import STOPWORDS

    words = F.split(F.trim(F.col("text")), r"\s+")
    words = F.filter(words, lambda t: t != "")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    d = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.round(
            F.aggregate(
                F.transform(words, lambda t: F.length(t)),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.greatest(F.size(words), F.lit(1)),
            ROUND,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter(words, lambda t: t.rlike("\\p{L}")))
            / F.greatest(F.size(words), F.lit(1)),
            ROUND,
        ).alias("alpha_word_frac"),
        F.size(
            F.filter(words, lambda t: F.array_contains(sw, F.lower(t)))
        ).cast("long").alias("stopword_hits"),
    )
    return d.select(
        "*",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words))
        .alias("ok_n_words"),
        (
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
        ).alias("ok_word_len"),
        (F.col("alpha_word_frac") >= min_alpha_word_frac).alias("ok_alpha"),
        (F.col("stopword_hits") >= min_stopword_hits).alias("ok_stopwords"),
    ).select(
        "*",
        (
            F.col("ok_n_words")
            & F.col("ok_word_len")
            & F.col("ok_alpha")
            & F.col("ok_stopwords")
        ).alias("keep"),
    )


def c4_clean(
    docs: DataFrame,
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    drop_line_words: tuple = ("javascript",),
    drop_doc_substrings: tuple = ("lorem ipsum", "{"),
    min_lines: int = 3,
    delim: str = "\n",
) -> DataFrame:
    """C4 cleaning rules (Raffel et al., arXiv:1910.10683 §2.2) as one
    stateless row-local plan — no shuffle, no Python, composes with
    partition pruning at any scale.

    Line rules (a line failing any is dropped):
    - at least ``min_words_per_line`` whitespace words;
    - ends in a terminal punctuation mark (``. ! ? "``) when
      ``require_terminal_punct``;
    - contains none of ``drop_line_words`` (case-insensitive).

    Document rules (a doc failing any is dropped entirely):
    - raw text contains none of ``drop_doc_substrings``
      (case-insensitive — C4's "lorem ipsum" / curly-brace rules);
    - at least ``min_lines`` lines survive the line rules.

    Returns (doc_id, text, n_lines_kept, n_lines_dropped) for the
    surviving documents, text reassembled in original line order.
    """
    def line_ok(ln):
        words = F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != "")
        ok = F.size(words) >= min_words_per_line
        if require_terminal_punct:
            ok = ok & F.trim(ln).rlike('[.!?"]$')
        for w in drop_line_words:
            ok = ok & ~F.lower(ln).contains(w.lower())
        return ok

    d = docs.where(F.col("text").isNotNull())
    for s in drop_doc_substrings:
        d = d.where(~F.lower(F.col("text")).contains(s.lower()))
    d = d.select(
        "doc_id",
        F.split(F.col("text"), delim, -1).alias("all_lines"),
    ).select(
        "doc_id",
        F.size("all_lines").cast("long").alias("n_lines_in"),
        F.filter("all_lines", line_ok).alias("kept_lines"),
    )
    return d.where(F.size("kept_lines") >= min_lines).select(
        "doc_id",
        F.array_join("kept_lines", delim).alias("text"),
        F.size("kept_lines").cast("long").alias("n_lines_kept"),
        (F.col("n_lines_in") - F.size("kept_lines")).alias(
            "n_lines_dropped"
        ),
    )


def line_dedup(
    docs: DataFrame,
    min_df: int = 2,
    delim: str = "\n",
    per_source: bool = False,
) -> DataFrame:
    """Cross-document boilerplate line removal (CCNet-style paragraph
    dedup, arXiv:1911.00359 §3.1): drop every line whose trimmed form
    appears in at least ``min_df`` DISTINCT documents, then reassemble
    the survivors in original order.

    ``per_source=True`` scopes the document-frequency count to the
    ``source`` column (boilerplate is usually site-templated — nav
    bars, footers — so per-domain counting both sharpens the signal
    and shrinks the shuffle key space).

    Returns (doc_id, text, n_lines_kept, n_lines_dropped); a document
    whose every line is boilerplate survives with text ''. Blank
    lines (trim = '') are neither counted nor dropped — they are
    structural, not content.

    Scale shape: one posexplode → doc-frequency hash agg keyed by the
    line (map-side partial combine) → the boilerplate set (df ≥
    min_df) is a small fraction of distinct lines, so the drop join
    is broadcast-able; reassembly is one per-doc agg with an
    order-restoring ``array_sort`` (no window).
    """
    scope = ["source"] if per_source else []
    lines = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        *scope,
        F.posexplode(F.split(F.col("text"), delim, -1)).alias(
            "pos", "line"
        ),
    ).withColumn("key", F.trim(F.col("line")))
    content = lines.where(F.col("key") != "")

    boiler = (
        content.groupBy(*scope, "key")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= min_df)
        .select(*scope, "key")
    )

    kept_content = content.join(boiler, [*scope, "key"], "left_anti")
    kept = lines.where(F.col("key") == "").select(
        "doc_id", "pos", "line"
    ).unionByName(kept_content.select("doc_id", "pos", "line"))

    n_in = lines.groupBy("doc_id").agg(
        F.count("*").alias("n_lines_in")
    )
    out = (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
                delim,
            ).alias("text"),
            F.count("*").alias("n_lines_kept"),
        )
    )
    return (
        n_in.join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (
                F.col("n_lines_in")
                - F.coalesce("n_lines_kept", F.lit(0))
            ).alias("n_lines_dropped"),
        )
    )


def duplicated_span_stats(
    docs: DataFrame,
    w: int = 8,
    min_df: int = 2,
    hashed_grams: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-span coverage per document — the
    Spark-shaped approximation of exact-substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): instead of a corpus suffix array, slide a
    ``w``-token window over each document and mark a window
    *duplicated* when the identical window text occurs in at least
    ``min_df`` DISTINCT documents.

    Returns ``(doc_id, n_tokens, n_dup_windows, n_covered,
    dup_frac)`` where ``n_covered`` is the size of the position-union
    of all duplicated windows and ``dup_frac = n_covered /
    n_tokens`` — a direct filter axis (``dup_frac <= x``) for a
    training-data funnel, and the per-doc signal you'd use to cut the
    spans themselves.

    Scale shape (all JVM, no Python): posexplode of per-doc windows
    (rows ≈ corpus tokens — the same budget as the shingle pipeline);
    window doc-frequency is ONE hash agg with map-side partials keyed
    by the gram; the dup set (df ≥ min_df) is boilerplate-vocabulary-
    sized, so the semi-join back broadcasts at scale; the coverage
    union re-aggregates on doc_id. ``hashed_grams=True`` swaps the
    string join key for xxhash64 — fixed-width shuffle keys for the
    at-scale run (identity with the string path is pytest-pinned;
    the oracle uses the string form).

    Within-doc-only repeats are NOT counted (``min_df`` counts
    distinct documents): intra-doc repetition is Gopher's
    ``ngram_repetition_stats`` axis, this one is corpus-level.
    """
    base = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            tokens_col(F.col(text_col)).alias("toks"),
        )
        .withColumn("n_tokens", F.size("toks"))
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.col("n_tokens") - (w - 1)),
        lambda i: F.concat_ws(" ", F.slice("toks", i, w)),
    )
    wins = (
        base.where(F.col("n_tokens") >= w)
        .select("doc_id", F.posexplode(grams).alias("p", "gram"))
        # 1-based window start, matching the oracle's unnest(range(1,..))
        .select("doc_id", (F.col("p") + 1).alias("s"), "gram")
    )
    if hashed_grams:
        wins = wins.select("doc_id", "s", F.xxhash64("gram").alias("gram"))
    dup = (
        wins.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= min_df)
        .select("gram")
    )
    dwins = wins.join(dup, "gram", "left_semi")
    cov = (
        dwins.select(
            "doc_id",
            "s",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + (w - 1))
            ).alias("tpos"),
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_dup_windows"),
            F.countDistinct("tpos").alias("n_covered"),
        )
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
            F.round(
                F.coalesce("n_covered", F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                ROUND,
            ).alias("dup_frac"),
        )
    )


# --- PII redaction (frozen spec v1; Java-regex ∩ RE2 so the DuckDB
# oracle runs the IDENTICAL patterns) ---
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\+[0-9]{7,15}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub personally-identifiable substrings from a text column —
    the pre-release step every public training corpus applies (C4 and
    the Gopher/MassiveText pipeline both strip contact strings; the
    reference redacts row-wise via its banner/cleaning UDFs,
    /root/reference/tlhop/library.py:62-97 — here it is three
    ``regexp_replace`` JVM expressions, zero Python).

    Frozen spec v1, applied in this order (emails first so their
    host part is never half-rewritten by the IP pass):
    emails → ``<EMAIL>``, dotted-quad IPv4 → ``<IP>``,
    international ``+``-prefixed phone numbers (7-15 digits) →
    ``<PHONE>``. Counts are measured on the ORIGINAL text.

    Adds ``text_redacted``, ``n_emails``, ``n_ips``, ``n_phones``.
    Row-local projection: no shuffle, stays in whole-stage codegen.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails",
                      F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint"))
        .withColumn("n_ips", F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint"))
        .withColumn("n_phones",
                    F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint"))
        .withColumn("text_redacted", red)
    )


def sql_redact_pii(text_expr: str) -> dict[str, str]:
    """DuckDB replicas of :func:`redact_pii`'s output columns."""
    email = EMAIL_RE
    ip = IPV4_RE
    phone = PHONE_RE
    red = (f"regexp_replace(regexp_replace(regexp_replace({text_expr}, "
           f"'{email}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), "
           f"'{phone}', '<PHONE>', 'g')")
    return {
        "n_emails": f"len(regexp_extract_all({text_expr}, '{email}'))::BIGINT",
        "n_ips": f"len(regexp_extract_all({text_expr}, '{ip}'))::BIGINT",
        "n_phones":
            f"len(regexp_extract_all({text_expr}, '{phone}'))::BIGINT",
        "text_redacted": red,
    }
