"""URL / domain operators for web-corpus curation.

The engine's input table is Common-Crawl-style pages keyed by ``url``
(BASELINE input_hint), and the reference pipeline enriches row-wise
records keyed by host/IP (``/root/reference/tlhop/library.py:62-97``,
``/root/reference/tlhop/shodan_library.py``). This module supplies the
URL-level curation layer a training-data pipeline needs on top of
that: canonicalization, URL-exact dedup, per-domain corpus statistics,
domain blocklist filtering, and temperature-based domain rebalancing.

Every transform here is a row-local JVM expression chain
(``regexp_extract`` / ``regexp_replace`` / ``concat``) — zero Python,
zero shuffle for the per-row ops; the per-domain ops reduce with ONE
hash aggregation and join the per-domain factor back with a broadcast
(domain cardinality ≪ corpus cardinality at any scale). All regexes
are written in the common Java-regex ∩ RE2 dialect (no lookaround, no
backreferences) so the DuckDB oracles run the IDENTICAL pattern.

Frozen spec v1 (any change bumps the suffix):
- scheme and host compare case-insensitively; path/query are
  case-sensitive (RFC 3986 §6.2.2.1).
- ``www.`` prefix, default ports (``:80`` http / ``:443`` https),
  and fragments are dropped by normalization.
- tracking params dropped: ``utm_[a-z0-9_]*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``mc_eid``, ``igshid`` (query-param order otherwise
  preserved — normalization never reorders).
- empty path becomes ``/``.
- registered domain: last TWO labels of the host, or last THREE when
  the host ends in a known two-level public suffix
  (:data:`TWO_LEVEL_SUFFIXES` — a frozen subset standing in for the
  public-suffix list, which is data, not code, at production scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tlhop_library_spark.operators import relational

# Frozen subset of the public-suffix list (spec v1). At production
# scale this is a broadcast table refreshed from publicsuffix.org;
# the operator shape (regex alternation / broadcast map) is identical.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "co.in", "co.nz", "com.mx", "com.cn",
)

TRACKING_PARAM_RE = "(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid)"

# --- shared regex building blocks (Java ∩ RE2 dialect) ---
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"
_FRAGMENT_RE = "#(.*)$"
_SUFFIX_ALT = "|".join(s.replace(".", "\\.") for s in TWO_LEVEL_SUFFIXES)
_REGDOM3_RE = f"([^.]+\\.({_SUFFIX_ALT}))$"
_REGDOM2_RE = "([^.]+\\.[^.]+)$"
_TRACK_STRIP_RE = f"(^|&){TRACKING_PARAM_RE}=[^&]*"


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL into lowercased scheme, host (no port), port
    string ('' if absent), path, query (no '?'), fragment (no '#').

    Pure ``regexp_extract`` over the row — stays inside whole-stage
    codegen; no UDF, no shuffle.
    """
    authority = F.regexp_extract(url, _AUTHORITY_RE, 1)
    return {
        "scheme": F.lower(F.regexp_extract(url, _SCHEME_RE, 1)),
        "host": F.lower(F.regexp_replace(authority, ":[0-9]+$", "")),
        "port": F.regexp_extract(authority, ":([0-9]+)$", 1),
        "path": F.regexp_extract(url, _PATH_RE, 1),
        "query": F.regexp_extract(url, _QUERY_RE, 1),
        "fragment": F.regexp_extract(url, _FRAGMENT_RE, 1),
    }


def registered_domain(host: Column) -> Column:
    """Registrable domain of a lowercase host (frozen spec v1): last
    three labels over a two-level public suffix, else last two, else
    the host itself (single-label hosts, IPs fall through verbatim).
    """
    three = F.regexp_extract(host, _REGDOM3_RE, 1)
    two = F.regexp_extract(host, _REGDOM2_RE, 1)
    return (
        F.when(host.rlike("^[0-9.]+$"), host)  # IPv4 literal: verbatim
        .when(three != "", three)
        .when(two != "", two)
        .otherwise(host)
    )


def strip_tracking_params(query: Column) -> Column:
    """Remove tracking params from a query string (no leading '?'),
    preserving the order of the surviving params."""
    cleaned = F.regexp_replace(query, _TRACK_STRIP_RE, "")
    return F.regexp_replace(cleaned, "^&", "")


def normalize_url(url: Column) -> Column:
    """Canonical URL (frozen spec v1 — see module docstring):
    lowercase scheme+host, drop ``www.``/default port/fragment/
    tracking params, empty path → ``/``. Row-local expression chain;
    the plan is a pure Project (asserted in tests/test_web.py)."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], "^www\\.", "")
    scheme = p["scheme"]
    port = F.when(
        (p["port"] == "")
        | ((scheme == "http") & (p["port"] == "80"))
        | ((scheme == "https") & (p["port"] == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    q = strip_tracking_params(p["query"])
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, port, path, qpart)


def with_url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``url_norm``, ``host``, ``domain`` (registered domain)
    and ``path_depth`` columns. Zero-shuffle projection."""
    p = url_parts(F.col(url_col))
    host = F.regexp_replace(p["host"], "^www\\.", "")
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    depth = F.size(F.split(F.regexp_replace(path, "/$", ""), "/")) - 1
    return (
        df.withColumn("url_norm", normalize_url(F.col(url_col)))
        .withColumn("host", host)
        .withColumn("domain", registered_domain(host))
        .withColumn("path_depth", F.greatest(depth, F.lit(0)))
    )


def url_dedup(df: DataFrame, url_col: str = "url",
              key_col: str = "doc_id") -> DataFrame:
    """URL-exact dedup: one row per canonical URL, keeping the row
    with the smallest ``key_col`` (deterministic representative —
    crawl dumps re-fetch the same page across snapshots and mirror
    hosts under www/tracking-param variants).

    Scale shape: ONE hash aggregation keyed by the canonical URL —
    near-unique keys, so the shuffle is ~corpus-sized but perfectly
    spread (no skew: a URL's group is its duplicate count, bounded by
    snapshot count). Same shape as ``dedup.exact_dedup``
    (operators/dedup.py), reused at the 10^12-doc design point.
    """
    return (
        df.withColumn("url_norm", normalize_url(F.col(url_col)))
        .groupBy("url_norm")
        .agg(F.min(key_col).alias(key_col),
             F.count("*").alias("n_variants"))
    )


def domain_stats(df: DataFrame, url_col: str = "url",
                 chars_col: str = "n_chars") -> DataFrame:
    """Per-registered-domain corpus profile: doc count, total chars
    (0 when ``chars_col`` is absent), mean path depth. ONE hash agg
    (map-side partial) on a key whose cardinality is millions at web
    scale — a small shuffle."""
    feat = with_url_features(df, url_col)
    chars = F.col(chars_col) if chars_col in df.columns else F.lit(0)
    return feat.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum(chars).cast("bigint").alias("sum_chars"),
        F.round(F.avg("path_depth"), 4).alias("avg_depth"),
    )


def domain_topk(df: DataFrame, k: int = 10,
                url_col: str = "url") -> DataFrame:
    """Top-k domains by doc count (ties broken by domain name) via
    ``ranked_topk`` — TakeOrderedAndProject, no global-window cliff."""
    stats = domain_stats(df, url_col)
    return relational.ranked_topk(
        stats, [F.desc("n_docs"), F.asc("domain")], k
    )


def blocklist_filter(df: DataFrame, blocked: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """Drop rows whose registered domain appears in ``blocked``
    (one ``domain`` column). Broadcast LEFT ANTI join — the blocklist
    (even a full commercial one) is ~10^6 rows, far under the
    broadcast threshold; no shuffle of the corpus side (plan asserted
    in tests/test_web.py)."""
    feat = with_url_features(df, url_col)
    return feat.join(F.broadcast(blocked), on="domain", how="left_anti")


def domain_temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    url_col: str = "url",
    key_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Temperature-rebalance a corpus across registered domains:
    keep each row of domain *d* with probability
    ``p_d = (c_min / c_d) ** (1 - alpha)`` where ``c_d`` is the
    domain's doc count and ``c_min`` the smallest domain's —
    ``alpha=1`` keeps everything, ``alpha=0`` levels every domain to
    ~``c_min`` docs (the head-domain downsampling step of
    CCNet/Pile-style corpus mixing).

    Deterministic: the keep decision is
    ``strata_hash(domain, key, salt) < round(p_d * 10000)`` — the
    md5-derived bucket from operators/corpus_stats.py, reproducible
    across engines / cluster layouts / runs (unlike ``sampleBy``).

    Scale shape: one hash agg for the counts, a single-row global min
    (broadcast via crossJoin), and a broadcast join of the per-domain
    factor back onto the corpus — the corpus itself is never shuffled.
    """
    from tlhop_library_spark.operators.corpus_stats import strata_hash

    feat = with_url_features(df, url_col)
    counts = feat.groupBy("domain").agg(F.count("*").alias("c_d"))
    cmin = counts.agg(F.min("c_d").alias("c_min"))
    probs = counts.crossJoin(F.broadcast(cmin)).select(
        "domain",
        F.round(
            F.pow(F.col("c_min").cast("double") / F.col("c_d"),
                  F.lit(1.0 - alpha)) * 10000
        ).cast("int").alias("thresh"),
    )
    b = strata_hash(F.col("domain"), F.col(key_col), salt)
    return (
        feat.join(F.broadcast(probs), on="domain")
        .where(b < F.col("thresh"))
        .drop("thresh")
    )


def sql_url_norm(url_expr: str) -> str:
    """DuckDB replica of :func:`normalize_url` (oracle building
    block) — the IDENTICAL regexes, with DuckDB's explicit 'g' flag
    where Spark's regexp_replace is global by default."""
    auth = f"regexp_extract({url_expr}, '{_AUTHORITY_RE}', 1)"
    scheme = f"lower(regexp_extract({url_expr}, '{_SCHEME_RE}', 1))"
    host = (f"regexp_replace(lower(regexp_replace({auth}, ':[0-9]+$', '')),"
            f" '^www\\.', '')")
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    path = f"regexp_extract({url_expr}, '{_PATH_RE}', 1)"
    query = f"regexp_extract({url_expr}, '\\?([^#]*)', 1)"
    kept = (f"regexp_replace(regexp_replace({query}, "
            f"'{_TRACK_STRIP_RE}', '', 'g'), '^&', '')")
    return (
        f"({scheme} || '://' || {host} || "
        f"(CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') "
        f"THEN '' ELSE ':' || {port} END) || "
        f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END) || "
        f"(CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END))"
    )


def sql_host(url_expr: str) -> str:
    """DuckDB replica of the no-www lowercase host."""
    auth = f"regexp_extract({url_expr}, '{_AUTHORITY_RE}', 1)"
    return (f"regexp_replace(lower(regexp_replace({auth}, ':[0-9]+$', "
            f"'')), '^www\\.', '')")


def sql_path_depth(url_expr: str) -> str:
    """DuckDB replica of ``with_url_features``'s ``path_depth``."""
    p0 = f"regexp_extract({url_expr}, '{_PATH_RE}', 1)"
    path = f"(CASE WHEN {p0} = '' THEN '/' ELSE {p0} END)"
    return (f"CAST(greatest(len(string_split(regexp_replace({path}, "
            f"'/$', ''), '/')) - 1, 0) AS INT)")


def sql_registered_domain(host_expr: str) -> str:
    """DuckDB replica of :func:`registered_domain`."""
    three = f"regexp_extract({host_expr}, '{_REGDOM3_RE}', 1)"
    two = f"regexp_extract({host_expr}, '{_REGDOM2_RE}', 1)"
    return (f"(CASE WHEN regexp_matches({host_expr}, '^[0-9.]+$') "
            f"THEN {host_expr} "
            f"WHEN {three} <> '' THEN {three} "
            f"WHEN {two} <> '' THEN {two} ELSE {host_expr} END)")
