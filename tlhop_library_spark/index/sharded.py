"""Sharded (federated) BM25 search across independent indexes.

At 10^12 documents a single monolithic index build is the wrong
deployment: the natural shape is one index per corpus partition (crawl
snapshot, url-prefix range, ingest day), each built, appended,
compacted, and checkpoint-resumed independently — and queried in
federation.  BM25 scores depend on corpus-GLOBAL statistics (N, avgdl,
per-term df); scoring each shard with its local stats would NOT be
rank-identical to one big index (a term rare in shard A but common in
shard B would be over-weighted in A).  :class:`ShardedIndexReader`
therefore:

1. aggregates global ``n_docs`` / ``sum_dl`` driver-side from each
   shard's ``stats.json`` (tiny, one file per shard),
2. resolves the query terms against every shard's dictionary and sums
   per-term df across shards,
3. scores EVERY shard with the global idf/avgdl through the same
   per-range kernels (``IndexReader._local_winners``) — block-max
   pruning stays exact because the stored ``block_max_w`` bounds are
   idf-free and the reader inflates them by
   ``max(1, global_avgdl / shard.min_encode_avgdl)``, the same
   mechanism the incremental-append path uses (index/append.py),
4. unions the ≤ k-per-range shard winners and takes the global top-k
   via ``TakeOrderedAndProject`` (only k·n_ranges·n_shards candidate
   rows ever leave the executors).

Per-shard top-k with the identical scoring function followed by a
merge of the per-shard winner sets is exactly the global top-k, so the
result is rank- AND score-identical to a single index built over the
union of the shards' corpora.  Shards are assumed to hold disjoint
doc_id spaces (what per-partition lineage guarantees in deployment); a
doc_id present in several shards would double-count, as in any
federated search system.

Reference parity note: the reference library has no sharding concept —
this is the piece Spark needs to make its row-wise pipeline shape
(reference/tlhop/shodan_dataset_manager.py processes one yearly Delta
partition at a time) queryable as ONE logical corpus.

Scale notes (100 TB):
- Global-stats aggregation is O(n_shards) driver-side JSON reads plus
  one dictionary lookup per shard (driver-memory map or a
  pushdown-filtered parquet read — never a scan).
- Each shard scores only its own (bucket, tid)-pruned chunks; the
  shard jobs are independent Spark stages with no cross-shard shuffle;
  the only cross-shard data movement is the ≤ k·n_ranges winner rows.
- The serving twin (:meth:`search_local`) reads only the query terms'
  chunks of every shard driver-side (pyarrow, hive-partition + row
  group pruning) — latency stays O(postings of the query terms),
  independent of shard count beyond the per-shard dictionary probe.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlhop_library_spark import bm25
from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.index.query import (
    SEGMENT_SCHEMA,
    _SCORE_SCHEMA,
    IndexReader,
    _range_scorer,
)

__all__ = ["ShardedIndexReader"]


class ShardedIndexReader:
    """Federated reader over ``index_dirs`` — rank-identical to one
    index over the union of the shards' corpora."""

    def __init__(
        self, spark: SparkSession, index_dirs: list[str],
        preload_dictionary: int | None = 2_000_000,
    ):
        if not index_dirs:
            raise ValueError("need at least one shard index dir")
        self.spark = spark
        self.readers = [
            IndexReader(spark, d, preload_dictionary) for d in index_dirs
        ]
        r0 = self.readers[0].stats
        for r in self.readers[1:]:
            for key in ("analyzer", "k1", "b"):
                if r.stats.get(key) != r0.get(key):
                    raise ValueError(
                        f"shard stats disagree on {key!r}: "
                        f"{r.stats.get(key)} vs {r0.get(key)}"
                    )
        self.n_docs = sum(r.stats["n_docs"] for r in self.readers)
        self.sum_dl = sum(r.stats["sum_dl"] for r in self.readers)
        self.avgdl = self.sum_dl / self.n_docs if self.n_docs else 0.0

    # ------------------------------------------------------------------
    def _resolve(self, query_text: str):
        """Per-shard term info + federation-global idf per term.

        Returns (per_shard_info, global_idf_by_term) where
        per_shard_info[i] maps term → (df, bucket, tid) in shard i and
        global idf uses Σ-across-shards df against global n_docs."""
        terms = sorted(set(py_tokens(query_text)))
        if not terms:
            return [], {}
        infos = [r.lookup_terms(terms) for r in self.readers]
        global_df: dict[str, int] = {}
        for info in infos:
            for t, (df, _, _) in info.items():
                global_df[t] = global_df.get(t, 0) + df
        idf_by_term = {
            t: bm25.idf(self.n_docs, df) for t, df in global_df.items()
        }
        return infos, idf_by_term

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "rank int, doc_id long, score double"
        )

    # ------------------------------------------------------------------
    def search(
        self, query_text: str, k: int = 10, mode: str = "auto"
    ) -> DataFrame:
        """Disjunctive BM25 top-k over all shards with global stats.

        Returns (rank int, doc_id long, score double), rank ≤ k —
        rank- and score-identical to ``IndexReader.search`` on a
        single index built over the concatenated corpora."""
        infos, idf_by_term = self._resolve(query_text)
        parts = []
        for r, info in zip(self.readers, infos):
            if not info:
                continue
            # tids are per-shard (content-hashed); key this shard's
            # kernel by ITS tids, values from the global idf table
            idf_map = {
                tid: idf_by_term[t] for t, (_, _, tid) in info.items()
            }
            parts.append(
                r._local_winners(info, idf_map, self.avgdl, k, mode)
            )
        if not parts:
            return self._empty()
        local = reduce(DataFrame.unionByName, parts)
        from tlhop_library_spark.operators.relational import ranked_topk

        return ranked_topk(
            local.withColumn("score", F.round("score", bm25.ROUND_DIGITS)),
            [F.desc("score"), F.asc("doc_id")],
            k,
        ).select("rank", "doc_id", "score")

    # ------------------------------------------------------------------
    def _positional_local(
        self, query_text: str, k: int, make_scorer,
        required: "set[str] | None" = None,
    ) -> DataFrame:
        """Shared shape of federated phrase/proximity: per-shard
        positional chunk scans scored with GLOBAL idf/avgdl by the
        kernel ``make_scorer(reader, info, idf_by_term)`` builds; a
        shard missing any REQUIRED term is skipped (no doc in it can
        match — docs live wholly in one shard), but its df
        contributions still feed the global idf like in a single
        union index. ``required`` defaults to every query term;
        span-not passes only its include terms (a shard may lack the
        exclude term and still match)."""
        from tlhop_library_spark.index.build import POS_SEGMENT_SCHEMA

        for r in self.readers:
            if not r.stats.get("positions"):
                raise ValueError(
                    "phrase/proximity federation needs positional "
                    f"shards; {r.index_dir} is not positional"
                )
        infos, idf_by_term = self._resolve(query_text)
        if required is None:
            required = set(py_tokens(query_text))
        parts = []
        for r, info in zip(self.readers, infos):
            if any(t not in info for t in required):
                continue
            scorer = make_scorer(r, info, idf_by_term)
            buckets = sorted({b for _, b, _ in info.values()})
            tids = sorted({t for _, _, t in info.values()})
            seg = r._segments.where(
                F.col("bucket").isin(buckets) & F.col("tid").isin(tids)
            ).select(
                *[fld.name for fld in POS_SEGMENT_SCHEMA.fields]
            ).withColumn("avgdl", F.lit(self.avgdl))
            def _wrap(s):
                return lambda key, pdf: s(key, pdf)

            parts.append(
                seg.groupBy("range_id").applyInPandas(
                    _wrap(scorer), schema=_SCORE_SCHEMA
                )
            )
        if not parts:
            return self._empty()
        local = reduce(DataFrame.unionByName, parts)
        from tlhop_library_spark.operators.relational import ranked_topk

        return ranked_topk(
            local, [F.desc("score"), F.asc("doc_id")], k
        ).select("rank", "doc_id", "score")

    def search_phrase(self, phrase_text: str, k: int = 10) -> DataFrame:
        """Federated exact-phrase top-k — rank-identical to
        ``IndexReader.search_phrase`` on a single union index."""
        from tlhop_library_spark.index.phrase import phrase_range_scorer

        slots = py_tokens(phrase_text)
        if not slots:
            return self._empty()

        def make(r, info, idf_by_term):
            idf_map = {
                tid: idf_by_term[t] for t, (_, _, tid) in info.items()
            }
            return phrase_range_scorer(
                [info[t][2] for t in slots], idf_map, k,
                deleted=r._deleted,
            )

        return self._positional_local(phrase_text, k, make)

    def search_proximity(
        self, query_text: str, window: int, k: int = 10
    ) -> DataFrame:
        """Federated proximity top-k — rank-identical to
        ``IndexReader.search_proximity`` on a single union index."""
        from tlhop_library_spark.index.phrase import (
            proximity_range_scorer,
        )

        if not py_tokens(query_text):
            return self._empty()

        def make(r, info, idf_by_term):
            idf_map = {
                tid: idf_by_term[t] for t, (_, _, tid) in info.items()
            }
            return proximity_range_scorer(
                sorted(info[t][2] for t in info), idf_map, window, k,
                deleted=r._deleted,
            )

        return self._positional_local(query_text, k, make)

    def significant_terms(
        self, query_text: str, m: int = 10, min_fg_df: int = 2
    ) -> DataFrame:
        """Federated significant_terms (JLH) — identical to the
        aggregation on one union index: per-shard (tid, fg) partials
        union and re-sum (shards own disjoint doc spaces and terms
        are content-addressed), fg_n = Σ shard hit counts,
        background df = Σ shard dictionary df, bg_n = global n_docs.
        Scale shape per shard = the single-index shape (hit-range
        pruned cogrouped decode); cross-shard traffic is the tiny
        (tid, fg) vocabulary-of-matching-set stream."""
        from functools import reduce

        from tlhop_library_spark.analyzer import py_tokens as _pt

        empty = self.spark.createDataFrame(
            [],
            "rank int, term string, fg_df long, bg_df long, "
            "score double",
        )
        terms = sorted(set(_pt(query_text)))
        parts, hit_parts = [], []
        for r in self.readers:
            if not r.lookup_terms(terms):
                continue  # no query term in this shard ⇒ no hits
            partial, hits = r._sig_fg_partials(query_text)
            parts.append(partial)
            hit_parts.append(hits)
        if not parts:
            return empty
        fg = (
            reduce(DataFrame.unionByName, parts)
            .groupBy("tid")
            .agg(F.sum("fg").alias("fg_df"))
        )
        n_hits = (
            reduce(DataFrame.unionByName, hit_parts)
            .agg(F.count("*").alias("fg_n"))
        )
        bg = (
            reduce(
                DataFrame.unionByName,
                [
                    r._dict.select("tid", "term", "df")
                    for r in self.readers
                ],
            )
            .groupBy("tid", "term")
            .agg(F.sum("df").alias("df"))
        )
        bg_n = float(self.n_docs)
        scored = (
            fg.join(bg, "tid")
            .crossJoin(F.broadcast(n_hits))
            .where(F.col("fg_n") > 0)
            .withColumn(
                "fg_pct", F.col("fg_df") / F.col("fg_n").cast("double")
            )
            .withColumn("bg_pct", F.col("df") / F.lit(bg_n))
            .where(
                (F.col("fg_pct") > F.col("bg_pct"))
                & (F.col("fg_df") >= F.lit(int(min_fg_df)))
            )
            .withColumn(
                "score",
                F.round(
                    (F.col("fg_pct") - F.col("bg_pct"))
                    * (F.col("fg_pct") / F.col("bg_pct")),
                    6,
                ),
            )
        )
        from tlhop_library_spark.operators.relational import ranked_topk

        return ranked_topk(
            scored, [F.desc("score"), F.asc("term")], m
        ).select(
            "rank", "term",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("df").cast("long").alias("bg_df"), "score",
        )

    def autocomplete(self, prefix: str, n: int = 10) -> DataFrame:
        """Federated prefix autocomplete: the shard dictionaries'
        startswith scans union and re-aggregate (terms are
        content-addressed, so a term's global cf/df are plain sums
        over its shard rows — identical to a union index). Returns
        (term, cf, df) ranked (cf desc, df desc, term asc)."""
        import re
        from functools import reduce

        q = prefix.lower()
        if not q or not re.fullmatch(r"[^\W_]+", q):
            raise ValueError(
                f"autocomplete() takes a single-token prefix; got "
                f"{prefix!r}"
            )
        parts = [
            r._dict.where(F.col("term").startswith(q)).select(
                "term", "cf", "df"
            )
            for r in self.readers
        ]
        u = reduce(DataFrame.unionByName, parts)
        agg = u.groupBy("term").agg(
            F.sum("cf").alias("cf"), F.sum("df").alias("df")
        )
        return (
            agg.orderBy(F.desc("cf"), F.desc("df"), F.asc("term"))
            .limit(n)
        )

    def suggest_df(
        self, term: str, max_edits: int = 2, n: int = 5
    ) -> DataFrame:
        """Federated did-you-mean: length-pruned levenshtein scans of
        every shard dictionary, global df = Σ shard df per term,
        ranked (dist asc, df desc, term asc) — identical to a union
        index."""
        from functools import reduce

        from tlhop_library_spark.analyzer import py_tokens as _pt

        toks = _pt(term)
        if len(toks) != 1:
            raise ValueError(
                "suggest() takes a single analyzable term; got "
                f"{term!r} -> {toks}"
            )
        q = toks[0]
        parts = [
            r._dict.where(
                (F.abs(F.length("term") - F.lit(len(q))) <= max_edits)
                & (F.levenshtein(F.col("term"), F.lit(q)) <= max_edits)
            ).select("term", "df")
            for r in self.readers
        ]
        u = reduce(DataFrame.unionByName, parts)
        agg = u.groupBy("term").agg(F.sum("df").alias("df"))
        return (
            agg.select(
                "term",
                F.levenshtein(F.col("term"), F.lit(q))
                .cast("int")
                .alias("dist"),
                "df",
            )
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(n)
        )

    def search_phrase_prefix(
        self, query_text: str, k: int = 10, max_expansions: int = 50
    ) -> DataFrame:
        """Federated match-phrase-prefix — identical to
        ``IndexReader.search_phrase_prefix`` on a union index: the
        completion candidate set and its blended group idf come from
        the FEDERATED dictionary (Σ df per candidate term across
        shards, max over candidates — exactly the union index's
        numbers), the exact-slot idfs from global Σ df; per-shard
        positional kernels score with those global weights and the
        winners union through ``ranked_topk``."""
        from tlhop_library_spark.analyzer import (
            MIN_TOKEN_LEN,
            _PY_NON_WORD_RE,
        )
        from tlhop_library_spark.index.build import POS_SEGMENT_SCHEMA
        from tlhop_library_spark.index.phrase import (
            phrase_prefix_range_scorer,
        )

        for r in self.readers:
            if not r.stats.get("positions"):
                raise ValueError(
                    "match_phrase_prefix federation needs positional "
                    f"shards; {r.index_dir} is not positional"
                )
        raw = [
            t
            for t in _PY_NON_WORD_RE.split(
                query_text.lower().replace("_", " ")
            )
            if t
        ]
        if not raw:
            return self._empty()
        prefix, exact = raw[-1], raw[:-1]
        if any(len(t) < MIN_TOKEN_LEN for t in exact):
            raise ValueError(
                "every token before the trailing prefix must be an "
                f"analyzable term (≥ {MIN_TOKEN_LEN} chars); got "
                f"{exact!r}"
            )
        # federated candidate expansion: global df per candidate term
        cand_by_shard = [
            r.lookup_terms_prefix([prefix], max_expansions)
            for r in self.readers
        ]
        gdf_cand: dict[str, int] = {}
        for ci in cand_by_shard:
            for t, (df, _b, _tid) in ci.items():
                gdf_cand[t] = gdf_cand.get(t, 0) + int(df)
        if len(gdf_cand) > max_expansions:
            raise ValueError(
                f"wildcard expands to more than {max_expansions} terms"
            )
        if not gdf_cand:
            return self._empty()
        # federated exact-term stats
        infos, gdf, _gcf = (
            self._resolve_full(sorted(set(exact)))
            if exact
            else ([{} for _ in self.readers], {}, {})
        )
        if exact and any(t not in gdf for t in set(exact)):
            return self._empty()
        group_idf = bm25.idf(self.n_docs, max(gdf_cand.values()))
        idf_map_by_term = {
            t: bm25.idf(self.n_docs, gdf[t]) for t in set(exact)
        }
        parts = []
        for r, info, ci in zip(self.readers, infos, cand_by_shard):
            if exact and len(info) < len(set(exact)):
                continue  # shard missing an exact term ⇒ no match in it
            if not ci:
                continue  # no completion in this shard
            slot_tids = [info[t][-1] for t in exact]
            idf_map = {info[t][-1]: idf_map_by_term[t] for t in set(exact)}
            last_tids = sorted(tid for (_df, _b, tid) in ci.values())
            buckets = sorted(
                {b for (_df, _cf, b, _t) in info.values()}
                | {b for (_df, b, _t) in ci.values()}
            ) if exact else sorted({b for (_df, b, _t) in ci.values()})
            tids = sorted(set(slot_tids) | set(last_tids))
            seg = r._segments.where(
                F.col("bucket").isin(buckets) & F.col("tid").isin(tids)
            ).select(
                *[f.name for f in POS_SEGMENT_SCHEMA.fields]
            ).withColumn("avgdl", F.lit(self.avgdl))
            scorer = phrase_prefix_range_scorer(
                slot_tids, last_tids, idf_map, group_idf, k,
                deleted=r._deleted,
            )

            def _wrap(s):
                return lambda key, pdf: s(key, pdf)

            parts.append(
                seg.groupBy("range_id").applyInPandas(
                    _wrap(scorer), schema=_SCORE_SCHEMA
                )
            )
        if not parts:
            return self._empty()
        local = reduce(DataFrame.unionByName, parts)
        from tlhop_library_spark.operators.relational import ranked_topk

        return ranked_topk(
            local, [F.desc("score"), F.asc("doc_id")], k
        ).select("rank", "doc_id", "score")

    def suggest_phrase(
        self, query_text: str, docs: DataFrame, n: int = 3,
        max_edits: int = 1, per_token: int = 3, add_k: float = 0.5,
    ) -> DataFrame:
        """Federated phrase suggester — identical to
        ``IndexReader.suggest_phrase`` on a union index: per-token
        candidates come from the FEDERATED dictionary (Σ df across
        shards, the :meth:`suggest_df` ranking), and the bigram-LM
        sequence scoring is shard-agnostic (it runs on the caller's
        ``docs`` corpus)."""
        import itertools

        from tlhop_library_spark.analyzer import py_tokens as _pt

        toks = _pt(query_text)
        empty = self.spark.createDataFrame(
            [], "rank int, suggestion string, score double"
        )
        if len(toks) < 2 or len(toks) > 4:
            raise ValueError(
                "suggest_phrase takes 2-4 analyzable tokens; got "
                f"{query_text!r} -> {toks}"
            )
        cands: list[list[str]] = []
        for t in toks:
            rows = self.suggest_df(t, max_edits, per_token).collect()
            if not rows:
                return empty
            cands.append([r["term"] for r in rows])
        pair_rows = []
        for combo in itertools.product(*cands):
            sug = " ".join(combo)
            for a, b in zip(combo, combo[1:]):
                pair_rows.append((sug, a, b))
        pairs = self.spark.createDataFrame(
            pair_rows, "suggestion string, w1 string, w2 string"
        )
        from tlhop_library_spark.operators.corpus_stats import (
            train_bigram_lm,
        )

        allc = sorted({c for cs in cands for c in cs})
        big, ctx, vocab = train_bigram_lm(docs)
        big_f = big.where(
            F.col("w1").isin(allc) & F.col("w2").isin(allc)
        )
        ctx_f = ctx.where(F.col("w1").isin(allc))
        logp = F.log2(
            (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k))
            / (
                F.coalesce(F.col("c1"), F.lit(0))
                + F.lit(add_k) * F.col("v")
            )
        )
        scored = (
            pairs.join(F.broadcast(big_f), ["w1", "w2"], "left")
            .join(F.broadcast(ctx_f), "w1", "left")
            .crossJoin(F.broadcast(vocab))
            .select("suggestion", logp.alias("logp"))
        )
        agg = scored.groupBy("suggestion").agg(
            F.round(F.sum("logp"), 4).alias("score")
        )
        from tlhop_library_spark.operators.relational import ranked_topk

        return ranked_topk(
            agg, [F.desc("score"), F.asc("suggestion")], n
        ).select("rank", "suggestion", "score")

    def stored_docs(self) -> DataFrame:
        """Federated stored-fields table: the union of every shard's
        DocValues parquet (shards own disjoint doc spaces, so the
        union is a concatenation — no dedup shuffle). Requires every
        shard to store the SAME field list (heterogeneous stored
        schemas are a config error, like mismatched analyzers)."""
        from functools import reduce

        flds = [
            tuple(r.stats.get("stored_fields") or [])
            for r in self.readers
        ]
        if len(set(flds)) != 1 or not flds[0]:
            raise ValueError(
                f"shards disagree on stored_fields (or none stored): "
                f"{flds}"
            )
        return reduce(
            DataFrame.unionByName,
            [r.stored_docs() for r in self.readers],
        )

    def search_span_near(
        self, query_text: str, slop: int = 0, k: int = 10
    ) -> DataFrame:
        """Federated ordered span-near — rank-identical to
        ``IndexReader.search_span_near`` on a single union index
        (clause order preserved per shard, global idf/avgdl)."""
        from tlhop_library_spark.index.phrase import (
            span_near_range_scorer,
        )

        clauses = py_tokens(query_text)
        if not clauses:
            return self._empty()

        def make(r, info, idf_by_term):
            idf_map = {
                tid: idf_by_term[t] for t, (_, _, tid) in info.items()
            }
            return span_near_range_scorer(
                [info[t][2] for t in clauses], idf_map, int(slop), k,
                deleted=r._deleted,
            )

        return self._positional_local(query_text, k, make)

    def search_span_not(
        self, include_text: str, exclude_term: str, slop: int = 0,
        k: int = 10, pre: int = 0, post: int = 0,
    ) -> DataFrame:
        """Federated span-not — rank-identical to
        ``IndexReader.search_span_not`` on a single union index: a
        doc's include AND exclude positions live wholly in its own
        shard, so per-shard rejection is global rejection; only the
        include terms are required per shard (a shard lacking the
        exclude term simply never rejects)."""
        from tlhop_library_spark.index.phrase import (
            span_not_range_scorer,
        )

        clauses = py_tokens(include_text)
        excl = py_tokens(exclude_term)
        if len(excl) != 1:
            raise ValueError(
                "exclude must analyze to exactly one term"
            )
        if not clauses:
            return self._empty()

        def make(r, info, idf_by_term):
            idf_map = {
                info[t][2]: idf_by_term[t] for t in set(clauses)
            }
            excl_tid = (
                info[excl[0]][2] if excl[0] in info else None
            )
            return span_not_range_scorer(
                [info[t][2] for t in clauses], excl_tid, idf_map,
                int(slop), int(pre), int(post), k, deleted=r._deleted,
            )

        return self._positional_local(
            include_text + " " + exclude_term, k, make,
            required=set(clauses),
        )

    # ------------------------------------------------------------------
    def _resolve_full(self, query_text_or_terms):
        """Per-shard full term info + Σ-across-shards df/cf (language-
        model and TF-IDF similarities need global collection stats,
        exactly like BM25 needs global idf)."""
        if isinstance(query_text_or_terms, str):
            terms = sorted(set(py_tokens(query_text_or_terms)))
        else:
            terms = sorted(set(query_text_or_terms))
        if not terms:
            return [], {}, {}
        infos = [r.lookup_terms_full(terms) for r in self.readers]
        gdf: dict[str, int] = {}
        gcf: dict[str, int] = {}
        for info in infos:
            for t, (df, cf, _b, _tid) in info.items():
                gdf[t] = gdf.get(t, 0) + df
                gcf[t] = gcf.get(t, 0) + cf
        return infos, gdf, gcf

    def _weighted_local(
        self, infos, gdf, gcf, k: int, similarity: str,
        boosts=None, tie_breaker=None, after=None,
    ) -> DataFrame:
        """Union of per-shard weighted-kernel results: each shard's
        weight closures are built from GLOBAL (n_docs, sum_dl, df, cf)
        but keyed by the shard's own tids — the same global-stats
        mechanism federated BM25 uses, generalized to any similarity.
        ``tie_breaker`` switches to the DisMax kernel; ``after``
        pushes a cursor predicate into the kernels."""
        from tlhop_library_spark import similarities
        from tlhop_library_spark.index.query import (
            dismax_range_scorer,
            similarity_range_scorer,
        )

        parts = []
        for r, info in zip(self.readers, infos):
            if not info:
                continue
            ginfo = {
                t: (gdf[t], gcf[t], b, tid)
                for t, (_df, _cf, b, tid) in info.items()
            }
            weight_of = similarities.weight_fns(
                similarity, ginfo, self.n_docs, int(self.sum_dl),
                avgdl=float(self.avgdl), boosts=boosts,
            )
            if tie_breaker is not None:
                scorer = dismax_range_scorer(
                    weight_of, k, float(tie_breaker), deleted=r._deleted
                )
            else:
                scorer = similarity_range_scorer(
                    weight_of, k, deleted=r._deleted, after=after
                )

            def _wrap(s):
                return lambda key, pdf: s(key, pdf)

            parts.append(
                r._pruned_segments(ginfo)
                .groupBy("range_id")
                .applyInPandas(_wrap(scorer), schema=_SCORE_SCHEMA)
            )
        if not parts:
            return self._empty()
        local = reduce(DataFrame.unionByName, parts)
        if k is None:
            # hit-stream mode (no k-cut): the rescore join consumes
            # every (doc_id, score) row
            return local
        from tlhop_library_spark.operators.relational import ranked_topk

        return ranked_topk(
            local, [F.desc("score"), F.asc("doc_id")], k
        ).select("rank", "doc_id", "score")

    def search_rescore(
        self, query_text: str, k: int = 10, window: int = 50,
        similarity: str = "lmdirichlet", query_weight: float = 1.0,
        rescore_weight: float = 1.0,
    ) -> DataFrame:
        """Federated two-pass rescoring — identical to
        ``IndexReader.search_rescore`` on a union index: the fed BM25
        top-``window`` broadcasts into a map-side join against the
        per-shard secondary-similarity hit streams (global Σ-stats
        weight closures)."""
        first = self.search(query_text, window)
        infos, gdf, gcf = self._resolve_full(query_text)
        if not any(infos):
            return self._empty()
        sec = self._weighted_local(infos, gdf, gcf, None, similarity)
        combined = (
            sec.select("doc_id", F.col("score").alias("__s2"))
            .join(
                F.broadcast(
                    first.select("doc_id", F.col("score").alias("__s1"))
                ),
                "doc_id",
            )
            .select(
                "doc_id",
                F.round(
                    F.lit(float(query_weight)) * F.col("__s1")
                    + F.lit(float(rescore_weight)) * F.col("__s2"),
                    bm25.ROUND_DIGITS,
                ).alias("score"),
            )
        )
        from tlhop_library_spark.operators.relational import ranked_topk

        return ranked_topk(
            combined, [F.desc("score"), F.asc("doc_id")], k
        ).select("rank", "doc_id", "score")

    def _fed_hits(self, query_text: str) -> "DataFrame | None":
        """Federated disjunctive (doc_id, score) hit stream with
        global Σ-stats — the building block every hit-stream consumer
        (decay, top_hits, facets, cardinality) federates through."""
        infos, gdf, gcf = self._resolve_full(query_text)
        if not any(infos):
            return None
        return self._weighted_local(infos, gdf, gcf, None, "bm25")

    def facet_counts(
        self, query_text: str, docs: DataFrame, facet_col: str = "lang"
    ) -> DataFrame:
        """Federated facet histogram ≡ ``IndexReader.facet_counts``
        on a union index (matching ids are shard-disjoint, so the
        unioned hit stream is the union matching set)."""
        hits = self._fed_hits(query_text)
        if hits is None:
            return self.spark.createDataFrame(
                [], "facet string, n_docs long"
            )
        meta = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(facet_col).alias("facet"),
        )
        return (
            hits.select("doc_id")
            .join(meta, "doc_id")
            .groupBy("facet")
            .agg(F.count("*").alias("n_docs"))
        )

    def facet_cardinality(
        self, query_text: str, docs: DataFrame, field: str,
        k: "int | None" = None,
    ) -> DataFrame:
        """Federated cardinality aggregation — exact countDistinct or
        the KMV sketch (k smallest hashes merge across shards exactly
        like across partitions)."""
        hits = self._fed_hits(query_text)
        if hits is None:
            return self.spark.createDataFrame(
                [(0,)], "cardinality long"
            ) if k is None else self.spark.createDataFrame(
                [(0.0, 0)], "kmv_estimate double, k_used long"
            )
        j = (
            docs.join(hits.select("doc_id"), "doc_id", "left_semi")
            .select(field)
            .where(F.col(field).isNotNull())
        )
        if k is None:
            return j.agg(
                F.countDistinct(field).cast("long").alias("cardinality")
            )
        from tlhop_library_spark.operators.corpus_stats import (
            kmv_distinct,
        )

        return kmv_distinct(j, field, k=k)

    def search_boosting(
        self, positive: str, negative: str, k: int = 10,
        negative_boost: float = 0.5,
    ) -> DataFrame:
        """Federated ES boosting query — both the positive and
        negative matching sets federate as global-stats hit streams;
        the demote join is shard-agnostic."""
        from tlhop_library_spark.index.query import boosting_rank_hits

        pos = self._fed_hits(positive)
        if pos is None:
            return self._empty()
        return boosting_rank_hits(
            pos, self._fed_hits(negative), k, negative_boost
        )

    def search_random(
        self, query_text: str, k: int = 10, seed: int = 42,
    ) -> DataFrame:
        """Federated random_score — the LCG score is a pure function
        of (doc_id, seed), so shard layout cannot change it."""
        from tlhop_library_spark.index.query import random_rank_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            return self._empty()
        return random_rank_hits(hits, k, seed)

    def search_diversified(
        self, query_text: str, docs: DataFrame, field: str,
        max_per_key: int = 1, k: int = 10,
    ) -> DataFrame:
        """Federated diversified_sampler — the per-key cap is GLOBAL
        (window over the unioned shard-disjoint matching set), so
        unlike ES's per-shard sampler the result is shard-layout-
        independent."""
        from tlhop_library_spark.index.query import (
            diversified_rank_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            return self._empty()
        return diversified_rank_hits(hits, docs, field, max_per_key, k)

    def search_rank_feature(
        self, query_text: str, docs: DataFrame, field: str,
        k: int = 10, function: str = "saturation",
        pivot: float = 1.0, boost: float = 1.0,
    ) -> DataFrame:
        """Federated rank_feature ⊕ BM25 — the feature clause is a
        pure per-doc function, shard-agnostic once the hit stream
        carries global-stats scores."""
        from tlhop_library_spark.index.query import (
            rank_feature_rank_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            return self._empty()
        return rank_feature_rank_hits(
            hits, docs, field, k,
            function=function, pivot=pivot, boost=boost,
        )

    def search_pinned(
        self, query_text: str, docs: DataFrame,
        pinned_ids: list[int], k: int = 10,
    ) -> DataFrame:
        """Federated pinned query — pins are existence-checked
        against the shared docs table; the organic stream federates
        as usual."""
        from tlhop_library_spark.index.query import pinned_rank_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id", "score")
        return pinned_rank_hits(hits, docs, pinned_ids, k)

    def facet_multi_terms(
        self, query_text: str, docs: DataFrame, fields: list[str],
        size: int = 10,
    ) -> DataFrame:
        """Federated multi_terms — shard-disjoint hit streams union
        into the global matching set; the composite-key agg is a
        plain hash agg over it."""
        from tlhop_library_spark.index.query import (
            multi_terms_agg_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            # run the normal agg over an empty hit stream so the
            # zero-match schema (key dtypes AND nullability) is the
            # non-empty path's by construction (round-4 advice: a
            # hand-built schema hard-coded string keys)
            hits = self._empty()
        return multi_terms_agg_hits(
            hits.select("doc_id"), docs, fields, size
        )

    def facet_adjacency_matrix(
        self, named_queries: dict[str, str],
    ) -> DataFrame:
        """Federated adjacency_matrix — each named filter's matching
        set federates independently; the pair self-join is on doc_id,
        which is globally unique across shards."""
        from tlhop_library_spark.index.query import (
            adjacency_matrix_hits,
        )

        streams = {}
        for name, q in named_queries.items():
            h = self._fed_hits(q)
            if h is not None:
                streams[name] = h
        if not streams:
            return self.spark.createDataFrame(
                [], "key1 string, key2 string, doc_count long"
            )
        return adjacency_matrix_hits(streams)

    def facet_filters(
        self, named_queries: dict[str, str],
        docs: "DataFrame | None" = None,
    ) -> DataFrame:
        """Federated filters aggregation — each named filter's
        matching set federates independently; counts and the
        other-bucket anti-join are doc_id-keyed, globally unique
        across shards."""
        from tlhop_library_spark.index.query import filters_agg_hits

        streams = {}
        for name, q in named_queries.items():
            h = self._fed_hits(q)
            if h is None:
                h = self.spark.createDataFrame(
                    [], "doc_id long, score double"
                )
            streams[name] = h
        return filters_agg_hits(streams, docs)

    def facet_histogram(
        self, query_text: str, docs: DataFrame, field: str,
        interval: float,
    ) -> DataFrame:
        """Federated histogram — shard-disjoint hit streams union
        into the global matching set; bucket keys are a pure per-doc
        function."""
        from tlhop_library_spark.index.query import histogram_agg_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            # normal agg over an empty hit stream — zero-match schema
            # (incl. nullability) equals the non-empty path's
            hits = self._empty()
        return histogram_agg_hits(
            hits.select("doc_id"), docs, field, interval
        )

    def facet_terms_stats(
        self, query_text: str, docs: DataFrame, key_field: str,
        metric_field: str, size: int = 10,
    ) -> DataFrame:
        """Federated terms+stats — one hash agg over the unioned
        matching set; sub-agg partials are plain Σs."""
        from tlhop_library_spark.index.query import (
            terms_stats_agg_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            # normal agg over an empty hit stream — zero-match schema
            # equals the non-empty path's by construction
            hits = self._empty()
        return terms_stats_agg_hits(
            hits.select("doc_id"), docs, key_field, metric_field, size
        )

    def facet_weighted_avg(
        self, query_text: str, docs: DataFrame, value_field: str,
        weight_field: str,
    ) -> DataFrame:
        """Federated weighted_avg — Σ(v·w) and Σw reduce over the
        unioned matching set exactly as over one index."""
        from tlhop_library_spark.index.query import (
            weighted_avg_agg_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return weighted_avg_agg_hits(
            hits.select("doc_id"), docs, value_field, weight_field
        )

    def facet_percentiles(
        self, query_text: str, docs: DataFrame, field: str,
        percentiles: "list[float] | None" = None,
        approx: bool = False, accuracy: int = 10000,
    ) -> DataFrame:
        """Federated percentiles over the unioned matching set.
        ``approx=False``: exact (vs ES's TDigest), which makes the
        federated result identical to the single-index one;
        ``approx=True``: the bounded-memory mergeable sketch — the
        at-scale default for continuous fields (the GK partials merge
        across shards exactly like any other partial agg). Scale
        contract in :func:`~tlhop_library_spark.index.query.
        percentiles_agg_hits`."""
        from tlhop_library_spark.index.query import (
            percentiles_agg_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return percentiles_agg_hits(
            hits.select("doc_id"), docs, field, percentiles,
            approx=approx, accuracy=accuracy,
        )

    def facet_missing(
        self, query_text: str, docs: DataFrame, field: str,
    ) -> DataFrame:
        """Federated missing agg — a plain count over the unioned
        matching set."""
        from tlhop_library_spark.index.query import missing_agg_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return missing_agg_hits(hits.select("doc_id"), docs, field)

    def facet_percentile_ranks(
        self, query_text: str, docs: DataFrame, field: str,
        values: list[float],
    ) -> DataFrame:
        """Federated percentile_ranks — exact counts reduce over the
        unioned matching set like any partial agg."""
        from tlhop_library_spark.index.query import (
            percentile_ranks_agg_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return percentile_ranks_agg_hits(
            hits.select("doc_id"), docs, field, values
        )

    def facet_mad(
        self, query_text: str, docs: DataFrame, field: str,
    ) -> DataFrame:
        """Federated median_absolute_deviation — both median passes
        run over the unioned matching set, so the federated result is
        identical to the single-index one (exactness, not TDigest, is
        what makes that true)."""
        from tlhop_library_spark.index.query import mad_agg_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return mad_agg_hits(hits.select("doc_id"), docs, field)

    def facet_boxplot(
        self, query_text: str, docs: DataFrame, field: str,
    ) -> DataFrame:
        """Federated boxplot — exact quartiles over the unioned
        matching set ≡ single index."""
        from tlhop_library_spark.index.query import boxplot_agg_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return boxplot_agg_hits(hits.select("doc_id"), docs, field)

    def facet_string_stats(
        self, query_text: str, docs: DataFrame, field: str,
    ) -> DataFrame:
        """Federated string_stats — the character counts reduce over
        the union before the entropy sum (a per-shard entropy would
        not merge)."""
        from tlhop_library_spark.index.query import (
            string_stats_agg_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return string_stats_agg_hits(
            hits.select("doc_id"), docs, field
        )

    def facet_top_metrics(
        self, query_text: str, docs: DataFrame, sort_field: str,
        metric_field: str, size: int = 1, asc: bool = False,
    ) -> DataFrame:
        """Federated top_metrics — the rank cut runs over the unioned
        matching set."""
        from tlhop_library_spark.index.query import (
            top_metrics_agg_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return top_metrics_agg_hits(
            hits.select("doc_id"), docs, sort_field, metric_field,
            size, asc,
        )

    def facet_t_test(
        self, query_text: str, docs: DataFrame, field: str,
        group_field: str,
    ) -> DataFrame:
        """Federated t_test — Σ/Σ²/n partials reduce over the union
        exactly."""
        from tlhop_library_spark.index.query import t_test_agg_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return t_test_agg_hits(
            hits.select("doc_id"), docs, field, group_field
        )

    def facet_rare_terms(
        self, query_text: str, docs: DataFrame, field: str,
        max_doc_count: int = 1, max_buckets: int = 1000,
    ) -> DataFrame:
        """Federated rare_terms — the tail buckets aggregate over the
        unioned matching set (a doc lives in one shard, so counts are
        exact)."""
        from tlhop_library_spark.index.query import (
            rare_terms_agg_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self._empty().select("doc_id")
        return rare_terms_agg_hits(
            hits.select("doc_id"), docs, field, max_doc_count,
            max_buckets,
        )

    def search_terms_set(
        self, query_text: str, docs: DataFrame, msm_field: str,
        k: int = 10,
    ) -> DataFrame:
        """Federated terms_set — per-shard counted kernels with
        GLOBAL weight closures; a doc lives in exactly one shard, so
        shard-local distinct-term counts are global counts."""
        from tlhop_library_spark.index.query import (
            _COUNTED_SCHEMA,
            counted_range_scorer,
            terms_set_rank_hits,
        )
        from tlhop_library_spark import similarities

        infos, gdf, gcf = self._resolve_full(query_text)
        if not any(infos):
            return self._empty()
        parts = []
        for r, info in zip(self.readers, infos):
            if not info:
                continue
            ginfo = {
                t: (gdf[t], gcf[t], b, tid)
                for t, (_df, _cf, b, tid) in info.items()
            }
            weight_of = similarities.weight_fns(
                "bm25", ginfo, self.n_docs, int(self.sum_dl),
                avgdl=float(self.avgdl),
            )
            scorer = counted_range_scorer(
                weight_of, deleted=r._deleted
            )

            def _wrap(s):
                return lambda key, pdf: s(key, pdf)

            parts.append(
                r._pruned_segments(ginfo)
                .groupBy("range_id")
                .applyInPandas(_wrap(scorer), schema=_COUNTED_SCHEMA)
            )
        counted = reduce(DataFrame.unionByName, parts)
        return terms_set_rank_hits(counted, docs, msm_field, k)

    def facet_stats(
        self, query_text: str, docs: DataFrame, field: str,
        extended: bool = False,
    ) -> DataFrame:
        """Federated stats / extended_stats ≡ the single-index agg on
        a union index: shard-disjoint hit streams union into the
        global matching set and the partials (count, sum, sum_sq)
        are plain Σs over it."""
        from tlhop_library_spark.index.query import stats_agg_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        return stats_agg_hits(hits, docs, field, extended=extended)

    def search_scan(
        self, query_text: str, slice_id: int = 0, n_slices: int = 1,
    ) -> DataFrame:
        """Federated scroll/scan ≡ the union index's: shard-disjoint
        hit streams union into the global matching set, and the md5
        slice rule is a pure function of doc_id, so slices agree with
        any sharding."""
        from tlhop_library_spark.operators.corpus_stats import slice_scan

        hits = self._fed_hits(query_text)
        if hits is None:
            return self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        if n_slices <= 1:
            if n_slices != 1 or slice_id != 0:
                raise ValueError("need 0 <= slice_id < n_slices")
            return hits
        return slice_scan(hits, slice_id, n_slices)

    def facet_date_histogram(
        self, query_text: str, docs: DataFrame, ts_col: str,
        interval: str = "day",
    ) -> DataFrame:
        """Federated date_histogram ≡ the single-index aggregation on
        a union index: a calendar bucket may span shards; the
        post-union groupBy merges its count exactly."""
        from tlhop_library_spark.index.query import date_histogram_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        return date_histogram_hits(hits, docs, ts_col, interval)

    def facet_pipeline(
        self, query_text: str, docs: DataFrame, ts_col: str,
        interval: str = "day", metric_field: "str | None" = None,
        window: int = 3, min_metric: "float | None" = None,
        sort_by_metric: bool = False, size: "int | None" = None,
    ) -> DataFrame:
        """Federated pipeline aggs ≡ single index on the union: the
        parent buckets merge exactly across shards BEFORE the window
        pass (pipeline columns are computed on the merged bucket
        list, never per shard — a per-shard cumulative sum would be
        wrong for any bucket spanning shards)."""
        from tlhop_library_spark.index.query import pipeline_aggs_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        return pipeline_aggs_hits(
            hits, docs, ts_col, interval, metric_field, window,
            min_metric, sort_by_metric, size,
        )

    def facet_auto_date_histogram(
        self, query_text: str, docs: DataFrame, ts_col: str,
        max_buckets: int = 20,
    ) -> DataFrame:
        """Federated auto_date_histogram — the ladder choice runs
        over the UNIONED matching set (per-shard choices could
        disagree; the merged bucket list must drive the interval)."""
        from tlhop_library_spark.index.query import (
            auto_date_histogram_hits,
        )

        hits = self._fed_hits(query_text)
        if hits is None:
            hits = self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        return auto_date_histogram_hits(
            hits, docs, ts_col, max_buckets
        )

    def facet_composite(
        self, query_text: str, docs: DataFrame, field: str,
        size: int = 10, after: "str | None" = None,
    ) -> DataFrame:
        """Federated composite (paginated terms) aggregation — a
        bucket may span shards; the post-union groupBy merges it
        exactly, and the sargable ``after`` resume predicate applies
        identically to every shard's hits."""
        from tlhop_library_spark.index.query import composite_agg_hits

        hits = self._fed_hits(query_text)
        if hits is None:
            return self.spark.createDataFrame(
                [], "rank int, key string, n_docs long"
            )
        return composite_agg_hits(hits, docs, field, size, after=after)

    def search_decay(
        self, query_text: str, docs: DataFrame, field: str,
        origin: float, scale: float, k: int = 10, decay: float = 0.5,
        offset: float = 0.0, fn: str = "gauss",
    ) -> DataFrame:
        """Federated function_score decay — identical to
        ``IndexReader.search_decay`` on a union index: the decay
        re-rank is a pure function of the (doc_id, score) hit stream,
        which federates with global Σ-stats."""
        from tlhop_library_spark.index.query import decay_rank_hits

        infos, gdf, gcf = self._resolve_full(query_text)
        if not any(infos):
            return self._empty()
        hits = self._weighted_local(infos, gdf, gcf, None, "bm25")
        return decay_rank_hits(
            hits, docs, field, origin, scale, k, decay, offset, fn
        )

    def search_highlight(
        self, query_text: str, docs: DataFrame, k: int = 10,
        fragment_size: int = 8, n_fragments: int = 1,
    ) -> DataFrame:
        """Federated highlighting — identical to
        ``IndexReader.search_highlight`` on a union index: fragments
        are a pure per-hit function of (doc_id, text, query), applied
        to the federated top-k page."""
        from tlhop_library_spark.index.highlight import highlight_hits

        hits = self.search(query_text, k=k)
        return highlight_hits(
            hits, docs, query_text, fragment_size, n_fragments
        ).select("rank", "doc_id", "score", "fragment")

    def search_group_topk(
        self, query_text: str, docs: DataFrame, group_field: str,
        n_groups: int = 5, per_group: int = 3,
    ) -> DataFrame:
        """Federated top_hits grouping — identical to
        ``IndexReader.search_group_topk`` on a union index (the
        grouping consumes only the federated hit stream; a group may
        span shards, which the post-union window handles exactly)."""
        from tlhop_library_spark.index.query import group_topk_hits

        infos, gdf, gcf = self._resolve_full(query_text)
        if not any(infos):
            return self._empty()
        hits = self._weighted_local(infos, gdf, gcf, None, "bm25")
        return group_topk_hits(
            hits, docs, group_field, n_groups, per_group
        )

    def search_sim(
        self, query_text: str, k: int = 10, similarity: str = "classic"
    ) -> DataFrame:
        """Federated pluggable-similarity top-k — rank-identical to
        ``IndexReader.search_sim`` on a single union index (collection
        stats are Σ-across-shards)."""
        infos, gdf, gcf = self._resolve_full(query_text)
        return self._weighted_local(infos, gdf, gcf, k, similarity)

    def search_boosted(self, boosted_query: str, k: int = 10) -> DataFrame:
        """Federated query-boosted BM25 (``term^2.5`` syntax)."""
        from tlhop_library_spark.index.query import parse_boosted_query

        boosts = parse_boosted_query(boosted_query)
        infos, gdf, gcf = self._resolve_full(sorted(boosts))
        return self._weighted_local(
            infos, gdf, gcf, k, "bm25", boosts=boosts
        )

    def search_dismax(
        self, query_text: str, k: int = 10, tie_breaker: float = 0.0
    ) -> DataFrame:
        """Federated DisjunctionMax top-k."""
        infos, gdf, gcf = self._resolve_full(query_text)
        return self._weighted_local(
            infos, gdf, gcf, k, "bm25", tie_breaker=tie_breaker
        )

    def search_after(
        self, query_text: str, after: tuple[float, int], k: int = 10
    ) -> DataFrame:
        """Federated cursor deep paging (Lucene ``searchAfter``)."""
        infos, gdf, gcf = self._resolve_full(query_text)
        return self._weighted_local(
            infos, gdf, gcf, k, "bm25",
            after=(float(after[0]), int(after[1])),
        )

    def term_vectors(self, doc_ids: list[int]) -> DataFrame:
        """Federated TermVectors: shards hold disjoint doc spaces, so
        the union of per-shard vectors is exact (ids absent from a
        shard decode nothing there)."""
        parts = [r.term_vectors(doc_ids) for r in self.readers]
        return reduce(DataFrame.unionByName, parts)

    # ------------------------------------------------------------------
    def count_matches(
        self, query_text: str, match: str = "any"
    ) -> DataFrame:
        """Federated total-hits: shards hold disjoint doc spaces, so
        the exact global count is the Σ of per-shard counts — one long
        per shard range crosses the wire, nothing else."""
        parts = [
            r.count_matches(query_text, match) for r in self.readers
        ]
        return reduce(DataFrame.unionByName, parts).agg(
            F.coalesce(F.sum("n_docs"), F.lit(0))
            .cast("long")
            .alias("n_docs")
        )

    def explain(
        self, query_text: str, k: int = 10, mode: str = "auto"
    ) -> DataFrame:
        """Federated scoring breakdown: identical to
        ``IndexReader.explain`` on a single union index — components
        are decoded per shard, weighted with the federation-global
        idf/avgdl."""
        from tlhop_library_spark.index.query import _attach_explain

        schema = (
            "rank int, doc_id long, term string, tf long, dl long, "
            "idf double, weight double, score double"
        )
        import numpy as np

        infos, idf_by_term = self._resolve(query_text)
        if not idf_by_term:
            return self.spark.createDataFrame([], schema)
        topk = self.search(query_text, k, mode).collect()
        if not topk:
            return self.spark.createDataFrame([], schema)
        keep = np.sort(
            np.array([r["doc_id"] for r in topk], dtype=np.int64)
        )
        parts = [
            r._component_rows(info, keep, idf_by_term)
            for r, info in zip(self.readers, infos)
            if info
        ]
        labeled = reduce(DataFrame.unionByName, parts)
        return _attach_explain(self.spark, labeled, topk, self.avgdl)

    # ------------------------------------------------------------------
    def search_local(
        self, query_text: str, k: int = 10, mode: str = "auto"
    ) -> DataFrame:
        """Serving-path twin of :meth:`search`: every shard's matching
        chunks are fetched driver-side (pruned pyarrow scan) and scored
        by the same kernels with the same global stats — no Spark job.
        Rank-identical to :meth:`search`."""
        infos, idf_by_term = self._resolve(query_text)
        parts = []
        for r, info in zip(self.readers, infos):
            if not info:
                continue
            idf_map = {
                tid: idf_by_term[t] for t, (_, _, tid) in info.items()
            }
            pdf = r._local_chunks(info, SEGMENT_SCHEMA.fields)
            if pdf is None:
                continue
            pdf["avgdl"] = self.avgdl  # global, not the shard's own
            enc = float(
                r.stats.get("min_encode_avgdl", self.avgdl) or self.avgdl
            )
            scale = max(1.0, self.avgdl / enc) if enc > 0 else 1.0
            scorer = _range_scorer(
                idf_map, k, mode, None, None,
                bound_scale=scale, deleted=r._deleted,
            )
            parts.extend(
                scorer((rid,), g)
                for rid, g in pdf.groupby("range_id", sort=False)
            )
        return self.readers[0]._merge_local_topk(parts, k)
