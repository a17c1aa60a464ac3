"""CLI entry for spark-submit runs.

    spark-submit --py-files tlhop.zip -m ...   (or)
    spark-submit --py-files tlhop.zip cli.py build --docs ... --index ...

Subcommands:
    gen     — write the deterministic corpus parquet
    build   — build (or resume) an index over a documents table
    search  — run BM25 top-k against a built index
    bench   — one-line JSON build+query benchmark (see bench.py for the
              driver-contract variant)
    report  — corpus report suite
    merge   — offline index optimize (range-salt coarsening)
    prep    — training-data funnel → parquet of survivors
    append  — add a new document batch to an existing index
    delete  — tombstone doc ids (metadata-only, Lucene semantics)
    expunge — compaction: rewrite without tombstoned postings
    snapshot— checksummed (incremental) copy of an index dir
    restore — materialize an index from a snapshot (verifies checksums)
    slice   — write deterministic slice I of N of a docs table
    alias   — atomic alias add/remove/swap (ES _aliases parity)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tlhop_library_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen")
    g.add_argument("--out", required=True)
    g.add_argument("--docs", type=int, default=10000)
    g.add_argument("--seed", type=int, default=42)

    b = sub.add_parser("build")
    b.add_argument("--docs", required=True, help="documents parquet/table path")
    b.add_argument("--index", required=True)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--ranges", type=int, default=None)
    b.add_argument("--jobs", type=int, default=1)
    b.add_argument("--resume", action="store_true")

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--mode", choices=["bmw", "exhaustive"], default="bmw")
    # the search MODES are mutually exclusive (each routes to a
    # different reader method); combining two used to silently take
    # the first in elif order — now argparse errors loudly instead
    sm = s.add_mutually_exclusive_group()
    sm.add_argument(
        "--all-terms", action="store_true",
        help="conjunctive (AND) semantics: only docs with every term",
    )
    sm.add_argument(
        "--boolean", action="store_true",
        help="parse the query as a Lucene-style AND/OR/NOT expression",
    )
    sm.add_argument(
        "--snippets", metavar="DOCS_PARQUET", default=None,
        help="attach first-match snippets (needs the docs table path)",
    )
    sm.add_argument(
        "--highlight", metavar="DOCS_PARQUET[:SIZE[:NFRAGS]]",
        default=None,
        help="plain-highlighter fragments: best-scoring token windows "
        "with query terms wrapped in <em> (needs the docs table path)",
    )
    sm.add_argument(
        "--wildcard", action="store_true",
        help="expand '*'-suffixed words against the dictionary "
        "(prefix search)",
    )
    sm.add_argument(
        "--serve", action="store_true",
        help="low-latency serving path: driver-side chunk scan, "
        "auto-routed by posting volume",
    )
    sm.add_argument(
        "--fuzzy", type=int, default=None, metavar="EDITS",
        help="typo tolerance: expand terms to dictionary entries "
        "within EDITS Levenshtein edits",
    )
    sm.add_argument(
        "--facets", metavar="DOCS_PARQUET:COL", default=None,
        help="print per-facet match counts instead of top-k "
        "(e.g. /data/docs.parquet:lang)",
    )
    sm.add_argument(
        "--similarity",
        choices=["classic", "lmdirichlet", "lmjelinekmercer"],
        default=None,
        help="rank with a pluggable similarity instead of BM25",
    )
    sm.add_argument(
        "--dismax", type=float, default=None, metavar="TIE",
        help="DisjunctionMax combination with the given tie-breaker",
    )
    sm.add_argument(
        "--boosted", action="store_true",
        help="parse Lucene 'term^2.5' per-term query boosts",
    )
    sm.add_argument(
        "--after", metavar="SCORE,DOC_ID", default=None,
        help="cursor deep paging: return the top-k strictly after "
        "the (score, doc_id) cursor",
    )
    sm.add_argument(
        "--span-near", type=int, default=None, metavar="SLOP",
        help="ordered span-near: terms left-to-right in query order "
        "within SLOP intervening positions (positional index)",
    )
    sm.add_argument(
        "--phrase-prefix", action="store_true",
        help="match-phrase-prefix (search-as-you-type): exact leading "
        "phrase + any completion of the trailing prefix",
    )
    sm.add_argument(
        "--sig-terms", action="store_true",
        help="significant_terms aggregation (JLH) over the matching "
        "set instead of top-k docs",
    )
    sm.add_argument(
        "--rescore",
        choices=["classic", "lmdirichlet", "lmjelinekmercer"],
        default=None,
        help="two-pass rescore: BM25 window re-ranked by the given "
        "second similarity",
    )
    sm.add_argument(
        "--span-not", metavar="EXCL[:SLOP[:PRE[:POST]]]", default=None,
        help="ordered span-near of the query terms with spans "
        "rejected when EXCL occurs in [start-PRE, end+POST] "
        "(positional index)",
    )
    sm.add_argument(
        "--boosting", metavar="NEGQUERY[:NB]", default=None,
        help="ES boosting query: demote docs also matching NEGQUERY "
        "by factor NB (default 0.5) — never filters",
    )
    sm.add_argument(
        "--random", type=int, default=None, metavar="SEED",
        help="function_score.random_score: seeded deterministic "
        "uniform re-rank of the matching set",
    )
    sm.add_argument(
        "--terms-set", metavar="DOCS_PARQUET:COL", default=None,
        help="terms_set query: per-doc minimum_should_match from the "
        "given docs column",
    )
    sm.add_argument(
        "--stats", metavar="DOCS_PARQUET:COL", default=None,
        help="extended_stats aggregation over the matching set "
        "instead of top-k docs",
    )
    sm.add_argument(
        "--composite", metavar="DOCS_PARQUET:COL[:SIZE[:AFTER]]",
        default=None,
        help="composite (paginated terms) aggregation; resume "
        "strictly after AFTER",
    )
    sm.add_argument(
        "--diversified", metavar="DOCS_PARQUET:COL[:MAX]",
        default=None,
        help="diversified_sampler: top-k with at most MAX hits "
        "(default 1) per distinct COL value",
    )
    sm.add_argument(
        "--rank-feature", metavar="DOCS_PARQUET:COL[:PIVOT[:BOOST]]",
        default=None,
        help="rank_feature ⊕ BM25: add boost·saturation(COL, PIVOT) "
        "to the text score (static doc-quality boost)",
    )
    sm.add_argument(
        "--pinned", metavar="DOCS_PARQUET:ID1,ID2,...", default=None,
        help="pinned query: the listed doc ids rank first in list "
        "order, organic BM25 ranking after",
    )
    sm.add_argument(
        "--bool-prefix", action="store_true",
        help="match_bool_prefix (unordered type-ahead): trailing "
        "token matched as a dictionary prefix, no position "
        "constraint",
    )
    sm.add_argument(
        "--histogram", metavar="DOCS_PARQUET:COL:INTERVAL",
        default=None,
        help="histogram aggregation: fixed-interval numeric buckets "
        "over the matching set instead of top-k docs",
    )
    sm.add_argument(
        "--terms-stats", metavar="DOCS_PARQUET:KEY:METRIC[:SIZE]",
        default=None,
        help="terms aggregation with a stats sub-agg: top KEY "
        "buckets, each with METRIC cnt/min/max/sum/avg",
    )
    sm.add_argument(
        "--multi-terms", metavar="DOCS_PARQUET:COL1,COL2[:SIZE]",
        default=None,
        help="multi_terms aggregation: composite-key buckets over "
        "the matching set",
    )
    sm.add_argument(
        "--percentiles", metavar="DOCS_PARQUET:COL[:P1,P2,...]",
        default=None,
        help="exact percentiles aggregation over the matching set "
        "(fractions in [0,1]; default 0.25,0.5,0.75)",
    )
    sm.add_argument(
        "--missing", metavar="DOCS_PARQUET:COL", default=None,
        help="missing aggregation: matching docs with a NULL field",
    )
    sm.add_argument(
        "--rare-terms", metavar="DOCS_PARQUET:COL[:MAXDC[:BUDGET]]",
        default=None,
        help="rare_terms aggregation: exact long-tail buckets "
        "(doc_count <= MAXDC, at most BUDGET buckets)",
    )

    ms = sub.add_parser(
        "msearch",
        help="multi-field search over one index per field "
        "(ES multi_match: most_fields / best_fields / cross_fields)",
    )
    ms.add_argument(
        "--field", action="append", required=True, metavar="NAME=DIR",
        help="field index (repeat per field), e.g. --field title=/idx/t",
    )
    ms.add_argument("--query", required=True)
    ms.add_argument("-k", type=int, default=10)
    ms.add_argument(
        "--type",
        choices=["most_fields", "best_fields", "cross_fields",
                 "combined_fields"],
        default="most_fields",
    )
    ms.add_argument(
        "--boost", action="append", default=[], metavar="NAME=W",
        help="query-time field boost (repeat per field)",
    )
    ms.add_argument(
        "--tie", type=float, default=0.0,
        help="tie_breaker for best_fields/cross_fields",
    )

    sg = sub.add_parser("suggest")
    sg.add_argument("--index", required=True)
    sg.add_argument("--term", required=True)
    sg.add_argument("--max-edits", type=int, default=2)
    sg.add_argument("-n", type=int, default=5)
    sgm = sg.add_mutually_exclusive_group()
    sgm.add_argument(
        "--prefix", action="store_true",
        help="prefix autocomplete over the dictionary (cf-ranked) "
        "instead of edit-distance did-you-mean",
    )
    sgm.add_argument(
        "--phrase", metavar="DOCS_PARQUET", default=None,
        help="multi-word did-you-mean ranked by the corpus bigram LM "
        "(needs the docs table path for LM training)",
    )

    ad = sub.add_parser("append")
    ad.add_argument("--index", required=True)
    ad.add_argument("--docs", required=True, help="new-batch parquet path")

    dl = sub.add_parser("delete")
    dl.add_argument("--index", required=True)
    dlg = dl.add_mutually_exclusive_group(required=True)
    dlg.add_argument(
        "--ids",
        help="comma list of doc ids, or @path to a parquet of doc_id",
    )
    dlg.add_argument(
        "--query",
        help="ES _delete_by_query: tombstone every doc matching the "
        "OR query (distributed matching-set scan)",
    )

    ex = sub.add_parser("expunge")
    ex.add_argument("--index", required=True)
    ex.add_argument("--out", required=True)

    r = sub.add_parser("report")
    r.add_argument("--docs", required=True)
    r.add_argument("--out", required=True)

    mg = sub.add_parser("merge")
    mg.add_argument("--index", required=True)
    mg.add_argument("--out", required=True)
    mg.add_argument("--factor", type=int, default=4)

    st = sub.add_parser("stats")
    st.add_argument("--index", required=True)

    fs = sub.add_parser("fsck")
    fs.add_argument("--index", required=True)
    fs.add_argument("--strict", action="store_true",
                    help="exit 1 on any failed check")

    sn = sub.add_parser(
        "snapshot",
        help="checksummed (incremental) snapshot of an index dir",
    )
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True)
    sn.add_argument("--full", action="store_true",
                    help="copy everything even if unchanged")

    rs = sub.add_parser(
        "restore", help="materialize an index from a snapshot"
    )
    rs.add_argument("--snap", required=True)
    rs.add_argument("--dest", required=True)
    rs.add_argument("--overwrite", action="store_true")

    sl = sub.add_parser(
        "slice",
        help="write deterministic slice I of N of a docs table "
        "(sliced-scroll parallel export)",
    )
    sl.add_argument("--docs", required=True)
    sl.add_argument("--out", required=True)
    sl.add_argument("--slice", type=int, required=True)
    sl.add_argument("--of", type=int, required=True)

    al = sub.add_parser(
        "alias",
        help="ES _aliases parity: atomic add/remove/swap on a JSON "
        "registry; 'resolve' prints an alias's index dirs",
    )
    al.add_argument("--registry", required=True)
    al.add_argument("--add", action="append", default=[],
                    metavar="ALIAS=DIR")
    al.add_argument("--remove", action="append", default=[],
                    metavar="ALIAS=DIR|ALIAS=*")
    al.add_argument("--resolve", metavar="ALIAS", default=None)

    pr = sub.add_parser("prep")
    pr.add_argument("--docs", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--min-quality", type=float, default=0.55)
    pr.add_argument("--jaccard", type=float, default=0.5)
    def _shingle_df(v: str):
        if v == "auto":
            return "auto"
        if v in ("none", "off"):
            return None
        return int(v)

    pr.add_argument(
        "--max-shingle-df", type=_shingle_df, default="auto",
        help="boilerplate-shingle df cap: an int, 'auto' "
        "(max(100, 0.1%% of docs) — default), or 'none'",
    )

    pb = sub.add_parser(
        "pqstore-build",
        help="train (coarse + residual PQ) on the embeddings table "
        "and persist a cell-partitioned code store",
    )
    pb.add_argument("--embeddings", required=True)
    pb.add_argument("--out", required=True)
    pb.add_argument("--m", type=int, default=8)
    pb.add_argument("--k", type=int, default=256)
    pb.add_argument("--cells", type=int, default=64)
    pb.add_argument("--iters", type=int, default=6)
    pb.add_argument("--seed", type=int, default=7)
    pb.add_argument("--sample-n", type=int, default=10000)
    pb.add_argument("--shard-mod", type=int, default=1,
                    help="write N disjoint shards (vec_id %% N)")

    pq = sub.add_parser(
        "pqstore-query",
        help="residual-IVFADC top-k over one or more code stores",
    )
    pq.add_argument("--store", action="append", required=True)
    pq.add_argument("--qvec", required=True,
                    help="comma-separated query floats")
    pq.add_argument("--k", type=int, default=10)
    pq.add_argument("--n-probe", type=int, default=8)

    args = ap.parse_args(argv)

    if args.cmd == "gen":
        from tlhop_library_spark.corpus import write_corpus_parquet

        write_corpus_parquet(args.out, args.docs, args.seed)
        print(json.dumps({"written": args.out, "docs": args.docs}))
        return 0

    if args.cmd == "alias":
        from tlhop_library_spark.index.aliases import (
            read_aliases,
            update_aliases,
        )

        if args.resolve is not None:
            print(json.dumps(
                read_aliases(args.registry).get(args.resolve, [])
            ))
            return 0
        actions = []
        # removes first so an add=remove pair on one CLI line is the
        # blue/green swap (both land in ONE atomic registry rename)
        for spec in args.remove:
            a, _, d = spec.partition("=")
            actions.append({"remove": {"alias": a, "index": d or "*"}})
        for spec in args.add:
            a, _, d = spec.partition("=")
            actions.append({"add": {"alias": a, "index": d}})
        print(json.dumps(update_aliases(args.registry, actions)))
        return 0
    if args.cmd == "snapshot":
        from tlhop_library_spark.index.snapshot import snapshot_index

        print(json.dumps(snapshot_index(
            args.index, args.out, incremental=not args.full
        )))
        return 0
    if args.cmd == "restore":
        from tlhop_library_spark.index.snapshot import restore_index

        print(json.dumps(restore_index(
            args.snap, args.dest, overwrite=args.overwrite
        )))
        return 0

    from tlhop_library_spark.session import get_spark

    spark = get_spark("tlhop-cli")
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "build":
        from tlhop_library_spark.index.build import IndexBuilder

        docs = spark.read.parquet(args.docs)
        t0 = time.time()
        stats = IndexBuilder(
            spark, args.index, n_buckets=args.buckets,
            n_ranges=args.ranges, n_jobs=args.jobs,
        ).build(docs, resume=args.resume)
        stats["docs_per_sec"] = round(stats["n_docs"] / (time.time() - t0), 1)
        print(json.dumps(stats))
    elif args.cmd == "search":
        from tlhop_library_spark.index.query import IndexReader

        reader = IndexReader(spark, args.index)
        if args.facets:
            path, _, col = args.facets.rpartition(":")
            docs = spark.read.parquet(path)
            rows = reader.facet_counts(args.query, docs, col).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.fuzzy is not None:
            rows = reader.search_fuzzy(
                args.query, args.k, max_edits=args.fuzzy
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.wildcard:
            rows = reader.search_wildcard(args.query, args.k).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.serve:
            rows = reader.search_serve(args.query, args.k).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.snippets:
            docs = spark.read.parquet(args.snippets)
            rows = reader.search_snippets(
                args.query, docs, args.k, mode=args.mode
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.highlight:
            path, _, rest = args.highlight.partition(":")
            size_s, _, nf_s = rest.partition(":")
            docs = spark.read.parquet(path)
            rows = reader.search_highlight(
                args.query, docs, args.k,
                fragment_size=int(size_s) if size_s else 8,
                n_fragments=int(nf_s) if nf_s else 1,
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.similarity:
            rows = reader.search_sim(
                args.query, args.k, similarity=args.similarity
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.dismax is not None:
            rows = reader.search_dismax(
                args.query, args.k, tie_breaker=args.dismax
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.boosted:
            rows = reader.search_boosted(args.query, args.k).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.after:
            score_s, _, doc_s = args.after.partition(",")
            rows = reader.search_after(
                args.query, (float(score_s), int(doc_s)), args.k
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.span_near is not None:
            rows = reader.search_span_near(
                args.query, slop=args.span_near, k=args.k
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.phrase_prefix:
            rows = reader.search_phrase_prefix(args.query, args.k).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.sig_terms:
            rows = reader.significant_terms(args.query, m=args.k).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.rescore:
            rows = reader.search_rescore(
                args.query, k=args.k, similarity=args.rescore
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.span_not is not None:
            parts = args.span_not.split(":")
            excl = parts[0]
            slop = int(parts[1]) if len(parts) > 1 else 0
            pre = int(parts[2]) if len(parts) > 2 else 0
            post = int(parts[3]) if len(parts) > 3 else 0
            rows = reader.search_span_not(
                args.query, excl, slop=slop, k=args.k, pre=pre,
                post=post,
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.boosting is not None:
            negq, _, nb_s = args.boosting.rpartition(":")
            if not negq:  # no ':' — the whole arg is the query
                negq, nb_s = nb_s, ""
            nb = float(nb_s) if nb_s else 0.5
            rows = reader.search_boosting(
                args.query, negq, k=args.k, negative_boost=nb
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.random is not None:
            rows = reader.search_random(
                args.query, args.k, seed=args.random
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.terms_set is not None:
            path, _, col = args.terms_set.rpartition(":")
            docs = spark.read.parquet(path)
            rows = reader.search_terms_set(
                args.query, docs, col, k=args.k
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.stats is not None:
            path, _, col = args.stats.rpartition(":")
            docs = spark.read.parquet(path)
            rows = reader.facet_stats(
                args.query, docs, col, extended=True
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.composite is not None:
            spec = args.composite.split(":")
            path, col = spec[0], spec[1]
            size = int(spec[2]) if len(spec) > 2 else 10
            after = spec[3] if len(spec) > 3 else None
            docs = spark.read.parquet(path)
            rows = reader.facet_composite(
                args.query, docs, col, size=size, after=after
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.diversified is not None:
            spec = args.diversified.split(":")
            docs = spark.read.parquet(spec[0])
            m = int(spec[2]) if len(spec) > 2 else 1
            rows = reader.search_diversified(
                args.query, docs, spec[1], max_per_key=m, k=args.k
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.rank_feature is not None:
            spec = args.rank_feature.split(":")
            docs = spark.read.parquet(spec[0])
            pivot = float(spec[2]) if len(spec) > 2 else 1.0
            boost = float(spec[3]) if len(spec) > 3 else 1.0
            rows = reader.search_rank_feature(
                args.query, docs, spec[1], k=args.k,
                pivot=pivot, boost=boost,
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.pinned is not None:
            path, _, ids = args.pinned.rpartition(":")
            docs = spark.read.parquet(path)
            pins = [int(x) for x in ids.split(",") if x]
            rows = reader.search_pinned(
                args.query, docs, pins, k=args.k
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.bool_prefix:
            rows = reader.search_bool_prefix(
                args.query, k=args.k
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.histogram is not None:
            spec = args.histogram.split(":")
            docs = spark.read.parquet(spec[0])
            rows = reader.facet_histogram(
                args.query, docs, spec[1], float(spec[2])
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.terms_stats is not None:
            spec = args.terms_stats.split(":")
            docs = spark.read.parquet(spec[0])
            size = int(spec[3]) if len(spec) > 3 else 10
            rows = reader.facet_terms_stats(
                args.query, docs, spec[1], spec[2], size=size
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.multi_terms is not None:
            spec = args.multi_terms.split(":")
            docs = spark.read.parquet(spec[0])
            size = int(spec[2]) if len(spec) > 2 else 10
            rows = reader.facet_multi_terms(
                args.query, docs, spec[1].split(","), size=size
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.percentiles is not None:
            spec = args.percentiles.split(":")
            docs = spark.read.parquet(spec[0])
            ps = (
                [float(x) for x in spec[2].split(",")]
                if len(spec) > 2 else None
            )
            rows = reader.facet_percentiles(
                args.query, docs, spec[1], ps
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.missing is not None:
            path, _, col = args.missing.rpartition(":")
            docs = spark.read.parquet(path)
            rows = reader.facet_missing(
                args.query, docs, col
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.rare_terms is not None:
            spec = args.rare_terms.split(":")
            docs = spark.read.parquet(spec[0])
            maxdc = int(spec[2]) if len(spec) > 2 else 1
            budget = int(spec[3]) if len(spec) > 3 else 1000
            rows = reader.facet_rare_terms(
                args.query, docs, spec[1], maxdc, budget
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.all_terms:
            rows = reader.search_and(args.query, args.k).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.boolean:
            rows = reader.search_boolean(args.query, args.k).collect()
            print(json.dumps([r.asDict() for r in rows]))
        else:
            rows = reader.search(args.query, args.k, mode=args.mode).collect()
            print(
                json.dumps(
                    [
                        {
                            "rank": r["rank"],
                            "doc_id": r["doc_id"],
                            "score": r["score"],
                        }
                        for r in rows
                    ]
                )
            )
    elif args.cmd == "msearch":
        from tlhop_library_spark.index import MultiFieldIndexReader

        dirs = dict(kv.split("=", 1) for kv in args.field)
        boosts = {
            f: float(w)
            for f, w in (kv.split("=", 1) for kv in args.boost)
        }
        mf = MultiFieldIndexReader(spark, dirs)
        if args.type == "most_fields":
            df = mf.search(args.query, k=args.k, boosts=boosts)
        elif args.type == "best_fields":
            df = mf.search_best_fields(
                args.query, k=args.k, boosts=boosts, tie_breaker=args.tie
            )
        elif args.type == "combined_fields":
            df = mf.search_combined_fields(
                args.query, k=args.k, weights=boosts
            )
        else:
            df = mf.search_cross_fields(
                args.query, k=args.k, boosts=boosts, tie_breaker=args.tie
            )
        print(json.dumps([r.asDict() for r in df.collect()]))
    elif args.cmd == "suggest":
        from tlhop_library_spark.index.query import IndexReader

        reader = IndexReader(spark, args.index)
        if args.prefix:
            rows = reader.autocomplete(args.term, n=args.n).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.phrase:
            docs = spark.read.parquet(args.phrase)
            rows = reader.suggest_phrase(
                args.term, docs, n=args.n, max_edits=args.max_edits
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        else:
            out = reader.suggest(args.term, args.max_edits, args.n)
            print(
                json.dumps(
                    [
                        {"term": t, "distance": d, "df": df}
                        for t, d, df in out
                    ]
                )
            )
    elif args.cmd == "stats":
        from tlhop_library_spark.index.query import IndexReader

        print(json.dumps(IndexReader(spark, args.index).describe()))
    elif args.cmd == "slice":
        from tlhop_library_spark.operators.corpus_stats import slice_scan

        docs = spark.read.parquet(args.docs)
        part = slice_scan(docs, args.slice, args.of)
        part.write.mode("overwrite").parquet(args.out)
        print(json.dumps({
            "written": args.out, "slice": args.slice, "of": args.of,
            "rows": spark.read.parquet(args.out).count(),
        }))
    elif args.cmd == "append":
        from tlhop_library_spark.index import add_documents

        stats = add_documents(spark, args.index, spark.read.parquet(args.docs))
        print(json.dumps(stats))
    elif args.cmd == "delete":
        from tlhop_library_spark.index import delete_documents
        from tlhop_library_spark.index.delete import delete_by_query

        if args.query is not None:
            stats = delete_by_query(spark, args.index, args.query)
        elif args.ids.startswith("@"):
            ids = spark.read.parquet(args.ids[1:])
            stats = delete_documents(spark, args.index, ids)
        else:
            ids = [int(x) for x in args.ids.split(",") if x]
            stats = delete_documents(spark, args.index, ids)
        print(json.dumps(stats))
    elif args.cmd == "expunge":
        from tlhop_library_spark.index import expunge_deletes

        stats = expunge_deletes(spark, args.index, args.out)
        print(json.dumps(stats))
    elif args.cmd == "report":
        from tlhop_library_spark.reports import CorpusReport

        docs = spark.read.parquet(args.docs)
        out = CorpusReport(spark, args.out).run_all(docs)
        print(json.dumps({k: v.count() for k, v in out.items()}))
    elif args.cmd == "merge":
        from tlhop_library_spark.index.merge import merge_index_ranges

        stats = merge_index_ranges(spark, args.index, args.out, args.factor)
        print(json.dumps(stats))
    elif args.cmd == "fsck":
        from tlhop_library_spark.index.fsck import verify_index

        rows = [r.asDict() for r in verify_index(spark, args.index).collect()]
        print(json.dumps(rows))
        if args.strict and any(r["status"] != "ok" for r in rows):
            return 1
    elif args.cmd == "prep":
        from tlhop_library_spark.pipeline import prepare_training_data

        docs = spark.read.parquet(args.docs)
        out = prepare_training_data(
            docs,
            min_quality=args.min_quality,
            jaccard_threshold=args.jaccard,
            max_shingle_df=args.max_shingle_df,
        )
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"survivors": n, "out": args.out}))
    elif args.cmd == "pqstore-build":
        import os as _os

        from tlhop_library_spark.operators.pq import (
            train_coarse,
            train_pq_residual,
        )
        from tlhop_library_spark.operators.pq_store import (
            write_pq_store,
        )

        emb = spark.read.parquet(args.embeddings)
        coarse = train_coarse(
            emb, n_centroids=args.cells, iters=args.iters,
            seed=args.seed, sample_n=args.sample_n,
        )
        cb = train_pq_residual(
            emb, coarse, m=args.m, k=args.k, iters=args.iters,
            seed=args.seed, sample_n=args.sample_n,
        )
        from pyspark.sql import functions as _F

        shards = []
        for i in range(max(1, args.shard_mod)):
            part = (
                emb
                if args.shard_mod <= 1
                else emb.where(_F.col("vec_id") % args.shard_mod == i)
            )
            p = (
                args.out
                if args.shard_mod <= 1
                else _os.path.join(args.out, f"shard{i}")
            )
            man = write_pq_store(part, p, cb, coarse)
            shards.append({"path": p, "n_vectors": man["n_vectors"],
                           "skew_ratio": man["skew_ratio"]})
        print(json.dumps({"out": args.out, "shards": shards}))
    elif args.cmd == "pqstore-query":
        from tlhop_library_spark.operators.pq_store import (
            PQStoreReader,
            ShardedPQStoreReader,
        )

        qv = [float(x) for x in args.qvec.split(",")]
        reader = (
            PQStoreReader(spark, args.store[0])
            if len(args.store) == 1
            else ShardedPQStoreReader(spark, args.store)
        )
        rows = reader.topk(qv, k=args.k, n_probe=args.n_probe).collect()
        print(json.dumps([
            {"rank": r["rank"], "vec_id": r["vec_id"],
             "adc_dist": r["adc_dist"]}
            for r in rows
        ]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
