"""Sequence packing (concat-and-chunk block maps) — spec v1."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.operators.packing import (
    oracle_sql_pack_blocks,
    oracle_sql_packing_summary,
    pack_blocks,
    packing_summary,
)


def _py_pack(rows, block_len, shard_docs):
    """Driver-side reference: greedy concat-and-chunk per shard."""
    out = {}
    by_shard = {}
    for doc_id, text in sorted(rows):
        n = len(py_tokens(text)) if text is not None else 0
        if n == 0:
            continue
        shard = doc_id // shard_docs
        off = by_shard.get(shard, 0)
        out[doc_id] = (
            shard,
            n,
            off,
            off // block_len,
            (off + n - 1) // block_len,
        )
        by_shard[shard] = off + n
    return out


def test_pack_blocks_matches_python_reference(spark, corpus_df):
    rows = [(r["doc_id"], r["text"]) for r in corpus_df.collect()]
    want = _py_pack(rows, block_len=64, shard_docs=100)
    got = {
        r["doc_id"]: (
            r["shard"],
            r["n_tokens"],
            r["start_off"],
            r["first_block"],
            r["last_block"],
        )
        for r in pack_blocks(
            corpus_df, block_len=64, shard_docs=100
        ).collect()
    }
    assert got == want


def test_pack_blocks_duckdb_oracle(spark, corpus_df, corpus_path):
    got = [
        tuple(r)
        for r in pack_blocks(corpus_df, 64, 100)
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    want = con.execute(oracle_sql_pack_blocks(64, 100)).fetchall()
    assert got == [tuple(w) for w in want]


def test_packing_summary_duckdb_oracle(spark, corpus_df, corpus_path):
    got = [
        tuple(r)
        for r in packing_summary(corpus_df, 64, 100)
        .orderBy("shard")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    want = con.execute(oracle_sql_packing_summary(64, 100)).fetchall()
    assert got == [tuple(w) for w in want]
    # invariants: blocks cover tokens exactly; padding < block_len
    for _, n_docs, n_tokens, n_blocks, pad, _ in got:
        assert n_blocks * 64 - pad == n_tokens
        assert 0 <= pad < 64
        assert n_docs > 0


def test_pack_blocks_shards_are_independent(spark, corpus_df):
    """Packing a single shard's docs alone yields the same offsets as
    packing the whole corpus — the no-cross-shard-coordination
    property that lets loader workers own shards independently."""
    whole = {
        r["doc_id"]: (r["start_off"], r["first_block"])
        for r in pack_blocks(corpus_df, 64, 100)
        .where(F.col("shard") == 2)
        .collect()
    }
    alone = {
        r["doc_id"]: (r["start_off"], r["first_block"])
        for r in pack_blocks(
            corpus_df.where(
                (F.col("doc_id") >= 200) & (F.col("doc_id") < 300)
            ),
            64,
            100,
        ).collect()
    }
    assert whole == alone and whole


def test_pack_blocks_plan_has_no_global_window(spark, corpus_df):
    """The running sum must be partitioned by shard — never the
    Exchange SinglePartition funnel of an unpartitioned window."""
    plan = (
        pack_blocks(corpus_df, 64, 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_pack_blocks_rejects_bad_params(spark, corpus_df):
    with pytest.raises(ValueError):
        pack_blocks(corpus_df, 0, 10)
    with pytest.raises(ValueError):
        pack_blocks(corpus_df, 10, 0)


def test_pack_blocks_shuffled_is_permutation_with_same_blocks(
    spark, corpus_df
):
    """shuffle_salt reorders docs within shards deterministically:
    same doc set, same per-shard token totals (summary invariant),
    different offsets; two runs with the same salt agree exactly and
    a different salt gives a different order."""
    a1 = {
        r["doc_id"]: r["start_off"]
        for r in pack_blocks(
            corpus_df, 64, 100, shuffle_salt="epoch1"
        ).collect()
    }
    a2 = {
        r["doc_id"]: r["start_off"]
        for r in pack_blocks(
            corpus_df, 64, 100, shuffle_salt="epoch1"
        ).collect()
    }
    b = {
        r["doc_id"]: r["start_off"]
        for r in pack_blocks(
            corpus_df, 64, 100, shuffle_salt="epoch2"
        ).collect()
    }
    plain = {
        r["doc_id"]: r["start_off"]
        for r in pack_blocks(corpus_df, 64, 100).collect()
    }
    assert a1 == a2
    assert set(a1) == set(plain) == set(b)
    assert a1 != plain and a1 != b
    # per-shard totals invariant under permutation
    from collections import Counter

    def shard_tokens(m):
        c = Counter()
        for r in m:
            c[r["shard"]] += r["n_tokens"]
        return dict(c)

    sh_plain = shard_tokens(pack_blocks(corpus_df, 64, 100).collect())
    sh_shuf = shard_tokens(
        pack_blocks(corpus_df, 64, 100, shuffle_salt="epoch1").collect()
    )
    assert sh_plain == sh_shuf
