"""Index aliases: atomic batch swap, multi-index federation resolve."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def _ranks(reader, q="bace cada", k=10):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in reader.search(q, k=k).collect()
    ]


def test_add_resolve_single(spark, index_dir, tmp_path):
    from tlhop_library_spark.index import (
        IndexReader,
        reader_for_alias,
        update_aliases,
    )

    reg = str(tmp_path / "aliases.json")
    m = update_aliases(reg, [{"add": {"alias": "docs", "index": index_dir}}])
    assert m == {"docs": [index_dir]}
    r = reader_for_alias(spark, reg, "docs")
    assert isinstance(r, IndexReader)
    assert _ranks(r) == _ranks(IndexReader(spark, index_dir))


def test_blue_green_swap_is_atomic_batch(spark, index_dir, tmp_path):
    """The remove+add pair lands in ONE rename: the registry on disk
    never names zero indexes mid-swap."""
    from tlhop_library_spark.index import (
        read_aliases,
        snapshot_index,
        restore_index,
        update_aliases,
    )

    green = str(tmp_path / "green")
    snapshot_index(index_dir, str(tmp_path / "snap"))
    restore_index(str(tmp_path / "snap"), green)

    reg = str(tmp_path / "aliases.json")
    update_aliases(reg, [{"add": {"alias": "live", "index": index_dir}}])
    m = update_aliases(reg, [
        {"remove": {"alias": "live", "index": index_dir}},
        {"add": {"alias": "live", "index": green}},
    ])
    assert m == {"live": [green]}
    assert read_aliases(reg) == {"live": [green]}
    # no temp files left behind
    assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []


def test_failed_batch_changes_nothing(index_dir, tmp_path):
    from tlhop_library_spark.index import read_aliases, update_aliases

    reg = str(tmp_path / "aliases.json")
    update_aliases(reg, [{"add": {"alias": "a", "index": index_dir}}])
    before = read_aliases(reg)
    with pytest.raises(ValueError, match="not an index"):
        update_aliases(reg, [
            {"remove": {"alias": "a", "index": index_dir}},
            {"add": {"alias": "a", "index": str(tmp_path)}},  # invalid
        ])
    assert read_aliases(reg) == before


def test_multi_index_alias_federates(spark, corpus_df, index_dir,
                                     tmp_path_factory, tmp_path):
    from tlhop_library_spark.index import (
        IndexReader,
        ShardedIndexReader,
        reader_for_alias,
        update_aliases,
    )
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("alias_shards")
    dirs = []
    for i in range(2):
        d = str(base / f"s{i}")
        IndexBuilder(spark, d, n_buckets=4, n_ranges=4, n_jobs=2).build(
            corpus_df.where(F.col("doc_id") % 2 == i)
        )
        dirs.append(d)
    reg = str(tmp_path / "aliases.json")
    update_aliases(reg, [
        {"add": {"alias": "all", "index": dirs[0]}},
        {"add": {"alias": "all", "index": dirs[1]}},
    ])
    r = reader_for_alias(spark, reg, "all")
    assert isinstance(r, ShardedIndexReader)
    assert _ranks(r) == _ranks(IndexReader(spark, index_dir))


def test_guards(index_dir, tmp_path):
    from tlhop_library_spark.index import update_aliases

    reg = str(tmp_path / "aliases.json")
    with pytest.raises(KeyError):
        update_aliases(reg, [{"remove": {"alias": "x", "index": "*"}}])
    with pytest.raises(ValueError, match="bad action"):
        update_aliases(reg, [{"frobnicate": {"alias": "x", "index": "y"}}])
    update_aliases(reg, [{"add": {"alias": "a", "index": index_dir}}])
    with pytest.raises(KeyError, match="does not point"):
        update_aliases(
            reg, [{"remove": {"alias": "a", "index": "/nope"}}]
        )
    # wildcard removal deletes the alias
    m = update_aliases(reg, [{"remove": {"alias": "a", "index": "*"}}])
    assert m == {}
    assert json.load(open(reg)) == {}


def test_concurrent_updaters_lose_no_batch(index_dir, tmp_path):
    # round-3 ADVICE: update_aliases was an unlocked read-modify-write
    # — two concurrent updaters could silently drop a batch. The
    # writer lock serializes them: every alias lands.
    import threading

    from tlhop_library_spark.index import read_aliases, update_aliases

    reg = str(tmp_path / "aliases.json")
    n, errs = 24, []

    def add(i: int) -> None:
        try:
            update_aliases(
                reg, [{"add": {"alias": f"a{i}", "index": index_dir}}]
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=add, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sorted(read_aliases(reg)) == sorted(f"a{i}" for i in range(n))
