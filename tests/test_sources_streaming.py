"""Converter, catalog IO, and streaming tests."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tlhop_library_spark.sources.catalog import TableCatalog, read_csv, read_jsonl
from tlhop_library_spark.sources.converter import convert_dump, normalize, read_dump
from tlhop_library_spark.streaming.events import (
    sessionize_batch,
    windowed_counts,
)


@pytest.fixture(scope="module")
def dump_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("dump") / "pages.jsonl"
    rows = [
        {
            "url": f"https://ex{i}.test/p",
            "warc_ts": f"2025-02-0{1 + i % 9} 10:0{i % 6}:00",
            "html": f"<html><body><p>page {i} words here</p></body></html>",
            "lang": "en",
        }
        for i in range(20)
    ]
    rows.append({"url": "", "warc_ts": "2025-02-01 00:00:00", "html": "x", "lang": ""})
    rows.append({"url": "https://nots.test/", "warc_ts": None, "html": "y", "lang": "en"})
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def test_convert_dump_idempotent(spark, dump_path, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "warehouse"))
    n1 = convert_dump(spark, dump_path, cat)
    assert n1 == 20  # empty-url and null-ts rows dropped
    n2 = convert_dump(spark, dump_path, cat)  # resume/idempotency
    assert n2 == 0
    out = cat.read("documents")
    assert out.count() == 20
    row = out.where(F.col("url") == "https://ex3.test/p").collect()[0]
    assert row["text"] == "page 3 words here"
    assert row["year"] == 2025
    assert row["doc_id"] is not None


def test_normalize_empty_to_null(spark, dump_path):
    raw = read_dump(spark, dump_path)
    assert raw.count() == 22
    norm = normalize(raw)
    assert norm.count() == 20
    assert norm.columns[:6] == ["doc_id", "url", "warc_ts", "html", "text", "lang"]


def test_read_dump_two_pass(spark, dump_path):
    df = read_dump(spark, dump_path, fast_mode=False)
    # two-pass demotes everything to string (strings-as-JSON escape hatch)
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)


def test_catalog_partitioned_write_prunes(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path))
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))
    cat.write_partitioned(df, "t1", ["part"], mode="overwrite")
    back = cat.read("t1").where(F.col("part") == 2)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 25
    # partition filter must reach the scan (pruned directories)
    assert "PartitionFilters: [isnotnull(part" in plan


def test_catalog_compact(spark, tmp_path):
    import os

    cat = TableCatalog(spark, str(tmp_path))
    df = spark.range(1000).repartition(16)
    cat.write_partitioned(df, "t2", [], mode="overwrite")
    cat.compact("t2", target_files=2)
    files = [f for f in os.listdir(tmp_path / "t2") if f.endswith(".parquet")]
    assert len(files) <= 2
    assert cat.read("t2").count() == 1000


def test_stream_convert_dumps_incremental_idempotent(spark, tmp_path):
    """Real micro-batch ingest: files dropped into the dump dir are
    normalized + MERGE-appended; redelivered rows are no-ops."""
    import time

    from tlhop_library_spark.sources.converter import stream_convert_dumps

    dump_dir = tmp_path / "dumps"
    dump_dir.mkdir()
    cat = TableCatalog(spark, str(tmp_path / "warehouse"))

    def write_dump(name, lo, hi):
        with open(dump_dir / name, "w") as f:
            for i in range(lo, hi):
                f.write(
                    json.dumps(
                        {
                            "url": f"https://s{i}.test/p",
                            "warc_ts": f"2025-03-01 10:{i % 60:02d}:00",
                            "html": f"<html><body>stream doc {i}</body></html>",
                            "lang": "en",
                        }
                    )
                    + "\n"
                )

    write_dump("a.jsonl", 0, 10)
    q = stream_convert_dumps(
        spark, str(dump_dir), cat,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        def table_count(expect):
            for _ in range(60):
                try:
                    if cat.read("documents").count() == expect:
                        return expect
                except Exception:
                    pass
                time.sleep(1)
            return cat.read("documents").count()

        assert table_count(10) == 10
        # second file overlaps rows 5-9 → only 5 new rows may land
        write_dump("b.jsonl", 5, 15)
        assert table_count(15) == 15
        docs = cat.read("documents")
        assert docs.select("url").distinct().count() == 15
        assert docs.where(F.col("text").contains("stream doc")).count() == 15
    finally:
        q.stop()


def test_avro_roundtrip_when_package_present(spark, tmp_path):
    """S2 runtime probe: executes the Avro write+read path when the
    spark-avro datasource is on the classpath, and records an explicit
    skip when it isn't (this container ships no spark-avro jar and has
    no network to fetch one — COVERAGE.md container-limitation note)."""
    import pytest

    from tlhop_library_spark.sources.catalog import read_avro

    path = str(tmp_path / "avro_t")
    try:
        spark.range(10).write.format("avro").save(path)
    except Exception as e:
        if "AVRO" in str(e).upper() or "Failed to find" in str(e):
            pytest.skip(f"spark-avro datasource not on classpath: {type(e).__name__}")
        raise
    assert read_avro(spark, path).count() == 10


def test_read_csv_and_jsonl(spark, tmp_path):
    csv = tmp_path / "x.csv"
    csv.write_text("a;b\n1;x\n2;y\n# comment\n")
    df = read_csv(spark, str(csv), sep=";", comment="#")
    assert df.count() == 2
    jl = tmp_path / "x.jsonl"
    jl.write_text('{"a": 1}\n{"a": 2}\n')
    assert read_jsonl(spark, str(jl)).count() == 2


def test_windowed_counts_batch(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = windowed_counts(ev, window="1 hour")
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == ev.count()


def test_windowed_counts_streaming(spark, tmp_path):
    """Same op on a real stream: file source → memory sink."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
    src = str(tmp_path / "stream_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        windowed_counts(stream, window="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")  # requires the watermark path
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only closed windows; completeness is the batch
    # test's job — here we assert the streaming plan runs end-to-end
    assert spark.table("win_counts").columns == [
        "window_start", "window_end", "event_type", "n", "sum_value"
    ]


def test_sessionize_batch(spark):
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 10:00:00",
                    "2024-01-01 10:10:00",
                    "2024-01-01 12:00:00",
                    "2024-01-01 09:00:00",
                ]
            ),
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = sessionize_batch(spark.createDataFrame(pdf), gap_minutes=30)
    rows = sorted(
        [(r["user_id"], r["n_events"], r["total_value"]) for r in out.collect()]
    )
    assert rows == [(1, 1, 3.0), (1, 2, 3.0), (2, 1, 4.0)]


def test_stream_dedup_first_arrival_wins(spark, tmp_path):
    """Streaming exact dedup: content set matches offline dedup_exact
    over the union; a re-landed duplicate never reaches the sink and
    the FIRST arrival is the survivor."""
    from tlhop_library_spark.operators.dedup import dedup_exact
    from tlhop_library_spark.streaming.dedup_stream import (
        stream_dedup_documents,
    )

    batches = tmp_path / "batches"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    batches.mkdir()

    import pyarrow as pa
    import pyarrow.parquet as pq

    def land(name, rows):
        ids, texts = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(batches / name),
        )

    rows1 = [(i, f"text {i % 7}") for i in range(10)]
    land("b1.parquet", rows1)
    q = stream_dedup_documents(spark, str(batches), str(out), str(ck))
    q.awaitTermination(120)

    # second landing: 7 duplicate texts + 3 new ones
    rows2 = [(100 + i, f"text {i}") for i in range(10)]
    land("b2.parquet", rows2)
    q = stream_dedup_documents(spark, str(batches), str(out), str(ck))
    q.awaitTermination(120)

    b1 = spark.createDataFrame(rows1, "doc_id long, text string")
    b2 = spark.createDataFrame(rows2, "doc_id long, text string")

    got = spark.read.parquet(str(out)).collect()
    union = b1.unionByName(b2)
    # offline oracle: one survivor per distinct content
    assert dedup_exact(union).count() == union.select("text").distinct(
    ).count()
    want_texts = {
        r["text"] for r in union.select("text").distinct().collect()
    }
    assert {r["text"] for r in got} == want_texts
    assert len(got) == len(want_texts)  # no duplicate ever sunk
    # first arrival wins: every text seen in batch 1 has its batch-1 id
    b1_min = {}
    for r in b1.collect():
        b1_min.setdefault(r["text"], r["doc_id"])
    for r in got:
        if r["text"] in b1_min:
            assert r["doc_id"] < 100


def test_stream_dedup_ttl_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark mode: duplicates landing within
    the TTL window are dropped; new content is admitted. (State expiry
    beyond watermark+delta is Spark's contract — not re-asserted.)"""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tlhop_library_spark.streaming.dedup_stream import (
        stream_dedup_documents,
    )

    batches = tmp_path / "batches"
    batches.mkdir()

    def land(name, rows):
        ids, texts, tss = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "ts": pa.array(tss, pa.timestamp("us")),
                }
            ),
            str(batches / name),
        )

    t0 = datetime(2026, 3, 1, 10, 0, 0)
    t1 = datetime(2026, 3, 1, 10, 0, 30)
    land("b1.parquet", [(1, "alpha", t0), (2, "beta", t0)])
    land("b2.parquet", [(3, "alpha", t1), (4, "gamma", t1)])
    # the file source orders by modification time; on a fast/loaded
    # host both writes can land in the same fs-timestamp tick, making
    # "which duplicate is first" nondeterministic — pin the order
    import os

    st = os.stat(batches / "b2.parquet")
    os.utime(batches / "b1.parquet", (st.st_atime - 10, st.st_mtime - 10))
    q = stream_dedup_documents(
        spark, str(batches), str(tmp_path / "out"),
        str(tmp_path / "ck"), ttl_col="ts", ttl="10 minutes",
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert set(got.values()) == {"alpha", "beta", "gamma"}
    assert 3 not in got  # within-TTL duplicate dropped
