"""Split the segments-phase cost into JVM-side (shuffle + Tungsten
sort + Arrow transfer) vs Python-side (stream encode) components.

The segments phase dominates the build (886 s of 1,011 s at the 10M
point), and its plan is fixed by design: one wide shuffle of token
instances, one JVM sort, one mapInArrow encode. Before optimizing the
Python encoder it must be established how much of the wall clock it
owns — this probe runs the SAME plan twice over a kept stress corpus:

  full   repartition → sortWithinPartitions → mapInArrow(real encoder)
         → parquet write (the production plan, tools/bench_stress.py)
  jvm    identical up to mapInArrow(pass-through counter) → parquet
         write of one summary row per partition

full − jvm ≈ Python encode + output-Arrow + segment-parquet cost.

Usage::

    python tools/encode_split_probe.py --corpus /tmp/stress1m/corpus.parquet
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time
from collections.abc import Iterator

import pyarrow as pa


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tlhop_library_spark.index.build import (
        IndexBuilder,
        default_n_ranges,
    )
    from tlhop_library_spark.session import get_spark

    spark = get_spark("encode-split", master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(args.corpus).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).where(F.col("text").isNotNull())
    n_docs = docs.count()  # also warms the FS cache

    workdir = tempfile.mkdtemp(prefix="encode_split_")
    b = IndexBuilder(spark, os.path.join(workdir, "idx"))

    from tlhop_library_spark.analyzer import tokens_col

    with_tokens = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("dl", F.size("tokens"))
    row = with_tokens.agg(
        F.sum("dl").alias("sum_dl"), F.max("doc_id").alias("max_doc")
    ).collect()[0]
    avgdl = float(row["sum_dl"]) / n_docs
    n_ranges = default_n_ranges(int(row["max_doc"]) + 1)
    range_size = max(1, -(-(int(row["max_doc"]) + 1) // n_ranges))
    exploded = b._exploded(with_tokens)

    def run_full() -> float:
        out = os.path.join(workdir, "seg_full")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        b._encode_group_df(exploded, avgdl, range_size).write.mode(
            "overwrite"
        ).parquet(out)
        return time.time() - t0

    # pass-through: identical shuffle+sort+Arrow transfer, near-zero
    # Python work (touch each column buffer, emit one count row)
    count_schema = pa.schema([("n", pa.int64())])

    def passthrough(batches: Iterator[pa.RecordBatch]):
        n = 0
        for batch in batches:
            n += batch.num_rows
        yield pa.RecordBatch.from_pylist([{"n": n}], schema=count_schema)

    bucket_expr = F.pmod(F.col("tid"), F.lit(b.n_buckets)).cast("int")
    range_expr = F.floor(F.col("doc_id") / F.lit(range_size)).cast("int")
    n_encode_parts = b.encode_parts or 4 * int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )

    def run_jvm() -> float:
        out = os.path.join(workdir, "seg_jvm")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        (
            exploded.select("tid", "doc_id", "dl")
            .repartition(n_encode_parts, bucket_expr, range_expr)
            .sortWithinPartitions(bucket_expr, range_expr, "tid", "doc_id")
            .mapInArrow(passthrough, schema="n long")
            .write.mode("overwrite")
            .parquet(out)
        )
        return time.time() - t0

    result = {"corpus": args.corpus, "n_docs": n_docs,
              "cores": args.cores, "full_sec": [], "jvm_sec": []}
    for _ in range(args.runs):
        result["jvm_sec"].append(round(run_jvm(), 1))
        result["full_sec"].append(round(run_full(), 1))
    f, j = min(result["full_sec"]), min(result["jvm_sec"])
    result["python_encode_sec"] = round(f - j, 1)
    result["python_fraction"] = round((f - j) / f, 3) if f else None
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
