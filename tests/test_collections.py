from pyspark.sql import functions as F

from tlhop_library_spark.functions.collections import (
    json_to_map,
    map_to_entries,
    split_map_by_value,
    transform_map_values,
    zip_unnest,
)


def test_split_map_by_value(spark):
    df = spark.createDataFrame(
        [({"cve-1": "yes", "cve-2": "no", "cve-3": "yes"},)],
        "vulns map<string,string>",
    )
    yes, no = split_map_by_value(F.col("vulns"), lambda v: v == "yes")
    row = df.select(yes.alias("v"), no.alias("u")).collect()[0]
    assert row["v"] == ["cve-1", "cve-3"]
    assert row["u"] == ["cve-2"]


def test_transform_map_values_and_entries(spark):
    df = spark.createDataFrame([({"a": 1, "b": 2},)], "m map<string,int>")
    out = df.select(
        map_to_entries(
            transform_map_values(F.col("m"), lambda v: v * 10)
        ).alias("e")
    ).collect()[0]["e"]
    assert [(e["key"], e["value"]) for e in out] == [("a", 10), ("b", 20)]


def test_zip_unnest(spark):
    df = spark.createDataFrame(
        [(1, ["x", "y"], [10, 20])],
        "id int, names array<string>, vals array<int>",
    )
    out = zip_unnest(df, ["names", "vals"], ["name", "val"]).collect()
    assert [(r["id"], r["name"], r["val"]) for r in out] == [
        (1, "x", 10),
        (1, "y", 20),
    ]


def test_json_to_map(spark):
    df = spark.createDataFrame([('{"k": "87", "z": "1"}',)], "props string")
    out = df.select(json_to_map(F.col("props")).alias("m")).collect()[0]["m"]
    assert out == {"k": "87", "z": "1"}
