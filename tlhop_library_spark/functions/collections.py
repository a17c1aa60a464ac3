"""Map / array higher-order-function parity (SURVEY.md §1.2, §2.8).

The reference's only lambda-HOF usage transforms the `vulns`
MapType column (/root/reference/tlhop/converters/
shodan_dataset_manager.py:376-389): map_values + transform_values +
map_filter to split a map<cve, struct<verified>> into verified /
unverified arrays. Same capabilities here, generalized; plus the
arrays_zip + explode zip-unnest used across the report queries
(/root/reference/tlhop/algorithms/vulnerability_assessment.py:192-193).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_map_by_value(
    m: Column, pred
) -> tuple[Column, Column]:
    """(keys where pred(value), keys where not) — the reference's
    verified/unverified vulns split re-expressed."""
    yes = F.map_keys(F.map_filter(m, lambda k, v: pred(v)))
    no = F.map_keys(F.map_filter(m, lambda k, v: ~pred(v)))
    return F.array_sort(yes), F.array_sort(no)


def transform_map_values(m: Column, fn) -> Column:
    """map<k, v> → map<k, fn(v)> (transform_values)."""
    return F.transform_values(m, lambda k, v: fn(v))


def map_to_entries(m: Column) -> Column:
    """map → sorted array<struct<key, value>> (deterministic)."""
    return F.array_sort(F.map_entries(m))


def zip_unnest(
    df: DataFrame, cols: list[str], out_names: list[str] | None = None
) -> DataFrame:
    """arrays_zip + explode: unnest parallel arrays row-aligned
    (ref vulnerability_assessment.py:192-193,240,336,450)."""
    out_names = out_names or cols
    zipped = F.explode(F.arrays_zip(*[F.col(c) for c in cols])).alias("__z")
    others = [c for c in df.columns if c not in cols]
    return df.select(*others, zipped).select(
        *others,
        *[F.col(f"__z.{c}").alias(n) for c, n in zip(cols, out_names)],
    )


def json_to_map(col: Column) -> Column:
    """JSON object string → map<string,string> (schema-free parse)."""
    return F.from_json(col, "map<string,string>")
