"""Content-level table diff — the verification step beyond V1's
row-count reconciliation (Migration/migration.py:1940-2049 counts rows;
this compares what the rows SAY).

Design for 100 TB: one full-outer equi-join on the key columns — the
same shuffle shape as any fact join, so it co-locates for free on
bucketed staging — comparing a single md5 over the non-key columns per
side instead of N per-column equality checks. Output is only the
disagreeing rows; the unchanged majority never leaves the join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _row_hash(df: DataFrame, key_cols: list[str],
              compare_cols: list[str] | None) -> DataFrame:
    cols = compare_cols or [c for c in df.columns if c not in key_cols]
    # null-safe canonical encoding with UNAMBIGUOUS field boundaries:
    # every field is hashed SEPARATELY to a fixed-width digest (plus an
    # explicit null flag — md5('') is a real value, so NULL vs '' must
    # be distinguished outside the digest), and the row hash is the md5
    # of the concatenated digests. No separator character appears in
    # the encoding at all, so a field VALUE containing any separator
    # can never shift bytes into a neighbouring field (a plain
    # concat_ws('\\x1f', ...) encoding let ('a\\x1f0\\x1fb','c') collide
    # with ('a','b\\x1f0\\x1fc') — a silent false negative).
    parts = []
    for c in sorted(cols):
        v = F.col(c).cast("string")
        parts += [F.when(v.isNull(), F.lit("1")).otherwise(F.lit("0")),
                  F.md5(F.coalesce(v, F.lit("")).cast("binary"))]
    return df.select(*key_cols,
                     F.md5(F.concat(*parts).cast("binary")).alias("_rh"))


def table_diff(left: DataFrame, right: DataFrame, key_cols: list[str],
               compare_cols: list[str] | None = None) -> DataFrame:
    """Per-key diff of two snapshots: rows only in `left` are
    `removed`, only in `right` are `added`, in both with different
    non-key content are `changed`. Unchanged rows are not emitted.
    Output: key columns + `status`."""
    lh = _row_hash(left, key_cols, compare_cols) \
        .withColumnRenamed("_rh", "_rh_l")
    rh = _row_hash(right, key_cols, compare_cols) \
        .withColumnRenamed("_rh", "_rh_r")
    joined = lh.join(rh, key_cols, "full_outer")
    return (joined.select(
        *key_cols,
        F.when(F.col("_rh_r").isNull(), F.lit("removed"))
         .when(F.col("_rh_l").isNull(), F.lit("added"))
         .when(F.col("_rh_l") != F.col("_rh_r"), F.lit("changed"))
         .otherwise(F.lit("unchanged")).alias("status"))
        .where(F.col("status") != "unchanged"))


def diff_summary(left: DataFrame, right: DataFrame, key_cols: list[str],
                 compare_cols: list[str] | None = None) -> DataFrame:
    """Rollup of table_diff: one row per status with its count — the
    reconciliation report a migration signs off on."""
    return (table_diff(left, right, key_cols, compare_cols)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_rows")))
