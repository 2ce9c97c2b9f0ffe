"""operators/ranking.py: the distributed two-phase global rank must
agree EXACTLY with the single-partition window it replaces (row_number
over a global ORDER BY), and ntile_from_rank must reproduce SQL
NTILE's remainder rule, for every n mod buckets case including
n < buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from iq_to_hdl_migration_spark.operators.ranking import (
    global_rank, ntile_from_rank)


def _frame(spark, n, seed):
    # Deterministic pseudo-random values with heavy ties so the
    # custkey tiebreaker matters; id is the unique tiebreaker.
    return (spark.range(n)
            .withColumn("v", (F.col("id") * 2654435761 % 97) % 13)
            .withColumn("g", F.col("id") % seed))


@pytest.mark.parametrize("n", [1, 3, 4, 5, 97, 1000])
def test_global_rank_matches_window(spark, n):
    df = _frame(spark, n, 7)
    keys = [F.col("v").desc(), F.col("id").asc()]
    got = global_rank(df, keys, rank_col="r", num_partitions=5)
    want = df.withColumn("r", F.row_number().over(
        Window.orderBy(*keys)).cast("bigint"))
    g = {(r["id"], r["r"]) for r in got.collect()}
    w = {(r["id"], r["r"]) for r in want.collect()}
    assert g == w


@pytest.mark.parametrize("n,b", [(1, 4), (3, 4), (4, 4), (5, 4),
                                 (97, 4), (100, 4), (11, 3), (2, 5)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, b):
    df = _frame(spark, n, 5)
    keys = [F.col("v").asc(), F.col("id").asc()]
    w = Window.orderBy(*keys)
    want = df.select("id", F.ntile(b).over(w).alias("t"))
    got = (global_rank(df, keys, rank_col="r", num_partitions=3)
           .crossJoin(F.broadcast(
               df.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))))
           .select("id", ntile_from_rank(F.col("r"), F.col("_n"), b)
                   .alias("t")))
    assert ({(r["id"], r["t"]) for r in got.collect()}
            == {(r["id"], r["t"]) for r in want.collect()})


def test_global_rank_never_sorts_data_frame_globally(spark):
    """The row_number window over the DATA frame must be partitioned
    by the range-partition id (no single-partition sort of the data).
    The one permitted global window is the prefix sum over the
    per-partition COUNTS frame, which holds <= num_partitions rows —
    bounded, not data-scaled."""
    df = _frame(spark, 1000, 7)
    got = global_rank(df, [F.col("v").desc(), F.col("id").asc()],
                      rank_col="r", num_partitions=8)
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "row_number() windowspecdefinition" in line:
            assert "_gr_pid" in line, f"unpartitioned data window: {line}"
    # The bounded offsets frame is the only thing allowed through a
    # SinglePartition exchange; it is recognizable by its _gr_cnt sum.
    assert plan.count("Exchange SinglePartition") <= plan.count(
        "sum(_gr_cnt"), plan
