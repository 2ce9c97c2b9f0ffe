"""Distributed global ranking — the scale-safe replacement for a
global ``ROW_NUMBER()/NTILE()`` window (which Spark executes as a
single-partition sort: one task holds the whole frame, the classic
100 TB bottleneck/OOM).

The two-phase pattern: ``repartitionByRange`` on the sort keys (range
partition i holds a contiguous key range below partition i+1), local
``row_number`` within each range partition, then add the partition's
global offset (prefix sum over the tiny per-partition count frame,
broadcast back).  The resulting rank is EXACTLY the global position in
the total order — independent of where the sampled range boundaries
fall — provided the sort key is a total order (callers must include a
unique tiebreaker column).  Wall-clock is two partition-parallel
passes; no task ever sees more than one range partition.

``ntile_from_rank`` reproduces SQL NTILE(b) arithmetic from that rank
(first ``n mod b`` buckets take ``n div b + 1`` rows — identical in
Spark and DuckDB), so a global NTILE becomes rank + O(1) math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_gr_pid"
_RN = "_gr_rn"
_OFF = "_gr_off"


def global_rank(df: DataFrame, order_cols: list[Column],
                rank_col: str = "rank",
                num_partitions: int = 32) -> DataFrame:
    """Append ``rank_col`` = exact 1-based global rank of each row
    under ``order_cols`` (must form a total order — include a unique
    tiebreaker).  Scale shape: one range shuffle + one hash-by-pid
    exchange of the same frame + a broadcast of ``num_partitions``
    offset rows; no single-partition sort anywhere.
    """
    # materialized (round 14, guide §2.4): `ranged` feeds the offset
    # broadcast AND the ranked output — left lazy, the range shuffle
    # (and its sampling pass over the whole upstream) re-executed for
    # each consumer, which turned chained rank calls into a quadratic
    # job cascade. One checkpoint pins one range shuffle per call.
    ranged = (df.repartitionByRange(num_partitions, *order_cols)
              .withColumn(_PID, F.spark_partition_id())
              .localCheckpoint())
    counts = ranged.groupBy(_PID).agg(
        F.count(F.lit(1)).cast("bigint").alias("_gr_cnt"))
    w_off = (Window.orderBy(_PID)
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("_gr_cnt").over(w_off), F.lit(0))
        .cast("bigint").alias(_OFF))
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    return (ranged
            .withColumn(_RN, F.row_number().over(w_local).cast("bigint"))
            .join(F.broadcast(offsets), _PID)
            .withColumn(rank_col, (F.col(_OFF) + F.col(_RN))
                        .cast("bigint"))
            .drop(_PID, _RN, _OFF))


def ntile_from_rank(rank: Column, n: Column, buckets: int) -> Column:
    """SQL NTILE(buckets) bucket (1-based) from an exact global rank
    and total row count ``n``: the first ``n mod buckets`` buckets hold
    ``n div buckets + 1`` rows each, the rest ``n div buckets`` —
    Spark's NTile and DuckDB's ntile agree on this remainder rule.
    The q == 0 branch (n < buckets) never divides by zero because every
    rank then satisfies ``rank <= rem``.
    """
    b = F.lit(buckets).cast("bigint")
    q = (n / b).cast("bigint")
    rem = n % b
    big_span = rem * (q + 1)
    return (F.when(rank <= big_span,
                   ((rank - 1) / (q + 1)).cast("bigint") + 1)
            .otherwise(rem + ((rank - big_span - 1)
                              / F.greatest(q, F.lit(1))).cast("bigint") + 1)
            .cast("int"))
