"""capped_fanout — THE flood-cap primitive (round-14 promotion of a
three-times-hand-rolled pattern: dedup's PAIR_CAP partner cap, the
SemDeDup per-cluster scan cap, and the click->purchase EDGE_CAP hour
cap each re-implemented "rank rows per bucket, keep top-K
deterministically, announce the truncation").  Three independent
implementations is how each of rounds 11-13 shipped exactly one new
uncapped generator; one shared operator with one property test kills
the bug class.

Semantics: within each `bucket_cols` key, rows are ranked by
`order_cols` (callers MUST make this a total order inside the bucket —
include a unique tiebreaker — or the cut is nondeterministic) and only
ranks <= k survive.  The truncation is never silent:

  * every surviving row carries the bucket's pre-cap row count
    (`count_col`) and how many rows were dropped (`overflow_col`);
  * `census` is the per-bucket one-row summary (n_in_bucket, n_kept,
    n_overflow, plus any caller-supplied `census_aggs` over the
    pre-cap rows) — bounded at one row per bucket, the announced-
    truncation frame graph/dedup reports expose to readers.

Scale shape: one hash exchange on `bucket_cols` + one sort per frame —
the count rides the SAME ordered window spec as the rank (unbounded
frame), so the plan carries a single WindowExec, not two.  Output is
bounded by n_buckets x k regardless of how degenerate the bucket-size
distribution is — linear in the corpus, never quadratic in a flood.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "_cf_rn"


def capped_fanout(df: DataFrame, bucket_cols: list[str],
                  order_cols: list[Column], k: int, *,
                  rank_col: str | None = None,
                  count_col: str = "n_in_bucket",
                  overflow_col: str = "n_overflow",
                  census_aggs: tuple[Column, ...] = ()) -> dict:
    """Return {"kept": ..., "census": ...} (both lazy DataFrames —
    an unconsumed census costs nothing).  `rank_col` optionally keeps
    the 1-based within-bucket rank on surviving rows (the graph
    builder bands on it)."""
    wo = Window.partitionBy(*bucket_cols).orderBy(*order_cols)
    full = wo.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)
    kept = (df
            .withColumn(count_col,
                        F.count(F.lit(1)).over(full).cast("bigint"))
            .withColumn(_RN, F.row_number().over(wo))
            .where(F.col(_RN) <= k)
            .withColumn(overflow_col,
                        F.greatest(F.lit(0),
                                   F.col(count_col) - k).cast("bigint")))
    kept = (kept.withColumn(rank_col, F.col(_RN)).drop(_RN)
            if rank_col else kept.drop(_RN))
    agged = df.groupBy(*bucket_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in_bucket"),
        *census_aggs)
    extra = [c for c in agged.columns
             if c not in (*bucket_cols, "n_in_bucket")]
    census = agged.select(
        *bucket_cols, "n_in_bucket",
        F.least(F.col("n_in_bucket"),
                F.lit(k).cast("bigint")).alias("n_kept"),
        F.greatest(F.col("n_in_bucket") - k,
                   F.lit(0).cast("bigint")).alias("n_overflow"),
        *extra)
    return {"kept": kept, "census": census}
