"""Skew-handling join strategies for data-scale keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two explicit strategies remain useful at 100 TB when the
build side is too big to broadcast yet a handful of keys dominate:

  * salted_join — replicate the (moderate) right side SALTS times and
    scatter the left side across the replicas, so one hot key's rows
    spread over SALTS reducers instead of one. The salt only routes
    rows; join semantics are unchanged (locked by a DuckDB oracle on
    the registered query).
  * split_hot_keys_join — count left keys first, broadcast-join the
    hot subset (a tiny dim slice), shuffle-join the cold rest, union.
    The hot path never shuffles the dominant keys at all.

Both preserve inner-equi-join semantics exactly; they trade a bounded
amount of duplication (right-side replication / an extra key count)
for the removal of the single-reducer bottleneck.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join on `key` with the right side replicated per salt.

    The left side gets a uniform salt in [0, n_salts); the right side
    is exploded once per salt value, so every (key, salt) partition
    holds the full right-side rows for that key. The shuffle key
    becomes (key, salt) — a hot key now lands on n_salts reducers.

    Right-side replication preserves inner/left/semi/anti semantics
    only: an unmatched RIGHT row would surface once per salt, so
    right/full outer joins are rejected.
    """
    if how.replace("_", "").lower() in ("right", "rightouter", "full",
                                        "fullouter", "outer"):
        raise ValueError(f"salted_join cannot preserve '{how}' semantics "
                         "(right side is replicated); use inner/left")
    salted_left = left.withColumn(
        "_salt", F.floor(F.rand(seed=42) * n_salts).cast("int"))
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")


def split_hot_keys_join(left: DataFrame, right: DataFrame, key: str,
                        hot_threshold: int = 100_000,
                        how: str = "inner") -> DataFrame:
    """Differentiated join: hot keys broadcast, cold keys shuffle.

    Keys whose left-side row count exceeds `hot_threshold` are joined
    by broadcasting the matching right-side slice (tiny: one row set
    per hot key); the remaining cold keys take the ordinary shuffle
    join. Result = exact union of both paths (each left row goes down
    exactly one path; right rows are partitioned between paths only
    for the inner/left families, so right/full outer are rejected).
    """
    if how.replace("_", "").lower() in ("right", "rightouter", "full",
                                        "fullouter", "outer"):
        raise ValueError(f"split_hot_keys_join cannot preserve '{how}' "
                         "semantics; use inner/left")
    counts = left.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    hot_keys = counts.where(F.col("_n") > hot_threshold).select(key)

    left_hot = left.join(F.broadcast(hot_keys), key, "left_semi")
    left_cold = left.join(F.broadcast(hot_keys), key, "left_anti")
    right_hot = right.join(F.broadcast(hot_keys), key, "left_semi")

    hot = left_hot.join(F.broadcast(right_hot), key, how)
    cold = left_cold.join(right, key, how)
    return hot.unionByName(cold)
