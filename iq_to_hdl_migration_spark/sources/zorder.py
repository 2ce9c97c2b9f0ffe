"""Z-order (Morton-code) clustering for multi-column data skipping.

A table sorted by ONE column gives perfect parquet min/max pruning on
that column and none on any other. Interleaving the bits of two (or
more) normalized columns into a Morton code and range-partitioning +
sorting by that code spreads locality across ALL participating
columns: every file covers a small hyper-rectangle of the key space,
so row-group min/max stats prune scans filtered on either column.
This is the standard lakehouse layout trick (Delta/Iceberg `OPTIMIZE
ZORDER BY`) re-expressed with plain DataFrame ops — everything stays
JVM-side (`shiftleft`/`shiftright`/bitwise ops inside whole-stage
codegen), and the write is `repartitionByRange(morton)` +
`sortWithinPartitions(morton)`, i.e. one range shuffle at any scale.

Normalization uses global min/max (one tiny aggregate pass — the same
2-pass pattern as decile binning); ranks would be more uniform but
need a full sort, which is exactly what z-ordering exists to avoid.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _normalize(col: Column, cmin, cmax, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits)."""
    span = float(cmax) - float(cmin)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((col.cast("double") - F.lit(float(cmin))) / F.lit(span)
              * F.lit((1 << bits) - 1))
    return F.round(scaled).cast("long")


def _interleave(x: Column, y: Column, bits: int) -> Column:
    """Morton code: bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(xbit, 2 * i)) \
                   .bitwiseOR(F.shiftleft(ybit, 2 * i + 1))
    return code


def with_morton(df: DataFrame, col_x: str, col_y: str,
                bits: int = 12, out_col: str = "_morton") -> DataFrame:
    """Add a Morton code over two numeric columns (global-min/max
    normalized). One tiny aggregate pass, then pure codegen math."""
    mins = df.agg(F.min(col_x), F.max(col_x),
                  F.min(col_y), F.max(col_y)).first()
    xmin, xmax, ymin, ymax = mins
    x = _normalize(F.col(col_x), xmin, xmax, bits)
    y = _normalize(F.col(col_y), ymin, ymax, bits)
    return df.withColumn(out_col, _interleave(x, y, bits))


def write_zordered(df: DataFrame, path: str, col_x: str, col_y: str,
                   num_files: int = 16, bits: int = 12) -> None:
    """Write `df` as parquet clustered by the Morton code of
    (col_x, col_y): range-partition on the code (one shuffle), sort
    within partitions, drop the helper column on write."""
    z = with_morton(df, col_x, col_y, bits)
    (z.repartitionByRange(num_files, F.col("_morton"))
      .sortWithinPartitions("_morton")
      .drop("_morton")
      .write.mode("overwrite").parquet(path))


def files_pruned_by(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(files_skippable, files_total) for a `column BETWEEN lo AND hi`
    predicate, judged by parquet row-group min/max stats — the same
    stats the Spark scan uses. Uses pyarrow footer metadata only (no
    data read)."""
    import pyarrow.parquet as pq
    import os
    total = skip = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(column)
        overlaps = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None:
                overlaps = True
                break
            if not (st.max < lo or st.min > hi):
                overlaps = True
                break
        total += 1
        if not overlaps:
            skip += 1
    return skip, total
