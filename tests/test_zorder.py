"""Z-order clustering: the multi-column data-skipping claim, measured.

A layout sorted by user_id alone prunes files perfectly for user_id
predicates and not at all for value predicates. The Morton layout must
prune on BOTH columns — that's the whole point of interleaving.
Pruning is judged by parquet row-group min/max footer stats, the same
stats the Spark parquet scan consults.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.sources.tables import load_table
from iq_to_hdl_migration_spark.sources.zorder import (
    files_pruned_by, with_morton, write_zordered)


def _narrow_band(df, col, frac=0.1):
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    span = (hi - lo) * frac
    mid = lo + (hi - lo) / 2
    return mid - span / 2, mid + span / 2


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "value", "event_type"))

    z_path = str(tmp_path / "zorder")
    u_path = str(tmp_path / "user_sorted")
    write_zordered(ev, z_path, "user_id", "value", num_files=16)
    (ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(u_path))

    ulo, uhi = _narrow_band(ev, "user_id")
    vlo, vhi = _narrow_band(ev, "value")

    zu_skip, zu_total = files_pruned_by(z_path, "user_id", ulo, uhi)
    zv_skip, _ = files_pruned_by(z_path, "value", vlo, vhi)
    su_skip, su_total = files_pruned_by(u_path, "user_id", ulo, uhi)
    sv_skip, _ = files_pruned_by(u_path, "value", vlo, vhi)

    # single-column sort: great on its own column, blind on the other
    assert su_skip > 0
    assert sv_skip == 0
    # z-order: must prune on BOTH columns
    assert zu_skip > 0, "z-order lost user_id locality entirely"
    assert zv_skip > 0, "z-order gives no value-column pruning"
    # and the whole reason to pay for it: second-dimension pruning wins
    assert zv_skip > sv_skip


def test_zorder_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id",
                                                    "value")
    path = str(tmp_path / "z2")
    write_zordered(ev, path, "user_id", "value", num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert back.columns == ev.columns  # helper column dropped
    assert (back.agg(F.sum("event_id")).first()[0]
            == ev.agg(F.sum("event_id")).first()[0])


def test_morton_code_is_deterministic_and_bounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    bits = 8
    z = with_morton(ev, "user_id", "value", bits=bits)
    mx = z.agg(F.max("_morton"), F.min("_morton")).first()
    assert mx[1] >= 0 and mx[0] < (1 << (2 * bits))
    again = with_morton(ev, "user_id", "value", bits=bits)
    assert (z.agg(F.sum("_morton")).first()[0]
            == again.agg(F.sum("_morton")).first()[0])


def test_morton_matches_python_reference(spark):
    """The Spark bit-interleave expression must agree with a plain
    Python reference on random inputs (seeded) across the full code
    range — locks the shiftleft/bitwiseOR math."""
    import random

    from iq_to_hdl_migration_spark.sources.zorder import _interleave

    bits = 12
    rng = random.Random(42)
    rows = [(rng.randrange(0, 1 << bits), rng.randrange(0, 1 << bits))
            for _ in range(1000)]

    def py_morton(x, y):
        code = 0
        for i in range(bits):
            code |= ((x >> i) & 1) << (2 * i)
            code |= ((y >> i) & 1) << (2 * i + 1)
        return code

    df = spark.createDataFrame(rows, "x long, y long")
    got = (df.select("x", "y",
                     _interleave(F.col("x"), F.col("y"), bits).alias("m"))
           .collect())
    for r in got:
        assert r["m"] == py_morton(r["x"], r["y"]), (r["x"], r["y"])
    # monotone in x for fixed y (order-preserving bit spread)
    xs = sorted(rng.randrange(0, 1 << bits) for _ in range(100))
    y = rng.randrange(0, 1 << bits)
    ms = [py_morton(x, y) for x in xs]
    assert ms == sorted(ms)
