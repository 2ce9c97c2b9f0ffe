"""Generic property lock on operators/fanout.capped_fanout — the
shared flood-cap primitive every cap family (dedup PAIR_CAP, SemDeDup
_SD_CAP, graph EDGE_CAP) now routes through.  The bound, the census
mass conservation, and the deterministic cut must hold for arbitrary
bucket-size distributions including the degenerate flood shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iq_to_hdl_migration_spark.operators.fanout import capped_fanout


def _flood(spark, sizes):
    """One bucket per entry of `sizes`, bucket i holding sizes[i] rows
    with a deterministic score that has heavy ties."""
    rows = []
    for b, n in enumerate(sizes):
        for i in range(n):
            rows.append((f"b{b}", i, (i * 2654435761 % 97) % 5))
    return spark.createDataFrame(rows, "bucket string, id bigint, s bigint")


@pytest.mark.parametrize("sizes,k", [
    ([0, 1, 3, 4, 5, 100], 4),
    ([1000], 16),          # single flooded bucket
    ([2, 2, 2], 16),       # cap never binds
    ([7, 7, 7, 7], 1),     # cap binds everywhere
])
def test_bound_census_and_mass(spark, sizes, k):
    df = _flood(spark, sizes)
    fan = capped_fanout(df, ["bucket"],
                        [F.desc("s"), F.asc("id")], k)
    kept = fan["kept"].collect()
    census = {r["bucket"]: r for r in fan["census"].collect()}
    # hard bound: no bucket exceeds k survivors
    per = {}
    for r in kept:
        per[r["bucket"]] = per.get(r["bucket"], 0) + 1
    assert all(v <= k for v in per.values())
    # census covers every nonempty bucket and conserves mass
    total = 0
    for b, n in (("b%d" % i, n) for i, n in enumerate(sizes)):
        if n == 0:
            assert b not in census
            continue
        c = census[b]
        assert c["n_in_bucket"] == n
        assert c["n_kept"] == min(n, k) == per.get(b, 0)
        assert c["n_overflow"] == max(0, n - k)
        assert c["n_kept"] + c["n_overflow"] == c["n_in_bucket"]
        total += n
    assert total == df.count()
    # inline columns agree with the census
    for r in kept:
        c = census[r["bucket"]]
        assert r["n_in_bucket"] == c["n_in_bucket"]
        assert r["n_overflow"] == c["n_overflow"]


def test_deterministic_cut_and_rank(spark):
    """Two runs produce the identical survivor set (the tiebreaker
    makes the order total), and rank_col is 1..n_kept densely per
    bucket ordered by the spec."""
    df = _flood(spark, [50, 9]).repartition(7)
    args = (["bucket"], [F.desc("s"), F.asc("id")], 8)
    a = capped_fanout(df, *args, rank_col="rn")["kept"]
    b = capped_fanout(df, *args, rank_col="rn")["kept"]
    sa = sorted((r["bucket"], r["id"], r["rn"]) for r in a.collect())
    sb = sorted((r["bucket"], r["id"], r["rn"]) for r in b.collect())
    assert sa == sb
    by_bucket = {}
    for bu, _id, rn in sa:
        by_bucket.setdefault(bu, []).append(rn)
    for bu, rns in by_bucket.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), bu
    # rank 1 must be the (max s, min id) element within the bucket
    rows = {(r["bucket"], r["id"]): r["s"] for r in df.collect()}
    for bu in by_bucket:
        best = min(((-s, i) for (bb, i), s in rows.items() if bb == bu))
        top = next(i for (b2, i, rn) in sa if b2 == bu and rn == 1)
        assert top == best[1]


def test_census_aggs_ride_along(spark):
    df = _flood(spark, [5, 30])
    fan = capped_fanout(df, ["bucket"], [F.asc("id")], 4,
                        census_aggs=(F.sum("s").cast("bigint")
                                     .alias("s_mass"),))
    got = {r["bucket"]: (r["n_in_bucket"], r["s_mass"])
           for r in fan["census"].collect()}
    want = {r["bucket"]: (r["n"], r["m"]) for r in
            df.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("s").alias("m")).collect()}
    assert got == want


def test_windowgrouplimit_plan_shape(spark):
    """Round 15 (guide §2.5): the rank must ride a rank-ONLY window
    so the plan carries a map-side WindowGroupLimit that truncates
    flooded buckets to top-k per partition BEFORE the exchange; the
    announced-truncation counts come from the census join, never from
    an unbounded count over the same window (which would defeat the
    group limit and ship the whole flood)."""
    df = _flood(spark, [40, 40])
    kept = capped_fanout(df, ["bucket"],
                         [F.desc("s"), F.asc("id")], 8)["kept"]
    kept.collect()
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # AQE's toString prints the final plan AND the initial plan —
    # audit only the final segment
    final = plan.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in final, final
    wlines = [l for l in final.splitlines() if "Window [" in l]
    assert len(wlines) == 1, final
    assert "row_number()" in wlines[0]
    assert "count(1)" not in wlines[0], wlines[0]


def test_null_bucket_key_is_a_group(spark):
    """A NULL bucket key forms a group (window/groupBy semantics);
    the census attach must be null-safe or those rows silently
    vanish from `kept`."""
    df = spark.createDataFrame(
        [(None, 1, 5), (None, 2, 4), (None, 3, 3), ("b", 4, 2)],
        "bucket string, id bigint, s bigint")
    fan = capped_fanout(df, ["bucket"], [F.desc("s"), F.asc("id")], 2,
                        rank_col="rn")
    kept = fan["kept"].collect()
    nulls = [r for r in kept if r["bucket"] is None]
    assert len(nulls) == 2
    assert all(r["n_in_bucket"] == 3 and r["n_overflow"] == 1
               for r in nulls)
    census = {r["bucket"]: r for r in fan["census"].collect()}
    assert census[None]["n_kept"] == 2 and census[None]["n_overflow"] == 1
