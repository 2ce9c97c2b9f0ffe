"""Round-12 invariants beyond registry-vs-oracle equality: structural
properties of the new operators (TVD bounds and spine completeness,
Parseval-style energy accounting for the Haar profile, Pettitt U
antisymmetry, Kendall-tau pair accounting, shuffle-plan permutation
laws, cohort monotonicity, reciprocity symmetry) that a value-hash
can't articulate."""

from __future__ import annotations

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.queries import load_all

REGISTRY = load_all()

_PPM = 1_000_000


def test_type_mix_drift_bounds_and_weighting(spark, sf_dir):
    """TVD is in [0, 1] (ppm in [0, 1e6]); the event-count-weighted
    mean of weekly TVDs cannot exceed the max single week; every week
    present in the data draws exactly one row."""
    rows = REGISTRY["events_type_mix_drift_tvd"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    week = (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            / 7).cast("int")
    weeks = {r.w for r in ev.select(week.alias("w")).distinct().collect()}
    assert {r.week for r in rows} == weeks
    for r in rows:
        assert 0 <= r.tvd_ppm <= _PPM
        assert r.n_events > 0
    assert sum(r.n_events for r in rows) == ev.count()


def test_type_mix_drift_streaming_twin_equals_batch(spark, sf_dir):
    batch = {r.week: (r.n_events, r.tvd_ppm) for r in
             REGISTRY["events_type_mix_drift_tvd"].fn(spark,
                                                      sf_dir).collect()}
    stream = {r.week: (r.n_events, r.tvd_ppm) for r in
              REGISTRY["stream_type_mix_drift"].fn(spark,
                                                   sf_dir).collect()}
    assert batch == stream


def test_haar_energy_parseval_accounting(spark, sf_dir):
    """Each (type, scale) row's energy is non-negative; block counts
    shrink (weakly) as the scale doubles; and scale-1 energy equals
    the directly computed sum over hour pairs — re-derived here
    independently."""
    rows = REGISTRY["events_haar_energy_profile"].fn(spark,
                                                     sf_dir).collect()
    by_type: dict[str, dict[int, tuple]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.scale_hours] = (
            r.n_blocks, r.detail_energy)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")  # normalizes ts to LTZ
    hourly = (ev.groupBy("event_type",
                         F.expr("unix_micros(ts) div 3600000000")
                         .alias("h"))
              .agg(F.count(F.lit(1)).alias("c")))
    s1 = (hourly.groupBy("event_type", F.expr("h div 2").alias("b"))
          .agg(F.sum(F.when(F.expr("h % 2 = 0"), F.col("c"))
                     .otherwise(-F.col("c"))).alias("d"))
          .groupBy("event_type")
          .agg(F.sum(F.expr("d * d")).alias("e")).collect())
    expected_s1 = {r.event_type: r.e for r in s1}
    for t, scales in by_type.items():
        assert set(scales) == {1, 2, 4, 8, 16, 32}
        for sc, (nb, en) in scales.items():
            assert en >= 0 and nb >= 1
        for sc in (2, 4, 8, 16, 32):
            assert scales[sc][0] <= scales[sc // 2][0]
        assert scales[1][1] == expected_s1[t]


def test_pettitt_u_antisymmetry_and_flag(spark, sf_dir):
    """U_t re-derived from the raw pairwise signs must match, exactly
    one changepoint is flagged, and it carries the max |U|."""
    rows = REGISTRY["trend_pettitt_changepoint_monthly"].fn(
        spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    m = (orders.groupBy((F.year("o_orderdate") * 12
                         + F.month("o_orderdate")).alias("x"))
         .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
              .cast("decimal(18,2)").alias("y")).collect())
    series = sorted((r.x, r.y) for r in m)
    for row in rows:
        u = 0
        for i, (xi, yi) in enumerate(series):
            for xj, yj in series[i + 1:]:
                if xi <= row.month_x < xj:
                    u += (yj > yi) - (yj < yi)
        assert u == row.u_t, f"U at {row.month_x}"
    flagged = [r for r in rows if r.is_changepoint]
    assert len(flagged) == 1
    assert abs(flagged[0].u_t) == max(abs(r.u_t) for r in rows)


def test_rank_fidelity_pair_accounting(spark, sf_dir):
    """Per probe: n_pairs = k(k-1)/2, concordant + discordant =
    n_pairs (both rankings are total orders — no ties survive the
    cand_id tie-break), tau = (C-D)/n exactly, and tau is in [-1, 1]."""
    rows = REGISTRY["sim_quantization_rank_fidelity"].fn(
        spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    for r in rows:
        assert r.n_pairs == 190  # C(20, 2)
        assert r.concordant + r.discordant == r.n_pairs
        assert -1.0 <= r.kendall_tau <= 1.0
        assert r.kendall_tau == (r.concordant - r.discordant) / r.n_pairs


def test_epoch_shuffle_is_permutation_and_differs(spark, sf_dir):
    """Every epoch visits every shard exactly once (visit_order is a
    permutation of 1..n_shards), the census is epoch-invariant, and at
    least two epochs disagree on the order (the point of the plan)."""
    rows = REGISTRY["mlprep_epoch_shuffle_plan"].fn(spark,
                                                    sf_dir).collect()
    by_epoch: dict[int, dict[int, int]] = {}
    census: dict[int, set] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.shard_id] = r.visit_order
        census.setdefault(r.shard_id, set()).add((r.n_docs, r.n_chars))
    n_shards = len(census)
    for e, plan in by_epoch.items():
        assert sorted(plan.values()) == list(range(1, n_shards + 1))
    assert all(len(v) == 1 for v in census.values())
    orders = {tuple(sorted(p.items())) for p in by_epoch.values()}
    assert len(orders) > 1, "epochs must shuffle differently"


def test_cohort_repeat_curve_monotone(spark, sf_dir):
    """Within a cohort the reach counts are non-increasing in k, k=1
    covers the whole cohort (share 1e6 ppm), and shares stay in
    (0, 1e6]."""
    rows = REGISTRY["orders_cohort_repeat_curve"].fn(spark,
                                                     sf_dir).collect()
    by_cohort: dict[int, dict[int, tuple]] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_q, {})[r.order_k] = (
            r.n_customers, r.share_ppm)
    for q, ks in by_cohort.items():
        assert 1 in ks and ks[1][1] == _PPM
        prev = None
        for k in sorted(ks):
            n, ppm = ks[k]
            assert 0 < ppm <= _PPM
            if prev is not None:
                assert n <= prev, f"cohort {q} k={k} grew"
            prev = n


def test_bigram_oov_rate_bounds(spark, sf_dir):
    """OOV shares are valid ppm, every lang draws a row, and whenever
    the corpus has more distinct bigrams than the vocab size the OOV
    mass must be positive (a top-1000 cut cannot cover them all)."""
    from iq_to_hdl_migration_spark.queries.corpus_queries import (
        _OOV_VOCAB, _TOKS_SPARK)

    rows = REGISTRY["corpus_bigram_oov_rate"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert {r.lang for r in rows} == langs
    for r in rows:
        assert 0 <= r.n_oov <= r.n_bigrams
        assert 0 <= r.oov_ppm <= _PPM
        assert r.oov_ppm == (_PPM * r.n_oov) // r.n_bigrams
    gs = ("CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1),"
          " i -> concat(t[i - 1], ' ', t[i])) ELSE array() END")
    n_distinct = (docs.select(F.expr(_TOKS_SPARK).alias("t"))
                  .select(F.explode(F.expr(gs)).alias("g"))
                  .select("g").distinct().count())
    if n_distinct > _OOV_VOCAB:
        assert sum(r.n_oov for r in rows) > 0


def test_reciprocity_identities(spark, sf_dir):
    """n_mutual is even (mutual edges come in pairs), bounded by
    n_edges, and the ppm is the exact floor ratio."""
    r = REGISTRY["graph_reciprocity_report"].fn(spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert 0 <= r.n_mutual <= r.n_edges
    assert r.n_mutual % 2 == 0
    assert r.reciprocity_ppm == (_PPM * r.n_mutual) // r.n_edges
    assert r.n_nodes >= 2


def test_cross_field_audit_rule_spine(spark, sf_dir):
    """All declared rules report, every rule checked the same row
    count (one shared join pass), and ppm is the exact floor ratio."""
    from iq_to_hdl_migration_spark.queries.validation_queries import (
        _CROSS_FIELD_RULES)

    rows = {r.rule: r for r in
            REGISTRY["dq_cross_field_audit"].fn(spark, sf_dir).collect()}
    assert set(rows) == {name for name, _ in _CROSS_FIELD_RULES}
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for r in rows.values():
        assert r.n_checked == li_count
        assert 0 <= r.n_violations <= r.n_checked
        assert r.violation_ppm == (_PPM * r.n_violations) // r.n_checked


def test_haar_streaming_twin_equals_batch(spark, sf_dir):
    batch = {(r.event_type, r.scale_hours): (r.n_blocks, r.detail_energy)
             for r in REGISTRY["events_haar_energy_profile"].fn(
                 spark, sf_dir).collect()}
    stream = {(r.event_type, r.scale_hours): (r.n_blocks, r.detail_energy)
              for r in REGISTRY["stream_haar_energy"].fn(
                  spark, sf_dir).collect()}
    assert batch == stream


def test_degree_census_mass_conservation(spark, sf_dir):
    """Total out-degree mass == total in-degree mass == edge count
    (every directed edge contributes one to each side), and each
    band's degree mass sits inside the band's arithmetic range."""
    rows = REGISTRY["graph_degree_census"].fn(spark, sf_dir).collect()
    sides = {"in": 0, "out": 0}
    for r in rows:
        sides[r.side] += r.total_degree
        lo, hi = 1 << (r.band - 1), (1 << r.band) - 1
        assert r.n_nodes * lo <= r.total_degree <= r.n_nodes * hi
    assert sides["in"] == sides["out"]
    rec = REGISTRY["graph_reciprocity_report"].fn(spark,
                                                  sf_dir).collect()[0]
    assert sides["out"] == rec.n_edges


def test_calendar_seasonality_accounting(spark, sf_dir):
    """Both calendar spines account for every order and the same
    revenue; indices are valid; floor shares sum to <= 1e6 and miss
    at most one ppm per bucket."""
    rows = REGISTRY["orders_calendar_seasonality"].fn(spark,
                                                      sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    by_kind: dict[str, list] = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert set(by_kind) == {"month_of_year", "day_of_week"}
    assert {r.idx for r in by_kind["month_of_year"]} <= set(range(1, 13))
    assert {r.idx for r in by_kind["day_of_week"]} <= set(range(7))
    rev = None
    for kind, rs in by_kind.items():
        assert sum(r.n_orders for r in rs) == n_orders
        k_rev = sum(r.revenue_units for r in rs)
        assert rev is None or k_rev == rev
        rev = k_rev
        share = sum(r.share_ppm for r in rs)
        assert _PPM - len(rs) <= share <= _PPM


def test_cluster_size_histogram_accounting(spark, sf_dir):
    """Bands partition the clusters reported by dedup_minhash_clusters:
    cluster and doc mass must reconcile exactly, and every band's
    min/max sit inside its power-of-two range."""
    hist = REGISTRY["dedup_cluster_size_histogram"].fn(spark,
                                                       sf_dir).collect()
    clusters = REGISTRY["dedup_minhash_clusters"].fn(spark,
                                                     sf_dir).collect()
    assert sum(r.n_clusters for r in hist) == len(clusters)
    assert sum(r.n_docs for r in hist) == sum(c.n_members
                                              for c in clusters)
    for r in hist:
        lo, hi = 1 << (r.band - 1), (1 << r.band) - 1
        assert lo <= r.min_size <= r.max_size <= hi


def test_type_mix_drift_exact_past_int64(spark, sf_dir):
    """The TVD tail must stay exact where int64 products overflow
    (per-cell o*N at ~4e22): synthetic week counts at 4e11 total
    events, known closed-form TVD 22.5% both weeks."""
    from iq_to_hdl_migration_spark.queries.events_queries import (
        type_mix_drift_from_counts)

    rows = [(0, "a", 100_000_000_000), (0, "b", 100_000_000_000),
            (1, "a", 190_000_000_000), (1, "b", 10_000_000_000)]
    wt = spark.createDataFrame(rows, "week int, event_type string, o bigint")
    out = {r.week: r.tvd_ppm
           for r in type_mix_drift_from_counts(wt).collect()}
    assert out == {0: 225000, 1: 225000}
