"""Round-11 invariants beyond registry-vs-oracle equality: structural
properties of the new operators (growth-accounting identities, HITS
normalization, IVF share accounting, entropy bounds on planted
payloads) that a value-hash can't articulate."""

from __future__ import annotations

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.queries import load_all

REGISTRY = load_all()

_PPM = 1_000_000


def test_lifecycle_stages_accounting_identities(spark, sf_dir):
    """Growth accounting must actually account: the three entry stages
    of week w sum to that week's active-user count, week 0 is all-new,
    and every user is 'new' exactly once."""
    rows = {r.week: r for r in
            REGISTRY["events_lifecycle_stages"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    week = (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            / 7).cast("int")
    uw = ev.select("user_id", week.alias("w")).distinct()
    active = {r.w: r.c for r in
              uw.groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()}
    n_users = uw.select("user_id").distinct().count()
    for w, r in rows.items():
        assert (r.n_new + r.n_retained + r.n_resurrected
                == active.get(w, 0)), f"week {w} entries != active"
    first = rows[min(rows)]
    assert first.n_retained == 0 and first.n_resurrected == 0
    assert sum(r.n_new for r in rows.values()) == n_users
    # churn can only come from users active some earlier week
    for w, r in rows.items():
        assert r.n_churned <= active.get(w - 1, 0)


def test_fertility_at_least_one_token_per_word(spark, sf_dir):
    """The BPE-ish pre-tokenizer only ever SPLITS whitespace words
    (letter runs / digits / punctuation), so fertility >= 1.0 and the
    BIGINT sums are internally consistent."""
    out = REGISTRY["mlprep_tokenizer_fertility_report"].fn(
        spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.n_bpe_tokens >= r.n_ws_tokens > 0
        assert r.fertility_ppm >= _PPM
        assert r.fertility_ppm == r.n_bpe_tokens * _PPM // r.n_ws_tokens


def test_novelty_curve_shape(spark, sf_dir):
    """Decile 0 is all-novel by construction; new-type counts sum to
    the corpus's distinct shingle count; novelty never exceeds 1.0
    and decays from the first decile to the last on this corpus."""
    rows = sorted(REGISTRY["corpus_novelty_curve"].fn(
        spark, sf_dir).collect(), key=lambda r: r.decile)
    assert rows[0].decile == 0
    assert rows[0].novelty_ppm == _PPM
    for r in rows:
        assert 0 <= r.novelty_ppm <= _PPM
        assert r.n_new_types <= r.n_types <= r.n_doc_shingles
    assert rows[-1].novelty_ppm < rows[0].novelty_ppm, \
        "a growing synthetic corpus must show decaying novelty"


def test_clustering_topk_bounds(spark, sf_dir):
    out = REGISTRY["graph_clustering_topk"].fn(spark, sf_dir).collect()
    assert len(out) == 20
    for r in out:
        assert r.d >= 2
        assert 0.0 <= r.clustering <= 1.0
        # coefficient is exactly the advertised rational
        assert r.clustering == 2 * r.n_triangles / (r.d * (r.d - 1))
    # deterministic ordering: non-increasing coefficient
    cs = [r.clustering for r in out]
    assert cs == sorted(cs, reverse=True)


def test_hits_normalization(spark, sf_dir):
    """Max-normalization contract: every score sits in [0, S] and the
    top authority is pinned at exactly S (floor(max/max * S))."""
    S = 1 << 20
    out = REGISTRY["graph_hits_scores"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r.auth_q <= S and 0 <= r.hub_q <= S
    assert out[0].auth_q == S, "top authority must normalize to S"


def test_ivf_balance_share_accounting(spark, sf_dir):
    out = REGISTRY["sim_ivf_balance_report"].fn(spark, sf_dir).collect()
    k = out[0].n_clusters
    assert len(out) == k
    total = out[0].n_vectors
    assert sum(r.n_members for r in out) == total
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert total == emb_n
    # floor-quantized shares sum to within k ulps of 1e6
    s = sum(r.share_ppm for r in out)
    assert _PPM - k <= s <= _PPM
    assert all(r.imbalance_ppm >= _PPM for r in out)


def test_payload_entropy_planted_extremes(spark):
    """The collision rate must hit its analytic endpoints: a constant
    payload reads 1e6 ppm, a perfectly uniform 256-byte alphabet reads
    floor(1e6/256) = 3906 ppm."""
    from iq_to_hdl_migration_spark.operators.multimodal import (
        byte_collision_features)

    uniform = bytes(range(256)) * 4
    df = (spark.createDataFrame(
        [(1, "flat", b"\x00" * 1024), (2, "uni", uniform)],
        "doc_id bigint, source string, payload binary"))
    got = {r.source: (r.n_bytes, r.sum_sq)
           for r in byte_collision_features(df).collect()}
    n, ss = got["flat"]
    assert ss * _PPM // (n * n) == _PPM
    n, ss = got["uni"]
    assert ss * _PPM // (n * n) == _PPM // 256


def test_payload_entropy_report_bounds(spark, sf_dir):
    out = REGISTRY["mm_payload_entropy_report"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert (_PPM // 256 <= r.min_collision_ppm
                <= r.mean_collision_ppm
                <= r.max_collision_ppm <= _PPM)


def test_ship_lag_profile_order_statistics(spark, sf_dir):
    out = {r.priority: r for r in
           REGISTRY["orders_ship_lag_profile"].fn(spark, sf_dir).collect()}
    assert len(out) == 5  # TPC-H priority domain
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n_lines for r in out.values()) == li
    for r in out.values():
        assert (r.min_lag_days <= r.p50_lag_days <= r.p90_lag_days
                <= r.max_lag_days)
        assert r.min_lag_days <= r.mean_lag_days <= r.max_lag_days


def test_bot_score_components_bounded(spark, sf_dir):
    out = REGISTRY["events_bot_score_report"].fn(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    for r in out:
        assert 0 <= r.subsec_ppm <= _PPM
        assert 0 <= r.night_ppm <= _PPM
        assert r.bot_score == r.subsec_ppm + r.night_ppm
    scores = [r.bot_score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_time_decay_attribution_accounting(spark, sf_dir):
    """Every purchase with at least one in-window click distributes
    <= 1e6 ppm of credit (floor quantization loses at most one ppm per
    touch), and age buckets stay inside the 24h window."""
    out = REGISTRY["events_attribution_time_decay"].fn(
        spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r.age_hours <= 23
        assert r.weight_sum >= r.n_touches  # every weight >= 1
    # total credit == n_purchases_with_touches * 1e6, minus floor dust
    total_credit = sum(r.credit_ppm for r in out)
    total_touches = sum(r.n_touches for r in out)
    from iq_to_hdl_migration_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    import pyspark.sql.functions as FF
    us = FF.unix_micros(FF.col("ts"))
    p = (ev.filter(FF.col("event_type") == "purchase")
         .select("user_id", FF.col("event_id").alias("pid"),
                 us.alias("pt")))
    c = (ev.filter(FF.col("event_type") == "click")
         .select("user_id", us.alias("ct")))
    n_attr = (p.join(c, "user_id")
              .where((FF.col("ct") < FF.col("pt"))
                     & (FF.col("pt") - FF.col("ct") < 24 * 3600 * 10**6))
              .select("pid").distinct().count())
    assert n_attr * _PPM - total_touches < total_credit <= n_attr * _PPM


def test_stream_lifecycle_equals_batch(spark, sf_dir):
    got = sorted(tuple(r) for r in
                 REGISTRY["stream_lifecycle_stages"].fn(
                     spark, sf_dir).collect())
    want = sorted(tuple(r) for r in
                  REGISTRY["events_lifecycle_stages"].fn(
                      spark, sf_dir).collect())
    assert got == want


def test_mixture_shift_share_accounting(spark, sf_dir):
    out = REGISTRY["dedup_mixture_shift_report"].fn(spark, sf_dir).collect()
    assert out
    n_src = len(out)
    for r in out:
        assert 0 <= r.n_after <= r.n_before
        assert r.delta_ppm == r.after_ppm - r.before_ppm
    for col in ("before_ppm", "after_ppm"):
        s = sum(getattr(r, col) for r in out)
        assert _PPM - n_src <= s <= _PPM
    # deltas telescope to ~0 (floor dust only)
    assert abs(sum(r.delta_ppm for r in out)) <= n_src


def test_session_duration_histogram_accounting(spark, sf_dir):
    out = REGISTRY["events_session_duration_histogram"].fn(
        spark, sf_dir).collect()
    from iq_to_hdl_migration_spark.sources.tables import load_table
    total_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in out) == total_events
    for r in out:
        assert r.min_dur_s <= r.max_dur_s
        if r.dur_bucket_log2s > 0:
            # bucket b holds durations with bit-length b
            assert 2 ** (r.dur_bucket_log2s - 1) <= r.min_dur_s
            assert r.max_dur_s < 2 ** r.dur_bucket_log2s


def test_migration_matrix_covers_every_customer(spark, sf_dir):
    out = REGISTRY["orders_customer_migration_matrix"].fn(
        spark, sf_dir).collect()
    from iq_to_hdl_migration_spark.sources.tables import load_table
    n_cust = (load_table(spark, sf_dir, "orders")
              .select("o_custkey").distinct().count())
    assert sum(r.n_customers for r in out) == n_cust
    tiers = {"none", "light", "mid", "heavy"}
    for r in out:
        assert r.tier_h1 in tiers and r.tier_h2 in tiers
    # a customer with orders lands in a real tier at least one half
    assert not any(r.tier_h1 == "none" and r.tier_h2 == "none"
                   for r in out)


def test_shard_plan_balance(spark, sf_dir):
    out = REGISTRY["mlprep_shard_plan"].fn(spark, sf_dir).collect()
    assert len(out) == 64
    from iq_to_hdl_migration_spark.sources.tables import load_table
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs
    # signed deviations around perfect balance telescope to ~0
    assert abs(sum(r.balance_delta_ppm for r in out)) <= 64 * 64


def test_payload_entropy_empty_doc_parity(spark, sf_dir, tmp_path):
    """An empty-text document is explicitly out of scope on BOTH
    engines (r11 review: the oracle's char unnest dropped it silently
    while Spark counted it at 0 ppm — hash-red on any corpus with a
    blank doc). Plant one and require the report to ignore it."""
    import shutil

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iq_to_hdl_migration_spark.sources.tables import TABLES, table_path

    work = str(tmp_path)
    for t in TABLES:
        if t != "documents":
            shutil.copy(table_path(sf_dir, t), f"{work}/{t}.parquet")
    tb = pq.read_table(table_path(sf_dir, "documents"))
    df = tb.to_pandas()
    extra = pd.DataFrame([{"doc_id": 10 ** 9, "text": "", "lang": "en",
                           "source": "src0", "n_chars": 0}])
    pq.write_table(
        pa.Table.from_pandas(pd.concat([df, extra], ignore_index=True),
                             schema=tb.schema),
        f"{work}/documents.parquet")

    spec = REGISTRY["mm_payload_entropy_report"]
    srows = sorted(tuple(r) for r in spec.fn(spark, work).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{work}/documents.parquet')")
    orows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert srows == orows
    # and the blank doc really was ignored, not counted at 0 ppm
    base = {r[0]: r[1] for r in sorted(
        tuple(r) for r in spec.fn(spark, sf_dir).collect())}
    got = {r[0]: r[1] for r in srows}
    assert got["src0"] == base["src0"]


# ---------------------------------------------------------------------------
# Second-batch round-11 additions: structural identities the value
# hash can't state, plus plan shape for the two bounded nested-loops.
# ---------------------------------------------------------------------------

def test_diversity_census_accounts_for_every_user(spark, sf_dir):
    """Band is a whole percent in [0, 100]; the bands partition the
    user set exactly; a user with a single event type lands at 100."""
    rows = REGISTRY["events_user_type_diversity"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    assert sum(r.n_users for r in rows) == n_users
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        assert 0 <= r.concentration_pct <= 100
        assert 1 <= r.min_types <= r.max_types
        if r.concentration_pct == 100:
            assert r.max_types == 1  # pure single-type users only
        if r.min_types == 1:
            assert r.concentration_pct == 100


def test_cluster_holdout_split_identities(spark, sf_dir):
    """Splits partition the corpus; the dup-mass identity holds
    (extra docs = docs - clusters, per split)."""
    rows = REGISTRY["mlprep_cluster_holdout_split"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.total_chars for r in rows) == (
        docs.agg(F.sum("n_chars")).collect()[0][0])
    for r in rows:
        assert r.n_docs - r.n_clusters == r.n_dup_extra_docs
        assert r.n_dup_clusters <= r.n_dup_extra_docs or r.n_dup_clusters == 0


def test_fd_audit_pk_holds_and_bounds(spark, sf_dir):
    rows = {r.fd: r for r in
            REGISTRY["dq_functional_dependency_audit"].fn(
                spark, sf_dir).collect()}
    pk = rows["orders.o_orderkey->o_custkey"]
    assert pk.n_violating_groups == 0 and pk.violation_ppm == 0
    assert pk.max_rhs_variants == 1
    for r in rows.values():
        assert 0 <= r.n_violating_groups <= r.n_lhs_groups
        assert 0 <= r.violation_ppm <= _PPM


def test_reorder_gap_profile_accounts_for_every_gap(spark, sf_dir):
    """Each customer with k orders contributes exactly k-1 gaps."""
    rows = REGISTRY["orders_reorder_gap_profile"].fn(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    for r in rows:
        assert 0 <= r.min_gap_days <= r.max_gap_days
        assert r.gap_week == r.min_gap_days // 7


def test_loo_confusion_classifies_every_live_vector(spark, sf_dir):
    """Every vector with a nonzero quantized norm gets exactly one
    prediction (LOO removes the vector from its own prototype, never
    from the candidate label set); plan (round 14): the N×L scoring is
    a map-only Arrow scan over the corpus — no join of ANY kind ships
    per-vector rows, and the only shuffle left is the bounded L×L
    confusion aggregate."""
    df = REGISTRY["sim_loo_centroid_confusion"].fn(spark, sf_dir)
    rows = df.collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_live = emb.where(F.expr(
        "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0"
    )).count()
    # a live vector can only drop out if its own label is a singleton
    # AND every other prototype is zero — impossible here, so exact:
    assert sum(r.n_vectors for r in rows) == n_live
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan   # the N×L join is gone
    assert "MapInPandas" in plan                   # scoring is map-only


def test_seqlen_curve_chunk_monotonicity(spark, sf_dir):
    rows = sorted(REGISTRY["mlprep_seqlen_capacity_curve"].fn(
        spark, sf_dir).collect(), key=lambda r: r.max_len)
    totals = {r.total_tokens for r in rows}
    assert len(totals) == 1  # same corpus mass at every candidate
    for a, b in zip(rows, rows[1:]):
        assert b.n_chunks <= a.n_chunks  # doubling L never adds chunks
    for r in rows:
        assert r.padded_tokens >= r.total_tokens
        assert r.padded_tokens == r.n_chunks * r.max_len
        assert 0 <= r.waste_ppm < _PPM


def test_agreement_matrix_bounds_and_plan(spark, sf_dir):
    df = REGISTRY["dedup_method_agreement_matrix"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 3  # full method spine even when a set is empty
    for r in rows:
        assert r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 <= r.pair_jaccard <= 1.0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_retrieval_mrr_rank_identity(spark, sf_dir):
    """The count-better rank must equal the window rank the oracle
    states; re-derive it here with an actual ROW_NUMBER window over the
    same Spark-computed scores (full sort per probe) and assert
    equality, plus the reciprocal identity."""
    from pyspark.sql import Window

    from iq_to_hdl_migration_spark.operators import similarity as sim
    from iq_to_hdl_migration_spark.queries.similarity_queries import (
        _N_QUERIES)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    rows = REGISTRY["sim_label_retrieval_mrr"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    for r in rows:
        assert r.first_hit_rank >= 1
        assert abs(r.reciprocal_rank - 1.0 / r.first_hit_rank) == 0.0

    # window-rank re-derivation: same scores, the naive full-sort plan
    emb = load_table(spark, sf_dir, "embeddings")
    v = (emb.withColumn("vec", F.expr(sim.as_double_array("embedding")))
         .withColumn("norm", F.sqrt(sim.dot_expr("vec", "vec")))
         .select("vec_id", "label", "vec", "norm"))
    probes = (v.where(F.col("vec_id") < _N_QUERIES)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("label").alias("true_label"),
                      F.col("vec").alias("qvec"),
                      F.col("norm").alias("qnorm")))
    scored = (v.join(F.broadcast(probes),
                     F.col("vec_id") != F.col("query_id"))
              .select("query_id", "true_label",
                      F.col("vec_id").alias("cand_id"),
                      F.col("label").alias("cand_label"),
                      (sim.dot_expr("qvec", "vec")
                       / (F.col("qnorm") * F.col("norm"))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("cand_id"))
    expected = {r2.query_id: r2.rnk for r2 in (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("cand_label") == F.col("true_label"))
        .groupBy("query_id").agg(F.min("rnk").alias("rnk"))
        .collect())}
    assert {r.query_id: r.first_hit_rank for r in rows} == expected


def test_id_continuity_identities(spark, sf_dir):
    rows = {r.probe: r for r in
            REGISTRY["dq_id_continuity_audit"].fn(spark, sf_dir).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r.min_id <= r.max_id
        assert 0 <= r.n_missing == r.max_id - r.min_id + 1 - r.n_ids
        assert r.n_dup_ids == r.n_rows - r.n_ids >= 0


def test_policy_whatif_dominance(spark, sf_dir):
    """strict's thresholds dominate moderate's dominate lenient's, so
    survival must be monotone across that chain."""
    rows = {r.policy: r for r in
            REGISTRY["curation_policy_whatif"].fn(spark, sf_dir).collect()}
    assert (rows["strict"].n_kept <= rows["moderate"].n_kept
            <= rows["lenient"].n_kept)
    for r in rows.values():
        assert 0 <= r.n_kept <= r.n_docs
        assert r.kept_tokens >= 0
        assert 0 <= r.survival_ppm <= _PPM


def test_partition_advisor_identities(spark, sf_dir):
    rows = REGISTRY["layout_partition_key_advisor"].fn(
        spark, sf_dir).collect()
    by_table = {}
    for r in rows:
        assert r.min_rows <= r.max_rows
        assert r.skew_ppm >= _PPM - 1  # max >= mean by definition
        assert 0 <= r.n_tiny <= r.n_partitions
        tbl = r.candidate.split(".")[0]
        by_table.setdefault(tbl, set()).add(r.total_rows)
    # same-table candidates must agree on the total row count
    for tbl, totals in by_table.items():
        assert len(totals) == 1, f"{tbl}: {totals}"


def test_pair_degree_census_handshake(spark, sf_dir):
    """Sum of degree x docs must equal twice the pair count (every
    pair contributes one degree to each endpoint)."""
    from iq_to_hdl_migration_spark.queries.dedup_queries import (
        minhash_pairs)

    rows = REGISTRY["dedup_pair_degree_census"].fn(spark, sf_dir).collect()
    n_pairs = minhash_pairs(spark, sf_dir, threshold=0.5).count()
    assert sum(r.degree * r.n_docs for r in rows) == 2 * n_pairs
    for r in rows:
        assert r.degree >= 1 and r.n_docs >= 1
