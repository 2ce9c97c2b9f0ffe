"""Semantic locks for the round-8 queries beyond the oracle equality:
the invariants a reader would assume from the docs, asserted directly
so a refactor that keeps hash parity by accident (e.g. both sides
wrong the same way) still can't silently change the contract."""

from __future__ import annotations

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.queries import load_all

REGISTRY = load_all()


def test_rag_packing_prefix_invariants(spark, sf_dir):
    """Per query: ranks are a contiguous prefix 1..m, cum_tokens is the
    running sum of n_tokens in rank order, and every row respects the
    budget."""
    from iq_to_hdl_migration_spark.queries.similarity_queries import (
        _RAG_BUDGET)

    rows = (REGISTRY["rag_context_packing"].fn(spark, sf_dir)
            .orderBy("query_id", "rnk").collect())
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q, "packing produced no rows at all"
    for q, rs in by_q.items():
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1)), (
            f"query {q}: ranks not a contiguous prefix")
        run = 0
        for r in rs:
            run += r.n_tokens
            assert r.cum_tokens == run, f"query {q}: cum_tokens drift"
            assert r.cum_tokens <= _RAG_BUDGET, f"query {q}: over budget"


def test_market_basket_support_consistency(spark, sf_dir):
    """n_ab <= min(n_a, n_b) <= n_orders' bound, supports >= min
    support, pairs ordered part_a < part_b, and lift/confidence recompute
    from the integer supports."""
    from iq_to_hdl_migration_spark.queries.cooccurrence_queries import (
        _BASKET_MIN_SUP)

    rows = REGISTRY["orders_market_basket_lift"].fn(spark, sf_dir).collect()
    assert rows, "no association rules found"
    for r in rows:
        assert r.part_a < r.part_b
        assert _BASKET_MIN_SUP <= r.n_ab <= min(r.n_a, r.n_b)
        assert r.confidence_ab == r.n_ab / r.n_a


def test_mad_outliers_bounded_by_corpus(spark, sf_dir):
    """MAD >= 0, outliers < n_docs (the median itself can never be an
    outlier), and every source in documents appears."""
    docs_sources = {
        r.source for r in
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source").distinct().collect()}
    rows = REGISTRY["dq_mad_outlier_docs"].fn(spark, sf_dir).collect()
    assert {r.source for r in rows} == docs_sources
    for r in rows:
        assert r.mad_chars >= 0.0
        assert 0 <= r.n_outliers < r.n_docs


def test_padding_waste_mass_conservation(spark, sf_dir):
    """Sum of sum_tokens across buckets equals the corpus token count,
    and waste = padded - real in every bucket."""
    rows = (REGISTRY["mlprep_length_bucket_padding_waste"]
            .fn(spark, sf_dir).collect())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
              .cast("bigint")).alias("t")).first()["t"]
    assert sum(r.sum_tokens for r in rows) == total
    for r in rows:
        assert r.bucket_len % 64 == 0 and r.bucket_len > 0
        assert r.padded_tokens == r.n_docs * r.bucket_len
        assert r.wasted_tokens == r.padded_tokens - r.sum_tokens
        assert 0 <= r.wasted_tokens < r.n_docs * 64  # each doc pads < 64


def test_survivor_bias_partitions_corpus(spark, sf_dir):
    """Keeper + dropped doc counts per source must add up to the
    source's corpus count, and keepers equal the distinct-text count."""
    rows = (REGISTRY["dedup_survivor_length_bias"]
            .fn(spark, sf_dir).collect())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_src = {r.source: (r.n, r.d) for r in
               docs.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.countDistinct(F.md5(F.col("text").cast("binary")))
                    .alias("d")).collect()}
    got: dict = {}
    for r in rows:
        tot, kept = got.get(r.source, (0, 0))
        got[r.source] = (tot + r.n_docs,
                         kept + (r.n_docs if r.is_keeper == 1 else 0))
    for src, (n, d) in per_src.items():
        assert got[src][0] == n, f"{src}: keeper+dropped != corpus"
        assert got[src][1] == d, f"{src}: keepers != distinct texts"
