"""Semantic invariants for the round-5 training-mix additions, beyond
the registry oracle gate: temperature-mixture algebra, centroid-cosine
replication in NumPy, and the exact-cross-copy lower bound that the
near-dup decontamination report must dominate."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.queries import load_all
from iq_to_hdl_migration_spark.sources.tables import load_table

REGISTRY = load_all()


def test_mix_temperature_invariants(spark, sf_dir):
    rows = REGISTRY["mix_temperature_sampling"].fn(spark, sf_dir).collect()
    assert rows
    # weights form a distribution
    assert math.isclose(sum(r.weight for r in rows), 1.0, rel_tol=1e-12)
    # allocation never exceeds the budget (= half the corpus) and the
    # floor() rounding only ever under-allocates
    total_tokens = sum(r.n_tokens for r in rows)
    assert sum(r.alloc_tokens for r in rows) <= total_tokens // 2
    # temperature flattening: weight order tracks size order, but the
    # RATIO between the largest and smallest weight is the sqrt of the
    # size ratio — strictly flatter than proportional sampling
    by_size = sorted(rows, key=lambda r: r.n_tokens)
    lo, hi = by_size[0], by_size[-1]
    assert lo.weight <= hi.weight
    if lo.n_tokens < hi.n_tokens:
        size_ratio = hi.n_tokens / lo.n_tokens
        weight_ratio = hi.weight / lo.weight
        assert weight_ratio < size_ratio
        assert math.isclose(weight_ratio, math.sqrt(size_ratio),
                            rel_tol=1e-3)
    # epochs = alloc / n_tokens exactly
    for r in rows:
        assert math.isclose(r.epochs, r.alloc_tokens / r.n_tokens,
                            rel_tol=1e-12)


def test_label_centroid_cosine_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = REGISTRY["sim_label_centroid_cosine"].fn(spark, sf_dir).collect()
    labels = sorted({r.label_a for r in rows} | {r.label_b for r in rows})
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    assert all(-1.0 - 1e-12 <= r.cosine <= 1.0 + 1e-12 for r in rows)

    # independent replication: same fixed-point pipeline in NumPy
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", "embedding").collect()
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for r in emb:
        q = np.floor(np.array(r.embedding, dtype=np.float64) * 1048576.0)
        sums[r.label] = sums.get(r.label, 0) + q
        counts[r.label] = counts.get(r.label, 0) + 1
    cent = {l: (sums[l] / counts[l]) / 1048576.0 for l in sums}
    got = {(r.label_a, r.label_b): r.cosine for r in rows}
    for (a, b), c in got.items():
        va, vb = cent[a], cent[b]
        expect = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert math.isclose(c, expect, rel_tol=1e-9), (a, b, c, expect)


def test_neardup_decontamination_dominates_exact_copies(spark, sf_dir):
    """Every train doc whose EXACT text also appears in the held-out
    split must be flagged (exact-dup links + the one-hop closure make
    this a guarantee, not a heuristic) — so the per-source contaminated
    count is lower-bounded by an independently computed exact-cross-copy
    count."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    tagged = docs.select(
        "source", F.md5("text").alias("digest"),
        F.when(bucket < "cc", "train").otherwise("held").alias("split"))
    held_digests = (tagged.where(F.col("split") == "held")
                    .select("digest").distinct())
    exact_cross = (tagged.where(F.col("split") == "train")
                   .join(held_digests, "digest")
                   .groupBy("source").agg(F.count(F.lit(1)).alias("n_exact")))
    lower = {r.source: r.n_exact for r in exact_cross.collect()}
    report = {r.source: r for r in
              REGISTRY["text_contamination_neardup"].fn(spark, sf_dir)
              .collect()}
    for src, n_exact in lower.items():
        assert report[src].n_contaminated >= n_exact, (src, n_exact)
    for src, r in report.items():
        assert 0 <= r.n_contaminated <= r.n_train_docs
        if r.max_est_jaccard is not None:
            assert 0.5 <= r.max_est_jaccard <= 1.0
