"""Semantic tests for ANN operators — locks the rows-only LSH probe."""

from __future__ import annotations

import math

import pytest
import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from iq_to_hdl_migration_spark.sources.tables import load_table
    return load_table(spark, sf_dir, "embeddings")


def test_bruteforce_topk_matches_numpy(emb, spark):
    import numpy as np

    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    out = sim.brute_force_topk(emb, emb.where(F.col("vec_id") < 2), k=3)
    got = {(r.query_id, r.rnk): (r.cand_id, r.cosine) for r in out.collect()}
    for qid in (0, 1):
        q = rows[qid]
        sims = sorted(
            ((float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), -cid)
             for cid, v in rows.items() if cid != qid),
            reverse=True)
        for rnk in (1, 2, 3):
            cand_id, cosine = got[(qid, rnk)]
            exp_sim, neg_cid = sims[rnk - 1]
            assert cand_id == -neg_cid
            assert math.isclose(cosine, exp_sim, rel_tol=1e-9)


def test_ann_probe_candidates_share_a_bucket(emb):
    out = sim.ann_lsh_topk(emb, emb.where(F.col("vec_id") < 10), k=5)
    rows = out.collect()
    assert len(rows) > 0
    codes = {r.vec_id: set(r.codes) for r in
             sim.with_table_codes(emb, "embedding").collect()}
    # candidates must collide with the query in >= 1 hash table... but
    # table_idx matters: recompute exact membership
    memb = {}
    for r in sim.exploded_buckets(
            emb.select(F.col("vec_id").alias("id"),
                       F.col("embedding").alias("cemb")), "cemb").collect():
        memb.setdefault(r.id, set()).add((r.table_idx, r.code))
    for r in rows:
        assert memb[r.query_id] & memb[r.cand_id], (
            f"{r.query_id},{r.cand_id} share no bucket")
        assert 1 <= r.rnk <= 5
        assert r.query_id != r.cand_id


def test_bucket_codes_in_range(emb):
    rows = sim.with_table_codes(emb, "embedding").collect()
    for r in rows:
        assert len(r.codes) == sim.N_TABLES
        assert all(0 <= c < (1 << sim.BITS_PER_TABLE) for c in r.codes)
