"""PageRank: distributed result must match a dense NumPy power
iteration on the same edge list (planted graph + the real query's
derived graph)."""

from __future__ import annotations

import numpy as np
import pytest

from iq_to_hdl_migration_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iters=10, damping=0.85):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, d, w in edges:
        M[idx[d], idx[s]] += w
    col = M.sum(axis=0)
    dangling = col == 0
    M[:, ~dangling] /= col[~dangling]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = r[dangling].sum() / n
        r = (1 - damping) / n + damping * (M @ r + dm)
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize("edges", [
    [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)],                  # cycle
    [(1, 2, 1.0), (1, 3, 3.0), (2, 3, 1.0), (4, 1, 1.0)],     # weighted+dangling(3)
    [(1, 2, 2.0), (2, 1, 1.0), (3, 3, 1.0)],                  # self-loop comp
])
def test_pagerank_matches_numpy(spark, edges):
    df = spark.createDataFrame(edges, "src int, dst int, weight double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iters=10, weight="weight").collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_user_pagerank_query(spark, sf_dir):
    from iq_to_hdl_migration_spark.queries import load_all

    rows = load_all()["graph_user_pagerank_top20"].fn(
        spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)


def test_fixedpoint_pagerank_tracks_float_pagerank(spark, sf_dir):
    """The integer 2^-40 fixed-point PageRank and the double-precision
    one implement the same recurrence; per-edge floor dust is bounded
    by (edges + nodes) * 2^-40 per iteration, so after 10 iterations
    ranks must agree to ~1e-6 absolute and produce the same top-20
    ordering on untied prefixes."""
    from iq_to_hdl_migration_spark.queries import load_all

    reg = load_all()
    fx = {r.user_id: r.rank for r in
          reg["graph_user_pagerank_fixedpoint_top20"].fn(
              spark, sf_dir).collect()}
    fl = {r.user_id: r.rank for r in
          reg["graph_user_pagerank_top20"].fn(spark, sf_dir).collect()}
    shared = set(fx) & set(fl)
    assert len(shared) >= 15   # near-identical top sets
    for u in shared:
        assert abs(fx[u] - fl[u]) < 1e-6, (u, fx[u], fl[u])
