"""Round-10 invariants beyond registry-vs-oracle equality: edge cases
the r9 ADVICE flagged (empty-graph BFS parity, streaming id-domain
assumptions) plus behavior locks for this round's additions."""

from __future__ import annotations

import shutil

import pyarrow.parquet as pq

from iq_to_hdl_migration_spark.queries import load_all
from iq_to_hdl_migration_spark.sources.tables import TABLES, table_path
from tests.oracle import assert_matches_oracle

REGISTRY = load_all()


def _corpus_with_empty(sf_dir: str, tmp_path, empty_tables: set[str]) -> str:
    """A sibling corpus where the named tables are schema-identical but
    zero-row — the degenerate input class oracles must survive."""
    work = str(tmp_path)
    for t in TABLES:
        src = table_path(sf_dir, t)
        if t in empty_tables:
            schema = pq.read_schema(src)
            pq.write_table(schema.empty_table(), f"{work}/{t}.parquet")
        else:
            shutil.copy(src, f"{work}/{t}.parquet")
    return work


def test_khop_reach_empty_graph_parity(spark, sf_dir, tmp_path):
    """r9 ADVICE: hop-0 was a hardcoded (0, 1, 1) row, so an edge-less
    corpus reported reach 1 while the oracle said 0. Both sides now
    derive hop 0 from the actual (possibly empty) seed frontier."""
    work = _corpus_with_empty(sf_dir, tmp_path, {"lineitem"})
    spec = REGISTRY["graph_khop_reach"]
    assert_matches_oracle(spark, spec.fn, spec.oracle, work,
                          name="graph_khop_reach[empty]")
    rows = {r["hop"]: (r["frontier_size"], r["reached"])
            for r in spec.fn(spark, work).collect()}
    assert rows[0] == (0, 0), "empty graph must report zero reach"


def _events_with_ids(sf_dir: str, tmp_path, mutate) -> str:
    """Corpus copy whose events.event_id column is `mutate`(original)."""
    import pyarrow as pa

    work = str(tmp_path)
    for t in TABLES:
        src = table_path(sf_dir, t)
        if t == "events":
            tab = pq.read_table(src)
            idx = tab.schema.get_field_index("event_id")
            new_ids = pa.array(mutate(tab["event_id"].to_pylist()),
                               type=pa.int64())
            pq.write_table(tab.set_column(idx, "event_id", new_ids),
                           f"{work}/events.parquet")
        else:
            shutil.copy(src, f"{work}/{t}.parquet")
    return work


def test_streaming_ab_test_negative_id_domain(spark, sf_dir, tmp_path):
    """r9 ADVICE: arrival slicing started at id 0, silently excluding
    negative ids from the stream while the batch oracle kept them.
    Slicing now starts at the actual min — a wholly-negative id domain
    must still reproduce the batch report bit-for-bit."""
    from iq_to_hdl_migration_spark.queries.cooccurrence_queries import (
        events_ab_test_report)
    from iq_to_hdl_migration_spark.streaming.windows import (
        streaming_ab_test)

    work = _events_with_ids(sf_dir, tmp_path,
                            lambda ids: [i - 10_000_000 for i in ids])
    got = sorted(map(tuple, streaming_ab_test(spark, work).collect()))
    want = sorted(map(tuple, events_ab_test_report(spark, work).collect()))
    assert got == want


def test_streaming_twins_reject_null_ids(spark, sf_dir, tmp_path):
    """A NULL id cannot be routed to any id-contiguous micro-batch;
    the twins must fail loudly instead of silently dropping the row
    (which would break the shared-oracle equality)."""
    import pytest

    from iq_to_hdl_migration_spark.streaming.windows import (
        streaming_ab_test)

    work = _events_with_ids(
        sf_dir, tmp_path,
        lambda ids: [None if n == 0 else i for n, i in enumerate(ids)])
    with pytest.raises(ValueError, match="NULL ids"):
        streaming_ab_test(spark, work)


def test_gini_matches_direct_formula(spark, sf_dir):
    """The closed-form histogram rank sums must equal the textbook
    sorted-rank Gini computed directly in the driver, and the
    coefficient must be a valid inequality measure (0 <= G < 1)."""
    row = REGISTRY["events_poweruser_gini"].fn(spark, sf_dir).first()
    from iq_to_hdl_migration_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    ev = load_table(spark, sf_dir, "events")
    xs = sorted(r["n"] for r in
                ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
                .collect())
    n, tot = len(xs), sum(xs)
    s_rank = sum((i + 1) * x for i, x in enumerate(xs))
    assert row["n_users"] == n and row["total_events"] == tot
    assert row["gini_num"] == 2 * s_rank - (n + 1) * tot
    assert row["gini_den"] == n * tot
    assert 0.0 <= row["gini"] < 1.0


def test_assortativity_is_valid_correlation(spark, sf_dir):
    row = REGISTRY["graph_degree_assortativity"].fn(spark, sf_dir).first()
    assert -1.0 <= row["assortativity"] <= 1.0
    # directed edge list: every undirected edge contributes twice, so
    # the count is even, and sums are consistent with m >= 1 degrees
    assert row["m_edges_directed"] % 2 == 0
    assert row["sum_deg"] >= row["m_edges_directed"]


def test_range_search_consistent_with_topk(spark, sf_dir):
    """Range results at tau must be exactly the quantized-cosine pairs
    >= tau: every top-k hit scoring >= tau appears in the range
    result, and no range row scores below tau."""
    from iq_to_hdl_migration_spark.queries.similarity_queries import (
        _RANGE_TAU)

    rng = {(r["query_id"], r["cand_id"]): r["cosine_q"]
           for r in REGISTRY["sim_cosine_range_search"]
           .fn(spark, sf_dir).collect()}
    assert all(c >= _RANGE_TAU for c in rng.values())
    topk = REGISTRY["sim_quantized_topk"].fn(spark, sf_dir).collect()
    for r in topk:
        if r["cosine_q"] >= _RANGE_TAU:
            assert (r["query_id"], r["cand_id"]) in rng, \
                "top-k hit above tau missing from range result"


def test_dataset_card_internal_consistency(spark, sf_dir):
    rows = REGISTRY["mlprep_dataset_card"].fn(spark, sf_dir).collect()
    assert rows, "card is empty"
    for r in rows:
        assert 0 <= r["n_exact_dup_docs"] < r["n_docs"]
        assert 0.0 < r["top_lang_share"] <= 1.0
        assert r["n_langs"] >= 1
        assert r["n_tokens"] >= r["n_docs"]  # every doc tokenizes


def test_session_overlap_pairs_probe_bounded(spark, sf_dir):
    rows = REGISTRY["events_session_overlap_pairs"].fn(
        spark, sf_dir).collect()
    assert rows, "no overlaps found (synthetic users are concurrent)"
    for r in rows:
        assert r["probe_user"] < 8, "non-probe user on the probe side"
        assert r["probe_user"] != r["user_b"]
        assert r["n_overlap_sessions"] >= 1


def test_dup_ngram_chars_bounds(spark, sf_dir):
    for r in REGISTRY["text_dup_ngram_chars"].fn(spark, sf_dir).collect():
        assert 0 <= r["dup_chars"] <= r["total_chars"]
        assert 0.0 <= r["max_doc_dup_ratio"] <= 1.0
        assert 0 <= r["n_docs_flagged"] <= r["n_docs"]


def test_fim_spans_survives_two_token_docs(spark, sf_dir, tmp_path):
    """Code-review regression: the cut-point modulus was evaluated for
    EVERY row, so a 2-token document (n_tokens - 2 == 0) raised
    REMAINDER_BY_ZERO under the ANSI default. The guarded modulus must
    run and still match the oracle on such a corpus."""
    import pyarrow as pa

    work = str(tmp_path)
    for t in TABLES:
        src = table_path(sf_dir, t)
        if t == "documents":
            tab = pq.read_table(src)
            texts = tab["text"].to_pylist()
            texts[0] = "two tokens"
            texts[1] = "one"
            idx = tab.schema.get_field_index("text")
            tab = tab.set_column(idx, "text", pa.array(texts, pa.string()))
            pq.write_table(tab, f"{work}/documents.parquet")
        else:
            shutil.copy(src, f"{work}/{t}.parquet")
    spec = REGISTRY["mlprep_fim_spans"]
    assert_matches_oracle(spark, spec.fn, spec.oracle, work,
                          name="mlprep_fim_spans[degenerate]")


def test_assortativity_equal_degree_graph_is_zero(spark, sf_dir,
                                                  tmp_path):
    """Code-review regression: an equal-degree graph (perfect matching
    — every co-purchase node has degree 2 after direction-doubling)
    zeroes the degree-variance denominator; the guarded expression
    must define assortativity 0.0 on both engines instead of raising
    DIVIDE_BY_ZERO under ANSI."""
    import pyarrow as pa

    work = str(tmp_path)
    for t in TABLES:
        src = table_path(sf_dir, t)
        if t == "lineitem":
            tab = pq.read_table(src).slice(0, 4)
            ok = tab.schema.get_field_index("l_orderkey")
            pk = tab.schema.get_field_index("l_partkey")
            tab = tab.set_column(ok, "l_orderkey",
                                 pa.array([1, 1, 2, 2], pa.int64()))
            tab = tab.set_column(pk, "l_partkey",
                                 pa.array([10, 20, 30, 40], pa.int64()))
            pq.write_table(tab, f"{work}/lineitem.parquet")
        else:
            shutil.copy(src, f"{work}/{t}.parquet")
    spec = REGISTRY["graph_degree_assortativity"]
    assert_matches_oracle(spark, spec.fn, spec.oracle, work,
                          name="graph_degree_assortativity[matching]")
    row = spec.fn(spark, work).first()
    assert row["assortativity"] == 0.0
    assert row["m_edges_directed"] == 4


def test_quantile_sketch_bound_promise_holds(spark, sf_dir):
    """The histogram sketch's contract: exact <= upper bound and the
    gap is at most one bin width (values are inside the [0, 1000)
    domain here, so the edge clamp never bites)."""
    rows = REGISTRY["sketch_quantile_accuracy_report"].fn(
        spark, sf_dir).collect()
    assert rows
    for r in rows:
        for q in ("p50", "p95", "p99"):
            err = r[f"{q}_err"]
            assert 0.0 <= err <= r["bin_width"] + 1e-9, (
                f"{r['event_type']} {q}: exact={r[f'{q}_exact']} "
                f"ub={r[f'{q}_ub']} err={err}")


def test_lsh_collision_profile_is_monotone(spark, sf_dir):
    """Banding theory in data: mean estimated Jaccard must rise with
    the number of colliding bands, and pairs colliding in ALL bands
    have identical signatures (estimate exactly 1.0)."""
    rows = sorted(
        (r["n_colliding_bands"], r["avg_est_jaccard"])
        for r in REGISTRY["dedup_lsh_collision_profile"]
        .fn(spark, sf_dir).collect())
    assert rows, "no candidate pairs"
    ests = [e for _, e in rows]
    assert ests == sorted(ests), f"profile not monotone: {rows}"
    import iq_to_hdl_migration_spark.operators.dedup as dedup
    full = dict(rows).get(dedup.BANDS)
    if full is not None:
        assert full == 1.0, "all-band collisions must be exact matches"
