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
