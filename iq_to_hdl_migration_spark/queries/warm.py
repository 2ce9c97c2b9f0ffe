"""Registry-level ingest warm-up (r14 verdict #2).

Every durable memo — the stored structure a 100 TB deployment
materializes at INGEST time (pair graphs, edge tables, trained
indexes, rank trajectories) — is built here, in one named step, so
that bench.py's untimed ingest phase covers ALL of them and its
`memo_build_sec` stamp is the complete stored-structure build cost.
Before this module the stamp covered only the three dedup structures;
the other memos built silently inside the first consumer's untimed
warm-up collect, which made several per-query timings look like
eliminated work when they were warm reads of an unstamped build.

Each module owns its memo configs (a warm function next to the
builders it warms), so warm-up and query can never drift apart; this
module is just the roll-up bench.py calls.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession


def warm_all_memos(spark: SparkSession, sf_dir: str) -> float:
    """Build every durable memo in the registry; returns the wall
    seconds of the whole ingest (stamped as `memo_build_sec`). A
    second call is a no-op dict lookup per memo."""
    from iq_to_hdl_migration_spark.queries.dedup_queries import (
        warm_dedup_memos)
    from iq_to_hdl_migration_spark.queries.events_queries import (
        warm_events_memos)
    from iq_to_hdl_migration_spark.queries.sequence_queries import (
        warm_graph_memos)
    from iq_to_hdl_migration_spark.queries.similarity_queries import (
        warm_similarity_memos)
    from iq_to_hdl_migration_spark.queries.text_queries import (
        warm_text_memos)

    t0 = time.perf_counter()
    warm_dedup_memos(spark, sf_dir)
    warm_graph_memos(spark, sf_dir)
    warm_events_memos(spark, sf_dir)
    warm_similarity_memos(spark, sf_dir)
    warm_text_memos(spark, sf_dir)
    return round(time.perf_counter() - t0, 3)
