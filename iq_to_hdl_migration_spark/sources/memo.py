"""Session-scoped memos for derived structures that production
materializes once (indexes, edge tables, pair graphs) instead of
rebuilding per report.

Every memo is keyed on (tag, applicationId, sf_dir, staged-warehouse
env, driver-side source fingerprint [+ extras]): a re-stage, corpus
switch, or in-place rewrite of the source files misses the memo and
rebuilds — the staleness discipline established by the LSH index's
fail-closed guard. Values are whatever the builder returns (usually a
localCheckpointed DataFrame or a tuple of them); the builder is
responsible for materializing.

At 100 TB each memoized structure becomes a persisted table (see
docs/DEPLOY_100TB.md, "Materialized shared structures") — this module
is the single seam where that swap happens.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MEMOS: dict[str, dict] = {}


def session_memo(tag: str, spark: SparkSession, sf_dir: str,
                 src: DataFrame, build: Callable[[], object],
                 extra: tuple = (), single_live: bool = True):
    """Return the memoized structure for (tag, corpus), building it on
    first use. `src` is the frame whose backing files fingerprint the
    corpus; `extra` extends the key (e.g. hyperparameters);
    `single_live=True` keeps one live entry per tag (the common case —
    one corpus per session), False lets configs coexist."""
    from iq_to_hdl_migration_spark.sources.bucketed import (
        _source_fingerprint)

    store = _MEMOS.setdefault(tag, {})
    key = (spark.sparkContext.applicationId, sf_dir,
           os.environ.get("SPARK_GRAFT_WAREHOUSE", ""),
           _source_fingerprint(src)) + tuple(extra)
    hit = store.get(key)
    if hit is None:
        hit = build()
        if single_live:
            store.clear()
        store[key] = hit
    return hit
