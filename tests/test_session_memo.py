"""The session-memo seam (sources/memo.py) must be corpus-stale-safe:
same corpus -> same object back (no rebuild); a rewritten source file
(mtime change suffices — the fingerprint is path/size/mtime) -> memo
miss and rebuild. This is the staleness class the round-7 ADVICE
flagged on _COPURCHASE_MEMO, now locked at the shared seam."""

from __future__ import annotations

import os
import shutil

from iq_to_hdl_migration_spark.sources.memo import session_memo
from iq_to_hdl_migration_spark.sources.tables import load_table


def _copy_docs(sf_dir: str, tmp_path) -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    dst_dir = str(tmp_path)
    shutil.copy(src, os.path.join(dst_dir, "documents.parquet"))
    return dst_dir


def test_memo_hit_and_stale_miss(spark, sf_dir, tmp_path):
    work = _copy_docs(sf_dir, tmp_path)
    builds = []

    def get():
        docs = load_table(spark, work, "documents")
        return session_memo(
            "test_memo", spark, work, docs,
            lambda: builds.append(1) or docs.limit(1).localCheckpoint())

    a = get()
    b = get()
    assert b is a, "same corpus must hit the memo"
    assert len(builds) == 1

    # in-place rewrite: same path, same size, new mtime -> must rebuild
    f = os.path.join(work, "documents.parquet")
    st = os.stat(f)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    c = get()
    assert c is not a, "rewritten source served a stale memo entry"
    assert len(builds) == 2


def test_memo_extra_key_separates_configs(spark, sf_dir, tmp_path):
    work = _copy_docs(sf_dir, tmp_path)
    docs = load_table(spark, work, "documents")
    a = session_memo("test_cfg", spark, work, docs,
                     lambda: ("k4",), extra=(4,), single_live=False)
    b = session_memo("test_cfg", spark, work, docs,
                     lambda: ("k8",), extra=(8,), single_live=False)
    a2 = session_memo("test_cfg", spark, work, docs,
                      lambda: ("rebuilt",), extra=(4,), single_live=False)
    assert a == ("k4",) and b == ("k8",)
    assert a2 is a, "coexisting configs must not evict each other"
