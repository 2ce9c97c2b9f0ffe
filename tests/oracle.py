"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row count, column-name set, and order-insensitive value equality after
sorting columns by name. Floats compare BIT-EXACT (struct-packed) —
the driver's value hash is exact on doubles, so a query that is equal
to 1e-9 but not bit-equal (sqrt(a*b) vs sqrt(a)*sqrt(b), windowed
SUM(double), float->DECIMAL casts, >2^53 int->double casts) is a red
driver row; the round-7 audit found and fixed four such queries, and
this gate now fails loudly before the driver sees the next one.
"""

from __future__ import annotations

import struct

import duckdb

from iq_to_hdl_migration_spark.sources.tables import TABLES, table_path

# DuckDB types that are invisible locally but break the DRIVER's value
# hash: int128 fetches as Python int (== int64 values), yet the driver's
# fetch path renders it as a non-int64 and the hash diverges (round-6
# red rows rank_q / chunk_id).  Round 13 added DECIMAL to the class:
# customer_balance_position was bit-equal locally but red under the
# driver hash because both engines fetch Decimal objects with different
# wire shapes.  Every SUM-descended / money column must be CAST to
# BIGINT (cents for money); this assertion makes the local gate catch
# it before the driver does.
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def _type_unsafe(duck_type: str) -> bool:
    t = duck_type.upper()
    return t in _FORBIDDEN_ORACLE_TYPES or t.startswith("DECIMAL")


def oracle_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def assert_oracle_types_portable(types, cols, name: str = "?"):
    bad = [(c, str(t)) for c, t in zip(cols, types)
           if _type_unsafe(str(t))]
    assert not bad, (
        f"{name}: oracle emits driver-hash-unsafe DuckDB types {bad}; "
        f"wrap SUM-derived columns in CAST(... AS BIGINT) and emit "
        f"money as BIGINT cents, never DECIMAL")


def run_oracle(sql: str, sf_dir: str, name: str = "?"):
    con = oracle_connection(sf_dir)
    rel = con.sql(sql)
    cols = list(rel.columns)
    assert_oracle_types_portable(rel.types, cols, name)
    return cols, rel.fetchall()


def _norm(v):
    if hasattr(v, "isoformat"):
        v = v.isoformat()
    if isinstance(v, bool):
        return v
    return v


def _rows_sorted(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def assert_matches_oracle(spark, fn, sql: str, sf_dir: str, name: str = "?"):
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ocols, orows = run_oracle(sql, sf_dir, name=name)
    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}")
    s_sorted = _rows_sorted(scols, srows)
    o_sorted = _rows_sorted(ocols, orows)
    for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for a, b in zip(sr, orow):
            if isinstance(a, float) and isinstance(b, float):
                if struct.pack("d", a) == struct.pack("d", b):
                    continue
                raise AssertionError(
                    f"{name}: row {i} float not BIT-exact {a!r} != {b!r} "
                    f"(driver-hash red even if numerically close)\n"
                    f"spark={sr}\noracle={orow}")
            if a != b:
                raise AssertionError(f"{name}: row {i} value {a!r} != {b!r}\n"
                                     f"spark={sr}\noracle={orow}")
