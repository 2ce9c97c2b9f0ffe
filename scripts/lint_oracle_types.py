#!/usr/bin/env python
"""Registry-wide oracle result-type lint.

DuckDB types any SUM-derived column HUGEINT (int128).  Locally that is
invisible — int128 fetches as a plain Python ``int`` so value compares
pass — but the DRIVER's order-insensitive value hash is type-sensitive
on the fetch path, so an equal-valued HUGEINT column hash-mismatches
(round-6 red rows ``graph_user_pagerank_fixedpoint_top20`` and
``mlprep_packing_assignments``).  Round 13 showed DECIMAL outputs hit
the same class: ``customer_balance_position`` emitted DECIMAL(18,2),
bit-equal locally but red under the driver hash (DuckDB fetches
Decimal objects, Spark fetches Decimal with a different wire shape).
This lint binds every registered oracle with ``DESCRIBE`` (plan-only,
no execution — runs the whole registry in seconds) and fails if any
top-level output column is HUGEINT/UHUGEINT or any DECIMAL type.
Emit money as BIGINT cents instead.

Usage: python scripts/lint_oracle_types.py [sf_dir]
Exit 0 = clean.
"""

from __future__ import annotations

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

FORBIDDEN = {"HUGEINT", "UHUGEINT"}


def _unsafe(duck_type: str) -> bool:
    """True if a top-level output column of this DuckDB type is
    driver-hash-unsafe: int128 variants, or any DECIMAL(p,s)."""
    t = duck_type.upper()
    return t in FORBIDDEN or t.startswith("DECIMAL")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry_mod
    from tests.oracle import oracle_connection

    con = oracle_connection(sf_dir)
    bad: dict[str, list[tuple[str, str]]] = {}
    osql = entry_mod.oracle_sql()
    for name, sql in osql.items():
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        hits = [(r[0], r[1]) for r in rows if _unsafe(r[1])]
        if hits:
            bad[name] = hits
    print(f"oracle-type lint: {len(osql)} oracles, {len(bad)} with "
          f"driver-hash-unsafe columns")
    for name, hits in bad.items():
        print(f"  {name}: {hits}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
