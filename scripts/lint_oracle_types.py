#!/usr/bin/env python
"""Registry-wide oracle result-type lint.

DuckDB types any SUM-derived column HUGEINT (int128).  Locally that is
invisible — int128 fetches as a plain Python ``int`` so value compares
pass — but the DRIVER's order-insensitive value hash is type-sensitive
on the fetch path, so an equal-valued HUGEINT column hash-mismatches
(round-6 red rows ``graph_user_pagerank_fixedpoint_top20`` and
``mlprep_packing_assignments``).  This lint binds every registered
oracle with ``DESCRIBE`` (plan-only, no execution — runs the whole
261-oracle registry in seconds) and fails if any output column is
HUGEINT/UHUGEINT.

Usage: python scripts/lint_oracle_types.py [sf_dir]
Exit 0 = clean.
"""

from __future__ import annotations

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

FORBIDDEN = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry_mod
    from tests.oracle import oracle_connection

    con = oracle_connection(sf_dir)
    bad: dict[str, list[tuple[str, str]]] = {}
    osql = entry_mod.oracle_sql()
    for name, sql in osql.items():
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        hits = [(r[0], r[1]) for r in rows if r[1].upper() in FORBIDDEN]
        if hits:
            bad[name] = hits
    print(f"oracle-type lint: {len(osql)} oracles, {len(bad)} with "
          f"driver-hash-unsafe columns")
    for name, hits in bad.items():
        print(f"  {name}: {hits}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
