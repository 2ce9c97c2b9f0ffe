"""Registry-wide bit-exact float audit: compares every oracled query's
Spark output against DuckDB with EXACT double equality (struct-packed
bits), i.e. the driver's value-hash semantics, instead of the 1e-9
relative tolerance tests/oracle.py historically allowed. A query that
passes the tolerant gate but fails here WILL be a hash-red driver row
(round-7 find: dedup_semdedup_clusters sqrt(a*b) vs sqrt(a)*sqrt(b)).

Usage: python scripts/float_exact_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from iq_to_hdl_migration_spark.queries import load_all
    from iq_to_hdl_migration_spark.session import get_spark
    from tests.oracle import _rows_sorted, run_oracle

    spark = get_spark("float-exact-audit")
    reg = load_all()
    sfv = float(sf.rsplit("sf", 1)[-1].rstrip("/"))
    bad, errs, n_run = [], [], 0
    for name, spec in sorted(reg.items()):
        if spec.oracle is None:
            continue
        if spec.oracle_max_sf is not None and sfv > spec.oracle_max_sf:
            continue
        n_run += 1
        try:
            sdf = spec.fn(spark, sf)
            ss = _rows_sorted(sdf.columns, [tuple(r) for r in sdf.collect()])
            ocols, orows = run_oracle(spec.oracle, sf, name=name)
            oo = _rows_sorted(ocols, orows)
            if len(ss) != len(oo):
                bad.append((name, "rowcount"))
                continue
            diff = 0
            for sr, orow in zip(ss, oo):
                for a, b in zip(sr, orow):
                    if isinstance(a, float) and isinstance(b, float):
                        if struct.pack("d", a) != struct.pack("d", b):
                            diff += 1
                    elif a != b:
                        diff += 1
            if diff:
                bad.append((name, f"{diff} cells"))
        except Exception as ex:  # pragma: no cover - audit tool
            errs.append((name, str(ex)[:200]))
    print(f"float-exact audit @ {sf}: {n_run} oracled queries")
    for name, why in bad:
        print(f"  NOT-BIT-EXACT {name}: {why}")
    for name, why in errs:
        print(f"  ERROR {name}: {why}")
    if not bad and not errs:
        print("  all bit-exact")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
