"""Registry-wide physical-plan audit: execute every batch query at a
small sf and flag scale anti-patterns in the final adaptive plan:

  * CartesianProduct anywhere;
  * the InferFiltersFromGenerate trap — a Filter (or scan DataFilters)
    carrying an inlined `transform(sequence...)` gram/shingle builder,
    i.e. an array-builder re-evaluated per input row (the round-5
    winnowing bug, measured 16x);
  * a filter evaluating the same regexp more than once per row.

The per-query gates in tests/test_plan_quality.py pin the headline
plans; this sweep is the registry-wide dragnet (run: round 5 — zero
flags across 199 batch queries).

Usage: python scripts/plan_audit.py [sf_dir]
Prints one JSON object {query: [flags]} — empty means clean.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from iq_to_hdl_migration_spark.queries import load_all
from iq_to_hdl_migration_spark.session import get_spark


def audit(spark, sf_dir: str) -> dict[str, list[str]]:
    flags: dict[str, list[str]] = {}
    for name, spec in sorted(load_all().items()):
        if name.startswith("stream_"):
            continue  # streaming drains have no single batch plan
        try:
            df = spec.fn(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 - audit must keep going
            flags[name] = [f"ERROR {str(ex)[:120]}"]
            continue
        f = []
        if "CartesianProduct" in plan:
            f.append("cartesian")
        for line in plan.splitlines():
            s = line.strip()
            if s.startswith(("Filter", "+- Filter")) or "DataFilters:" in s:
                if "transform(sequence" in s:
                    f.append("inlined-transform-filter")
                    break
                if s.count("regexp_replace") >= 2:
                    f.append("multi-regexp-filter")
                    break
        if f:
            flags[name] = f
    return flags


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--out=")]
    out_path = next((a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--out=")), None)
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    payload = json.dumps(audit(spark, sf_dir), indent=1)
    if out_path:
        # file handoff for scripted callers (scripts/check.py): stdout
        # under a live SparkSession can interleave JVM/log lines with
        # the JSON and break a stdout parse
        with open(out_path, "w") as f:
            f.write(payload)
    print(payload)


if __name__ == "__main__":
    main()
