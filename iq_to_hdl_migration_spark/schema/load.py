"""S9: schema load — execute generated DDL with onerror-continue
semantics (load_schema.sh:18 `-onerror continue`; V7 error ledger
load_schema_and_data.py:314-340). Each statement runs via spark.sql;
failures land in a structured ledger instead of aborting the run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class DdlOutcome:
    key: str
    ok: bool
    error: str = ""


def execute_ddl(spark: SparkSession, statements: list[tuple[str, str]],
                on_error: str = "continue") -> list[DdlOutcome]:
    out = []
    for key, stmt in statements:
        try:
            spark.sql(stmt)
            out.append(DdlOutcome(key, True))
        except Exception as exc:
            msg = str(exc).strip().splitlines()
            out.append(DdlOutcome(key, False,
                                  (msg[0] if msg else repr(exc))[:200]))
            if on_error != "continue":
                raise
    return out
