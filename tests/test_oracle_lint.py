"""The driver-hash type lint must catch every unsafe top-level output
type: HUGEINT (round-6 red rows) and DECIMAL (round-13 red row
customer_balance_position).  These tests feed deliberately-unsafe
oracles through the same assertion the gate uses and require a loud
failure — if the lint ever regresses, this file goes red before the
driver does.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import assert_oracle_types_portable


def _types_of(sql: str):
    rel = duckdb.connect().sql(sql)
    return rel.types, list(rel.columns)


@pytest.mark.parametrize("sql,label", [
    ("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)", "HUGEINT"),
    ("SELECT CAST(1.50 AS DECIMAL(18,2)) AS m", "DECIMAL"),
    ("SELECT CAST(7 AS DECIMAL(38,0)) AS wide", "DECIMAL(38,0)"),
])
def test_lint_rejects_unsafe_types(sql, label):
    types, cols = _types_of(sql)
    with pytest.raises(AssertionError, match="driver-hash-unsafe"):
        assert_oracle_types_portable(types, cols, name=f"deliberate-{label}")


@pytest.mark.parametrize("sql", [
    "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)",
    "SELECT CAST(150 AS BIGINT) AS cents, CAST(1.5 AS DOUBLE) AS d, 'x' AS s",
])
def test_lint_accepts_portable_types(sql):
    types, cols = _types_of(sql)
    assert_oracle_types_portable(types, cols, name="portable")
