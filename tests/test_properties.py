"""Property-based tests (SURVEY §5.4) over the driver-side pure
functions: planning operators, the type mapper, and the DDL rewrite
engine. Hypothesis generates the adversarial inputs; each property is
an invariant the reference's behavior implies.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iq_to_hdl_migration_spark.ddl import engine as E
from iq_to_hdl_migration_spark.ddl.rules import BASE_RULES
from iq_to_hdl_migration_spark.operators.planning import (
    lpt_assign, suggest_partitions)
from iq_to_hdl_migration_spark.schema.typemap import iq_domain_to_spark

# --------------------------- planning: suggest_partitions -------------------


@given(size=st.integers(min_value=0, max_value=1 << 50),
       target=st.integers(min_value=1, max_value=1 << 30))
def test_suggest_partitions_covers_size(size, target):
    n = suggest_partitions(size, target_bytes=target)
    assert 1 <= n <= 10_000
    if n < 10_000:
        assert n * target >= size          # partitions cover the data
        if n > 1:
            assert (n - 1) * target < size  # and none are gratuitous


@given(a=st.integers(min_value=0, max_value=1 << 45),
       b=st.integers(min_value=0, max_value=1 << 45))
def test_suggest_partitions_monotonic(a, b):
    lo, hi = sorted((a, b))
    assert suggest_partitions(lo) <= suggest_partitions(hi)


# --------------------------- planning: LPT bin-packing ----------------------

_items = st.lists(
    st.tuples(st.text(min_size=1, max_size=8), st.integers(0, 1 << 40)),
    min_size=0, max_size=60, unique_by=lambda kv: kv[0])


@given(items=_items, n=st.integers(min_value=1, max_value=8))
def test_lpt_partition_of_items(items, n):
    out = lpt_assign(items, n)
    # every item exactly once, buckets in range, order_in_bucket dense
    assert sorted((k, s) for k, s, _, _ in out) == sorted(items)
    assert all(0 <= b < n for _, _, b, _ in out)
    for b in range(n):
        orders = sorted(o for _, _, bb, o in out if bb == b)
        assert orders == list(range(len(orders)))


@given(items=_items, n=st.integers(min_value=1, max_value=8))
def test_lpt_balance_bound(items, n):
    """Greedy LPT guarantee: max bucket load <= average + max item."""
    if not items:
        return
    out = lpt_assign(items, n)
    loads = [0] * n
    for _, s, b, _ in out:
        loads[b] += s
    total = sum(s for _, s in items)
    biggest = max(s for _, s in items)
    assert max(loads) <= total / n + biggest


@given(items=_items, n=st.integers(min_value=1, max_value=8))
def test_lpt_deterministic_under_input_order(items, n):
    assert lpt_assign(items, n) == lpt_assign(list(reversed(items)), n)


# --------------------------- type mapper ------------------------------------


@given(domain=st.text(max_size=30), width=st.integers(-5, 200),
       scale=st.integers(-5, 200))
def test_type_mapper_total_and_valid(domain, width, scale):
    t = iq_domain_to_spark(domain, width, scale)
    s = t.simpleString()
    if s.startswith("decimal"):
        prec, sc = map(int, s[8:-1].split(","))
        assert 1 <= prec <= 38 and 0 <= sc <= prec


# --------------------------- DDL rewrite engine -----------------------------

_sql_line = st.one_of(
    st.just("go"),
    st.just(""),
    st.text(alphabet=st.characters(whitelist_categories=("L", "N", "P", "Z"),
                                   blacklist_characters="\n\r"),
            max_size=60),
    st.just('ALTER TABLE "o"."t" ADD FOREIGN KEY fk (c) REFERENCES "o"."p"'),
    st.just("CREATE TEXT CONFIGURATION \"SYS\".cfg"),
)


@settings(deadline=None, max_examples=60)
@given(lines=st.lists(_sql_line, max_size=40))
def test_rewrite_total_and_line_preserving(lines):
    """rewrite() never raises on arbitrary statement lists, never loses
    a line (it only prefixes `-- ` and inserts marker/clone lines), and
    commenting is prefix-only: every input line is retrievable."""
    res = E.rewrite(list(lines), BASE_RULES)
    out = [ln for ln in res.lines
           if not ln.startswith("--**") and ln not in res.added_lines] \
        if hasattr(res, "added_lines") else res.lines
    stripped = [ln[3:] if ln.startswith("-- ") else ln
                for ln in out if not ln.startswith("--**")]
    for original in lines:
        assert original in stripped or any(original in s for s in stripped)


@settings(deadline=None, max_examples=30)
@given(lines=st.lists(_sql_line, max_size=30))
def test_rewrite_idempotent_on_own_output(lines):
    """Re-running the rewriter on its own output adds no new hits —
    commented blocks must not be re-matched (D3 semantics)."""
    first = E.rewrite(list(lines), BASE_RULES)
    second = E.rewrite(list(first.lines), BASE_RULES)
    assert second.lines == first.lines


# ---------------------------------------------------------------------------
# round-7 properties: exactness claims behind the GEMM/sketch rewrites


@given(st.lists(st.lists(st.integers(min_value=-(1 << 20),
                                     max_value=1 << 20),
                         min_size=8, max_size=8),
                min_size=2, max_size=12))
@settings(max_examples=100, deadline=None)
def test_float64_gemm_exact_for_quantized_vectors(vecs):
    """The SemDeDup claim: float64 BLAS GEMM over 2^-20-quantized
    integer vectors equals exact integer dot products in ANY
    summation order — every partial product |q*q| <= 2^40 and every
    partial sum <= dims * 2^40 < 2^53 is exactly representable."""
    import numpy as np

    q = np.array(vecs, dtype=np.int64)
    exact = q @ q.T                       # int64: exact
    viaf = q.astype(np.float64) @ q.astype(np.float64).T
    assert (viaf == exact.astype(np.float64)).all()


@given(st.sets(st.integers(min_value=0, max_value=(1 << 60) - 1),
               min_size=1, max_size=400),
       st.sets(st.integers(min_value=0, max_value=(1 << 60) - 1),
               min_size=1, max_size=400))
@settings(max_examples=100, deadline=None)
def test_kmv_union_merge_property(a_vals, b_vals):
    """The sketch_kmv_set_ops mergeability claim: the K smallest of
    (sketch(A) ∪ sketch(B)) equal the K smallest of (A ∪ B) — stored
    sketches alone answer the union question exactly as a rescan
    would."""
    k = 128
    sk_a = sorted(a_vals)[:k]
    sk_b = sorted(b_vals)[:k]
    from_sketches = sorted(set(sk_a) | set(sk_b))[:k]
    from_rescan = sorted(a_vals | b_vals)[:k]
    assert from_sketches == from_rescan


@given(st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=126),
               min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_portable_hash60_matches_duckdb(s):
    """The portable 60-bit hash idiom's DuckDB leg
    (CAST('0x'||substr(md5(x),1,15) AS BIGINT)) equals the reference
    computation int(md5(utf8)[0:15], 16) for arbitrary printable
    input — the contract every sketch/bucket/sampler oracle rests on
    (the Spark leg is locked against the same reference by the
    registry gate)."""
    import hashlib

    import duckdb

    expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    got = duckdb.connect().execute(
        "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)",
        [s]).fetchone()[0]
    assert got == expect


def test_benford_ppm_constants():
    """dq_benford_first_digit's hardcoded expectations are
    floor(log10(1+1/d) * 1e6) and cover ~100% of the mass."""
    import math

    from iq_to_hdl_migration_spark.queries.validation_queries import (
        _BENFORD_PPM)

    for d, ppm in _BENFORD_PPM.items():
        assert ppm == math.floor(math.log10(1 + 1 / d) * 1_000_000)
    assert 999_990 <= sum(_BENFORD_PPM.values()) <= 1_000_000


@given(st.lists(st.integers(min_value=0, max_value=3000),
                min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_cusum_recurrence_reference(xs):
    """The CUSUM oracle/fold recurrence against a direct Python
    evaluation: s_t = max(0, s_{t-1} + x_t - ref) with the query's
    ceil-mean + 5% slack reference — drains to 0 under the reference
    level and is always non-negative."""
    n = len(xs)
    k = (sum(xs) + n - 1) // n
    ref = k + max(1, k // 20)
    s = 0
    for x in xs:
        s = max(0, s + x - ref)
        assert s >= 0
    # constant series at the reference level never alarms
    s2 = 0
    for _ in range(50):
        s2 = max(0, s2 + k - ref)
    assert s2 == 0
