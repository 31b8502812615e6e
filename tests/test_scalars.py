"""Exact-quotient scalar helpers (SURVEY §2.7).

Pins the r7→r8 fix: `round_ratio_half_up_wide` must produce the exact
decimal HALF_UP quotient even when the narrow variant's
2·N·10^s < 2^53 float-path precondition is breached (market-wide
dollar-volume sums past ~sf45 — the p7 index-price call sites,
plans/stage2.py). Oracles: Python `decimal.Decimal` (exact, unlimited
precision) and DuckDB's hugeint `//` (the engine the driver's parity
gate diffs against).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, localcontext

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trace_data_pipeline_spark.functions.scalars import (
    round_ratio_half_up,
    round_ratio_half_up_wide,
)


def _decimal_oracle(n: int, d: int, scale: int) -> float:
    """Exact HALF_UP round of n/d at `scale` decimals via Decimal.
    prec=60 keeps the intermediate division exact enough that the
    quantize decision is the true one for any N < 10^20, D < 10^11."""
    with localcontext() as ctx:
        ctx.prec = 60
        q = (Decimal(n) / Decimal(d)).quantize(
            Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
        )
    return float(q)


# Past-2^53 cases the narrow float path cannot compute: N is 1e16-1e19
# so 2·N·10^4 is up to ~2e23, ten orders past the 2^53 ceiling — but
# the QUOTIENT stays < 2^53/10^4 (the wide variant's output-cast
# precondition; in p7 the quotient is a price, the sums cancel). Odd
# denominators + crafted exact-tie numerators probe the floor()
# decision boundary.
WIDE_CASES = [
    (10**16 + 1, 99_991),                  # prime denom, q ≈ 1e11
    (10**16 + 7, 20_001),
    (12_345_678_901_234_567, 89_999),
    (10**18 - 1, 10**7 + 19),              # prime denom
    (10**19 - 7, 99_999_989),              # at the decimal(20,0) edge
    (9_007_199_254_740_993, 12_347),       # 2^53 + 1 numerator
    # EXACT ties at 4dp: N/D = x.xxxx5 precisely → HALF_UP goes up.
    (2 * 10**15 + 1, 2 * 10**4),           # 1e11 + 0.00005 → .0001
    (6 * 10**15 + 3, 2 * 10**4),           # 3e11 + 0.00015 → .0002
]


@pytest.mark.parametrize("n,d", WIDE_CASES)
def test_round_ratio_half_up_wide_matches_decimal_oracle(spark, n, d):
    df = spark.createDataFrame(
        [(Decimal(n), Decimal(d))], "numer decimal(20,0), denom decimal(20,0)"
    )
    from pyspark.sql import functions as F

    got = df.select(
        round_ratio_half_up_wide(F.col("numer"), F.col("denom"), 4).alias("q")
    ).first()["q"]
    assert got == _decimal_oracle(n, d, 4), (n, d)


@pytest.mark.parametrize("n,d", WIDE_CASES)
def test_round_ratio_half_up_wide_matches_duckdb_hugeint(n, d):
    """The driver's oracle engine computes the same quotient with
    HUGEINT floor division — since r9 the exact formulation p7's
    DuckDB oracle SQL uses for its index-price quotients (the sums
    are explicitly CAST AS HUGEINT in plans/stage2.py, so the oracle
    shares the wide variant's N < 1e20 domain rather than a BIGINT
    ceiling). The Spark result must land on the identical value, so
    pin the shared Decimal oracle against DuckDB too."""
    (q,) = duckdb.sql(
        f"SELECT ((2*{n}::HUGEINT*10000 + {d}) // (2*{d}::HUGEINT))"
        " / 10000.0"
    ).fetchone()
    assert float(q) == _decimal_oracle(n, d, 4), (n, d)


@st.composite
def _wide_inputs(draw):
    scale = draw(st.sampled_from([0, 2, 4]))
    n = draw(st.integers(min_value=1, max_value=10**18))
    # respect the output-cast precondition quotient·10^s < 2^53
    d_min = (n * 10**scale) // 2**53 + 1
    d = draw(st.integers(min_value=d_min, max_value=10**10))
    return n, d, scale


@pytest.mark.slow  # r17 (verdict item 1): 30 Spark round-trips ≈ 18 s;
# the wide quotient's real call sites are oracle-hash-checked in the
# default parity lane (p7/p8/es5), so the randomized battery moves to
# the slow lane unreduced
@given(nds=_wide_inputs())
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_round_ratio_half_up_wide_property(spark, nds):
    """Any in-precondition (N, D, scale) triple — including N far past
    2^53 — matches the exact Decimal HALF_UP oracle."""
    n, d, scale = nds
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(Decimal(n), Decimal(d))], "numer decimal(20,0), denom decimal(20,0)"
    )
    got = df.select(
        round_ratio_half_up_wide(
            F.col("numer"), F.col("denom"), scale
        ).alias("q")
    ).first()["q"]
    assert got == _decimal_oracle(n, d, scale), (n, d, scale)


def test_wide_equals_narrow_inside_narrow_domain(spark):
    """Where the narrow variant's 2·N·10^s < 2^53 precondition holds,
    the two forms are interchangeable — the p7 swap cannot move any
    value at currently-tested scales."""
    from pyspark.sql import functions as F

    rows = [(n, d) for n in (1, 999, 123_456, 10**9 + 7) for d in (1, 3, 800)]
    df = spark.createDataFrame(rows, "numer long, denom long")
    out = df.select(
        round_ratio_half_up(F.col("numer"), F.col("denom"), 4).alias("a"),
        round_ratio_half_up_wide(F.col("numer"), F.col("denom"), 4).alias("b"),
    ).collect()
    for r in out:
        assert r["a"] == r["b"]
