"""W10 bond-analytics plan: synthetic level-coupon bonds derived from
orders, priced → ytm/duration/convexity via the closed-form engine.

Oracle strategy: the engine is a FIXED arithmetic sequence (25 Newton
steps from y₀=0.03, clamped, sequential term accumulation), so DuckDB
replays it with a recursive CTE + list_transform sums. The iteration
converges to machine precision, which erases libm pow() ulp differences
between engines, and outputs are rounded at 6dp — flip risk ~1e-14 per
row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_data_pipeline_spark.operators.bond_math import bond_analytics
from trace_data_pipeline_spark.plans.catalog import register
from trace_data_pipeline_spark.sources import load_table

_CF = "(CASE WHEN t = n THEN c * 100 + 100 ELSE c * 100 END)"

_W10_ORACLE = rf"""
WITH RECURSIVE bonds AS (
  SELECT o_orderkey,
         CAST(1 + o_orderkey % 20 AS INT) AS n,
         CAST(2 + o_orderkey % 7 AS DOUBLE) / 200.0 AS c,
         60.0 + CAST(o_orderkey * 37 % 800 AS DOUBLE) / 10.0 AS p
  FROM orders
),
it AS (
  -- seed must be DOUBLE: a bare 0.03 literal is DECIMAL(3,2) in DuckDB
  -- and the recursive union would quantize y to 2 decimals
  SELECT o_orderkey, n, c, p, 0 AS k, CAST(0.03 AS DOUBLE) AS y FROM bonds
  UNION ALL
  SELECT o_orderkey, n, c, p, k + 1,
         least(greatest(
           y - (list_sum(list_transform(range(1, n + 1),
                  t -> {_CF} * power(1.0 / (1.0 + y), t))) - p)
             / list_sum(list_transform(range(1, n + 1),
                  t -> -t * {_CF} * power(1.0 / (1.0 + y), t + 1))),
           -0.9), 10.0) AS y
  FROM it WHERE k < 25
),
fin AS (
  SELECT o_orderkey, n, c, p, y,
         list_sum(list_transform(range(1, n + 1),
            t -> {_CF} * power(1.0 / (1.0 + y), t))) AS pv,
         list_sum(list_transform(range(1, n + 1),
            t -> t * {_CF} * power(1.0 / (1.0 + y), t))) AS wsum,
         list_sum(list_transform(range(1, n + 1),
            t -> t * (t + 1) * {_CF} * power(1.0 / (1.0 + y), t))) AS csum
  FROM it WHERE k = 25
)
SELECT o_orderkey,
       ROUND(y * 2.0, 6) + 0.0 AS ytm,
       ROUND(wsum / pv / 2.0, 6) AS mac_dur,
       ROUND(wsum / pv / 2.0 / (1.0 + y), 6) AS mod_dur,
       ROUND(csum * (1.0 / (1.0 + y)) * (1.0 / (1.0 + y)) / pv / 4.0, 6)
         AS convexity,
       ROUND(pv - p, 6) + 0.0 AS pv_residual
FROM fin
"""


@register("w10_bond_analytics", oracle=_W10_ORACLE)
def w10_bond_analytics(spark, sf_dir):
    """W10: price → yield/duration/convexity for synthetic level-coupon
    bonds (1–20 semiannual periods, 1–4% per-period coupons, prices
    60–139.9), via the Arrow-batched closed-form engine. Value-hash
    checked against a DuckDB recursive-CTE replay of the same Newton
    iteration."""
    orders = load_table(spark, sf_dir, "orders")
    bonds = orders.select(
        "o_orderkey",
        (1 + F.col("o_orderkey") % 20).cast("int").alias("n"),
        ((2 + F.col("o_orderkey") % 7) / 200.0).alias("c"),
        (60.0 + (F.col("o_orderkey") * 37 % 800).cast("double") / 10.0).alias("p"),
    )
    out = bonds.withColumn("r", bond_analytics(F.col("p"), F.col("c"), F.col("n")))
    # `+ 0.0` maps IEEE -0.0 → +0.0 so value hashes agree across engines
    return out.select(
        "o_orderkey",
        (F.round(F.col("r.ytm"), 6) + 0.0).alias("ytm"),
        F.round(F.col("r.mac_dur"), 6).alias("mac_dur"),
        F.round(F.col("r.mod_dur"), 6).alias("mod_dur"),
        F.round(F.col("r.convexity"), 6).alias("convexity"),
        (F.round(F.col("r.pv_residual"), 6) + 0.0).alias("pv_residual"),
    )


_W10C_ORACLE = rf"""
WITH RECURSIVE bonds AS (
  SELECT o_orderkey,
         CAST(CASE o_orderkey % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                  WHEN 2 THEN 4 ELSE 12 END AS INT) AS m,
         CAST((1 + o_orderkey % 10)
              * (CASE o_orderkey % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                     WHEN 2 THEN 4 ELSE 12 END) AS INT) AS n,
         CASE WHEN o_orderkey % 5 = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(2 + o_orderkey % 7 AS DOUBLE)
                   / (100.0 * (CASE o_orderkey % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                                   WHEN 2 THEN 4 ELSE 12 END))
         END AS c,
         60.0 + CAST(o_orderkey * 37 % 800 AS DOUBLE) / 10.0 AS p
  FROM orders
),
it AS (
  SELECT o_orderkey, m, n, c, p, 0 AS k, CAST(0.03 AS DOUBLE) AS y FROM bonds
  UNION ALL
  SELECT o_orderkey, m, n, c, p, k + 1,
         least(greatest(
           y - (list_sum(list_transform(range(1, n + 1),
                  t -> {_CF} * power(1.0 / (1.0 + y), t))) - p)
             / list_sum(list_transform(range(1, n + 1),
                  t -> -t * {_CF} * power(1.0 / (1.0 + y), t + 1))),
           -0.9), 10.0) AS y
  FROM it WHERE k < 25
),
fin AS (
  SELECT o_orderkey, m, n, c, p, y,
         list_sum(list_transform(range(1, n + 1),
            t -> {_CF} * power(1.0 / (1.0 + y), t))) AS pv,
         list_sum(list_transform(range(1, n + 1),
            t -> t * {_CF} * power(1.0 / (1.0 + y), t))) AS wsum,
         list_sum(list_transform(range(1, n + 1),
            t -> t * (t + 1) * {_CF} * power(1.0 / (1.0 + y), t))) AS csum
  FROM it WHERE k = 25
)
SELECT o_orderkey, m,
       ROUND(y * m, 6) + 0.0 AS ytm,
       ROUND(wsum / pv / m, 6) AS mac_dur,
       ROUND(wsum / pv / m / (1.0 + y), 6) AS mod_dur,
       ROUND(csum * (1.0 / (1.0 + y)) * (1.0 / (1.0 + y)) / pv / (m * m), 6)
         AS convexity,
       ROUND(pv - p, 6) + 0.0 AS pv_residual
FROM fin
"""


@register("w10c_bond_freqs", oracle=_W10C_ORACLE)
def w10c_bond_freqs(spark, sf_dir):
    """W10 depth: the reference's interest_frequency surface — annual /
    semiannual / quarterly / monthly compounding plus zero-coupon rows
    (c = 0, the {0,99} codes), solved by the same engine with per-row
    frequency annualization. Same recursive-CTE oracle, parametrized
    by m."""
    from trace_data_pipeline_spark.operators.bond_math import bond_analytics_freq

    orders = load_table(spark, sf_dir, "orders")
    m = (
        F.when(F.col("o_orderkey") % 4 == 0, 1)
        .when(F.col("o_orderkey") % 4 == 1, 2)
        .when(F.col("o_orderkey") % 4 == 2, 4)
        .otherwise(12)
        .cast("int")
    )
    bonds = orders.select(
        "o_orderkey",
        m.alias("m"),
        ((1 + F.col("o_orderkey") % 10) * m).cast("int").alias("n"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(0.0))
        .otherwise((2 + F.col("o_orderkey") % 7).cast("double") / (100.0 * m))
        .alias("c"),
        (60.0 + (F.col("o_orderkey") * 37 % 800).cast("double") / 10.0).alias("p"),
    )
    out = bonds.withColumn(
        "r", bond_analytics_freq(F.col("p"), F.col("c"), F.col("n"), F.col("m"))
    )
    return out.select(
        "o_orderkey",
        "m",
        (F.round(F.col("r.ytm"), 6) + 0.0).alias("ytm"),
        F.round(F.col("r.mac_dur"), 6).alias("mac_dur"),
        F.round(F.col("r.mod_dur"), 6).alias("mod_dur"),
        F.round(F.col("r.convexity"), 6).alias("convexity"),
        (F.round(F.col("r.pv_residual"), 6) + 0.0).alias("pv_residual"),
    )
