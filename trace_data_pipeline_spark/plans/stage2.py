"""Stage-2 preview: monthly factor signals over the daily panel.

The reference's CHANGELOG lists Stage 2 (monthly panel with factor
signals) as unreleased "coming soon"; this module is the Spark-first
preview of its flagship signal block, built on the same daily-panel
machinery as p3: per (bond, month) price momentum/reversal, realized
volatility, Amihud illiquidity, and the Roll effective-spread measure
— the classic corporate-bond factor set (momentum: Jostova et al. 2013
RFS; illiquidity: Bao-Pan-Wang 2011 JF "The Illiquidity of Corporate
Bonds" — Roll 1984 negative autocovariance of price changes; Amihud
2002 |ret|/volume).

Spark shape: one daily aggregate (exact fixed-point prices), the daily
return/Δp windows partitioned by bond (reusing the daily frame's
grouping), one monthly aggregate, and the momentum lags over the
monthly frame (|bonds|·|months| rows — tiny next to the fact table).
No UDF, no joins, two partial-agg shuffles total.

Float discipline (per plans/catalog.py): daily prices are exact-4dp
half-up quotients of integer sums, so the derived return/Δp doubles
are bit-identical across engines; every emitted float rounds at 6dp
with -0.0 normalized; lag/stddev/covar all skip nulls identically in
Spark and DuckDB (verified: covar_samp pairwise-null behavior agrees).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from trace_data_pipeline_spark.functions.scalars import round_ratio_half_up
from trace_data_pipeline_spark.plans.catalog import register
from trace_data_pipeline_spark.sources import load_table

_P4_ORACLE = r"""
WITH daily AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS d,
         CAST((2 * SUM(CAST(round(l_extendedprice * l_quantity * 100, 0) AS BIGINT)) * 10000
               + 100 * SUM(CAST(l_quantity AS BIGINT)))
              // (200 * SUM(CAST(l_quantity AS BIGINT))) AS DOUBLE) / 10000 AS prc,
         CAST(SUM(CAST(round(l_extendedprice * l_quantity * 100, 0) AS BIGINT))
              AS DOUBLE) / 100 AS dvol
  FROM lineitem GROUP BY 1, 2
),
seq AS (
  SELECT *,
         prc / lag(prc) OVER w - 1 AS ret_d,
         prc - lag(prc) OVER w AS dp
  FROM daily WINDOW w AS (PARTITION BY l_suppkey ORDER BY d)
),
seq2 AS (
  SELECT *, lag(dp) OVER (PARTITION BY l_suppkey ORDER BY d) AS dp_l
  FROM seq
),
monthly AS (
  SELECT l_suppkey, strftime(d, '%Y-%m') AS month,
         COUNT(*) AS n_days,
         MAX_BY(prc, d) AS prc_eom,
         stddev_samp(ret_d) AS vol_raw,
         AVG(abs(ret_d) / dvol) AS amihud_raw,
         covar_samp(dp, dp_l) AS cov_raw
  FROM seq2 GROUP BY 1, 2
),
sig AS (
  SELECT *,
         prc_eom / lag(prc_eom, 1) OVER m - 1 AS ret_1m_raw,
         lag(prc_eom, 2) OVER m / lag(prc_eom, 7) OVER m - 1 AS mom_6_1_raw
  FROM monthly WINDOW m AS (PARTITION BY l_suppkey ORDER BY month)
)
SELECT l_suppkey, month, n_days, prc_eom,
       ROUND(ret_1m_raw, 6) + 0.0 AS ret_1m,
       ROUND(mom_6_1_raw, 6) + 0.0 AS mom_6_1,
       ROUND(vol_raw, 6) + 0.0 AS vol_1m,
       ROUND(amihud_raw * 1000000, 6) + 0.0 AS amihud_1m,
       CASE WHEN cov_raw IS NULL THEN NULL
            ELSE ROUND(2 * sqrt(CASE WHEN -cov_raw > 0 THEN -cov_raw
                                     ELSE 0 END), 6) + 0.0 END AS roll_1m
FROM sig
"""


@register("p4_monthly_signals", oracle=_P4_ORACLE)
def p4_monthly_signals(spark, sf_dir):
    """Stage-2 preview — the monthly bond factor signal block:
    ret_1m (reversal), mom_6_1 (6-month momentum skipping the most
    recent month, observation-lagged on the monthly frame), vol_1m
    (realized daily-return vol), amihud_1m (|ret|/dollar-volume,
    scaled x1e6), roll_1m (2·√−cov(Δp, Δp₋₁), the Roll effective
    spread; 0 when the autocovariance is positive). Lags are over
    OBSERVED months — a bond with a gap lags to its previous trading
    month on both engines identically."""
    li = load_table(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    pq_cents = F.round(p * q * 100, 0).cast("long")
    daily = li.groupBy(
        "l_suppkey", F.to_date("l_shipdate").alias("d")
    ).agg(
        round_ratio_half_up(F.sum(pq_cents), F.sum(q.cast("long")) * 100, 4).alias(
            "prc"
        ),
        (F.sum(pq_cents).cast("double") / 100).alias("dvol"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("d")
    seq = daily.withColumn("ret_d", F.col("prc") / F.lag("prc").over(w) - 1).withColumn(
        "dp", F.col("prc") - F.lag("prc").over(w)
    )
    seq = seq.withColumn("dp_l", F.lag("dp").over(w))
    monthly = seq.groupBy(
        "l_suppkey", F.date_format("d", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max_by("prc", F.col("d")).alias("prc_eom"),
        F.stddev_samp("ret_d").alias("vol_raw"),
        F.avg(F.abs(F.col("ret_d")) / F.col("dvol")).alias("amihud_raw"),
        F.covar_samp("dp", "dp_l").alias("cov_raw"),
    )
    m = Window.partitionBy("l_suppkey").orderBy("month")
    sig = monthly.withColumn(
        "ret_1m_raw", F.col("prc_eom") / F.lag("prc_eom", 1).over(m) - 1
    ).withColumn(
        "mom_6_1_raw",
        F.lag("prc_eom", 2).over(m) / F.lag("prc_eom", 7).over(m) - 1,
    )
    cov = F.col("cov_raw")
    return sig.select(
        "l_suppkey",
        "month",
        "n_days",
        "prc_eom",
        (F.round("ret_1m_raw", 6) + 0.0).alias("ret_1m"),
        (F.round("mom_6_1_raw", 6) + 0.0).alias("mom_6_1"),
        (F.round("vol_raw", 6) + 0.0).alias("vol_1m"),
        (F.round(F.col("amihud_raw") * 1_000_000, 6) + 0.0).alias("amihud_1m"),
        F.when(cov.isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                2 * F.sqrt(F.when(-cov > 0, -cov).otherwise(F.lit(0.0))), 6
            )
            + 0.0
        )
        .alias("roll_1m"),
    )
