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


# ------------------------------------------------------------------ p6

# Expected-loss penalty per rating class: annual default probability ×
# LGD 0.6 × 100 (carry units). Constants spelled as exact double
# literals so both engines subtract identical values.
_P6_PEN_IG, _P6_PEN_NIG, _P6_PEN_DEF = 0.12, 2.4, 21.0

from trace_data_pipeline_spark.plans.stage1 import _P2_CTES  # noqa: E402

_P6_ORACLE = f"""
WITH RECURSIVE {_P2_CTES},
bm AS (
  SELECT user_id, substr(d, 1, 7) AS m7,
         CAST(floor((CAST(substr(d, 9, 2) AS INTEGER) - 1) / 7.0) AS INTEGER) AS wk,
         COUNT(*) AS n_days,
         -- selection key: day-of-month as INT, not the d string — a
         -- var-width max_by buffer demotes the whole aggregate to
         -- SortAggregate; day is unique within (bond, month, week)
         CAST(SUM(n_trades) AS BIGINT) AS n_trades_sum,
         MAX_BY(pr, CAST(substr(d, 9, 2) AS INTEGER)) AS pr_eom,
         MAX_BY(ytm_w, CAST(substr(d, 9, 2) AS INTEGER)) AS ytm_eom,
         MAX_BY(spread_w, CAST(substr(d, 9, 2) AS INTEGER)) AS spread_eom,
         MAX_BY(bond_maturity, CAST(substr(d, 9, 2) AS INTEGER)) AS bm_eom,
         MAX_BY(sp_composite, CAST(substr(d, 9, 2) AS INTEGER)) AS sp_eom,
         stddev_samp(pr) AS disp_raw
  FROM final GROUP BY 1, 2, 3
),
cr AS (
  SELECT *,
         CAST(2 + user_id % 7 AS DOUBLE) AS coupon,
         CASE CAST(user_id % 9 AS INTEGER)
              WHEN 3 THEN 1 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 12
              ELSE 2 END AS m
  FROM bm
),
cr2 AS (
  SELECT *,
         ytm_eom / m AS y,
         coupon / (100.0 * m) AS c,
         CAST(least(200, greatest(1, CAST(floor(bm_eom * m) AS BIGINT)))
              AS INTEGER) AS n
  FROM cr
),
cr3 AS (
  SELECT *,
         CASE WHEN y > 0 THEN
           ((1 + y) / y
            - (1 + y + n * (c - y)) / (c * (power(1 + y, n) - 1) + y))
           / ((1 + y) * m)
         END AS mdur_raw,
         spread_eom - lag(spread_eom)
           OVER (PARTITION BY user_id ORDER BY m7, wk) AS dspr_raw,
         pr_eom / lag(pr_eom)
           OVER (PARTITION BY user_id ORDER BY m7, wk) - 1 AS retp_raw,
         coupon / pr_eom * 100 AS carry_raw
  FROM cr2
),
ns AS (SELECT MAX(l_suppkey) AS s FROM lineitem),
mkt AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY month) - 1
            AS mseq
  FROM ({{p4}})
)
SELECT c.user_id, c.m7 || '-w' || CAST(c.wk AS VARCHAR) AS period,
       c.n_days,
       CASE WHEN c.sp_eom <= 10 THEN 'IG'
            WHEN c.sp_eom >= 22 THEN 'DEF' ELSE 'NIG' END AS rating_class,
       c.spread_eom,
       ROUND(c.dspr_raw, 6) + 0.0 AS d_spread,
       ROUND(c.retp_raw, 6) + 0.0 AS ret_p,
       c.n_trades_sum,
       ROUND(c.n_days / 7.0, 6) + 0.0 AS traded_share,
       ROUND(c.disp_raw, 6) + 0.0 AS prc_disp,
       ROUND(c.mdur_raw, 6) + 0.0 AS mod_dur,
       ROUND(c.mdur_raw * c.spread_eom, 6) + 0.0 AS dts,
       ROUND(c.carry_raw, 6) + 0.0 AS carry,
       ROUND(c.carry_raw
             - CASE WHEN c.sp_eom <= 10 THEN {_P6_PEN_IG!r}
                    WHEN c.sp_eom >= 22 THEN {_P6_PEN_DEF!r}
                    ELSE {_P6_PEN_NIG!r} END, 6) + 0.0 AS def_adj_carry,
       k.ret_1m AS mkt_ret_1m,
       k.mom_6_1 AS mkt_mom_6_1,
       k.vol_1m AS mkt_vol_1m,
       k.roll_1m AS mkt_roll_1m
FROM cr3 c CROSS JOIN ns
LEFT JOIN mkt k
  ON k.l_suppkey = c.user_id % ns.s + 1 AND k.mseq = c.wk
""".replace("{p4}", _P4_ORACLE)


@register("p6_portfolio_panel", oracle=_P6_ORACLE)
def p6_portfolio_panel(spark, sf_dir):
    """Stage-2 completion (r4 verdict item 3) — the portfolio-ready
    periodic output contract joining the stage-1 bond panel's
    credit-risk factors with the p4 market signal block:

    - d_spread   — credit spread CHANGE vs the bond's previous period
                   (spread momentum / credit deterioration signal);
    - mod_dur    — closed-form modified duration from the winsorized
                   ytm (Fabozzi closed form; zero-coupon limit = n
                   periods, guarded null for non-positive yields);
    - dts        — Duration-Times-Spread, the standard credit risk
                   exposure measure (Ben Dor et al. 2007, "DTS");
    - carry      — running yield (coupon/price × 100, as p5);
    - def_adj_carry — carry minus rating-class expected loss
                   (annual PD × LGD 0.6, constants in _P6_PEN_*);
    - ret_p      — bond-level period price return (reversal signal);
    - n_trades_sum / traded_share / prc_disp — the liquidity block
                   (activity, share of the 7-day period with trades,
                   within-period price dispersion — the CHANGELOG's
                   "liquidity measures" at the panel grain);
    - mkt_*      — the p4 momentum/vol/Roll signals of the linked
                   market entity, sequence-aligned.

    PERIOD GRAIN: the synthetic tape spans a single calendar month, so
    a month-over-month lag would be all-NULL (the d30 vacuity trap);
    the period is therefore the WEEK-within-tape (YYYY-MM-wK, K =
    (day-1)//7) — on a real multi-month tape substitute substr(d,1,7)
    and the contract is the reference CHANGELOG's monthly panel
    unchanged. ENTITY LINK: bonds map onto the market dimension by
    user_id % max(l_suppkey) + 1 and periods align by sequence index
    (row_number per supplier) — both deterministic, mirrored in the
    oracle.

    Scale shape: the stage-1 panel aggregates once to (bond, period) —
    one fact shuffle; the lag window re-keys the tiny periodic frame
    once; the market side (|suppliers|×|months| rows) and the 1-row
    max-suppkey aggregate both BROADCAST, so the join adds no fact
    shuffle and no SortAggregate anywhere (scalar string max_by keys).
    """
    from trace_data_pipeline_spark.plans.stage1 import _S, build_stage1

    base = build_stage1(spark, sf_dir, _S)
    uid = F.col("user_id")
    day = F.substring("d", 9, 2).cast("int")
    wk = F.floor((day - 1) / F.lit(7.0)).cast("int")
    monthly = base.groupBy(
        uid.alias("user_id"),
        F.substring("d", 1, 7).alias("m7"),
        wk.alias("wk"),
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_trades").alias("n_trades_sum"),
        # int day key (unique within the group): a string key's
        # var-width buffer would demote this aggregate to SortAggregate
        F.max_by("pr", day).alias("pr_eom"),
        F.max_by("ytm_w", day).alias("ytm_eom"),
        F.max_by("spread_w", day).alias("spread_eom"),
        F.max_by("bond_maturity", day).alias("bm_eom"),
        F.max_by("sp_composite", day).alias("sp_eom"),
        F.stddev_samp("pr").alias("disp_raw"),
    )
    coupon = (2 + uid % 7).cast("double")
    m = (
        F.when(uid % 9 == 3, 1)
        .when(uid % 9 == 4, 2)
        .when(uid % 9 == 5, 4)
        .when(uid % 9 == 6, 12)
        .otherwise(2)
    )
    y = F.col("ytm_eom") / m
    c = coupon / (F.lit(100.0) * m)
    n = F.least(
        F.lit(200),
        F.greatest(F.lit(1), F.floor(F.col("bm_eom") * m).cast("long")),
    ).cast("int")
    mdur_raw = F.when(
        y > 0,
        (
            (1 + y) / y
            - (1 + y + n * (c - y)) / (c * (F.pow(1 + y, n) - 1) + y)
        )
        / ((1 + y) * m),
    )
    lagw = Window.partitionBy("user_id").orderBy("m7", "wk")
    cr = (
        monthly.withColumn("coupon", coupon)
        .withColumn("mdur_raw", mdur_raw)
        .withColumn(
            "dspr_raw",
            F.col("spread_eom") - F.lag("spread_eom").over(lagw),
        )
        .withColumn(
            "retp_raw", F.col("pr_eom") / F.lag("pr_eom").over(lagw) - 1
        )
        .withColumn("carry_raw", coupon / F.col("pr_eom") * 100)
    )
    ns = load_table(spark, sf_dir, "lineitem").agg(
        F.max("l_suppkey").alias("__ns")
    )
    mw = Window.partitionBy("l_suppkey").orderBy("month")
    mkt = p4_monthly_signals(spark, sf_dir).select(
        F.col("l_suppkey").alias("__sk"),
        (F.row_number().over(mw) - 1).alias("__mseq"),
        F.col("ret_1m").alias("mkt_ret_1m"),
        F.col("mom_6_1").alias("mkt_mom_6_1"),
        F.col("vol_1m").alias("mkt_vol_1m"),
        F.col("roll_1m").alias("mkt_roll_1m"),
    )
    sp = F.col("sp_eom")
    pen = (
        F.when(sp <= 10, F.lit(_P6_PEN_IG))
        .when(sp >= 22, F.lit(_P6_PEN_DEF))
        .otherwise(F.lit(_P6_PEN_NIG))
    )
    return (
        cr.crossJoin(F.broadcast(ns))
        .join(
            F.broadcast(mkt),
            (F.col("__sk") == F.col("user_id") % F.col("__ns") + 1)
            & (F.col("__mseq") == F.col("wk")),
            "left",
        )
        .select(
            "user_id",
            F.concat(
                F.col("m7"), F.lit("-w"), F.col("wk").cast("string")
            ).alias("period"),
            "n_days",
            F.when(sp <= 10, "IG")
            .when(sp >= 22, "DEF")
            .otherwise("NIG")
            .alias("rating_class"),
            "spread_eom",
            (F.round("dspr_raw", 6) + 0.0).alias("d_spread"),
            (F.round("retp_raw", 6) + 0.0).alias("ret_p"),
            "n_trades_sum",
            (F.round(F.col("n_days") / F.lit(7.0), 6) + 0.0).alias(
                "traded_share"
            ),
            (F.round("disp_raw", 6) + 0.0).alias("prc_disp"),
            (F.round("mdur_raw", 6) + 0.0).alias("mod_dur"),
            (F.round(F.col("mdur_raw") * F.col("spread_eom"), 6) + 0.0).alias(
                "dts"
            ),
            (F.round("carry_raw", 6) + 0.0).alias("carry"),
            (F.round(F.col("carry_raw") - pen, 6) + 0.0).alias(
                "def_adj_carry"
            ),
            "mkt_ret_1m",
            "mkt_mom_6_1",
            "mkt_vol_1m",
            "mkt_roll_1m",
        )
    )
