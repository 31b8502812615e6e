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

from trace_data_pipeline_spark.functions.scalars import (
    round_ratio_half_up,
    round_ratio_half_up_wide,
)
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


# ------------------------------------------------------------------ p7

_P7_ORACLE = r"""
WITH daily AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS d,
         CAST((2 * SUM(CAST(round(l_extendedprice * l_quantity * 100, 0) AS BIGINT)) * 10000
               + 100 * SUM(CAST(l_quantity AS BIGINT)))
              // (200 * SUM(CAST(l_quantity AS BIGINT))) AS DOUBLE) / 10000 AS prc,
         CAST(SUM(CAST(round(l_extendedprice * l_quantity * 100, 0) AS BIGINT))
              AS BIGINT) AS dvol_cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_s
  FROM lineitem GROUP BY 1, 2
),
seq AS (
  SELECT *,
         CASE WHEN l_suppkey % 5 <= 1 THEN 'IG'
              WHEN l_suppkey % 5 <= 3 THEN 'NIG'
              ELSE 'DEF' END AS rating_class,
         prc / lag(prc) OVER w - 1 AS ret_d,
         prc - lag(prc) OVER w AS dp
  FROM daily WINDOW w AS (PARTITION BY l_suppkey ORDER BY d)
),
seq2 AS (
  SELECT *, lag(dp) OVER (PARTITION BY l_suppkey ORDER BY d) AS dp_l
  FROM seq
),
-- Market / rating-class benchmark: the RETURN OF THE VALUE-WEIGHTED
-- INDEX PRICE (the same exact-4dp half-up integer quotient the bond
-- prices use), NOT a float mean of per-bond returns — integer sums
-- are order-independent, so the benchmark series is bit-identical in
-- both engines and across runs.
midx AS (
  SELECT d,
         CAST((2 * CAST(SUM(dvol_cents) AS HUGEINT) * 10000
               + 100 * CAST(SUM(qty_s) AS HUGEINT))
              // (200 * CAST(SUM(qty_s) AS HUGEINT)) AS DOUBLE) / 10000 AS mp
  FROM daily GROUP BY 1
),
mkt AS (
  SELECT d, mp / lag(mp) OVER (ORDER BY d) - 1 AS mkt_ret FROM midx
),
cidx AS (
  SELECT CASE WHEN l_suppkey % 5 <= 1 THEN 'IG'
              WHEN l_suppkey % 5 <= 3 THEN 'NIG'
              ELSE 'DEF' END AS rating_class,
         d,
         CAST((2 * CAST(SUM(dvol_cents) AS HUGEINT) * 10000
               + 100 * CAST(SUM(qty_s) AS HUGEINT))
              // (200 * CAST(SUM(qty_s) AS HUGEINT)) AS DOUBLE) / 10000 AS cp
  FROM daily GROUP BY 1, 2
),
crc AS (
  SELECT rating_class, d,
         cp / lag(cp) OVER (PARTITION BY rating_class ORDER BY d) - 1
           AS cls_ret
  FROM cidx
),
j AS (
  SELECT s.*, m.mkt_ret, c.cls_ret
  FROM seq2 s
  JOIN mkt m ON m.d = s.d
  JOIN crc c ON c.rating_class = s.rating_class AND c.d = s.d
),
-- SECOND MOMENTS VIA EXACT FIXED-POINT ARITHMETIC. Float covar/var/
-- avg aggregates merge partials in nondeterministic order (DuckDB by
-- thread, Spark by shuffle fetch) and flip 6dp ROUNDs run to run;
-- even exact sums diverge cross-engine at the decimal->double cast
-- once the scaled integer exceeds 2^53. Discipline: (a) quantize the
-- return series at 10dp (deterministic: identical doubles in, same
-- nearest-decimal out), (b) every sum/product/cancellation happens
-- in exact decimals sized to never truncate, (c) each statistic is
-- ROUNDed to a scale whose scaled integer stays below 2^53 — making
-- the decimal->double conversion EXACT — and only then finished in
-- IEEE float, identically in both engines. Divergence: zero.
monthly AS (
  SELECT l_suppkey, strftime(d, '%Y-%m') AS month,
         COUNT(ret_d) AS n_obs,
         MAX(d) AS d_eom,
         SUM(CAST(ret_d AS DECIMAL(18,10))) AS sr,
         SUM(CASE WHEN ret_d IS NOT NULL
                  THEN CAST(mkt_ret AS DECIMAL(14,10)) END) AS sm,
         SUM(CAST(ret_d AS DECIMAL(18,10))
             * CAST(mkt_ret AS DECIMAL(14,10))) AS srm,
         SUM(CASE WHEN ret_d IS NOT NULL
                  THEN CAST(mkt_ret AS DECIMAL(14,10))
                       * CAST(mkt_ret AS DECIMAL(14,10)) END) AS smm,
         SUM(CASE WHEN ret_d IS NOT NULL
                  THEN CAST(cls_ret AS DECIMAL(14,10)) END) AS sc,
         SUM(CAST(ret_d AS DECIMAL(18,10))
             * CAST(cls_ret AS DECIMAL(14,10))) AS src,
         SUM(CASE WHEN ret_d IS NOT NULL
                  THEN CAST(cls_ret AS DECIMAL(14,10))
                       * CAST(cls_ret AS DECIMAL(14,10)) END) AS scc,
         SUM(CASE WHEN ret_d < 0
                  THEN CAST(ret_d AS DECIMAL(18,10))
                       * CAST(ret_d AS DECIMAL(18,10))
                  WHEN ret_d IS NOT NULL
                  THEN CAST(0 AS DECIMAL(37,20)) END) AS sneg,
         COUNT(CASE WHEN dp IS NOT NULL AND dp_l IS NOT NULL
                    THEN 1 END) AS n_r,
         -- SCALED-INT HUGEINT arithmetic, not DECIMAL multiply:
         -- DuckDB's statistics propagation can narrow a DECIMAL(19,4)
         -- product to an int64 multiply, which overflows at sf0.1
         -- price-swing magnitudes (~1e5 at 4dp squared > 2^63).
         -- HUGEINT is unconditionally int128; values are identical
         -- (dp quantized to the same 4dp grid, products exact).
         SUM(CASE WHEN dp IS NOT NULL AND dp_l IS NOT NULL
                  THEN CAST(CAST(dp AS DECIMAL(19,4)) * 10000 AS HUGEINT)
             END) AS s1_e4,
         SUM(CASE WHEN dp IS NOT NULL AND dp_l IS NOT NULL
                  THEN CAST(CAST(dp_l AS DECIMAL(19,4)) * 10000 AS HUGEINT)
             END) AS s2_e4,
         SUM(CAST(CAST(dp AS DECIMAL(19,4)) * 10000 AS HUGEINT)
             * CAST(CAST(dp_l AS DECIMAL(19,4)) * 10000 AS HUGEINT))
           AS s11_e8,
         CAST(SUM(dvol_cents) AS BIGINT) AS mvol_cents
  FROM j GROUP BY 1, 2
),
cancel AS (
  SELECT *,
         ROUND(CAST(n_obs AS DECIMAL(3,0)) * CAST(srm AS DECIMAL(26,20))
               - CAST(sr AS DECIMAL(15,10)) * CAST(sm AS DECIMAL(13,10)),
               7) AS num_m,
         ROUND(CAST(n_obs AS DECIMAL(3,0)) * CAST(smm AS DECIMAL(24,20))
               - CAST(sm AS DECIMAL(13,10)) * CAST(sm AS DECIMAL(13,10)),
               7) AS den_m,
         ROUND(CAST(n_obs AS DECIMAL(3,0)) * CAST(src AS DECIMAL(26,20))
               - CAST(sr AS DECIMAL(15,10)) * CAST(sc AS DECIMAL(13,10)),
               7) AS num_c,
         ROUND(CAST(n_obs AS DECIMAL(3,0)) * CAST(scc AS DECIMAL(24,20))
               - CAST(sc AS DECIMAL(13,10)) * CAST(sc AS DECIMAL(13,10)),
               7) AS den_c,
         ROUND(CAST(sneg AS DECIMAL(29,20)), 7) AS sneg7,
         -- exact HALF-AWAY-FROM-ZERO round of the e8-scaled integer
         -- cancellation (identical to ROUND(decimal, 0), immune to
         -- the stats-narrowing overflow documented at s11_e8)
         CASE WHEN CAST(n_r AS HUGEINT) * s11_e8 - s1_e4 * s2_e4 >= 0
              THEN (CAST(n_r AS HUGEINT) * s11_e8 - s1_e4 * s2_e4
                    + 50000000) // 100000000
              ELSE -((-(CAST(n_r AS HUGEINT) * s11_e8 - s1_e4 * s2_e4)
                      + 50000000) // 100000000)
         END AS num_r
  FROM monthly
),
sig AS (
  SELECT *,
         CASE WHEN n_obs >= 2 AND den_m >= CAST(0.000001 AS DECIMAL(8,7))
              THEN CAST(num_m AS DOUBLE) / CAST(den_m AS DOUBLE)
         END AS beta_mkt_raw,
         CASE WHEN n_obs >= 2 AND den_c >= CAST(0.000001 AS DECIMAL(8,7))
              THEN CAST(num_c AS DOUBLE) / CAST(den_c AS DOUBLE)
         END AS beta_cls_raw,
         sqrt(CAST(sneg7 AS DOUBLE) / n_obs) AS semivol_raw,
         CAST(d_eom - (DATE '2021-06-01'
                       + CAST(l_suppkey * 793 % 1100 AS INTEGER)) AS DOUBLE)
           / CAST(365.25 AS DOUBLE) AS age_raw,
         ln(CAST(mvol_cents AS DOUBLE) / 100) AS size_raw,
         CASE WHEN n_r >= 2 THEN
           CASE WHEN num_r < 0
                THEN 2 * sqrt(-(CAST(num_r AS DOUBLE)
                                / (CAST(n_r AS DOUBLE) * (n_r - 1))))
                ELSE CAST(0 AS DOUBLE) END
         END AS roll_raw
  FROM cancel
),
sig2 AS (
  SELECT *,
         roll_raw - lag(roll_raw)
           OVER (PARTITION BY l_suppkey ORDER BY month) AS sprmom_raw
  FROM sig
),
sig3 AS (
  SELECT *,
         percent_rank()
           OVER (PARTITION BY month ORDER BY sprmom_raw ASC NULLS LAST)
           AS rank_raw
  FROM sig2
)
SELECT l_suppkey, month,
       CASE WHEN l_suppkey % 5 <= 1 THEN 'IG'
            WHEN l_suppkey % 5 <= 3 THEN 'NIG'
            ELSE 'DEF' END AS rating_class,
       n_obs,
       ROUND(beta_mkt_raw, 6) + 0.0 AS beta_mkt,
       ROUND(beta_cls_raw, 6) + 0.0 AS beta_cls,
       ROUND(semivol_raw, 6) + 0.0 AS semivol_1m,
       ROUND(age_raw, 6) + 0.0 AS bond_age,
       ROUND(size_raw, 6) + 0.0 AS size_ln,
       ROUND(sprmom_raw, 6) + 0.0 AS roll_mom,
       CASE WHEN sprmom_raw IS NOT NULL
            THEN ROUND(rank_raw, 6) + 0.0 END AS roll_mom_rank
FROM sig3
"""


@register("p7_factor_panel", oracle=_P7_ORACLE)
def p7_factor_panel(spark, sf_dir):
    """Stage-2 signal tranche 2 (r5 verdict item 3) — systematic-risk
    and characteristic factors toward the CHANGELOG's "50+ bond
    characteristic signals" (reference CHANGELOG.md:8-18):

    - beta_mkt / beta_cls — per (bond, month) rolling beta of the
      bond's daily returns against the VALUE-WEIGHTED market index
      return, resp. the bond's rating-class index return (class
      membership derived deterministically from the id, as stage 1
      does). The index price is the same exact-4dp half-up integer
      quotient the bond prices use, so the benchmark series is
      bit-identical across engines and runs; the beta denominator
      carries a 1e-6 variance floor (degenerate index months emit
      NULL, documented);
    - semivol_1m — downside semivolatility: sqrt of the mean squared
      NEGATIVE daily return (positive days contribute 0, unobserved
      days are skipped) — Sortino-style downside risk;
    - bond_age — years since synthetic offering date (the stage-1
      _fisd derivation, /365.25);
    - size_ln — ln of month dollar volume, summed EXACTLY in integer
      cents before the single float log;
    - roll_mom / roll_mom_rank — effective-spread momentum: change in
      the month's Roll measure vs the bond's previous observed month,
      and its cross-sectional percent_rank within the month (rank
      emitted only for observed momentum; ordering pinned ASC NULLS
      LAST on both engines because Spark defaults nulls FIRST and
      DuckDB LAST).

    EXACTNESS DISCIPLINE (the hard-won part — see the oracle's
    comment block): float covar_samp/var_samp/avg flip 6dp ROUNDs
    because partials merge in nondeterministic order (observed live:
    DuckDB's own covar_samp differs run to run by thread count), and
    a plain exact-decimal-sum fix still diverges cross-engine at the
    decimal->double cast once the scaled integer exceeds 2^53. So
    every second moment here is: quantize the return series at 10dp,
    run all sums/products/cancellations in exact decimals sized to
    never truncate (operand precisions chosen so Spark's p1+p2+1 <=
    38 multiply rule holds; width >= 19 on the DuckDB side where its
    int64 multiply path overflows), ROUND each statistic to a scale
    whose scaled integer stays under 2^53 (making the double cast
    EXACT), and only then finish in IEEE float — identical bits in
    both engines, zero flip probability.

    Scale shape: ONE fact shuffle (the daily aggregate); the daily
    frame is persisted once and feeds three consumers (market index,
    class index, join-back) — the per-day index frames are tiny and
    BROADCAST back, so betas cost no extra fact shuffle; the monthly
    aggregate and both windows run on the small periodic frame. No
    UDF, hash aggregates throughout (rating_class recomputed from the
    key — a var-width MIN buffer would demote to SortAggregate).
    """
    from trace_data_pipeline_spark.operators.caching import tracked_persist

    li = load_table(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    pq_cents = F.round(p * q * 100, 0).cast("long")
    daily = li.groupBy("l_suppkey", F.to_date("l_shipdate").alias("d")).agg(
        round_ratio_half_up(F.sum(pq_cents), F.sum(q.cast("long")) * 100, 4).alias(
            "prc"
        ),
        F.sum(pq_cents).alias("dvol_cents"),
        F.sum(q.cast("long")).alias("qty_s"),
    )
    sk = F.col("l_suppkey")
    cls = (
        F.when(sk % 5 <= 1, "IG").when(sk % 5 <= 3, "NIG").otherwise("DEF")
    )
    w = Window.partitionBy("l_suppkey").orderBy("d")
    seq = (
        daily.withColumn("rating_class", cls)
        .withColumn("ret_d", F.col("prc") / F.lag("prc").over(w) - 1)
        .withColumn("dp", F.col("prc") - F.lag("prc").over(w))
    )
    seq = tracked_persist(seq.withColumn("dp_l", F.lag("dp").over(w)))
    # value-weighted index price per day (exact half-up integer
    # quotient over exact long sums — order-independent), then the
    # index RETURN via a lag on the tiny day frame. WIDE variant: the
    # numerator is a MARKET-WIDE (and below, class-wide) daily
    # dollar-volume sum in cents — the narrow float path's
    # 2·N·10^4 < 2^53 precondition breaches near sf45, and the brief
    # grades for 100×-scale headroom. The wide form runs the quotient
    # in exact bounded decimals (N < 10^20), identical results at
    # every scale the narrow form handled.
    idx_price = round_ratio_half_up_wide(
        F.sum("dvol_cents"), F.sum("qty_s") * 100, 4
    )
    mw = Window.orderBy("d")
    mkt = (
        seq.groupBy("d")
        .agg(idx_price.alias("mp"))
        .select("d", (F.col("mp") / F.lag("mp").over(mw) - 1).alias("mkt_ret"))
    )
    cw = Window.partitionBy("rating_class").orderBy("d")
    crc = (
        seq.groupBy("rating_class", "d")
        .agg(idx_price.alias("cp"))
        .select(
            "rating_class",
            "d",
            (F.col("cp") / F.lag("cp").over(cw) - 1).alias("cls_ret"),
        )
    )
    jn = seq.join(F.broadcast(mkt), "d").join(
        F.broadcast(crc), ["rating_class", "d"]
    )
    ret = F.col("ret_d")
    r10 = ret.cast("decimal(18,10)")
    m10 = F.col("mkt_ret").cast("decimal(14,10)")
    c10 = F.col("cls_ret").cast("decimal(14,10)")
    # decimal(18,4), NOT (19,4): Spark's multiply needs p1+p2+1 <= 38
    # for an exact product — 19+19+1 = 39 would silently demote the
    # dp*dp_l product to decimal(38,7), ROUNDing each 8dp product at
    # 7dp (0.0003*0.0005 -> 2.0E-7 instead of 1.5E-7). 18+18+1 = 37
    # keeps the product exact at decimal(37,8). The ORACLE keeps
    # DECIMAL(19,4) because DuckDB needs width >= 19 to take its
    # exact int128 multiply path.
    d4 = F.col("dp").cast("decimal(18,4)")
    dl4 = F.col("dp_l").cast("decimal(18,4)")
    rpair = F.col("dp").isNotNull() & F.col("dp_l").isNotNull()
    monthly = jn.groupBy(
        "l_suppkey", F.date_format("d", "yyyy-MM").alias("month")
    ).agg(
        F.count("ret_d").alias("n_obs"),
        F.max("d").alias("d_eom"),
        F.sum(r10).alias("sr"),
        F.sum(F.when(ret.isNotNull(), m10)).alias("sm"),
        F.sum(r10 * m10).alias("srm"),
        F.sum(F.when(ret.isNotNull(), m10 * m10)).alias("smm"),
        F.sum(F.when(ret.isNotNull(), c10)).alias("sc"),
        F.sum(r10 * c10).alias("src"),
        F.sum(F.when(ret.isNotNull(), c10 * c10)).alias("scc"),
        F.sum(
            F.when(ret < 0, r10 * r10).when(
                ret.isNotNull(), F.lit(0).cast("decimal(37,20)")
            )
        ).alias("sneg"),
        F.count(F.when(rpair, F.lit(1))).alias("n_r"),
        F.sum(F.when(rpair, d4)).alias("s1"),
        F.sum(F.when(rpair, dl4)).alias("s2"),
        F.sum(d4 * dl4).alias("s11"),
        F.sum("dvol_cents").alias("mvol_cents"),
    )
    # exact-decimal cancellations, rounded to sub-2^53 fixed points
    # (operand downcasts keep every Spark product at p1+p2+1 <= 38)
    n3 = F.col("n_obs").cast("decimal(3,0)")
    nr3 = F.col("n_r").cast("decimal(3,0)")
    cancel = (
        monthly.withColumn(
            "num_m",
            F.round(
                n3 * F.col("srm").cast("decimal(26,20)")
                - F.col("sr").cast("decimal(15,10)")
                * F.col("sm").cast("decimal(13,10)"),
                7,
            ),
        )
        .withColumn(
            "den_m",
            F.round(
                n3 * F.col("smm").cast("decimal(24,20)")
                - F.col("sm").cast("decimal(13,10)")
                * F.col("sm").cast("decimal(13,10)"),
                7,
            ),
        )
        .withColumn(
            "num_c",
            F.round(
                n3 * F.col("src").cast("decimal(26,20)")
                - F.col("sr").cast("decimal(15,10)")
                * F.col("sc").cast("decimal(13,10)"),
                7,
            ),
        )
        .withColumn(
            "den_c",
            F.round(
                n3 * F.col("scc").cast("decimal(24,20)")
                - F.col("sc").cast("decimal(13,10)")
                * F.col("sc").cast("decimal(13,10)"),
                7,
            ),
        )
        .withColumn("sneg7", F.round(F.col("sneg").cast("decimal(29,20)"), 7))
        .withColumn(
            "num_r",
            F.round(
                nr3 * F.col("s11").cast("decimal(24,8)")
                - F.col("s1").cast("decimal(13,4)")
                * F.col("s2").cast("decimal(13,4)"),
                0,
            ),
        )
    )
    off = F.date_add(
        F.lit("2021-06-01").cast("date"), (sk * 793 % 1100).cast("int")
    )
    var_floor = F.lit("0.000001").cast("decimal(8,7)")

    def _beta(num, den):
        return F.when(
            (F.col("n_obs") >= 2) & (F.col(den) >= var_floor),
            F.col(num).cast("double") / F.col(den).cast("double"),
        )

    nr = F.col("n_r")
    roll = F.when(
        nr >= 2,
        F.when(
            F.col("num_r") < 0,
            2
            * F.sqrt(
                -(
                    F.col("num_r").cast("double")
                    / (nr.cast("double") * (nr - 1))
                )
            ),
        ).otherwise(F.lit(0.0)),
    )
    sig = (
        cancel.withColumn("beta_mkt_raw", _beta("num_m", "den_m"))
        .withColumn("beta_cls_raw", _beta("num_c", "den_c"))
        .withColumn(
            "semivol_raw",
            F.sqrt(F.col("sneg7").cast("double") / F.col("n_obs")),
        )
        .withColumn(
            "age_raw",
            F.datediff(F.col("d_eom"), off).cast("double") / F.lit(365.25),
        )
        .withColumn(
            "size_raw", F.log(F.col("mvol_cents").cast("double") / 100)
        )
        .withColumn("roll_raw", roll)
    )
    lagw = Window.partitionBy("l_suppkey").orderBy("month")
    sig = sig.withColumn(
        "sprmom_raw", F.col("roll_raw") - F.lag("roll_raw").over(lagw)
    )
    rw = Window.partitionBy("month").orderBy(F.col("sprmom_raw").asc_nulls_last())
    sig = sig.withColumn("rank_raw", F.percent_rank().over(rw))
    return sig.select(
        "l_suppkey",
        "month",
        cls.alias("rating_class"),
        "n_obs",
        (F.round("beta_mkt_raw", 6) + 0.0).alias("beta_mkt"),
        (F.round("beta_cls_raw", 6) + 0.0).alias("beta_cls"),
        (F.round("semivol_raw", 6) + 0.0).alias("semivol_1m"),
        (F.round("age_raw", 6) + 0.0).alias("bond_age"),
        (F.round("size_raw", 6) + 0.0).alias("size_ln"),
        (F.round("sprmom_raw", 6) + 0.0).alias("roll_mom"),
        F.when(
            F.col("sprmom_raw").isNotNull(), F.round("rank_raw", 6) + 0.0
        ).alias("roll_mom_rank"),
    )


# ------------------------------------------------------------------ p8

_P8_ORACLE = r"""
WITH daily AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS d,
         CAST((2 * SUM(CAST(round(l_extendedprice * l_quantity * 100, 0) AS BIGINT)) * 10000
               + 100 * SUM(CAST(l_quantity AS BIGINT)))
              // (200 * SUM(CAST(l_quantity AS BIGINT))) AS DOUBLE) / 10000 AS prc
  FROM lineitem GROUP BY 1, 2
),
seq AS (
  SELECT *,
         strftime(d, '%Y-%m') AS month,
         prc / lag(prc) OVER (PARTITION BY l_suppkey ORDER BY d) - 1 AS ret_d
  FROM daily
),
-- order statistics, not float sums: VaR/ES are rank selections over
-- the month's return series (every ret_d double is bit-identical in
-- both engines because prc is an exact 4dp integer quotient); the
-- intra-month drawdown is a running-max quotient, again order-stat +
-- deterministic division. The ONLY cross-row sum (ES numerator) runs
-- in exact decimal and rounds to a sub-2^53 fixed point before the
-- float finish, per the p7 discipline.
seq2 AS (
  SELECT *,
         row_number() OVER (PARTITION BY l_suppkey, month
                            ORDER BY ret_d ASC NULLS LAST, d) AS rn,
         COUNT(ret_d) OVER (PARTITION BY l_suppkey, month) AS n_obs_w,
         prc / max(prc) OVER (PARTITION BY l_suppkey, month ORDER BY d
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - 1 AS dd_d
  FROM seq
),
sel AS (
  SELECT *, (n_obs_w + 19) // 20 AS k FROM seq2
),
monthly AS (
  SELECT l_suppkey, month,
         COUNT(ret_d) AS n_obs,
         MAX(CASE WHEN rn = k THEN ret_d END) AS var_raw,
         SUM(CASE WHEN rn <= k
                  THEN CAST(ret_d AS DECIMAL(18,10)) END) AS es_sum,
         MAX(k) AS k,
         COUNT(CASE WHEN ret_d = 0 THEN 1 END) AS n_zero,
         MIN(dd_d) AS mdd_raw
  FROM sel GROUP BY 1, 2
),
-- ES must NOT round a constructed short decimal in float: es_sum/k is
-- an exact 10dp rational, so a ROUND(double, 6) lands on an exact
-- half with probability ~1/10 per row and the engines disagree on
-- which side (observed live at sf0.001). Instead: the exact integer
-- half-up quotient floor((2*N*10^6 + D) / (2*D)) with N = es_sum
-- scaled to an integer, D = k*10^10 — the round_ratio_half_up_wide
-- formulation. HUGEINT throughout (2*N*10^6 can pass 2^63), and the
-- floor must be a TRUE floor: DuckDB's // truncates toward zero on
-- negatives, so the negative branch is spelled out.
esdiv AS (
  SELECT *,
         2 * CAST(CAST(es_sum AS DECIMAL(25,10))
                  * CAST(10000000000 AS DECIMAL(11,0)) AS HUGEINT)
           * 1000000
           + CAST(k AS HUGEINT) * 10000000000 AS fnum,
         2 * CAST(k AS HUGEINT) * 10000000000 AS fden
  FROM monthly
)
SELECT l_suppkey, month, n_obs,
       ROUND(var_raw, 6) + 0.0 AS var5,
       CASE WHEN n_obs >= 1 THEN
         CAST(CASE WHEN fnum >= 0 THEN fnum // fden
                   ELSE -((-fnum + fden - 1) // fden) END AS DOUBLE)
         / 1000000
       END AS es5,
       CASE WHEN n_obs >= 1
            THEN ROUND(CAST(n_zero AS DOUBLE) / n_obs, 6) + 0.0
       END AS zero_ret_share,
       ROUND(mdd_raw, 6) + 0.0 AS mdd
FROM esdiv
"""


@register("p8_tail_risk_panel", oracle=_P8_ORACLE)
def p8_tail_risk_panel(spark, sf_dir):
    """Stage-2 tranche 3 (r8 verdict item 7) — tail-risk factors per
    (bond, month) toward the CHANGELOG's "50+ bond characteristic
    signals" (reference CHANGELOG.md:8-18):

    - var5 — historical 5% Value-at-Risk: the k-th smallest daily
      return of the month, k = ceil(n_obs/20) computed in INTEGER
      arithmetic ((n+19)//20 — a float ceil(0.05*n) flips at n=20
      because 0.05 is not binary-representable);
    - es5 — expected shortfall: the mean of the k tail returns. The
      selection is a rank (row_number over ret ASC, day tiebreak —
      boundary ties carry equal values, so the sum is tie-order
      invariant); the numerator sums in exact decimal(18,10) and the
      mean itself is the exact integer half-up quotient
      (round_ratio_half_up_wide) — es_sum/k is an exact 10dp
      rational, so a float ROUND at 6dp would land on an exact half
      ~1/10 of the time and the engines disagree on which side
      (observed live before this formulation);
    - zero_ret_share — fraction of observed days with a zero return
      (Lesmond-Ogden-Trzcinka zero-return illiquidity proxy): integer
      count / integer count, single deterministic float division;
    - mdd — intra-month maximum drawdown: min over days of
      prc / running-max(prc) - 1 — running max is an order statistic
      and every quotient is a deterministic IEEE op on bit-identical
      exact-quotient prices.

    Tail selection is RANK-BASED, not a float quantile: engines
    disagree on quantile interpolation conventions, while "the k-th
    smallest element" is exactly reproducible everywhere — and at
    100 TB it needs no per-group array state, just a window rank.

    Scale shape: ONE fact shuffle (the daily aggregate keyed
    (l_suppkey, d)), then ONE daily-frame exchange on hash(l_suppkey)
    that every downstream op reuses — the return lag partitions by
    bond, and the three month-partitioned windows plus the monthly
    hash aggregate all cluster on (l_suppkey, month), which
    hash(l_suppkey) already satisfies (subset rule), so Spark inserts
    no further exchange. No joins, no UDF, no arrays; plan-guarded
    SortAggregate-free.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    pq_cents = F.round(p * q * 100, 0).cast("long")
    daily = li.groupBy("l_suppkey", F.to_date("l_shipdate").alias("d")).agg(
        round_ratio_half_up(
            F.sum(pq_cents), F.sum(q.cast("long")) * 100, 4
        ).alias("prc")
    )
    wb = Window.partitionBy("l_suppkey").orderBy("d")
    seq = daily.withColumn(
        "month", F.date_format("d", "yyyy-MM")
    ).withColumn("ret_d", F.col("prc") / F.lag("prc").over(wb) - 1)
    ret = F.col("ret_d")
    wrank = Window.partitionBy("l_suppkey", "month").orderBy(
        ret.asc_nulls_last(), "d"
    )
    wcnt = Window.partitionBy("l_suppkey", "month")
    wrun = (
        Window.partitionBy("l_suppkey", "month")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = (
        seq.withColumn("rn", F.row_number().over(wrank))
        .withColumn("n_obs_w", F.count(ret).over(wcnt))
        .withColumn("dd_d", F.col("prc") / F.max("prc").over(wrun) - 1)
        .withColumn(
            # integer ceil(n/20): (n+19) - (n+19) mod 20, over 20 — all
            # long arithmetic, no float division anywhere near the cut
            "k",
            ((F.col("n_obs_w") + 19) - (F.col("n_obs_w") + 19) % 20) / 20,
        )
        .withColumn("k", F.col("k").cast("long"))
    )
    rn = F.col("rn")
    monthly = sel.groupBy("l_suppkey", "month").agg(
        F.count(ret).alias("n_obs"),
        F.max(F.when(rn == F.col("k"), ret)).alias("var_raw"),
        F.sum(
            F.when(rn <= F.col("k"), ret.cast("decimal(18,10)"))
        ).alias("es_sum"),
        F.max("k").alias("k"),
        F.count(F.when(ret == 0, F.lit(1))).alias("n_zero"),
        F.min("dd_d").alias("mdd_raw"),
    )
    n_obs = F.col("n_obs")
    # exact integer half-up quotient (see the oracle's esdiv comment):
    # |es_sum| < 10^5 so decimal(15,10) holds it and the 10^10 scale
    # shift stays exact at decimal(27,10). Floor-exactness: at scale 6
    # the wide variant's quotient carries only 9 dp (see
    # round_ratio_half_up_wide's scale-dependent dp), so the generic
    # D < 10^dp bound does NOT cover D = k*10^10 ≈ 2e10 — safety here
    # rests on the NUMERATOR's grid instead: es_n steps in integer
    # units (es_sum is a 10-dp decimal times 10^10), so the quotient
    # (2·es_n·10^6 + D)/(2·D) moves on a grid of spacing
    # 1/(2·k·10^(10-scale)) = 1/(2·k·10^4) ≈ 2.5e-5 for k ≤ 2 —
    # vastly wider than the 5e-10 rounding error at 9 dp, so floor()
    # can never land on the wrong side of an attainable quotient.
    es_n = (
        F.col("es_sum").cast("decimal(15,10)")
        * F.lit(10**10).cast("decimal(11,0)")
    ).cast("decimal(20,0)")
    es_d = F.col("k") * F.lit(10**10)
    return monthly.select(
        "l_suppkey",
        "month",
        "n_obs",
        (F.round("var_raw", 6) + 0.0).alias("var5"),
        F.when(
            n_obs >= 1, round_ratio_half_up_wide(es_n, es_d, 6)
        ).alias("es5"),
        F.when(
            n_obs >= 1,
            F.round(F.col("n_zero").cast("double") / n_obs, 6) + 0.0,
        ).alias("zero_ret_share"),
        (F.round("mdd_raw", 6) + 0.0).alias("mdd"),
    )
