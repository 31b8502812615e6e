"""Stage-1 end-to-end composite: FISD merge → as-of ratings →
composites → curve spread → bond analytics → final screens (Table 2)
→ within-date winsorization.

Mirrors the reference's `stage1/stage1_pipeline.py` step chain
(`run_all_steps`, :2978-3002):

  F12 date cutoff            :242-247
  step4_merge_fisd (F13)     :330-404   valid_accrued_vars
  step6_merge_ratings (J12)  :851-956   as-of ratings + W8 composites
  step5 analytics + W9 curve             ytm / credit spread
  step9_final_filters (F15)  :1742-1806  prc_high / prc_dip flags
  step10a Table 2 (F14)      :1860-1944  sequential filter counts
  winsorization (A11)        :1950-1960  within-date clip

Synthetic mapping: `events` is the trade tape (user_id ~ cusip_id,
value ~ price). The FISD dimension and the ratings history derive
deterministically from user_id / trade cents so both engines compute
identical inputs. Every float that crosses an engine boundary is
either exact integer arithmetic (prices via `round_ratio_half_up`),
a correctly-rounded division of exact operands (tenors /365.25), or
a replayed fixed iteration (the Newton solver, proven bit-stable by
the w10 family).

Scale notes: the FISD dimension broadcasts; the as-of join is the
linear union+window pattern (one shuffle on user_id); every window
partitions by user_id, reusing that shuffle; the winsorize bounds
aggregate to |dates| rows and broadcast back; the Newton solve is an
Arrow-batched pandas UDF applied AFTER the row filters (hand-pushed
predicate — Catalyst cannot push filters through a UDF).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trace_data_pipeline_spark.functions.scalars import round_ratio_half_up
from trace_data_pipeline_spark.operators.analytics import (
    piecewise_linear,
    winsorize_many_by_group,
)
from trace_data_pipeline_spark.operators.caching import tracked_persist
from trace_data_pipeline_spark.operators.filters import AuditLedger, filter_with_log
from trace_data_pipeline_spark.functions.ordered import ts_seq_key
from trace_data_pipeline_spark.plans.catalog import register
from trace_data_pipeline_spark.sources import load_table


@dataclass(frozen=True)
class Stage1Settings:
    """Knobs mirroring `stage1/_stage1_settings.py` / `config.py`
    (DATE_CUT_OFF, FINAL_FILTER_CONFIG, winsor bounds). Defaults
    reproduce exactly the oracle-checked p2 chain."""

    # F12 (reference DATE_CUT_OFF, stage1_pipeline.py:242)
    cutoff_date: str = "2024-01-20"
    # F13 valid_accrued_vars (stage1_pipeline.py:382-401)
    freq_exclusions: tuple[int, ...] = (-1, 13, 16)
    # Table-2 filter 3 (stage1_pipeline.py:1898)
    min_maturity_years: float = 1.0
    # distressed spike screen (stand-in for the W7 flag column)
    spike_threshold: float = 75.0
    # step9 defaults (stage1_pipeline.py:1742)
    dip_window: tuple[str, str] = ("2024-01-08", "2024-01-14")
    dip_threshold: float = 35.0
    price_threshold: float = 300.0
    # winsorization (stage1_pipeline.py:1950-1960)
    apply_winsor: bool = True
    winsor_lower: float = 0.005
    winsor_upper: float = 0.995


_S = Stage1Settings()  # the oracle-checked defaults

# treasury-style curve nodes shared with w9_curve_interp
_XS = (1.0, 2.0, 5.0, 7.0, 10.0, 20.0, 30.0)
_YS = (0.04, 0.042, 0.045, 0.047, 0.05, 0.055, 0.06)


# --------------------------------------------------------------- Spark chain


def _panel(spark: SparkSession, sf_dir: str, s: Stage1Settings) -> DataFrame:
    """Daily panel (the stage-0 output stand-in): per (user_id, day)
    trade count + exact 6-dp equal-weighted price, after the F12 date
    cutoff. Prices go through integer cents so both engines agree.

    r17 (guide §2.4 "remove shuffles outright"): the step6 rating
    observation rides THIS aggregate instead of a second events scan +
    row_number window + as-of union — three structural facts make the
    fusion output-identical to the old rat/asof chain (oracle-checked):

    1. the last purchase of a (user, day) is max_by over the packed
       (ts, event_id) order key — the same hash-aggregate selection the
       a1 panel uses (lexicographic max == the rn=1 row of the old
       DESC/DESC row_number window; event_id is unique so the max is);
    2. a purchase on day d implies an event on day d, so rating days
       are a SUBSET of panel days — the backward as-of attach over the
       union degenerates to a running last-non-null over the panel
       itself (computed in ``_merged`` BEFORE the accrued screen, so
       pre-screen rating days still reach later surviving rows);
    3. the panel's date cutoff is output-invariant for ratings too: a
       rating observed after the cutoff can never attach to a panel
       row (attachment needs rd ≤ d ≤ cutoff < rd — contradiction).
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    is_p = F.col("event_type") == "purchase"
    pkey = ts_seq_key("ts", "event_id")
    return (
        ev.filter(F.to_date("ts") <= F.lit(s.cutoff_date).cast("date"))
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            round_ratio_half_up(F.sum(cents), F.count(F.lit(1)) * 100, 6).alias(
                "pr"
            ),
            # last purchase's cents (max_by skips null keys = the
            # non-purchase rows; the value may be legitimately null)
            F.max_by(F.when(is_p, cents), F.when(is_p, pkey)).alias(
                "__rat_cents"
            ),
            # marker: a purchase day has a rating OBSERVATION even when
            # its cents (hence both derived levels) are null
            F.max(is_p.cast("int")).alias("__has_rat"),
        )
    )


def _fisd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic FISD issue dimension derived from user_id (reference
    fisd columns, stage1_pipeline.py:345-352): offering/dated dates,
    maturity, interest_frequency (with the invalid -1/13/16 codes),
    annual coupon. One row per user — broadcasts."""
    uid = F.col("user_id")
    offering = F.date_add(
        F.lit("2021-06-01").cast("date"), (uid * 793 % 1100).cast("int")
    )
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id").distinct().select(
        "user_id",
        offering.alias("offering_date"),
        F.when(uid % 13 == 0, F.lit(None).cast("date"))
        .otherwise(offering)
        .alias("dated_date"),
        F.date_add(F.lit("2023-09-01").cast("date"), (uid * 1597 % 4000).cast("int")).alias(
            "maturity"
        ),
        F.when(uid % 9 == 0, -1)
        .when(uid % 9 == 1, 13)
        .when(uid % 9 == 2, 16)
        .when(uid % 9 == 3, 1)
        .when(uid % 9 == 4, 2)
        .when(uid % 9 == 5, 4)
        .when(uid % 9 == 6, 12)
        .otherwise(2)
        .alias("freq"),
        (2 + uid % 7).cast("double").alias("coupon"),
    )


def _merged(spark: SparkSession, sf_dir: str, s: Stage1Settings) -> DataFrame:
    """step4 FISD merge + tenor derivations (stage1_pipeline.py:365-378):
    broadcast left join, bond_maturity / bond_age in /365.25 years, and
    the valid_accrued_vars predicate as a column (`accrued_ok`) so the
    Table-2 report can count it without a second scan.

    r17: also materializes the step6 backward as-of rating attach as a
    running last-non-null over the panel itself (``__rat_asof``) — see
    ``_panel`` for why this is output-identical to the old second-scan
    rat frame + as-of union. It runs HERE, before the accrued screen,
    because the screen's bond_age>0 predicate drops early days whose
    rating observations must still reach later surviving rows (the old
    rat side was never screened). Whole-row semantics preserved: the
    struct is filled as one value, so a null-level observation still
    replaces an older vintage rather than mixing columns."""
    panel = _panel(spark, sf_dir, s)
    cents = F.col("__rat_cents")
    sp = F.when(cents % 7 == 0, F.lit(None)).otherwise(1 + cents % 22)
    mdy = F.when(cents % 5 == 0, F.lit(None)).otherwise(1 + cents % 21)
    obs = F.when(
        F.col("__has_rat") == 1,
        F.struct(sp.alias("sp_num"), mdy.alias("mdy_num")),
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    panel = (
        panel.withColumn("__rat_asof", F.last(obs, ignorenulls=True).over(w_fill))
        .drop("__rat_cents", "__has_rat")
    )
    merged = panel.join(F.broadcast(_fisd(spark, sf_dir)), "user_id", "left")
    bm = F.datediff(F.col("maturity"), F.col("d")).cast("double") / 365.25
    ba = F.datediff(F.col("d"), F.col("offering_date")).cast("double") / 365.25
    accrued_ok = (
        (bm > 0)
        & (ba > 0)
        & F.col("dated_date").isNotNull()
        & ~F.col("freq").isin(*s.freq_exclusions)
    )
    return (
        merged.withColumn("bond_maturity", bm)
        .withColumn("bond_age", ba)
        .withColumn("accrued_ok", accrued_ok)
    )


def _enriched(
    spark: SparkSession, sf_dir: str, acc: DataFrame, s: Stage1Settings
) -> DataFrame:
    """step6 ratings merge + step9 flags on the accrued-surviving frame:
    the backward as-of rating attach is already ON the frame (computed
    in ``_merged`` as a running last-non-null over the unscreened
    panel — r17; whole-row struct semantics unchanged), so this step
    unpacks it and computes the W8 composite levels, the spike
    (distressed stand-in), dip-window and high-price flags. All windows
    partition by user_id and order by the (unique) panel date."""
    rated = (
        acc.withColumn("sp_num", F.col("__rat_asof.sp_num"))
        .withColumn("mdy_num", F.col("__rat_asof.mdy_num"))
        .drop("__rat_asof")
    )
    mdy_adj = F.when(F.col("mdy_num") >= 21, F.lit(22)).otherwise(F.col("mdy_num"))
    comp = rated.withColumn("mdy_adj", mdy_adj).withColumn(
        "sp_composite", F.coalesce("sp_num", "mdy_adj")
    ).withColumn("mdy_composite", F.coalesce("mdy_adj", "sp_num"))

    w_u = Window.partitionBy("user_id").orderBy("d")
    lag_pr = F.lag("pr").over(w_u)
    lead_pr = F.lead("pr").over(w_u)
    spike = (
        ((F.col("pr") - lag_pr) * (F.col("pr") - lead_pr) > 0)
        & (F.abs(F.col("pr") - lag_pr) > s.spike_threshold)
        & (F.abs(F.col("pr") - lead_pr) > s.spike_threshold)
    )
    lo, hi = s.dip_window
    in_dip = F.col("d").between(F.lit(lo).cast("date"), F.lit(hi).cast("date"))
    w_dip = Window.partitionBy(F.col("user_id"), in_dip).orderBy("d")
    dip = (
        in_dip
        & (F.row_number().over(w_dip) == 2)
        & (F.abs(F.col("pr") - F.lag("pr").over(w_dip)) > s.dip_threshold)
    )
    return (
        comp.withColumn(
            "flag_refined_any", F.when(spike, 1).otherwise(0)
        )
        .withColumn("prc_dip", F.when(dip, 1).otherwise(0))
        .withColumn(
            "prc_high", (F.col("pr") > s.price_threshold).cast("int")
        )
    )


# ordered Table-2 screens (stage1_pipeline.py:1886-1944); each predicate
# is row-local on the flagged frame, so sequential filters == one pass
def _screens(s: Stage1Settings) -> list[tuple[str, F.Column]]:
    return [
        ("valid_rating", F.col("sp_num").isNotNull() | F.col("mdy_num").isNotNull()),
        ("valid_maturity", F.col("bond_maturity") >= s.min_maturity_years),
        ("distressed_errors", F.col("flag_refined_any") != 1),
        ("dip_window_filter", F.col("prc_dip") != 1),
        ("high_prc", F.col("prc_high") != 1),
    ]


def _screened(
    enriched: DataFrame, s: Stage1Settings, ledger: AuditLedger | None = None
) -> DataFrame:
    df = enriched
    for stage, pred in _screens(s):
        df = filter_with_log(df, pred, stage, ledger)
    return df


def _analytics(screened: DataFrame, s: Stage1Settings) -> DataFrame:
    """step5: Newton price→yield on the surviving rows + the W9
    interpolated curve → credit spread. Routed through the UNIFIED W10
    solver surface (`bond_analytics_frac`, the engine behind the
    9-output w10e record) at q = 1 — stage-1's daily panel prices carry
    no intra-period settlement context, so flows sit on the period grid
    and the frequency-scaled Newton seed keeps monthly bonds in the
    convergence basin. Rounded at 6 dp on both sides of the oracle;
    `+ 0.0` maps IEEE -0.0 to +0.0."""
    from trace_data_pipeline_spark.operators.bond_math import bond_analytics_frac

    m = F.col("freq").cast("int")
    nper = (
        F.least(F.lit(200), F.greatest(F.lit(1), F.floor(F.col("bond_maturity") * m)))
        .cast("int")
    )
    cpp = F.col("coupon") / (F.lit(100.0) * m)
    solved = screened.withColumn(
        "__r", bond_analytics_frac(F.col("pr"), cpp, nper, m, F.lit(1.0))
    )
    curve = piecewise_linear(F.col("bond_maturity"), list(_XS), list(_YS))
    return solved.withColumn(
        "ytm6", F.round(F.col("__r.ytm"), 6) + 0.0
    ).withColumn(
        "spread6", F.round(F.col("__r.ytm") - curve, 6) + 0.0
    ).drop("__r")


def _final_select(df: DataFrame) -> DataFrame:
    comp_rating = (F.col("sp_composite") + F.col("mdy_composite")) / 2.0
    return df.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n_trades",
        "pr",
        "sp_composite",
        "mdy_composite",
        comp_rating.alias("comp_rating"),
        F.round("bond_maturity", 6).alias("bond_maturity"),
        (F.round("ytm_w", 6) + 0.0).alias("ytm_w"),
        (F.round("spread_w", 6) + 0.0).alias("spread_w"),
    )


def build_stage1(
    spark: SparkSession,
    sf_dir: str,
    settings: Stage1Settings = _S,
    ledger: AuditLedger | None = None,
) -> DataFrame:
    """Assemble the full stage-1 chain per the switchboard (the Spark
    `run_all_steps`). Defaults == the p2_stage1_full oracle chain;
    toggled-off winsorization passes the rounded raw columns through."""
    merged = _merged(spark, sf_dir, settings)
    acc = filter_with_log(
        merged.drop("accrued_ok"),
        (F.col("bond_maturity") > 0)
        & (F.col("bond_age") > 0)
        & F.col("dated_date").isNotNull()
        & ~F.col("freq").isin(*settings.freq_exclusions),
        "valid_accrued_vars",
        ledger,
    )
    enriched = _enriched(spark, sf_dir, acc, settings)
    screened = _screened(enriched, settings, ledger)
    solved = _analytics(screened, settings)
    if settings.apply_winsor:
        # persist: the winsorize bounds aggregate AND the clip join both
        # consume `solved`, and without the cache each consumer re-runs
        # the whole screens+Newton chain (the chained two-column form
        # executed it 4x). One bounds pass for BOTH columns, one
        # broadcast join.
        solved = tracked_persist(solved)
        solved = winsorize_many_by_group(
            solved,
            [("ytm6", "ytm_w"), ("spread6", "spread_w")],
            ["d"],
            settings.winsor_lower,
            settings.winsor_upper,
        )
    else:
        solved = solved.withColumn("ytm_w", F.col("ytm6")).withColumn(
            "spread_w", F.col("spread6")
        )
    return _final_select(solved)


# ------------------------------------------------------------- oracle SQL

_CF = "(CASE WHEN t = n THEN c * 100 + 100 ELSE c * 100 END)"


def _curve_case_sql(var: str) -> str:
    """The W9 piecewise-linear curve as a CASE chain whose literals are
    the exact float64 values Spark's `piecewise_linear` uses (slopes
    spelled as repr'd differences so both engines evaluate identical
    expressions)."""
    parts = [f"CASE WHEN {var} < {_XS[0]!r} THEN {_YS[0]!r}"]
    for i in range(1, len(_XS)):
        x0, x1, y0, y1 = _XS[i - 1], _XS[i], _YS[i - 1], _YS[i]
        parts.append(
            f"WHEN {var} >= {x0!r} AND {var} < {x1!r} "
            f"THEN {y0!r} + ({var} - {x0!r}) * {(y1 - y0)!r} / {(x1 - x0)!r}"
        )
    parts.append(f"ELSE {_YS[-1]!r} END")
    return "\n         ".join(parts)


_BASE_CTES = f"""
panel AS (
  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n_trades,
         CAST((2 * SUM(CAST(round(value * 100, 0) AS BIGINT)) * 1000000
               + 100 * COUNT(*)) // (200 * COUNT(*)) AS DOUBLE) / 1000000 AS pr
  FROM events
  WHERE CAST(ts AS DATE) <= DATE '{_S.cutoff_date}'
  GROUP BY 1, 2
),
fisd AS (
  SELECT user_id,
         DATE '2021-06-01' + CAST(user_id * 793 % 1100 AS INTEGER) AS offering_date,
         CASE WHEN user_id % 13 = 0 THEN NULL
              ELSE DATE '2021-06-01' + CAST(user_id * 793 % 1100 AS INTEGER)
         END AS dated_date,
         DATE '2023-09-01' + CAST(user_id * 1597 % 4000 AS INTEGER) AS maturity,
         CASE CAST(user_id % 9 AS INTEGER)
              WHEN 0 THEN -1 WHEN 1 THEN 13 WHEN 2 THEN 16 WHEN 3 THEN 1
              WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 12 ELSE 2 END AS freq,
         CAST(2 + user_id % 7 AS DOUBLE) AS coupon
  FROM (SELECT DISTINCT user_id FROM events)
),
merged AS (
  SELECT p.user_id, p.d, p.n_trades, p.pr,
         f.offering_date, f.dated_date, f.maturity, f.freq, f.coupon,
         CAST(date_diff('day', p.d, f.maturity) AS DOUBLE) / 365.25 AS bond_maturity,
         CAST(date_diff('day', f.offering_date, p.d) AS DOUBLE) / 365.25 AS bond_age
  FROM panel p LEFT JOIN fisd f ON p.user_id = f.user_id
),
acc AS (
  SELECT * FROM merged
  WHERE bond_maturity > 0 AND bond_age > 0 AND dated_date IS NOT NULL
    AND freq NOT IN {tuple(_S.freq_exclusions)}
)"""

_ENRICH_CTES = f"""
rat AS (
  SELECT user_id, rd,
         CASE WHEN cents % 7 = 0 THEN NULL ELSE 1 + cents % 22 END AS sp_num,
         CASE WHEN cents % 5 = 0 THEN NULL ELSE 1 + cents % 21 END AS mdy_num
  FROM (
    SELECT user_id, CAST(ts AS DATE) AS rd,
           CAST(round(value * 100, 0) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
),
rated AS (
  SELECT a.*, r.sp_num, r.mdy_num
  FROM acc a ASOF LEFT JOIN rat r
    ON a.user_id = r.user_id AND a.d >= r.rd
),
comp AS (
  SELECT *,
         COALESCE(sp_num, mdy_adj) AS sp_composite,
         COALESCE(mdy_adj, sp_num) AS mdy_composite
  FROM (SELECT *, CASE WHEN mdy_num >= 21 THEN 22 ELSE mdy_num END AS mdy_adj
        FROM rated)
),
flagged AS (
  SELECT *,
         CASE WHEN (pr - lag_pr) * (pr - lead_pr) > 0
                   AND abs(pr - lag_pr) > {_S.spike_threshold!r}
                   AND abs(pr - lead_pr) > {_S.spike_threshold!r}
              THEN 1 ELSE 0 END AS flag_refined_any,
         CASE WHEN in_dip AND rnw = 2 AND abs(pr - lag_w) > {_S.dip_threshold!r}
              THEN 1 ELSE 0 END AS prc_dip,
         CASE WHEN pr > {_S.price_threshold!r} THEN 1 ELSE 0 END AS prc_high
  FROM (
    SELECT *,
           lag(pr)  OVER (PARTITION BY user_id ORDER BY d) AS lag_pr,
           lead(pr) OVER (PARTITION BY user_id ORDER BY d) AS lead_pr,
           (d BETWEEN DATE '{_S.dip_window[0]}'
                  AND DATE '{_S.dip_window[1]}') AS in_dip,
           row_number() OVER (
             PARTITION BY user_id,
                          (d BETWEEN DATE '{_S.dip_window[0]}'
                                 AND DATE '{_S.dip_window[1]}')
             ORDER BY d) AS rnw,
           lag(pr) OVER (
             PARTITION BY user_id,
                          (d BETWEEN DATE '{_S.dip_window[0]}'
                                 AND DATE '{_S.dip_window[1]}')
             ORDER BY d) AS lag_w
    FROM comp)
)"""

_SCREEN_CTES = f"""
s1 AS (SELECT * FROM flagged WHERE sp_num IS NOT NULL OR mdy_num IS NOT NULL),
s2 AS (SELECT * FROM s1 WHERE bond_maturity >= {_S.min_maturity_years!r}),
s3 AS (SELECT * FROM s2 WHERE flag_refined_any != 1),
s4 AS (SELECT * FROM s3 WHERE prc_dip != 1),
s5 AS (SELECT * FROM s4 WHERE prc_high != 1)"""


@register(
    "f12_f13_accrued_screen",
    oracle=f"""
    WITH {_BASE_CTES.lstrip()}
    SELECT user_id, strftime(d, '%Y-%m-%d') AS d, n_trades, pr,
           CAST(freq AS BIGINT) AS freq,
           ROUND(bond_maturity, 6) AS bond_maturity,
           ROUND(bond_age, 6) AS bond_age
    FROM acc
    """,
)
def f12_f13_accrued_screen(spark, sf_dir):
    """F12+F13 (`stage1_pipeline.py:242-247, 382-404`): the date-cutoff
    panel merged with the FISD dimension, screened to rows with valid
    accrued-interest inputs (positive residual maturity and age, a
    dated date, a payable frequency code)."""
    merged = _merged(spark, sf_dir, _S)
    acc = merged.filter(F.col("accrued_ok"))
    return acc.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n_trades",
        "pr",
        F.col("freq").cast("long").alias("freq"),
        F.round("bond_maturity", 6).alias("bond_maturity"),
        F.round("bond_age", 6).alias("bond_age"),
    )


@register(
    "f14_final_screens",
    oracle=f"""
    WITH {_BASE_CTES.lstrip()},
    {_ENRICH_CTES.lstrip()},
    {_SCREEN_CTES.lstrip()}
    SELECT user_id, strftime(d, '%Y-%m-%d') AS d, n_trades, pr,
           CAST(sp_composite AS BIGINT) AS sp_composite,
           CAST(mdy_composite AS BIGINT) AS mdy_composite
    FROM s5
    """,
)
def f14_final_screens(spark, sf_dir):
    """F14 (`stage1_pipeline.py:1886-1944`): the sequential Table-2
    screen chain — valid rating, minimum maturity, distressed flag,
    dip-window flag, high-price flag — applied after the as-of rating
    merge and flag computation."""
    merged = _merged(spark, sf_dir, _S)
    acc = merged.filter(F.col("accrued_ok"))
    enriched = _enriched(spark, sf_dir, acc, _S)
    out = _screened(enriched, _S)
    return out.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n_trades",
        "pr",
        F.col("sp_composite").cast("long").alias("sp_composite"),
        F.col("mdy_composite").cast("long").alias("mdy_composite"),
    )


@register(
    "t2_filter_report",
    oracle=f"""
    WITH {_BASE_CTES.lstrip()},
    {_ENRICH_CTES.lstrip()},
    counts0 AS (
      SELECT COUNT(*) AS n_start,
             CAST(SUM(CASE WHEN bond_maturity > 0 AND bond_age > 0
                            AND dated_date IS NOT NULL
                            AND freq NOT IN {tuple(_S.freq_exclusions)}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_acc
      FROM merged
    ),
    preds AS (
      SELECT (sp_num IS NOT NULL OR mdy_num IS NOT NULL) AS p1,
             bond_maturity >= {_S.min_maturity_years!r} AS p2,
             flag_refined_any != 1 AS p3,
             prc_dip != 1 AS p4,
             prc_high != 1 AS p5
      FROM flagged
    ),
    counts1 AS (
      SELECT CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c4,
             CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 AND p5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c5
      FROM preds
    ),
    rows_ AS (
      SELECT 0 AS stage_idx, 'start' AS stage, n_start AS n_before,
             n_start AS n_after FROM counts0
      UNION ALL SELECT 1, 'valid_accrued_vars', n_start, n_acc FROM counts0
      UNION ALL SELECT 2, 'valid_rating', n_acc, c1 FROM counts0, counts1
      UNION ALL SELECT 3, 'valid_maturity', c1, c2 FROM counts1
      UNION ALL SELECT 4, 'distressed_errors', c2, c3 FROM counts1
      UNION ALL SELECT 5, 'dip_window_filter', c3, c4 FROM counts1
      UNION ALL SELECT 6, 'high_prc', c4, c5 FROM counts1
      UNION ALL SELECT 7, 'overall', n_start, c5 FROM counts0, counts1
    )
    SELECT r.stage_idx, r.stage, r.n_before, r.n_after,
           r.n_before - r.n_after AS n_removed,
           CAST((2 * (r.n_before - r.n_after) * 100 * 1000000 + c0.n_start)
                // (2 * c0.n_start) AS DOUBLE) / 1000000 AS pct_of_start
    FROM rows_ r, counts0 c0
    """,
)
def t2_filter_report(spark, sf_dir):
    """Table 2 (`stage1_pipeline.py:1860-1944`): sequential filter
    record — before/after/removed counts and the share of the starting
    rows removed, one row per screen plus start and overall. Computed
    as survival-flag sums in TWO scans (pre-filter frame + flagged
    frame), not one count-action per filter."""
    merged = _merged(spark, sf_dir, _S)
    counts0 = merged.agg(
        F.count(F.lit(1)).alias("n_start"),
        F.sum(F.col("accrued_ok").cast("long")).alias("n_acc"),
    )
    acc = merged.filter(F.col("accrued_ok"))
    enriched = _enriched(spark, sf_dir, acc, _S)
    preds = _screens(_S)
    cum, cols = None, []
    for i, (_, pred) in enumerate(preds, start=1):
        cum = pred if cum is None else (cum & pred)
        cols.append(F.sum(cum.cast("long")).alias(f"c{i}"))
    counts1 = enriched.agg(*cols)
    # 1-row × 1-row combine: broadcast → BroadcastNestedLoopJoin, never
    # a CartesianProduct (test_plan_shapes bans the latter)
    both = counts0.crossJoin(F.broadcast(counts1))
    stages = (
        "stack(8, "
        "0L, 'start', n_start, n_start, "
        "1L, 'valid_accrued_vars', n_start, n_acc, "
        "2L, 'valid_rating', n_acc, c1, "
        "3L, 'valid_maturity', c1, c2, "
        "4L, 'distressed_errors', c2, c3, "
        "5L, 'dip_window_filter', c3, c4, "
        "6L, 'high_prc', c4, c5, "
        "7L, 'overall', n_start, c5"
        ") AS (stage_idx, stage, n_before, n_after)"
    )
    rows = both.selectExpr("n_start", stages)
    return rows.select(
        "stage_idx",
        "stage",
        "n_before",
        "n_after",
        (F.col("n_before") - F.col("n_after")).alias("n_removed"),
        round_ratio_half_up(
            (F.col("n_before") - F.col("n_after")) * 100, F.col("n_start"), 6
        ).alias("pct_of_start"),
    )


_P2_CTES = f"""{_BASE_CTES.lstrip()},
{_ENRICH_CTES.lstrip()},
{_SCREEN_CTES.lstrip()},
bonds AS (
  SELECT user_id, d, n_trades, pr, sp_composite, mdy_composite, bond_maturity,
         CAST(freq AS INTEGER) AS m,
         CAST(least(200, greatest(1, CAST(floor(bond_maturity * freq) AS BIGINT)))
              AS INTEGER) AS n,
         coupon / (100.0 * freq) AS c,
         pr AS p
  FROM s5
),
it AS (
  SELECT user_id, d, m, n, c, p, 0 AS k, CAST(0.06 AS DOUBLE) / m AS y
  FROM bonds
  UNION ALL
  SELECT user_id, d, m, n, c, p, k + 1,
         least(greatest(
           y - (list_sum(list_transform(range(1, n + 1),
                  t -> {_CF} * power(1.0 / (1.0 + y), t))) - p)
             / list_sum(list_transform(range(1, n + 1),
                  t -> -t * {_CF} * power(1.0 / (1.0 + y), t + 1))),
           -0.9), 10.0) AS y
  FROM it WHERE k < 25
),
solved AS (
  SELECT b.*, ROUND(i.y * b.m, 6) + 0.0 AS ytm6,
         ROUND(i.y * b.m - ({_curve_case_sql("b.bond_maturity")}), 6) + 0.0
           AS spread6
  FROM bonds b JOIN it i
    ON b.user_id = i.user_id AND b.d = i.d AND i.k = 25
),
bounds AS (
  SELECT d,
         quantile_cont(ytm6, {_S.winsor_lower!r}) AS ylo,
         quantile_cont(ytm6, {_S.winsor_upper!r}) AS yhi,
         quantile_cont(spread6, {_S.winsor_lower!r}) AS slo,
         quantile_cont(spread6, {_S.winsor_upper!r}) AS shi
  FROM solved GROUP BY 1
),
final AS (
  SELECT s.user_id, strftime(s.d, '%Y-%m-%d') AS d, s.n_trades, s.pr,
         CAST(s.sp_composite AS BIGINT) AS sp_composite,
         CAST(s.mdy_composite AS BIGINT) AS mdy_composite,
         (s.sp_composite + s.mdy_composite) / 2.0 AS comp_rating,
         ROUND(s.bond_maturity, 6) AS bond_maturity,
         CASE WHEN s.ytm6 IS NULL THEN NULL
              ELSE ROUND(LEAST(GREATEST(s.ytm6, b.ylo), b.yhi), 6) + 0.0
         END AS ytm_w,
         CASE WHEN s.spread6 IS NULL THEN NULL
              ELSE ROUND(LEAST(GREATEST(s.spread6, b.slo), b.shi), 6) + 0.0
         END AS spread_w
  FROM solved s JOIN bounds b ON s.d = b.d
)"""

_P2_ORACLE = f"WITH RECURSIVE {_P2_CTES}\nSELECT * FROM final"


@register("p2_stage1_full", oracle=_P2_ORACLE)
def p2_stage1_full(spark, sf_dir):
    """The stage-1 `run_all_steps` composite
    (`stage1_pipeline.py:2978-3002`): panel → FISD merge →
    valid-accrued screen → as-of ratings + composites → Table-2
    screens → Newton price→yield + curve spread → within-date
    winsorization. One end-to-end value-hash-checked plan proving the
    stage-1 operators compose."""
    return build_stage1(spark, sf_dir, _S)


# rating-category split used by Tables 3-8 (reference: IG = numeric
# S&P 1-10, defaulted = 22 ('D'), everything else non-investment grade)
_CLASS_SQL = ("CASE WHEN sp_composite <= 10 THEN 'IG' "
              "WHEN sp_composite >= 22 THEN 'DEF' ELSE 'NIG' END")


def _classed(df: DataFrame) -> DataFrame:
    cls = (
        F.when(F.col("sp_composite") <= 10, "IG")
        .when(F.col("sp_composite") >= 22, "DEF")
        .otherwise("NIG")
    )
    return df.withColumn("rating_class", cls)


@register(
    "r3_availability_by_rating",
    oracle=f"""
    WITH RECURSIVE {_P2_CTES},
    classed AS (SELECT *, {_CLASS_SQL} AS rating_class FROM final)
    SELECT rating_class,
           COUNT(*) AS n_bond_days,
           COUNT(DISTINCT user_id) AS n_bonds,
           COUNT(DISTINCT d) AS n_days,
           MIN(d) AS first_d,
           MAX(d) AS last_d
    FROM classed GROUP BY 1
    """,
)
def r3_availability_by_rating(spark, sf_dir):
    """Table 3 (`stage1_pipeline.py:2103-2110`): data availability by
    rating category over the final stage-1 panel — bond-days, distinct
    bonds, distinct sessions, coverage window. Composes on the p2
    chain; dates compare as ISO strings so min/max are engine-neutral."""
    out = _classed(build_stage1(spark, sf_dir, _S))
    # min/max over the fixed-width DATE, not the ISO string: a var-width
    # string buffer demotes the whole two-countDistinct aggregate chain
    # to SortAggregate (8 SortAggregate nodes + 2 full-panel Sorts at
    # r16 measurement); ISO-8601 ordering == date ordering, and the
    # final date_format restores the identical string values
    agg = out.groupBy("rating_class").agg(
        F.count(F.lit(1)).alias("n_bond_days"),
        F.countDistinct("user_id").alias("n_bonds"),
        F.countDistinct("d").alias("n_days"),
        F.min(F.to_date("d")).alias("__first"),
        F.max(F.to_date("d")).alias("__last"),
    )
    return agg.select(
        "rating_class",
        "n_bond_days",
        "n_bonds",
        "n_days",
        F.date_format("__first", "yyyy-MM-dd").alias("first_d"),
        F.date_format("__last", "yyyy-MM-dd").alias("last_d"),
    )


@register(
    "r2_descriptive_by_rating",
    oracle=f"""
    WITH RECURSIVE {_P2_CTES},
    classed AS (SELECT *, {_CLASS_SQL} AS rating_class FROM final),
    long_ AS (
      SELECT rating_class, 'pr' AS var, pr AS value FROM classed
      UNION ALL
      SELECT rating_class, 'ytm_w', ytm_w FROM classed
      UNION ALL
      SELECT rating_class, 'spread_w', spread_w FROM classed
    )
    SELECT rating_class, var,
           COUNT(value) AS n,
           ROUND(AVG(value), 4) + 0.0 AS mean,
           ROUND(stddev_samp(value), 4) + 0.0 AS std,
           ROUND(quantile_cont(value, 0.05), 4) + 0.0 AS q05,
           ROUND(quantile_cont(value, 0.5), 4) + 0.0 AS q50,
           ROUND(quantile_cont(value, 0.95), 4) + 0.0 AS q95
    FROM long_ GROUP BY 1, 2
    """,
)
def r2_descriptive_by_rating(spark, sf_dir):
    """Tables 4-7 (`stage1_pipeline.py:2113-2224`): pooled descriptive
    statistics per rating category over the winsorized panel — the A8
    stat block applied per class x variable after a stack unpivot.
    Same float discipline as a8 (AVG/std/exact quantiles rounded 4,
    -0.0 normalized)."""
    classed = _classed(build_stage1(spark, sf_dir, _S))
    long_ = classed.selectExpr(
        "rating_class",
        "stack(3, 'pr', pr, 'ytm_w', ytm_w, 'spread_w', spread_w)"
        " AS (var, value)",
    )
    agg = long_.groupBy("rating_class", "var").agg(
        F.count("value").alias("n"),
        (F.round(F.avg("value"), 4) + 0.0).alias("mean"),
        (F.round(F.stddev_samp("value"), 4) + 0.0).alias("std"),
        # one shared percentile buffer for all three quantiles (see
        # operators/analytics.py::pooled_stats)
        F.percentile(
            F.col("value"), F.array(F.lit(0.05), F.lit(0.5), F.lit(0.95))
        ).alias("__qs"),
    )
    return agg.select(
        "rating_class", "var", "n", "mean", "std",
        (F.round(F.get("__qs", 0), 4) + 0.0).alias("q05"),
        (F.round(F.get("__qs", 1), 4) + 0.0).alias("q50"),
        (F.round(F.get("__qs", 2), 4) + 0.0).alias("q95"),
    )


@register(
    "p5_carry_value",
    oracle=f"""
    WITH RECURSIVE {_P2_CTES},
    classed AS (SELECT *, {_CLASS_SQL} AS rating_class FROM final),
    med AS (
      SELECT rating_class, d, quantile_cont(spread_w, 0.5) AS ms
      FROM classed GROUP BY 1, 2
    )
    SELECT c.user_id, c.d, c.rating_class,
           ROUND((2 + c.user_id % 7) / c.pr * 100, 6) + 0.0 AS carry,
           -- 7dp: spread_w is 6dp and an even-count median ends in an
           -- exact half-digit, so the difference TERMINATES at 7dp —
           -- rounding there is tie-free, while ROUND(.,6) ties on every
           -- odd half and the engines break double-ties differently
           ROUND(c.spread_w - m.ms, 7) + 0.0 AS value_sprd
    FROM classed c JOIN med m
      ON m.rating_class = c.rating_class AND m.d = c.d
    """,
)
def p5_carry_value(spark, sf_dir):
    """Stage-2 preview, carry + value signals over the stage-1 panel
    (the CHANGELOG's unreleased "carry and value signals"): carry =
    running yield (coupon/price x 100, the coupon derivation mirroring
    the stage-1 FISD columns); value = winsorized credit spread minus
    its (rating class, date) cross-sectional median — rich/cheap vs
    peers. The panel is persisted because the median aggregate and the
    demeaning join both consume it (the winsorize-diamond lesson); the
    median side aggregates to |classes|x|dates| rows and broadcasts."""
    from trace_data_pipeline_spark.operators.caching import tracked_persist

    base = tracked_persist(_classed(build_stage1(spark, sf_dir, _S)))
    med = base.groupBy("rating_class", "d").agg(
        F.median("spread_w").alias("__ms")
    )
    coupon = (2 + F.col("user_id") % 7).cast("double")
    return (
        base.join(F.broadcast(med), ["rating_class", "d"])
        .select(
            "user_id",
            "d",
            "rating_class",
            (F.round(coupon / F.col("pr") * 100, 6) + 0.0).alias("carry"),
            # 7dp — tie-free because the 6dp spread minus a half-digit
            # median terminates at the 7th decimal (see oracle comment)
            (F.round(F.col("spread_w") - F.col("__ms"), 7) + 0.0).alias(
                "value_sprd"
            ),
        )
    )
