"""Stage-1-style enrichment plans: correction chains, linker joins,
two-hop flags, join+filter screens, resample+ffill, flag summaries.

Fixed-point rounding discipline: any mean/ratio whose denominator is an
integer count is computed with round_ratio_half_up (exact integer
half-up) in both engines — see plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_data_pipeline_spark.functions.daycount import (
    act_360,
    act_365,
    act_act_isda,
    coupon_bracket,
    thirty_360_us,
)
from trace_data_pipeline_spark.functions.ordered import last_by, ts_seq_key
from trace_data_pipeline_spark.functions.scalars import round_ratio_half_up
from trace_data_pipeline_spark.operators.cleaning import correction_chain_resolution
from trace_data_pipeline_spark.operators.temporal import forward_extend, resample_ffill
from trace_data_pipeline_spark.operators.parallelism import ensure_min_parallelism
from trace_data_pipeline_spark.plans.catalog import register
from trace_data_pipeline_spark.sources import load_table


@register(
    "j4_correction_chain",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
      WHERE l_returnflag IN ('N', 'A')
    ), w AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             l_linenumber - 1 AS orig
      FROM lineitem WHERE l_returnflag = 'R'
    ), combined AS (
      SELECT l_orderkey, l_linenumber AS nb, 'msg' AS role FROM w
      UNION ALL
      SELECT l_orderkey, orig AS nb, 'omsg' AS role FROM w
    ), counts AS (
      SELECT l_orderkey, nb, count(*) AS napp, count(DISTINCT role) AS ntype
      FROM combined GROUP BY 1, 2
    ), keptnb AS (
      SELECT l_orderkey, nb FROM counts
      WHERE napp = 1 OR (napp > 1 AND ntype = 1)
    ), kept AS (
      SELECT c.l_orderkey, c.nb, c.role,
             count(*) OVER (PARTITION BY c.l_orderkey) / 2.0 AS npair
      FROM combined c
      JOIN keptnb k ON c.l_orderkey = k.l_orderkey AND c.nb = k.nb
    ), pairs1 AS (
      -- min() mirrors the operator's deterministic stand-in for the
      -- reference pivot's aggfunc='first' (single-valued cells here)
      SELECT l_orderkey,
             min(CASE WHEN role = 'msg' THEN nb END) AS pmsg,
             min(CASE WHEN role = 'omsg' THEN nb END) AS pomsg
      FROM kept WHERE npair = 1 GROUP BY 1
    ), pairs2 AS (
      SELECT k.l_orderkey, k.nb AS pmsg, w.orig AS pomsg
      FROM kept k
      LEFT JOIN w ON w.l_orderkey = k.l_orderkey AND w.l_linenumber = k.nb
      WHERE k.npair > 1 AND k.role = 'msg'
    ), pairs AS (
      SELECT * FROM pairs1 UNION ALL SELECT * FROM pairs2
    ), wfull AS (
      SELECT p.l_orderkey, p.pmsg, p.pomsg, w.l_returnflag
      FROM pairs p
      LEFT JOIN w ON w.l_orderkey = p.l_orderkey AND w.l_linenumber = p.pmsg
    ), targets AS (
      SELECT DISTINCT l_orderkey, pomsg FROM wfull
    ), surv AS (
      SELECT t.* FROM t
      WHERE NOT EXISTS (SELECT 1 FROM targets x
                        WHERE x.l_orderkey = t.l_orderkey
                          AND x.pomsg = t.l_linenumber)
    ), toadd AS (
      SELECT f.l_orderkey, f.pmsg AS l_linenumber, f.l_returnflag
      FROM wfull f
      WHERE EXISTS (SELECT 1 FROM t JOIN targets x
                      ON x.l_orderkey = t.l_orderkey
                     AND x.pomsg = t.l_linenumber
                    WHERE t.l_orderkey = f.l_orderkey
                      AND t.l_linenumber = f.pomsg)
    )
    SELECT * FROM surv UNION ALL SELECT * FROM toadd
    """,
)
def j4_correction_chain(spark, sf_dir):
    """J4: correction-chain resolution with the reference's EXACT
    napp/ntype/npair pairing (`create_daily_enhanced_trace.py:
    1811-1907`): same-group W→W chains collapse to (head msg, trade
    msg) pairs, multi-pair groups keep each W's own orig, matched
    trades are removed and replaced by the pairs' W rows (unmatched
    pairs substitute nothing)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    trades = li.filter(F.col("l_returnflag").isin("N", "A"))
    corrections = li.filter(F.col("l_returnflag") == "R").withColumn(
        "orig", F.col("l_linenumber") - 1
    )
    return correction_chain_resolution(
        trades,
        corrections,
        keys=["l_orderkey"],
        msg_col="l_linenumber",
        orig_col="orig",
    )


@register(
    "j13_j14_linker_extend",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS DATE) AS d,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ), linker AS (
      SELECT user_id, d,
             CAST((2 * SUM(cents) * 1000000 + 100 * COUNT(*))
                  // (200 * COUNT(*)) AS DOUBLE) / 1000000 AS attrib
      FROM ev WHERE d <= DATE '2024-01-15' GROUP BY 1, 2
    ), mx AS (SELECT max(d) AS mxd FROM linker),
    snap AS (SELECT user_id, attrib FROM linker, mx WHERE d = mxd),
    future AS (SELECT DISTINCT d FROM ev, mx WHERE d > mxd),
    ext AS (SELECT s.user_id, f.d, s.attrib FROM snap s CROSS JOIN future f),
    lx AS (SELECT * FROM linker UNION ALL SELECT * FROM ext)
    SELECT e.event_id, lx.attrib
    FROM ev e LEFT JOIN lx ON e.user_id = lx.user_id AND e.d = lx.d
    """,
)
def j13_j14_linker_extend(spark, sf_dir):
    """J13+J14: slowly-changing linker join with forward extension —
    snapshot the linker's last observed date and cross-join it with
    future panel dates (broadcast), then join the panel on
    (id, date)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    linker = (
        ev.filter(F.col("d") <= F.lit("2024-01-15").cast("date"))
        .groupBy("user_id", "d")
        .agg(
            round_ratio_half_up(
                F.sum("cents"), F.count(F.lit(1)) * 100, 6
            ).alias("attrib")
        )
    )
    extended = forward_extend(linker, "d", ev.select("d"))
    return ev.join(extended, on=["user_id", "d"], how="left").select(
        "event_id", "attrib"
    )


@register(
    "j16_two_hop_flag",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey,
           CAST(COALESCE(n.n_name IN ('FRANCE', 'GERMANY', 'CHINA'), FALSE)
                AS BIGINT) AS callable
    FROM lineitem l
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def j16_two_hop_flag(spark, sf_dir):
    """J16: two-hop enrichment (fact → id-map → attribute table) with a
    fillna(0) flag; both dimensions broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    joined = li.join(
        F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"], "left"
    ).join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"], "left")
    flag = F.coalesce(
        F.col("n_name").isin("FRANCE", "GERMANY", "CHINA"), F.lit(False)
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        flag.cast("long").alias("callable"),
    )


@register(
    "f6_f7_join_screens",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity * 1000 < o.o_totalprice * 0.5
      AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + INTERVAL 90 DAY
    """,
)
def f6_f7_join_screens(spark, sf_dir):
    """F6+F7: screens that need reference-table context — volume vs
    issue size and trade-before-maturity — a broadcast left join
    followed by plain filters."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.to_date("o_orderdate").alias("o_d")
    )
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left")
    return joined.filter(
        (F.col("l_quantity") * 1000 < F.col("o_totalprice") * 0.5)
        & (F.to_date("l_shipdate") <= F.date_add(F.col("o_d"), 90))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "a12_flag_summary",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_obs,
           CAST(SUM(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           strftime(min(CAST(ts AS DATE)), '%Y-%m-%d') AS first_date,
           strftime(max(CAST(ts AS DATE)), '%Y-%m-%d') AS last_date,
           CAST((2 * SUM(CASE WHEN value > 150 THEN 1 ELSE 0 END) * 1000000
                 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000 AS pct_flagged
    FROM events GROUP BY 1
    """,
)
def a12_flag_summary(spark, sf_dir):
    """A12: per-entity flag report — totals, flagged counts, first/last
    observation dates, exact flagged share."""
    ev = load_table(spark, sf_dir, "events")
    flagged = F.when(F.col("value") > 150, 1).otherwise(0)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(flagged).alias("n_flagged"),
        F.date_format(F.min(F.to_date("ts")), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.max(F.to_date("ts")), "yyyy-MM-dd").alias("last_date"),
        round_ratio_half_up(F.sum(flagged), F.count(F.lit(1)), 6).alias(
            "pct_flagged"
        ),
    )


@register(
    "a14_resample_ffill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), obs AS (SELECT user_id, d, value FROM daily WHERE rn = 1),
    grid AS (
      SELECT u.user_id, s.d
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events) s
    )
    SELECT g.user_id, strftime(g.d, '%Y-%m-%d') AS d,
           last_value(o.value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.d = o.d
    """,
)
def a14_resample_ffill(spark, sf_dir):
    """A14: spine resample + forward fill — per-id last observation per
    day, aligned to the shared date spine, gaps forward-filled (the
    reference's resample('D').last().ffill() for the yield curve)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        last_by("value", ts_seq_key("ts", "event_id")).alias("value")
    )
    filled = resample_ffill(
        daily,
        id_col="user_id",
        date_col="d",
        value_cols=["value"],
        spine=ev.select(F.to_date("ts").alias("d")),
    )
    return filled.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.col("value").alias("filled"),
    )


@register(
    "w8b_composite_ratings",
    oracle="""
    WITH r AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE 1 + (o_orderkey * 13) % 22 END AS sp_num,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE 1 + (o_orderkey * 17) % 21 END AS mdy_num
      FROM orders
    ), adj AS (
      SELECT o_orderkey, sp_num,
             CASE WHEN mdy_num >= 21 THEN 22 ELSE mdy_num END AS mdy_adj
      FROM r
    ), comp AS (
      SELECT o_orderkey, sp_num, mdy_adj,
             COALESCE(sp_num, mdy_adj) AS sp_composite,
             COALESCE(mdy_adj, sp_num) AS mdy_composite,
             CASE WHEN sp_num <= 7 THEN 1 WHEN sp_num <= 10 THEN 2
                  WHEN sp_num <= 13 THEN 3 WHEN sp_num <= 16 THEN 4
                  WHEN sp_num <= 19 THEN 5 WHEN sp_num <= 22 THEN 6 END AS sp_naic
      FROM adj
    )
    SELECT o_orderkey, sp_composite, mdy_composite, sp_naic,
           CASE WHEN sp_composite IS NULL AND mdy_composite IS NULL THEN NULL
                WHEN sp_composite IS NULL THEN CAST(mdy_composite AS DOUBLE)
                WHEN mdy_composite IS NULL THEN CAST(sp_composite AS DOUBLE)
                ELSE (sp_composite + mdy_composite) / 2.0 END AS comp_rating
    FROM comp
    """,
)
def w8b_composite_ratings(spark, sf_dir):
    """W8 depth (`stage1_pipeline.py:851-956`, `helper_functions.py:
    411-433`): Moody's ≥21 adjusted to 22, crosswise coalesce
    composites, NAIC band mapping, and the null-aware pairwise mean
    (pandas mean(axis=1): one null → the other value, both null →
    null — NOT SQL AVG semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    r = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(1 + (F.col("o_orderkey") * 13) % 22)
        .alias("sp_num"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(1 + (F.col("o_orderkey") * 17) % 21)
        .alias("mdy_num"),
    )
    adj = r.withColumn(
        "mdy_adj",
        F.when(F.col("mdy_num") >= 21, F.lit(22)).otherwise(F.col("mdy_num")),
    )
    sp_comp = F.coalesce("sp_num", "mdy_adj")
    mdy_comp = F.coalesce("mdy_adj", "sp_num")
    naic = (
        F.when(F.col("sp_num") <= 7, 1)
        .when(F.col("sp_num") <= 10, 2)
        .when(F.col("sp_num") <= 13, 3)
        .when(F.col("sp_num") <= 16, 4)
        .when(F.col("sp_num") <= 19, 5)
        .when(F.col("sp_num") <= 22, 6)
    )
    comp = adj.select(
        "o_orderkey",
        sp_comp.alias("sp_composite"),
        mdy_comp.alias("mdy_composite"),
        naic.alias("sp_naic"),
    )
    mean_na = (
        F.when(
            F.col("sp_composite").isNull() & F.col("mdy_composite").isNull(),
            F.lit(None),
        )
        .when(F.col("sp_composite").isNull(), F.col("mdy_composite").cast("double"))
        .when(F.col("mdy_composite").isNull(), F.col("sp_composite").cast("double"))
        .otherwise((F.col("sp_composite") + F.col("mdy_composite")) / 2.0)
    )
    return comp.withColumn("comp_rating", mean_na)


@register(
    "w10b_daycount",
    oracle="""
    WITH pd AS (
      SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS sdate,
             CAST(l_shipdate AS DATE) + CAST(l_orderkey % 1100 AS INTEGER) AS edate
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           strftime(sdate, '%Y-%m-%d') AS sdate,
           strftime(edate, '%Y-%m-%d') AS edate,
           CAST(360 * (year(edate) - year(sdate))
                + 30 * (month(edate) - month(sdate))
                + (CASE WHEN day(edate) = 31
                             AND least(day(sdate), 30) = 30 THEN 30
                        ELSE day(edate) END
                   - least(day(sdate), 30)) AS DOUBLE) / 360.0
             AS f_30_360,
           CAST(date_diff('day', sdate, edate) AS DOUBLE) / 360.0
             AS f_act_360,
           CAST(date_diff('day', sdate, edate) AS DOUBLE) / 365.0
             AS f_act_365,
           list_sum(list_transform(
             range(year(sdate), year(edate) + 1),
             y -> CAST(greatest(0, date_diff('day',
                    greatest(sdate, make_date(y, 1, 1)),
                    least(edate, make_date(y + 1, 1, 1)))) AS DOUBLE)
                  / (CASE WHEN (y % 4 = 0 AND y % 100 != 0) OR y % 400 = 0
                          THEN 366.0 ELSE 365.0 END)))
             AS f_act_act
    FROM pd
    """,
)
def w10b_daycount(spark, sf_dir):
    """W10 depth: the four day-count bases the reference feeds QuantLib
    (`stage1/helper_functions.py` day_count_basis), as pure date/integer
    column algebra over a deterministic accrual period (ship date plus
    up to ~3 years, so the ACT/ACT ISDA per-year leap split has real
    work) — 30/360 US clipping rules, ACT/360, ACT/365, ACT/ACT. No
    UDF; bit-exact (integer operands, correctly-rounded divisions) so
    the oracle needs no rounding."""
    # widen the single-row-group scan: the day-count algebra is per-row
    # (partition-independent bits), so spreading it is parity-free
    li = ensure_min_parallelism(load_table(spark, sf_dir, "lineitem"))
    s = F.to_date("l_shipdate")
    e = F.date_add(s, (F.col("l_orderkey") % 1100).cast("int"))
    pd_ = li.select(
        "l_orderkey", "l_linenumber", s.alias("sdate"), e.alias("edate")
    )
    s2, e2 = F.col("sdate"), F.col("edate")
    out = pd_.select(
        "l_orderkey",
        "l_linenumber",
        "sdate",
        "edate",
        thirty_360_us(s2, e2).alias("f_30_360"),
        act_360(s2, e2).alias("f_act_360"),
        act_365(s2, e2).alias("f_act_365"),
        act_act_isda(s2, e2).alias("f_act_act"),
    )
    return out.withColumn(
        "sdate", F.date_format("sdate", "yyyy-MM-dd")
    ).withColumn("edate", F.date_format("edate", "yyyy-MM-dd"))


@register(
    "w10d_accrued",
    oracle="""
    WITH bonds AS (
      SELECT o_orderkey,
             DATE '2020-03-15' + CAST(o_orderkey % 365 AS INTEGER) AS settle,
             DATE '2030-06-15' + (INTERVAL 1 MONTH * CAST(o_orderkey % 120 AS INTEGER))
               AS maturity,
             CAST(CASE o_orderkey % 3 WHEN 0 THEN 12 WHEN 1 THEN 6 ELSE 3 END
                  AS INTEGER) AS pm,
             CAST(2 + o_orderkey % 7 AS DOUBLE) / 100.0 AS c_annual,
             60.0 + CAST(o_orderkey * 37 % 800 AS DOUBLE) / 10.0 AS prclean
      FROM orders
    ),
    sched AS (
      SELECT *,
             list_max(list_filter(
               list_transform(range(0, 251),
                 j -> CAST(maturity - INTERVAL 1 MONTH * (pm * j) AS DATE)),
               d -> d <= settle)) AS last_cpn,
             list_min(list_filter(
               list_transform(range(0, 251),
                 j -> CAST(maturity - INTERVAL 1 MONTH * (pm * j) AS DATE)),
               d -> d > settle)) AS next_cpn
      FROM bonds
    )
    SELECT o_orderkey,
           strftime(last_cpn, '%Y-%m-%d') AS last_cpn,
           strftime(next_cpn, '%Y-%m-%d') AS next_cpn,
           CAST(360 * (year(settle) - year(last_cpn))
                + 30 * (month(settle) - month(last_cpn))
                + (CASE WHEN day(settle) = 31
                             AND least(day(last_cpn), 30) = 30 THEN 30
                        ELSE day(settle) END
                   - least(day(last_cpn), 30)) AS DOUBLE) / 360.0
             AS f_30_360,
           CAST(date_diff('day', last_cpn, settle) AS DOUBLE) / 365.0 AS f_act_365,
           ROUND(c_annual * 100.0
                 * CAST(360 * (year(settle) - year(last_cpn))
                        + 30 * (month(settle) - month(last_cpn))
                        + (CASE WHEN day(settle) = 31
                                     AND least(day(last_cpn), 30) = 30 THEN 30
                                ELSE day(settle) END
                           - least(day(last_cpn), 30)) AS DOUBLE) / 360.0, 8)
             AS accrued,
           ROUND(prclean + c_annual * 100.0
                 * CAST(360 * (year(settle) - year(last_cpn))
                        + 30 * (month(settle) - month(last_cpn))
                        + (CASE WHEN day(settle) = 31
                                     AND least(day(last_cpn), 30) = 30 THEN 30
                                ELSE day(settle) END
                           - least(day(last_cpn), 30)) AS DOUBLE) / 360.0, 8)
             AS prfull
    FROM sched
    """,
)
def w10d_accrued(spark, sf_dir):
    """W10 depth: the accrued-interest / dirty-price columns of the
    reference's analytics output (acclast / prfull): backward coupon
    schedule from maturity (array algebra, no UDF), 30/360 accrual
    fraction since the last coupon, accrued = annual coupon x fraction,
    dirty = clean + accrued. Maturity day-of-month is 15 so month-step
    clamping cannot differ between engines."""
    orders = ensure_min_parallelism(load_table(spark, sf_dir, "orders"))
    pm = (
        F.when(F.col("o_orderkey") % 3 == 0, 12)
        .when(F.col("o_orderkey") % 3 == 1, 6)
        .otherwise(3)
        .cast("int")
    )
    bonds = orders.select(
        "o_orderkey",
        F.date_add(F.lit("2020-03-15").cast("date"), (F.col("o_orderkey") % 365).cast("int")).alias("settle"),
        F.add_months(F.lit("2030-06-15").cast("date"), (F.col("o_orderkey") % 120).cast("int")).alias("maturity"),
        pm.alias("pm"),
        ((2 + F.col("o_orderkey") % 7).cast("double") / 100.0).alias("c_annual"),
        (60.0 + (F.col("o_orderkey") * 37 % 800).cast("double") / 10.0).alias("prclean"),
    )
    last_cpn, next_cpn = coupon_bracket(
        F.col("settle"), F.col("maturity"), F.col("pm"), max_periods=250
    )
    sched = bonds.select(
        "o_orderkey", "settle", "c_annual", "prclean",
        last_cpn.alias("last_cpn"),
        next_cpn.alias("next_cpn"),
    )
    f30 = thirty_360_us(F.col("last_cpn"), F.col("settle"))
    f365 = act_365(F.col("last_cpn"), F.col("settle"))
    accrued = F.col("c_annual") * 100.0 * f30
    out = sched.select(
        "o_orderkey",
        "last_cpn",
        "next_cpn",
        f30.alias("f_30_360"),
        f365.alias("f_act_365"),
        F.round(accrued, 8).alias("accrued"),
        F.round(F.col("prclean") + accrued, 8).alias("prfull"),
    )
    return out.withColumn(
        "last_cpn", F.date_format("last_cpn", "yyyy-MM-dd")
    ).withColumn("next_cpn", F.date_format("next_cpn", "yyyy-MM-dd"))


def _w11_oracle() -> str:
    """w11 oracle with the REAL NYSE closure list for the event window
    (Jan-Mar 2024) embedded — generated from the same public ruleset
    the engine uses, so engine and oracle can only agree if the rules
    themselves are applied identically."""
    import datetime as _dt

    from trace_data_pipeline_spark.functions.nyse_calendar import nyse_holidays

    hols = ", ".join(
        f"DATE '{d.isoformat()}'"
        for d in nyse_holidays(2024, 2024)
        if _dt.date(2024, 1, 1) <= d <= _dt.date(2024, 3, 15)
    )
    return f"""
    WITH days AS (
      SELECT DATE '2024-01-01' + CAST(i AS INTEGER) AS s FROM range(0, 75) t(i)
    ),
    sess AS (
      SELECT s FROM days
      WHERE isodow(s) < 6
        AND s NOT IN ({hols})
    ),
    iv AS (
      SELECT s, lead(s, 1) OVER (ORDER BY s) AS nxt,
             lead(s, 2) OVER (ORDER BY s) AS settle
      FROM sess
    )
    SELECT e.event_id, strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS trade_d,
           strftime(iv.settle, '%Y-%m-%d') AS settle_dt
    FROM events e LEFT JOIN iv
      ON CAST(e.ts AS DATE) >= iv.s
     AND (CAST(e.ts AS DATE) < iv.nxt OR iv.nxt IS NULL)
    """


@register("w11_settlement_t2", oracle=_w11_oracle())
def w11_settlement_t2(spark, sf_dir):
    """T+2 settlement against the REAL NYSE trading calendar (reference:
    QuantLib NYSE advance(trade, 2, Days) via pandas_market_calendars,
    `stage0/create_daily_enhanced_trace.py:1397-1456`): rule-derived
    sessions for the event window (Jan 2024 closes New Year's Day and
    MLK Day Jan 15), trades rolled to the second session strictly after
    the trade date via the broadcast interval join in
    `add_business_days_calendar`."""
    import datetime as _dt

    from trace_data_pipeline_spark.functions.nyse_calendar import (
        nyse_sessions_df,
    )
    from trace_data_pipeline_spark.operators.temporal import (
        add_business_days_calendar,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.to_date("ts").alias("trade_d")
    )
    cal = nyse_sessions_df(spark, _dt.date(2024, 1, 1), _dt.date(2024, 3, 15))
    out = add_business_days_calendar(ev, "trade_d", cal, n=2)
    return out.select(
        "event_id",
        F.date_format("trade_d", "yyyy-MM-dd").alias("trade_d"),
        F.date_format("settle_dt", "yyyy-MM-dd").alias("settle_dt"),
    )


# NYSE full-day closures 2029-06-01..2032-06-30, derived INDEPENDENTLY
# of functions/nyse_calendar.py (textbook Butcher computus + published
# NYSE rule 7.2 schedule; public Easter table cross-check: 2029-04-01,
# 2030-04-21, 2031-04-13, 2032-03-28). Embedded as literals so the
# w11b parity gate can actually catch a rule-extrapolation bug in the
# engine — an oracle that calls the engine's own nyse_holidays() would
# faithfully reproduce such a bug on both sides (ADVICE r9).
# tests/test_nyse_calendar.py pins the engine against this same list.
_W11B_HOLIDAYS_2029_2032: tuple[str, ...] = (
    "2029-06-19", "2029-07-04", "2029-09-03", "2029-11-22", "2029-12-25",
    "2030-01-01", "2030-01-21", "2030-02-18", "2030-04-19", "2030-05-27",
    "2030-06-19", "2030-07-04", "2030-09-02", "2030-11-28", "2030-12-25",
    "2031-01-01", "2031-01-20", "2031-02-17", "2031-04-11", "2031-05-26",
    "2031-06-19", "2031-07-04", "2031-09-01", "2031-11-27", "2031-12-25",
    "2032-01-01", "2032-01-19", "2032-02-16", "2032-03-26", "2032-05-31",
    "2032-06-18",
)


def _w11b_oracle() -> str:
    """w11b oracle: ModifiedFollowing against the NYSE calendar for a
    2029-2032 payment grid — years PAST the module's 2030 default
    ceiling, pinning that the ruleset extrapolates (the defaults mirror
    the reference's TRACE sample span, not a data limit). The holiday
    list is an independently derived literal (see
    `_W11B_HOLIDAYS_2029_2032` above) so the gate is NOT
    self-referential against the engine's rule code."""
    hols = ", ".join(
        f"DATE '{d}'" for d in _W11B_HOLIDAYS_2029_2032
    )
    return f"""
    WITH days AS (
      SELECT DATE '2029-06-01' + CAST(i AS INTEGER) AS d
      FROM range(0, 1126) t(i)
    ),
    sp AS (
      SELECT d,
             max(CASE WHEN is_sess THEN d END)
               OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS prv,
             min(CASE WHEN is_sess THEN d END)
               OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS nxt
      FROM (SELECT d, (isodow(d) < 6 AND d NOT IN ({hols})) AS is_sess
            FROM days)
    ),
    pays AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0
                  THEN last_day(CAST(DATE '2029-06-30' + INTERVAL 1 MONTH
                       * CAST(o_orderkey % 36 AS INTEGER) AS DATE))
                  ELSE CAST(DATE '2029-06-30' + INTERVAL 1 MONTH
                       * CAST(o_orderkey % 36 AS INTEGER) AS DATE)
             END AS pay_d
      FROM orders
    ),
    adj AS (
      SELECT p.o_orderkey, p.pay_d,
             CASE WHEN date_trunc('month', sp.nxt)
                       = date_trunc('month', p.pay_d)
                  THEN sp.nxt ELSE sp.prv END AS pay_adj
      FROM pays p JOIN sp ON sp.d = p.pay_d
    )
    SELECT o_orderkey,
           strftime(pay_d, '%Y-%m-%d') AS pay_d,
           strftime(pay_adj, '%Y-%m-%d') AS pay_adj,
           CAST(CASE WHEN pay_adj > pay_d THEN 1
                     WHEN pay_adj < pay_d THEN -1
                     ELSE 0 END AS INTEGER) AS moved
    FROM adj
    """


@register("w11b_modified_following", oracle=_w11b_oracle())
def w11b_modified_following(spark, sf_dir):
    """ModifiedFollowing payment-date adjustment — the QuantLib
    convention the reference passes for schedule payment/termination
    dates (`stage1/helper_functions.py:125-152`): roll a scheduled
    date forward to the next NYSE session unless that crosses into
    the next month, then roll backward. The payment grid spans
    June 2029 - May 2032 (half on raw month-grid dates, half pinned
    to month-END via last_day — the dates where the backward branch
    actually fires, e.g. Sat 2029-06-30 -> back to Fri 2029-06-29),
    deliberately PAST the calendar module's 2030 default so the
    oracle pins rule extrapolation to arbitrary years.

    Scale shape: the day spine with prev/next session attached is
    dimension-sized (two single-partition windows over ~1.1k rows,
    the settlement-table pattern) and broadcasts; the fact side takes
    one BroadcastHashJoin on the calendar date — no fact shuffle, no
    range condition."""
    import datetime as _dt

    from trace_data_pipeline_spark.functions.nyse_calendar import (
        nyse_sessions_df,
    )
    from trace_data_pipeline_spark.operators.temporal import (
        modified_following_calendar,
    )

    k = F.col("o_orderkey")
    base = F.add_months(F.lit("2029-06-30").cast("date"), (k % 36).cast("int"))
    pays = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(k % 2 == 0, F.last_day(base)).otherwise(base).alias("pay_d"),
    )
    cal = nyse_sessions_df(spark, _dt.date(2029, 6, 1), _dt.date(2032, 6, 30))
    out = modified_following_calendar(pays, "pay_d", cal, out_col="pay_adj")
    return out.select(
        "o_orderkey",
        F.date_format("pay_d", "yyyy-MM-dd").alias("pay_d"),
        F.date_format("pay_adj", "yyyy-MM-dd").alias("pay_adj"),
        F.when(F.col("pay_adj") > F.col("pay_d"), 1)
        .when(F.col("pay_adj") < F.col("pay_d"), -1)
        .otherwise(0)
        .cast("int")
        .alias("moved"),
    )
