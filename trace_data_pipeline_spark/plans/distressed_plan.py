"""W7 ultra-distressed filter plan: daily panel from deterministically
corrupted events (ultra-low prints via /1000, spikes via ×5, plateau
fodder via a literal 0.05), then all four sub-filters.

Every number in the pipeline is either a raw data value, an exact IEEE
product/quotient, or a median picked from sorted values — so the DuckDB
oracle (same corruption, same daily panel, anomaly/spike via list
slicing, plateaus via gaps-and-islands) compares bit-exact with NO
rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_data_pipeline_spark.functions.ordered import first_by, last_by, ts_seq_key
from trace_data_pipeline_spark.operators.distressed import ultra_distressed_filter
from trace_data_pipeline_spark.plans.catalog import register
from trace_data_pipeline_spark.sources import load_table

_RND = "(abs({p} - 0.001) < 0.0001 OR abs({p} - 0.01) < 0.0001 OR abs({p} - 0.05) < 0.0001 OR abs({p} - 0.10) < 0.0001 OR abs({p} - 0.25) < 0.0001 OR abs({p} - 0.50) < 0.0001 OR abs({p} - 0.75) < 0.0001 OR abs({p} - 1.00) < 0.0001)"

_W7_ORACLE = (
    r"""
WITH base AS (
  SELECT user_id, event_id, ts, CAST(ts AS DATE) AS d,
         CASE WHEN event_id % 13 = 0 THEN value / 1000
              WHEN event_id % 17 = 0 THEN value * 5
              WHEN value < 50 THEN 0.05
              ELSE value END AS p
  FROM events
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, d ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY user_id, d ORDER BY ts DESC, event_id DESC) AS rd
  FROM base
),
daily AS (
  SELECT user_id, d,
         max(p) AS pr_hi, min(p) AS pr_lo,
         max(CASE WHEN ra = 1 THEN p END) AS pr_first,
         max(CASE WHEN rd = 1 THEN p END) AS pr_last
  FROM ranked GROUP BY 1, 2
),
seq AS (
  SELECT user_id, d, pr_hi, pr_lo, pr_first, pr_last,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS i,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM daily
),
lists AS (SELECT user_id, list(pr_last ORDER BY i) AS ps FROM seq GROUP BY 1),
scan AS (
  SELECT s.*, l.ps,
         list_sort(list_filter(l.ps[greatest(1, s.i - 5):s.i - 1]
                               || l.ps[s.i + 1:least(s.n, s.i + 5)],
                               x -> x > s.pr_last)) AS surr,
         list_sort(list_filter(l.ps[greatest(1, s.i - 5):s.i - 1],
                               x -> x < s.pr_last)) AS pre
  FROM seq s JOIN lists l USING (user_id)
),
meds AS (
  SELECT *,
         CASE WHEN len(surr) = 0 THEN NULL
              WHEN len(surr) % 2 = 1 THEN surr[(len(surr) + 1) // 2]
              ELSE (surr[len(surr) // 2] + surr[len(surr) // 2 + 1]) / 2.0
         END AS med_surr,
         CASE WHEN len(pre) = 0 THEN NULL
              WHEN len(pre) % 2 = 1 THEN pre[(len(pre) + 1) // 2]
              ELSE (pre[len(pre) // 2] + pre[len(pre) // 2 + 1]) / 2.0
         END AS med_pre
  FROM scan
),
flags12 AS (
  SELECT user_id, d, i, n, ps, pr_hi, pr_lo, pr_first, pr_last,
         CASE WHEN n >= 3
                   AND (pr_last < 0.10 OR """
    + _RND.format(p="pr_last")
    + r""")
                   AND med_surr IS NOT NULL
                   AND med_surr / (pr_last + 1e-10) >= 3.0
              THEN 1 ELSE 0 END AS flag_anomalous_price,
         CASE WHEN n >= 3
                   AND (pr_last > 5.0 OR ("""
    + _RND.format(p="pr_last")
    + r""" AND pr_last > 0.50))
                   AND med_pre IS NOT NULL
                   AND pr_last / (med_pre + 1e-10) >= 3.0
                   AND len(list_filter(ps[i + 1:least(n, i + 5)],
                                       x -> x <= med_pre * 2.0)) > 0
              THEN 1 ELSE 0 END AS flag_upward_spike
  FROM meds
),
isl AS (
  SELECT user_id, d, i, n, pr_last,
         i - row_number() OVER (PARTITION BY user_id, pr_last ORDER BY i) AS grp
  FROM seq
),
islands AS (
  SELECT user_id, pr_last AS p, grp, min(i) AS i0, max(i) AS i1,
         count(*) AS run_len, max(n) AS n
  FROM isl GROUP BY 1, 2, 3
),
island_flags AS (
  SELECT il.user_id, il.i0, il.i1,
         CASE WHEN il.n >= 2 AND il.run_len >= 2
                   AND (il.p < 0.15 OR """
    + _RND.format(p="il.p")
    + r""")
                   AND ("""
    + _RND.format(p="il.p")
    + r"""
                        OR (l.ps[il.i0 - 1] IS NOT NULL
                            AND l.ps[il.i0 - 1] / (il.p + 1e-10) >= 3.0)
                        OR (l.ps[il.i1 + 1] IS NOT NULL
                            AND l.ps[il.i1 + 1] / (il.p + 1e-10) >= 3.0))
              THEN 1 ELSE 0 END AS pflag
  FROM islands il JOIN lists l USING (user_id)
),
assembled AS (
  SELECT f.user_id, f.d, f.pr_last, f.flag_anomalous_price, f.flag_upward_spike,
         COALESCE((SELECT max(pflag) FROM island_flags g
                   WHERE g.user_id = f.user_id
                     AND f.i BETWEEN g.i0 AND g.i1), 0) AS flag_plateau_sequence,
         CASE WHEN least(pr_first, pr_last, pr_hi, pr_lo) < 20.0
                   AND (pr_first + pr_last + pr_hi + pr_lo) / 4.0 > 0
                   AND (pr_hi - pr_lo)
                       / ((pr_first + pr_last + pr_hi + pr_lo) / 4.0) > 0.75
              THEN 1 ELSE 0 END AS flag_intraday_inconsistent
  FROM flags12 f
)
SELECT user_id, strftime(d, '%Y-%m-%d') AS d, pr_last,
       flag_anomalous_price, flag_upward_spike, flag_plateau_sequence,
       flag_intraday_inconsistent,
       CASE WHEN flag_anomalous_price = 1 OR flag_upward_spike = 1
                 OR flag_plateau_sequence = 1 OR flag_intraday_inconsistent = 1
            THEN 1 ELSE 0 END AS flag_refined_any
FROM assembled
"""
)


_R5_ORACLE = (
    "WITH w7 AS (\n"
    + _W7_ORACLE
    + "\n)\nSELECT user_id, d, pr_last AS pr, flag_refined_any AS flag\n"
    "FROM w7 WHERE user_id IN (SELECT user_id FROM w7 WHERE flag_refined_any = 1)"
)


@register("r5_distressed_series", oracle=_R5_ORACLE)
def r5_distressed_series(spark, sf_dir):
    """Stage-1 distressed report figure data: the full daily price
    series of every entity the W7 ultra-distressed filter flagged, with
    the per-day flag — exactly the frame the reference's per-CUSIP
    distressed panels consume (`stage1/_distressed_plot_helpers.py:
    152-230` _plot_panel_distressed via `stage1_pipeline.py:1631-1716`,
    which plots only flagged CUSIPs: All line + kept-only Filtered line
    + Eliminated markers). Shape: one W7 pass, a broadcast semi-join on
    the (small) flagged-entity set — the series stays distributed; the
    report sink renders pages from this frame without collecting it."""
    w7 = w7_ultra_distressed(spark, sf_dir)
    flagged = (
        w7.filter(F.col("flag_refined_any") == 1).select("user_id").distinct()
    )
    return w7.join(F.broadcast(flagged), "user_id", "left_semi").select(
        "user_id",
        "d",
        F.col("pr_last").alias("pr"),
        F.col("flag_refined_any").alias("flag"),
    )


@register("w7_ultra_distressed", oracle=_W7_ORACLE)
def w7_ultra_distressed(spark, sf_dir):
    """W7: all four ultra-distressed sub-filters over the daily panel of
    a corrupted events series — anomaly/spike/plateau via one
    applyInPandas grouped map, intraday inconsistency as JVM column
    algebra. Bit-exact vs a list-SQL + gaps-and-islands oracle."""
    ev = load_table(spark, sf_dir, "events")
    p = (
        F.when(F.col("event_id") % 13 == 0, F.col("value") / 1000)
        .when(F.col("event_id") % 17 == 0, F.col("value") * 5)
        .when(F.col("value") < 50, F.lit(0.05))
        .otherwise(F.col("value"))
    )
    base = ev.select(
        "user_id", "event_id", "ts", F.to_date("ts").alias("d"), p.alias("p")
    )
    daily = base.groupBy("user_id", "d").agg(
        F.max("p").alias("pr_hi"),
        F.min("p").alias("pr_lo"),
        first_by("p", ts_seq_key("ts", "event_id")).alias("pr_first"),
        last_by("p", ts_seq_key("ts", "event_id")).alias("pr_last"),
    )
    flagged = ultra_distressed_filter(
        daily,
        id_col="user_id",
        order_cols=("d",),
        price_col="pr_last",
        price_cols=("pr_first", "pr_last", "pr_hi", "pr_lo"),
        round_dp=None,
    )
    return flagged.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "pr_last",
        F.col("flag_anomalous_price").cast("int").alias("flag_anomalous_price"),
        F.col("flag_upward_spike").cast("int").alias("flag_upward_spike"),
        F.col("flag_plateau_sequence").cast("int").alias("flag_plateau_sequence"),
        F.col("flag_intraday_inconsistent")
        .cast("int")
        .alias("flag_intraday_inconsistent"),
        F.col("flag_refined_any").cast("int").alias("flag_refined_any"),
    )
