"""S9–S12 external-source readers (offline: local fixture files), plus
the scan-layer pushdown proof (S1–S5: filters must reach the parquet
reader)."""

from __future__ import annotations

import os
import zipfile

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import TEST_SF_DIR
from trace_data_pipeline_spark.operators.interval import range_join
from trace_data_pipeline_spark.sources import load_table
from trace_data_pipeline_spark.sources.external import (
    ff_industry_table,
    read_tenor_curve,
    read_zip_member,
    read_zip_text,
)

FF_SAMPLE = """\
1 Agric  Agriculture
  0100-0199 Agricultural production - crops
  0200-0299 Agricultural production - livestock

2 Mines  Mining
  1000-1299 Metal mining
"""


def test_tenor_curve_outer_merge(spark, tmp_path):
    """S9: 3 per-tenor CSVs with disjoint date coverage outer-merge into
    one wide frame; unparseable yields coerce to null."""
    dates = ["2024-01-01", "2024-01-02", "2024-01-03"]
    specs = {
        "DGS1": [("2024-01-01", "4.1"), ("2024-01-02", "4.2")],
        "DGS10": [("2024-01-02", "4.5"), ("2024-01-03", ".")],  # '.' = missing
        "DGS30": [("2024-01-01", "4.8")],
    }
    paths = {}
    for tenor, rows in specs.items():
        p = os.path.join(str(tmp_path), f"{tenor}.csv")
        pd.DataFrame(rows, columns=["observation_date", tenor]).to_csv(
            p, index=False
        )
        paths[tenor] = p
    curve = read_tenor_curve(spark, paths)
    got = {
        str(r["date"]): (r["DGS1"], r["DGS10"], r["DGS30"])
        for r in curve.collect()
    }
    assert set(got) == set(dates)
    assert got["2024-01-01"] == (4.1, None, 4.8)
    assert got["2024-01-02"] == (4.2, 4.5, None)
    assert got["2024-01-03"] == (None, None, None)  # '.' coerced to null


def test_zip_member_roundtrip(spark, tmp_path):
    """S11: zip-wrapped parquet member extract → spark.read."""
    df = load_table(spark, TEST_SF_DIR, "region").toPandas()
    inner = os.path.join(str(tmp_path), "linker.parquet")
    df.to_parquet(inner)
    zpath = os.path.join(str(tmp_path), "bundle.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(inner, "data/linker.parquet")
    extracted = read_zip_member(zpath, ".parquet", str(tmp_path) + "/out")
    assert spark.read.parquet(extracted).count() == len(df)


def test_ff_ranges_parse_and_range_join(spark, tmp_path):
    """S12 + J15: FF definition text → range table → interval join with
    the 'Other' fallback."""
    zpath = os.path.join(str(tmp_path), "ff.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("Siccodes17.txt", FF_SAMPLE)
    table = ff_industry_table(spark, read_zip_text(zpath, ".txt"))
    assert {tuple(r) for r in table.collect()} == {
        (1, 100, 199),
        (1, 200, 299),
        (2, 1000, 1299),
    }
    sics = spark.createDataFrame(
        [(150,), (1100,), (9999,), (None,)], ["sic_code"]
    )
    joined = range_join(
        sics, "sic_code", table, "sic_low", "sic_high", ["ind_num"],
        defaults={"ind_num": 17},
    )
    got = {r["sic_code"]: r["ind_num"] for r in joined.collect()}
    assert got == {150: 1, 1100: 2, 9999: 17, None: 17}


def test_scan_pushdown_reaches_parquet(spark):
    """S1/S2: a declarative filter + projection must appear in the scan
    node as PushedFilters / a pruned ReadSchema — the 100 TB posture."""
    li = load_table(spark, TEST_SF_DIR, "lineitem")
    plan = (
        li.filter(F.col("l_suppkey") == 7)
        .select("l_orderkey", "l_extendedprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_suppkey), EqualTo(l_suppkey,7)]" in plan
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_orderkey" in read and "l_extendedprice" in read
    assert "l_comment" not in read and "l_quantity" not in read