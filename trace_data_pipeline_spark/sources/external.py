"""External reference-data sources (SURVEY.md §2.1 S9–S12).

The reference pulls auxiliary data over HTTP at run time: per-tenor
FRED yield CSVs outer-merged on date (`stage1/helper_functions.py:
257-307`), a Liu-Wu xlsx export (`:645-762`), a zip-wrapped linker
parquet (`:457-473`), and Fama-French industry-definition zips
(`:4370-4451`). Re-expressed for Spark:

- every reader takes LOCAL paths; `fetch()` is the separated network
  step (driver-side, cached) so executors never open sockets and runs
  are reproducible from the cache;
- small reference tables land as broadcast-ready DataFrames;
- parsing (zip members, FF range text) is driver-side stdlib — these
  files are kilobytes; the cluster only ever sees the parsed table.
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession, functions as F


def fetch(url: str, cache_path: str, timeout: int = 60) -> str:
    """Download url → cache_path once (driver-side); return the cached
    path. Separated from the readers so offline/reproducible runs just
    pre-seed the cache."""
    if not os.path.exists(cache_path):
        import urllib.request

        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
            data = resp.read()
        with open(cache_path, "wb") as f:
            f.write(data)
    return cache_path


def read_tenor_curve(
    spark: SparkSession,
    tenor_csvs: Mapping[str, str],
    date_col: str = "observation_date",
) -> DataFrame:
    """S9: per-tenor CSVs (date, yield) outer-merged on date into one
    wide curve frame; yields parsed null-on-failure (the reference's
    errors='coerce')."""
    out: DataFrame | None = None
    for tenor, path in tenor_csvs.items():
        df = (
            spark.read.option("header", True)
            .csv(path)
            .select(
                F.to_date(date_col).alias("date"),
                F.col(tenor).try_cast("double").alias(tenor),
            )
        )
        out = df if out is None else out.join(df, on="date", how="outer")
    assert out is not None, "no tenor files given"
    return out


def read_zip_member(
    zip_path: str, member_suffix: str, extract_dir: str
) -> str:
    """S11: extract the first member matching suffix from a zip; return
    its extracted path (then spark.read.parquet/csv it)."""
    with zipfile.ZipFile(zip_path) as zf:
        for name in zf.namelist():
            if name.endswith(member_suffix):
                return zf.extract(name, extract_dir)
    raise FileNotFoundError(f"no member *{member_suffix} in {zip_path}")


def parse_ff_industry_ranges(text: str) -> list[tuple[int, int, int]]:
    """S12: parse a Fama-French industry-definition file into
    (industry_num, sic_low, sic_high) rows. Format:

        1 Agric  Agriculture
          0100-0199 Agricultural production
          0200-0299 ...
        2 Food   Food products
          ...
    """
    rows: list[tuple[int, int, int]] = []
    current: int | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        head = line.split()[0]
        if "-" in head and head.replace("-", "").isdigit():
            lo, hi = head.split("-", 1)
            if current is not None:
                rows.append((current, int(lo), int(hi)))
        elif head.isdigit():
            current = int(head)
    return rows


def ff_industry_table(spark: SparkSession, text: str) -> DataFrame:
    """S12 → broadcast-ready range table for the J15 interval join."""
    return spark.createDataFrame(
        parse_ff_industry_ranges(text), ["ind_num", "sic_low", "sic_high"]
    )


def read_zip_text(zip_path: str, member_suffix: str) -> str:
    """Zip member → text (FF definition files ship inside zips)."""
    with zipfile.ZipFile(zip_path) as zf:
        for name in zf.namelist():
            if name.endswith(member_suffix):
                with zf.open(name) as f:
                    return io.TextIOWrapper(f, encoding="latin-1").read()
    raise FileNotFoundError(f"no member *{member_suffix} in {zip_path}")
