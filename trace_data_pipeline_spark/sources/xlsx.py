"""S10: xlsx ingestion without an xlsx codec.

An .xlsx file is a zip of ECMA-376 SpreadsheetML XML parts, so the
container ships everything needed to read one: stdlib `zipfile` +
`xml.etree`. The reader walks `xl/worksheets/sheetN.xml` cell by cell,
resolving shared strings — no pandas/openpyxl dependency.

`liu_wu_curve` reproduces the reference's Liu-Wu treasury ingestion
(`stage1/helper_functions.py:645-762`): header at spreadsheet row 9
(index 8), first column YYYYMMDD integer dates (coerced, invalid →
dropped), '12 m'…'360 m' percentage columns mapped to FRED-style names
and divided by 100, then daily-resampled + forward-filled onto a
contiguous date spine (the pandas `resample('D').last().ffill()`)
via the shared `resample_ffill` window operator.

Driver-side by design: these files are kilobytes of reference data;
the cluster only ever sees the parsed, broadcast-ready DataFrame
(same policy as the S9/S11/S12 readers in `external.py`).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'BC12' → 54: base-26 column letters of an A1 ref."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>; concatenate all text nodes
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t in ("str", "e"):
        return v.text
    if t == "b":
        return bool(int(v.text))
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_xlsx_rows(path: str, sheet_index: int = 0) -> list[list]:
    """Parse one worksheet into rectangular rows (None-padded). Sheets
    are ordered by their numeric part name (sheet1.xml, sheet2.xml…)."""
    with zipfile.ZipFile(path) as zf:
        sheets = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        if not sheets:
            raise FileNotFoundError(f"no worksheets in {path}")
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(sheets[sheet_index]))
    raw: list[dict[int, object]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for pos, c in enumerate(row.findall(f"{_NS}c")):
            ref = c.get("r")
            ci = _col_index(ref) if ref else pos
            cells[ci] = _cell_value(c, shared)
        raw.append(cells)
    width = max((max(r) + 1 for r in raw if r), default=0)
    return [[r.get(i) for i in range(width)] for r in raw]


_MATURITY_MAP = {
    "12 m": "oneyr",
    "24 m": "twoyr",
    "60 m": "fiveyr",
    "84 m": "sevyr",
    "120 m": "tenyr",
    "240 m": "twentyr",
    "360 m": "thirtyr",
}


def liu_wu_curve(
    spark: SparkSession,
    path: str,
    header_row: int = 8,
    start_date: str = "2000-01-31",
) -> DataFrame:
    """Liu-Wu zero-coupon yields → (trd_exctn_dt, oneyr…thirtyr),
    decimals, daily-resampled and forward-filled."""
    from trace_data_pipeline_spark.operators.temporal import resample_ffill

    rows = read_xlsx_rows(path)
    header = [str(h).strip() if h is not None else "" for h in rows[header_row]]
    col_of = {h: i for i, h in enumerate(header)}
    missing = [m for m in _MATURITY_MAP if m not in col_of]
    if missing:
        raise ValueError(f"expected maturities missing from sheet: {missing}")

    records = []
    for r in rows[header_row + 1:]:
        # YYYYMMDD integer → ISO date; anything unparseable coerces null
        raw_d = r[0]
        try:
            s = str(int(raw_d))
            d = f"{s[0:4]}-{s[4:6]}-{s[6:8]}"
            import datetime

            d = datetime.date.fromisoformat(d)
        except (TypeError, ValueError):
            continue  # the reference's dropna(subset=['trd_exctn_dt'])
        vals = []
        for m in _MATURITY_MAP:
            v = r[col_of[m]]
            # percentage points → decimals, null-on-parse-failure
            try:
                vals.append(float(v) / 100.0)
            except (TypeError, ValueError):
                vals.append(None)
        records.append((d, *vals))

    # the reference's resample('D').last() keeps only the LAST observation
    # per day; duplicate sheet dates must collapse before the spine join or
    # they multiply rows downstream
    by_date = {rec[0]: rec for rec in records}
    records = [by_date[d] for d in sorted(by_date)]

    cols = ["trd_exctn_dt", *_MATURITY_MAP.values()]
    schema = "trd_exctn_dt date, " + ", ".join(
        f"{c} double" for c in _MATURITY_MAP.values()
    )
    obs = spark.createDataFrame(records, schema).filter(
        F.col("trd_exctn_dt") >= F.lit(start_date).cast("date")
    )
    # contiguous daily spine min..max, then last().ffill() per the
    # reference's resample('D') — one window, no shuffle beyond the
    # (single-series) repartition
    bounds = obs.agg(
        F.min("trd_exctn_dt").alias("lo"), F.max("trd_exctn_dt").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("trd_exctn_dt")
    )
    filled = resample_ffill(
        obs.withColumn("__series", F.lit(1)),
        id_col="__series",
        date_col="trd_exctn_dt",
        value_cols=list(_MATURITY_MAP.values()),
        spine=spine,
    )
    return filled.drop("__series").select(*cols)
