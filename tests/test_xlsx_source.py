"""S10: xlsx ingestion — the reader parses a REAL xlsx container
(zip of SpreadsheetML XML built with stdlib only) with the Liu-Wu
layout: junk preamble, header at spreadsheet row 9, YYYYMMDD integer
dates, percentage yields, date gaps to forward-fill."""

from __future__ import annotations

import zipfile

import pytest

from trace_data_pipeline_spark.sources.xlsx import liu_wu_curve, read_xlsx_rows

_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'

_HEADERS = [" Date ", "12 m", "24 m", "60 m", "84 m", "120 m", "240 m", "360 m"]


def _cell(ref: str, value, t: str | None = None) -> str:
    if t == "s":
        return f'<c r="{ref}" t="s"><v>{value}</v></c>'
    if t == "inlineStr":
        return f'<c r="{ref}" t="inlineStr"><is><t>{value}</t></is></c>'
    return f'<c r="{ref}"><v>{value}</v></c>'


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _make_xlsx(path: str) -> None:
    shared = "".join(f"<si><t>{h}</t></si>" for h in _HEADERS)
    sst = f'<sst {_NS} count="{len(_HEADERS)}">{shared}</sst>'

    rows = []
    # rows 1-8: title/preamble junk the reader must skip
    for r in range(1, 9):
        rows.append(f'<row r="{r}">{_cell(f"A{r}", 0, "inlineStr")}</row>')
    # row 9: header via shared strings
    hdr = "".join(
        _cell(f"{_col_letter(i)}9", i, "s") for i in range(len(_HEADERS))
    )
    rows.append(f'<row r="9">{hdr}</row>')
    # data: a pre-start row, two observations, a gap, one more, one junk date
    data = [
        (19991231, [9.9] * 7),          # before start_date -> filtered
        (20240101, [1.0, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6]),  # superseded dup
        (20240101, [3.5, 3.6, 3.7, 3.8, 3.9, 4.0, 4.1]),  # last-per-day wins
        (20240102, [4.0, 4.1, 4.2, 4.3, 4.4, 4.5, 4.6]),
        # 03/04 missing -> forward-filled from 0102
        (20240105, [4.5, 4.6, 4.7, 4.8, 4.9, 5.0, 5.1]),
    ]
    r = 10
    for d, ys in data:
        cells = [_cell(f"A{r}", d)] + [
            _cell(f"{_col_letter(i + 1)}{r}", y) for i, y in enumerate(ys)
        ]
        rows.append(f'<row r="{r}">{"".join(cells)}</row>')
        r += 1
    rows.append(f'<row r="{r}">{_cell(f"A{r}", "not-a-date", "inlineStr")}</row>')
    sheet = f'<worksheet {_NS}><sheetData>{"".join(rows)}</sheetData></worksheet>'

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


@pytest.fixture(scope="module")
def xlsx_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("xlsx") / "liu_wu.xlsx"
    _make_xlsx(str(p))
    return str(p)


def test_read_xlsx_rows(xlsx_path):
    rows = read_xlsx_rows(xlsx_path)
    assert rows[8] == _HEADERS  # header row, shared strings resolved
    assert rows[9][0] == 19991231 and rows[10][0] == 20240101
    assert rows[10][1] == 1.0 and rows[11][1] == 3.5  # raw dup preserved
    assert rows[-1][0] == "not-a-date"


def test_liu_wu_curve(spark, xlsx_path):
    df = liu_wu_curve(spark, xlsx_path).orderBy("trd_exctn_dt")
    got = df.collect()
    # daily spine 01-01..01-05, pre-start + junk rows dropped
    assert [str(r["trd_exctn_dt"]) for r in got] == [
        f"2024-01-0{i}" for i in range(1, 6)
    ]
    assert got[0]["oneyr"] == pytest.approx(0.035)
    assert got[1]["thirtyr"] == pytest.approx(0.046)
    # the gap days carry 01-02's values forward
    for gap in (2, 3):
        assert got[gap]["oneyr"] == pytest.approx(0.040)
        assert got[gap]["thirtyr"] == pytest.approx(0.046)
    assert got[4]["sevyr"] == pytest.approx(0.048)
