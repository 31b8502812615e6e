"""Pure-string LaTeX builders for the audit report.

The reference assembles its Stage-0 data report from booktabs tables
plus per-CUSIP figures (`stage0/_error_plot_helpers.py:694-1200`:
`_rows_to_latex*`, `make_parameters_table`, `make_filters_counts_table`,
`make_error_report`). These builders produce the same artifact class —
a self-contained `\\documentclass{article}` report with a parameters
table, per-stage removal tables, and included figures — from plain
Python rows, so they are unit-testable without Spark and reusable by
any caller that has already collected a bounded report frame.

Everything here is deterministic string formatting: no timestamps are
injected unless the caller passes one (reproducible artifacts hash
identically run to run).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

# LaTeX-special characters and their escaped forms. Backslash first is
# handled separately (it would double-escape the others' replacements).
_SPECIALS = {
    "&": r"\&",
    "%": r"\%",
    "$": r"\$",
    "#": r"\#",
    "_": r"\_",
    "{": r"\{",
    "}": r"\}",
    "~": r"\textasciitilde{}",
    "^": r"\textasciicircum{}",
}


def escape_tex(value: object) -> str:
    """Escape a cell value for LaTeX body text."""
    # backslash via a sentinel: its replacement contains braces that
    # the loop below would otherwise double-escape
    s = str(value).replace("\\", "\x00")
    for ch, rep in _SPECIALS.items():
        s = s.replace(ch, rep)
    return s.replace("\x00", r"\textbackslash{}")


def _fmt_int(n: object) -> str:
    """Thousands-separated integer (LaTeX-safe: ',' needs no escape)."""
    return f"{int(n):,}"


def _fmt_pct(frac: object, digits: int = 3) -> str:
    """A 0..1 fraction as a percent cell; empty for null."""
    if frac is None:
        return ""
    return f"{100.0 * float(frac):.{digits}f}" + r"\%"


def tabular(
    header: Sequence[str],
    rows: Sequence[Sequence[object]],
    align: str,
    escape: bool = True,
) -> str:
    """A booktabs `tabular` environment: header, midrule, body rows."""
    fmt = (lambda v: escape_tex(v)) if escape else str
    lines = [
        rf"\begin{{tabular}}{{{align}}}",
        r"\toprule",
        " & ".join(fmt(h) for h in header) + r" \\",
        r"\midrule",
    ]
    lines += [" & ".join(fmt(c) for c in row) + r" \\" for row in rows]
    lines += [r"\bottomrule", r"\end{tabular}"]
    return "\n".join(lines)


def table_env(
    body: str, caption: str, label: str, note: str | None = None
) -> str:
    """Wrap a tabular body in a centered `table` float with caption,
    label, and an optional footnote-sized note paragraph (the
    reference's table idiom, `_error_plot_helpers.py:757-807`)."""
    parts = [
        r"\begin{table}[!ht]",
        r"\begin{center}",
        r"\footnotesize",
        rf"\caption{{{escape_tex(caption)}}}",
        rf"\label{{{label}}}\vspace{{2mm}}",
        body,
        r"\end{center}",
    ]
    if note:
        parts += [
            r"\begin{flushleft}\footnotesize",
            escape_tex(note),
            r"\end{flushleft}",
        ]
    parts.append(r"\end{table}")
    return "\n".join(parts)


def removal_table(
    rows: Sequence[Mapping[str, object]],
    caption: str,
    label: str,
    *,
    stage_key: str = "stage",
    before_key: str = "rows_before",
    after_key: str = "rows_after",
    removed_key: str = "removed",
    frac_key: str | None = "removed_frac",
    pct_key: str | None = None,
    note: str | None = None,
) -> str:
    """The per-stage removal table (`filters_df_to_summary` →
    `make_filters_counts_table` in the reference): one row per filter
    stage with before/after/removed counts and the share removed.

    `rows` are mappings (e.g. `Row.asDict()` from the oracle-checked
    `r1_audit_report` / `r2_error_checks` / `t2_filter_report`
    frames); the key names parameterize over their column spellings.
    The share column reads `frac_key` as a 0..1 fraction, or
    `pct_key` as an already-scaled percent (t2's convention) — pass
    exactly one.
    """

    def _share(r: Mapping[str, object]) -> str:
        if pct_key is not None:
            v = r.get(pct_key)
            return "" if v is None else f"{float(v):.3f}" + r"\%"
        return _fmt_pct(r.get(frac_key))

    body_rows = [
        (
            escape_tex(r[stage_key]),
            _fmt_int(r[before_key]),
            _fmt_int(r[after_key]),
            _fmt_int(r[removed_key]),
            _share(r),
        )
        for r in rows
    ]
    body = tabular(
        ("Filter", "$N_{pre}$", "$N_{post}$", "Removed", r"\% of start"),
        body_rows,
        "lrrrr",
        escape=False,  # cells pre-escaped above; headers carry math
    )
    return table_env(body, caption, label, note)


def distressed_summary_table(
    total_rows: int,
    total_entities: int,
    flagged_rows: int,
    flagged_entities: int,
    flag_breakdown: Mapping[str, int] | None = None,
    caption: str = "Ultra Distressed Filter Summary",
    label: str = "tab:distressed_summary",
) -> str:
    """The stage-1 distressed report's summary table
    (`stage1/_distressed_plot_helpers.py:377-455`,
    build_distressed_summary_table): total vs flagged observation and
    entity counts with percentages, plus an optional per-flag-type
    breakdown block."""

    def _pct(n: int, d: int) -> str:
        return f"{(100 * n / d if d > 0 else 0):.2f}" + r"\%"

    lines = [
        r"\begin{tabular}{lr}",
        r"\midrule",
        r"Metric & Value \\",
        r"\midrule",
        rf"Total Observations & {_fmt_int(total_rows)} \\",
        rf"Total Entities & {_fmt_int(total_entities)} \\",
        r"\midrule",
        rf"Flagged Observations & {_fmt_int(flagged_rows)}"
        rf" ({_pct(flagged_rows, total_rows)}) \\",
        rf"Flagged Entities & {_fmt_int(flagged_entities)}"
        rf" ({_pct(flagged_entities, total_entities)}) \\",
    ]
    if flag_breakdown:
        lines += [
            r"\midrule",
            r"\multicolumn{2}{c}{\textbf{Breakdown by Flag Type}} \\",
            r"\midrule",
        ]
        lines += [
            rf"\texttt{{{escape_tex(col)}}} & {_fmt_int(cnt)}"
            rf" ({_pct(cnt, total_rows)}) \\"
            for col, cnt in flag_breakdown.items()
        ]
    lines += [r"\bottomrule", r"\end{tabular}"]
    return table_env(
        "\n".join(lines),
        caption,
        label,
        note=(
            "Impact of the stage-1 ultra-distressed screen: counts and "
            "shares of observations and entities flagged by any of the "
            "four anomaly detectors (ultra-low price, upward spike, "
            "plateau run, intraday inconsistency), with the per-flag "
            "breakdown. Flagged rows are exclusion candidates "
            "downstream."
        ),
    )


def concentration_table(
    stats_ig: Mapping[str, float],
    stats_nig: Mapping[str, float],
    stats_def: Mapping[str, float],
    min_date: str,
    max_date: str,
    caption: str = "Trading Concentration Metrics by Rating Category",
    label: str = "tab:concentration",
) -> str:
    """Table 8 (`stage1/helper_functions.py:3599-3661`,
    make_concentration_table): top-10%/25% volume shares and the bond
    share needed for 50%/90% of volume, one column per rating category.
    Stats dicts use the engine's fraction convention
    (`operators/analytics.py::concentration_metrics`); rendering scales
    to the reference's %.3f percents."""

    def _row(key: str) -> str:
        return " & ".join(
            f"{s[key] * 100:.3f}" for s in (stats_ig, stats_nig, stats_def)
        )

    lines = [
        r"\begin{tabular}{lrrr}",
        r"\midrule",
        r"Metric & Investment & Non-Investment & Defaulted \\",
        r"       & Grade (1-10) & Grade (11-21) & (22) \\",
        r"\midrule",
        r"\multicolumn{4}{l}{\textbf{Panel A: Volume Share of Top"
        r" Bonds (\%)}} \\",
        r"\midrule",
        rf"Top 10\% of bonds & {_row('top_10pct_share')} \\",
        rf"Top 25\% of bonds & {_row('top_25pct_share')} \\",
        r"\midrule",
        r"\multicolumn{4}{l}{\textbf{Panel B: Bonds Needed for Volume"
        r" Share (\% of bonds)}} \\",
        r"\midrule",
        rf"50\% of volume & {_row('frac_for_50pct')} \\",
        rf"90\% of volume & {_row('frac_for_90pct')} \\",
        r"\bottomrule",
        r"\end{tabular}",
    ]
    return table_env(
        "\n".join(lines),
        caption,
        label,
        note=(
            f"This table presents trading concentration metrics by "
            f"rating category for the period {min_date} to {max_date}. "
            "Panel A shows the share of total dollar volume captured by "
            "the top 10% and 25% most actively traded bonds; Panel B the "
            "share of bonds needed to account for 50% and 90% of total "
            "dollar volume (lower values indicate higher concentration)."
        ),
    )


def availability_table(
    panels: Mapping[str, Sequence[tuple[str, int, float]]],
    min_date: str,
    max_date: str,
    caption: str = "Data Availability by Rating Category",
    label: str = "tab:data_availability",
) -> str:
    """Table 3 (`stage1/helper_functions.py:3454-3596`,
    make_data_availability_table): per variable, the non-missing count
    and %-missing across the rating panels. `panels` maps panel title →
    [(variable, observations, pct_missing), ...] — every panel must
    list the same variables in the same order."""
    titles = list(panels)
    per_var: dict[str, list[tuple[int, float]]] = {}
    for rows in panels.values():
        for var, obs, pct in rows:
            per_var.setdefault(var, []).append((obs, pct))
    head1 = " & ".join(
        rf"\multicolumn{{2}}{{c}}{{\textbf{{{escape_tex(t)}}}}}"
        for t in titles
    )
    lines = [
        rf"\begin{{tabular}}{{l{'rr' * len(titles)}}}",
        r"\toprule",
        rf"& {head1} \\",
        "Variable "
        + " & Obs. & \\% Missing" * len(titles)
        + r" \\",
        r"\midrule",
    ]
    for var, cells in per_var.items():
        body = " & ".join(f"{o:,} & {p:.2f}" for o, p in cells)
        lines.append(rf"{escape_tex(var)} & {body} \\")
    lines += [r"\bottomrule", r"\end{tabular}"]
    return table_env(
        "\n".join(lines),
        caption,
        label,
        note=(
            "For each panel, the number of non-missing observations and "
            "the percentage of missing values per variable. The sample "
            f"spans {min_date} to {max_date}."
        ),
    )


def descriptive_stats_table(
    rows: Sequence[Mapping[str, object]],
    caption: str = "Daily Descriptive Statistics by Rating Category",
    label: str = "tab:descriptive",
    note: str | None = None,
) -> str:
    """Tables 4–7 (`stage1/helper_functions.py:3754-3835`,
    make_descriptive_stats_table_fixed): the pooled per-class stats
    block, one row per (rating class, variable) from the oracle-checked
    `r2_descriptive_by_rating` frame."""
    body_rows = [
        (
            escape_tex(r["rating_class"]),
            escape_tex(r["var"]),
            _fmt_int(r["n"]),
            f"{float(r['mean']):.4f}",
            f"{float(r['std']):.4f}",
            f"{float(r['q05']):.4f}",
            f"{float(r['q50']):.4f}",
            f"{float(r['q95']):.4f}",
        )
        for r in rows
    ]
    body = tabular(
        ("Class", "Variable", "N", "Mean", "SD", "P5", "Median", "P95"),
        body_rows,
        "llrrrrrr",
        escape=False,
    )
    return table_env(body, caption, label, note)


def fmt_param_value(v: object) -> str:
    """Parameter-cell rendering, matching the reference's
    `_fmt_scalar_value` (`stage0/_error_plot_helpers.py:938-960`)
    exactly: booleans as \texttt{On}/\texttt{Off}, ints plain,
    floats %.8g, tuples/lists as \texttt{(..)}/\texttt{[..]} with
    nested wrapping stripped, strings underscore-escaped in
    \texttt{} (r15 differential)."""
    import numpy as _np

    if isinstance(v, bool):
        return r"\texttt{On}" if v else r"\texttt{Off}"
    if isinstance(v, (int, _np.integer)):
        return f"{int(v)}"
    if isinstance(v, (float, _np.floating)):
        return f"{v:.8g}"
    if isinstance(v, (tuple, list)):
        inside = ", ".join(fmt_param_value(x) for x in v)
        inside = inside.replace(r"\texttt{", "").replace("}", "")
        return (
            r"\texttt{(" + inside + r")}"
            if isinstance(v, tuple)
            else r"\texttt{[" + inside + r"]}"
        )
    return r"\texttt{" + str(v).replace("_", r"\_") + "}"


def parameters_table(
    panels: Mapping[str, Sequence[tuple[str, object]]],
    caption: str = "Error-Correction Filters and Module Parameters",
    label: str = "tab:parameters",
    note: str | None = None,
) -> str:
    """The multi-panel parameter table (`make_parameters_table`,
    `_error_plot_helpers.py:722-830`): one two-column Parameter/Value
    block per panel, each introduced by a bold spanning panel title."""
    lines = [
        r"\begin{tabular}{lc}",
        r"\toprule",
        r"Parameter & Value \\",
    ]
    for title, pairs in panels.items():
        lines += [
            r"\midrule",
            rf"\multicolumn{{2}}{{c}}{{\textbf{{{escape_tex(title)}}}}} \\",
            r"\midrule",
        ]
        lines += [
            rf"\texttt{{{escape_tex(k)}}} & {fmt_param_value(v)} \\"
            for k, v in pairs
        ]
    lines += [r"\bottomrule", r"\end{tabular}"]
    return table_env("\n".join(lines), caption, label, note)


def data_report(
    tables: Sequence[str],
    figures: Sequence[str] = (),
    *,
    title: str = "Stage 0 TRACE Daily Data Report",
    abstract: str | None = None,
    author: str | None = None,
    date: str | None = None,
) -> str:
    """Assemble the full report document (`make_error_report`,
    `_error_plot_helpers.py:1077-1195`): preamble, optional abstract,
    the rendered tables, then one full-page figure per entry in
    `figures` (paths as emitted by `render.render_figures`). `date`
    is injected only when given — by default the artifact is
    bit-reproducible."""
    lines = [
        r"\documentclass[11pt]{article}",
        r"\usepackage{graphicx,booktabs,geometry}",
        r"\usepackage{amsmath}",
        r"\usepackage{hyperref}",
        r"\geometry{margin=1in}",
        rf"\title{{{escape_tex(title)}}}",
    ]
    if author:
        lines.append(rf"\author{{{escape_tex(author)}}}")
    if date:
        lines.append(rf"\date{{{escape_tex(date)}}}")
    lines += [r"\begin{document}", r"\maketitle"]
    if abstract:
        lines += [r"\begin{abstract}", escape_tex(abstract), r"\end{abstract}"]
    lines.append(r"\section{Filter Tables}")
    for t in tables:
        lines.append(t)
    if figures:
        lines += [r"\clearpage", r"\section{Flagged Price Series}"]
        for path in figures:
            lines += [
                r"\begin{figure}[h!]\centering",
                rf"\includegraphics[width=\textwidth,"
                rf"keepaspectratio]{{{path}}}",
                r"\end{figure}",
                r"\clearpage",
            ]
    lines.append(r"\end{document}")
    return "\n".join(lines)
