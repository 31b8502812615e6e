"""Audit-report rendering — the reference's LaTeX report layer
(`stage0/_error_plot_helpers.py:694-1200`, `_build_error_files.py:407+`)
re-expressed over the engine's oracle-checked report frames.

Split deliberately in two:

- `latex` — pure string builders (escaping, tabular/table envs, the
  removal and parameters tables, the full data-report document). No
  Spark, no I/O; unit-tested against golden structure.
- `render` — the thin driver-side sink that collects the BOUNDED
  report aggregates (a removal table is a handful of rows; the bound
  is enforced, not assumed), writes `.tex`, exports the per-entity
  figure DATA that `r4_flagged_series` computes distributedly, and
  renders PNG figures: matplotlib when importable (the reference's
  backend), otherwise `rasterize` — a pure-numpy panel renderer over
  the repo's own PNG codec — so pages exist in this container too.

Two documents: `write_audit_report` (the stage-0 error report) and
`write_distressed_report` (the stage-1 distressed diagnostic —
`stage1/_distressed_plot_helpers.py` + `stage1_pipeline.py:1631-1716`
— over the W7 flags via the oracle-checked `r5_distressed_series`).
"""

from trace_data_pipeline_spark.reports.latex import (  # noqa: F401
    availability_table,
    concentration_table,
    data_report,
    descriptive_stats_table,
    distressed_summary_table,
    escape_tex,
    parameters_table,
    removal_table,
    tabular,
)
from trace_data_pipeline_spark.reports.render import (  # noqa: F401
    collect_report_rows,
    render_figures,
    write_audit_report,
    write_distressed_report,
    write_quality_report,
)
