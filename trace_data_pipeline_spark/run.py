"""Pipeline runner — the Spark analog of the reference's
`run_pipeline.sh` orchestration (stage 0 extract/clean → daily panel →
stage 1 enrichment), as one Spark application instead of an SGE job
chain.

    python -m trace_data_pipeline_spark.run \
        --sf-dir /root/testdata/sf0.001 --out /tmp/out \
        --stages stage0 --format parquet

Each stage writes snappy parquet (or gzip csv) to `<out>/<name>/` and
prints an audit line per output. Where the reference chains three SGE
jobs with `-hold_jid` and spills temp chunks between them, the Spark
plan is one lazy DAG per stage — the scheduler overlaps everything a
single job chain would serialize.
"""

from __future__ import annotations

import argparse
import json
import time

from trace_data_pipeline_spark.operators.caching import release_caches
from trace_data_pipeline_spark.plans import get_catalog
from trace_data_pipeline_spark.session import get_spark

# stage -> ordered catalog entries (each independently oracle-checked)
STAGES: dict[str, list[str]] = {
    # stage 0: clean the corrupted tape end-to-end and emit the panel
    "stage0": ["w1_decimal_shift", "w2_bounce_back", "p1_stage0_full"],
    # stage 1: the end-to-end composite (FISD merge → as-of ratings →
    # screens → analytics → winsorize) + its Table-2 filter record
    "stage1": [
        "p2_stage1_full",
        "t2_filter_report",
        "r1_audit_report",
    ],
    # training-data pipeline over documents/embeddings
    "datapipe": [
        "d1_exact_dedup",
        "d4_minhash_lsh_pairs",
        "d7_text_stats",
        "d8_lang_id",
        "d13_ivf_topk",
        "d14_subword_counts",
        "d15_winnow_fingerprint",
    ],
}


def run_stage(
    spark,
    stage: str,
    sf_dir: str,
    out: str,
    fmt: str,
    report_opts: dict | None = None,
) -> list[dict]:
    if stage in ("report", "report_distressed", "report_quality"):
        # the three LaTeX documents: stage-0 audit report
        # (`_build_error_files.py`), stage-1 distressed diagnostic
        # (`_distressed_plot_helpers.py`), stage-1 quality report
        # (`helper_functions.py::build_latex_document`); pages render
        # via matplotlib when installed, else the built-in rasterizer
        from trace_data_pipeline_spark import reports

        opts = dict(report_opts or {})
        if stage == "report":
            writer_fn, sub = reports.write_audit_report, "report"
        else:
            # the error-panel type switch is audit-report-only
            opts.pop("figure_error_types", None)
            writer_fn = (
                reports.write_distressed_report
                if stage == "report_distressed"
                else reports.write_quality_report
            )
            sub = stage
        t0 = time.perf_counter()
        manifest = writer_fn(spark, sf_dir, f"{out}/{sub}", **opts)
        release_caches()
        return [
            {
                "stage": stage,
                "query": "data_report",
                "path": manifest["tex"],
                "n_pages": sum(
                    len(v)
                    for k, v in manifest.items()
                    if k.startswith("pages")
                ),
                "secs": round(time.perf_counter() - t0, 3),
            }
        ]
    catalog = get_catalog()
    results = []
    for name in STAGES[stage]:
        t0 = time.perf_counter()
        df = catalog[name].builder(spark, sf_dir)
        path = f"{out}/{stage}/{name}"
        writer = df.write.mode("overwrite")
        if fmt == "parquet":
            writer.option("compression", "snappy").parquet(path)
        else:
            writer.option("compression", "gzip").option("header", True).csv(path)
        # free any caches the entry persisted for multi-consumer reuse
        release_caches()
        results.append(
            {
                "stage": stage,
                "query": name,
                "path": path,
                "secs": round(time.perf_counter() - t0, 3),
            }
        )
    return results


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--stages",
        default="stage0,stage1,datapipe",
        help=(
            "comma list from: " + ",".join(STAGES)
            + ",report,report_distressed,report_quality"
        ),
    )
    ap.add_argument("--format", choices=["parquet", "csv"], default="parquet")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--figures",
        action="store_true",
        help="render PNG figure pages in the report stage",
    )
    ap.add_argument(
        "--figures-per-page",
        type=int,
        default=1,
        help="entities per report page (>1 tiles a 2-column grid)",
    )
    ap.add_argument(
        "--figure-error-types",
        default="decimal_shift",
        help=(
            "comma list of report panel types: decimal_shift,"
            "bounce_back,init_price"
        ),
    )
    args = ap.parse_args(argv)

    report_opts = {
        "figures": args.figures,
        "figures_per_page": args.figures_per_page,
        "figure_error_types": tuple(
            t.strip() for t in args.figure_error_types.split(",") if t.strip()
        ),
    }
    spark = get_spark(app_name="trace-pipeline-run", cpus=args.cpus)
    for stage in args.stages.split(","):
        for line in run_stage(
            spark,
            stage.strip(),
            args.sf_dir,
            args.out,
            args.format,
            report_opts=report_opts,
        ):
            print(json.dumps(line))


if __name__ == "__main__":
    main()
