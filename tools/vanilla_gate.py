"""Foreign-session regression gate.

Runs registry queries on a VANILLA SparkSession — none of
session.py:get_spark's confs — the environment of any harness or user
application that embeds this library in a session it built itself (the
round driver is one such harness). 582 local tests run on the engine's
own session and therefore cannot catch a query that silently depends on
a builder conf; this gate can (the r7/r8 red row
`delta_pysource_pruned_batch` was exactly that: planning fails when
`spark.sql.python.filterPushdown.enabled` is left at its default).

Usage::

    python tools/vanilla_gate.py SF_DIR [N | name...]

Runs the first N names of ``DRIVER_PRIORITY`` (default: the driver's
50-row window), or the explicit names given. Prints one JSON line
``{"passed": [...], "failed": {name: error}}`` and exits non-zero on
any failure.

Only two settings are applied, both harness-environment not
engine-requirement: ``master`` (a vanilla session has no master at all)
and a throwaway ``spark.sql.warehouse.dir`` (so repeated runs don't
trip over leftover managed-table directories — the driver gets a fresh
workdir per round for the same reason).
"""
from __future__ import annotations

import json
import sys
import tempfile
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WINDOW = 50  # the driver verifies this many DRIVER_PRIORITY rows per round


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    rest = argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-gate")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="mm_vgate_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as entry
    from mergermetrics_lakehouse_pipeline_spark.registry import DRIVER_PRIORITY

    qs = entry.queries()
    if rest and not rest[0].isdigit():
        names = rest
    else:
        n = int(rest[0]) if rest else WINDOW
        names = DRIVER_PRIORITY[:n]

    passed: list[str] = []
    failed: dict[str, str] = {}
    for name in names:
        try:
            rows = qs[name](spark, sf_dir).collect()
            passed.append(name)
            print(f"ok   {name} ({len(rows)} rows)", file=sys.stderr)
        except Exception:
            failed[name] = traceback.format_exc().strip().splitlines()[-1]
            print(f"FAIL {name}: {failed[name]}", file=sys.stderr)
    print(json.dumps({"passed": passed, "failed": failed}))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
