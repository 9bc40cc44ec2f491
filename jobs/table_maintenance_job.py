"""Table maintenance: small-file compaction + sorted layout, via
spark-submit, over a SnapshotTable.

    python tools/make_pyfiles.py            # builds dist/ionex_spark.zip
    spark-submit --master local[32] \
        --py-files dist/ionex_spark.zip \
        jobs/table_maintenance_job.py \
        --table /path/to/tbl --target-files 16 --sort-by zkey

The maintenance a 100 TB snapshot table accumulates a need for:
streaming and chunked jobs commit many small parquet files per
snapshot; this job rewrites the CURRENT snapshot into ``--target-files``
files (optionally range-partitioned + sorted by ``--sort-by``, e.g. the
Z-order layout key from plans/layout.py, so each output file covers a
tight key range and parquet footer stats prune scans — the measured
2.07x ROI-scan win in BENCH.md).  Data is bit-identical (the rewrite
carries a row-count guard); every pre-compaction snapshot remains
time-travelable because data files are never deleted.

Re-running is naturally idempotent at the snapshot level: each run
commits one new snapshot whose summary records the maintenance
parameters; a crashed run leaves only an orphan stage directory (never
a half-visible snapshot — manifest commit is atomic).

Prints one JSON line: files before/after, rows, snapshot ids, seconds.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="SnapshotTable root")
    ap.add_argument("--target-files", type=int, default=16)
    ap.add_argument(
        "--sort-by",
        default=None,
        help="comma-separated sort columns (e.g. a Z-order key) for a"
        " range-partitioned, footer-prunable layout",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ionex_spark.session import get_spark
    from ionex_spark.sources.tableio import SnapshotTable

    spark = get_spark("table-maintenance", master=args.master)
    t = SnapshotTable(args.table)
    pre = t.current_snapshot()
    if pre is None:
        raise SystemExit(f"{args.table} has no snapshots")
    sort_by = args.sort_by.split(",") if args.sort_by else None
    t0 = time.time()
    sid = t.rewrite_data_files(
        spark,
        target_files=args.target_files,
        sort_by=sort_by,
        summary={
            "job": "table-maintenance",
            "target_files": args.target_files,
            "sort_by": args.sort_by or "",
        },
    )
    post = t.current_snapshot()
    # the rewrite's pre-commit guard already counted the rows; reuse it
    # instead of a third full-table scan
    rows = post["summary"]["rows"]
    print(
        json.dumps(
            {
                "table": args.table,
                "files_before": len(pre["files"]),
                "files_after": len(post["files"]),
                "rows": rows,
                "snapshot_before": pre["snapshot_id"],
                "snapshot_after": sid,
                "sort_by": args.sort_by or None,
                "seconds": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
