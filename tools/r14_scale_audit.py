"""r14 linearity/boundedness audits — the standing 10×/100× replica
protocol applied to the round's new keys (r13 verdict's design-for-
scale discipline).

Per key, two signals:

- **wall ratio**: warm wall at N× replica vs at sf0.1 (fixture build
  excluded — each dir's scratch is materialized by a throwaway first
  run). Linear-or-better is the pass bar; the txn-log keys' planning
  is metadata-sized so their ratio should track data volume only.
- **structural invariants** counted from the committed artifacts
  (duckdb over the scratch parquet, no Spark needed):
  - conflict: commit count CONSTANT (5) at any scale — the CAS dance
    is per-commit metadata, data volume only changes file sizes;
  - schema evolution: the two ALTER commits add ZERO data rows at any
    scale (the O(1)-ALTER claim, counted not asserted);
  - cdf: feed rows scale EXACTLY linearly with the change set (the
    %20/%100/%30 fractions are scale-invariant) while carried rows
    emit nothing — feed_rows/table_rows constant;
  - tail: commit count (4) constant at any scale — steady-state
    batches are commit-aligned; a pre-built backlog drains in one
    file-parallel batch (per-file partitions carry the parallelism).

Usage: python tools/r14_scale_audit.py [--copies 10]
Prints one JSON line per audit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"

KEYS = [
    "sink_txn_log_conflict",
    "sink_txn_log_schema_evolution",
    "scan_txn_log_cdf",
    "stream_txn_log_tail",
    "ml_kmeans_converged",
    # wave 2
    "sink_txn_log_restore",
    "scan_txn_log_as_of_ts",
]


def _scratch_base(prefix: str, sf_dir: str) -> str:
    from etl_8x8_spark.sources.readers import scratch_dir
    from etl_8x8_spark.sources.scans import _src_tag

    return os.path.join(
        scratch_dir(), f"{prefix}_{_src_tag(sf_dir, 'orders')}"
    )


def _log_stats(base: str) -> dict:
    """Commit count + rows added per commit, from the artifacts."""
    import duckdb

    con = duckdb.connect()
    log_dir = os.path.join(base, "_log")
    n_commits = 0
    rows_per_commit = []
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json") or not name.split(".")[0].isdigit():
            continue
        n_commits += 1
        rec = json.load(open(os.path.join(log_dir, name)))
        n = 0
        for add in rec.get("adds", []):
            p = add["path"] if isinstance(add, dict) else add
            pat = os.path.join(base, p, "*.parquet")
            n += con.sql(
                f"SELECT COUNT(*) FROM read_parquet('{pat}')"
            ).fetchone()[0]
        rows_per_commit.append(n)
    return {"n_commits": n_commits, "rows_per_commit": rows_per_commit}


def _timed(qs, name, spark, sf_dir) -> float:
    t0 = time.time()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from etl_8x8_spark.session import get_spark
    from tools.scale_experiment import build_replica

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark(
        "r14audit",
        cpus="32",
        shuffle_partitions=min(max(32, 8 * args.copies), 256),
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    replica = build_replica(spark, args.copies)

    out: dict[str, dict] = {}
    for name in KEYS:
        res: dict = {}
        for label, sf in (("base", BASE_SF), (f"{args.copies}x", replica)):
            _timed(qs, name, spark, sf)  # fixture build + cold
            warm = min(_timed(qs, name, spark, sf) for _ in range(2))
            res[f"warm_{label}"] = warm
        res["wall_ratio"] = round(
            res[f"warm_{args.copies}x"] / max(res["warm_base"], 1e-9), 2
        )
        out[name] = res
        print(json.dumps({name: res}), flush=True)

    # structural invariants from the artifacts
    inv = {}
    for prefix, key in (
        ("txnconflict", "sink_txn_log_conflict"),
        ("txnschema", "sink_txn_log_schema_evolution"),
        ("txncdf", "scan_txn_log_cdf"),
        ("txntail", "stream_txn_log_tail"),
    ):
        inv[key] = {
            "base": _log_stats(_scratch_base(prefix, BASE_SF)),
            f"{args.copies}x": _log_stats(_scratch_base(prefix, replica)),
        }
    # cdf feed compression: feed rows / table rows at both scales
    import duckdb

    con = duckdb.connect()
    for label, sf in (("base", BASE_SF), (f"{args.copies}x", replica)):
        op = os.path.join(sf, "orders.parquet")
        if os.path.isdir(op):  # replica tables are Spark-written dirs
            op = os.path.join(op, "*.parquet")
        n_orders = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{op}')"
        ).fetchone()[0]
        feed = qs["scan_txn_log_cdf"](spark, sf).count()
        inv["scan_txn_log_cdf"][f"feed_fraction_{label}"] = round(
            feed / n_orders, 4
        )
    print(json.dumps({"invariants": inv}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
