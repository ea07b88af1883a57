"""r12 linearity/boundedness audits (r11 verdict items 1 and 3).

1. ``cdc_stream_apply`` after the txn-log rebase: the operator now
   stores the table as merge-key buckets (o_orderkey % 77) under an
   ordered commit log, so the audit can measure the REAL artifact: for
   every commit record, the rows written (adds) and the rows retired
   (removes), plus how many buckets the batch touched. The r11 weak
   hold was "per-micro-batch rewrite is TABLE-sized"; the pass
   criterion here is that the seq-2 update batch rewrites ~11/77 and
   the seq-3 delete batch ~7/77 of the table (their planted residues
   7·3 and 11 concentrate into those buckets), and that those
   fractions are CONSTANT across a data scale-up — rewrite volume is
   bounded by touched partitions, not table size.

2. ``window_theil_sen`` after the histogram-prune rework: wall ratio
   at N× via tools/scale_experiment.py is reported separately (r12:
   1.5x at 100x); here we pin the structural invariant — the pairwise
   relation is calendar-bounded, so n_pairs at N× data must equal
   n_pairs at 1× (same day span ⇒ same pair count).

Usage: python tools/r12_scale_audit.py [--copies 10]
Prints one JSON line per audit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"


def _commit_stats(base: str) -> list[dict]:
    """Fold the committed log and count rows per version from the
    actual parquet files (duckdb — no Spark session needed)."""
    import duckdb

    log_dir = os.path.join(base, "_log")
    data = os.path.join(base, "data")
    con = duckdb.connect()

    def nrows(rel: str) -> int:
        pat = os.path.join(data, rel, "*.parquet")
        return con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{pat}')"
        ).fetchone()[0]

    out = []
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json"):
            continue
        rec = json.load(open(os.path.join(log_dir, name)))
        out.append(
            {
                "version": int(name.split(".")[0]),
                "rows_written": sum(nrows(p) for p in rec["adds"]),
                "rows_retired": sum(nrows(p) for p in rec["removes"]),
                "buckets_touched": len(
                    {p.split("b=")[-1] for p in rec["adds"] + rec["removes"]}
                ),
            }
        )
    return out


def cdc_audit(spark, sf_dir: str, label: str) -> dict:
    from etl_8x8_spark.operators.cdc import _CDC_NB
    from etl_8x8_spark.registry import all_queries
    from etl_8x8_spark.sources.readers import scratch_dir

    q = all_queries()["cdc_stream_apply"]
    final_rows = q.builder(spark, sf_dir).count()
    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    base = os.path.join(scratch_dir(), f"cdc_stream_{sf_tag}")
    commits = _commit_stats(base)
    table_rows = commits[0]["rows_written"]
    return {
        "label": label,
        "nb": _CDC_NB,
        "table_rows": table_rows,
        "final_rows": final_rows,
        "commits": commits,
        "rewrite_frac_per_batch": [
            round(c["rows_written"] / table_rows, 4) for c in commits[1:]
        ],
        "buckets_frac_per_batch": [
            round(c["buckets_touched"] / _CDC_NB, 4) for c in commits[1:]
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from etl_8x8_spark.session import get_spark
    from tools.scale_experiment import build_replica

    spark = get_spark(
        "r12_audit", cpus="32",
        shuffle_partitions=min(max(32, 8 * args.copies), 256),
    )
    base = cdc_audit(spark, BASE_SF, "1x")
    print(json.dumps({"audit": "cdc_stream_apply", **base}))
    replica = build_replica(spark, args.copies)
    scaled = cdc_audit(spark, replica, f"{args.copies}x")
    print(json.dumps({"audit": "cdc_stream_apply", **scaled}))
    print(
        json.dumps(
            {
                "audit": "cdc_rewrite_boundedness",
                "copies": args.copies,
                "rewrite_frac_1x": base["rewrite_frac_per_batch"],
                "rewrite_frac_Nx": scaled["rewrite_frac_per_batch"],
                "table_ratio": round(
                    scaled["table_rows"] / base["table_rows"], 2
                ),
            }
        )
    )

    # theil_sen structural invariant: calendar-bounded pair count
    from etl_8x8_spark.registry import all_queries

    q = all_queries()["window_theil_sen"]
    p1 = q.builder(spark, BASE_SF).collect()[0]
    pN = q.builder(spark, replica).collect()[0]
    print(
        json.dumps(
            {
                "audit": "theil_sen_pairs_bounded",
                "copies": args.copies,
                "n_pairs_1x": p1["n_pairs"],
                "n_pairs_Nx": pN["n_pairs"],
                "n_days_1x": p1["n_days"],
                "n_days_Nx": pN["n_days"],
            }
        )
    )


if __name__ == "__main__":
    main()
