"""Dump explain("formatted") for named queries to plans/r16/.

Usage: python tools/r16_dump_plans.py --suffix before name [name ...]
Optionally override one session conf for the dump session:
    --conf spark.sql.join.preferSortMergeJoin=true
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    from etl_8x8_spark.session import get_spark

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(
        "r16_plans",
        cpus=args.cpus,
        shuffle_partitions=int(args.cpus),
        extra_conf=extra,
    )
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        try:
            df = qs[name](spark, args.sf)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok" if not txt.startswith("ERROR") else txt[:120])
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
