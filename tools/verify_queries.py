"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
in DuckDB against the same sf dir, then compares row count, sorted
column names, and order-insensitive values (exact first, 1e-9 relative
tolerance as a diagnostic fallback so near-misses are visible).

Usage:
    python tools/verify_queries.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(_canon_cell)
    if len(df) == 0 or len(df.columns) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str).apply(lambda r: "\x1f".join(r.values), axis=1)
    return df.iloc[key.argsort(kind="mergesort").values].reset_index(drop=True)


def _driver_canon_lint(df: pd.DataFrame) -> str | None:
    """Replica of the driver's canonicalizer constraint: the driver
    pandas-``sort_values``/hashes RAW cells with no list-stringify
    fallback, so any list/ndarray/dict cell kills the key with
    ``TypeError: unhashable type`` (the embed_jl_project r12 failure).
    Returns the offending column name, or None if all cells are
    driver-safe scalars."""
    for c in df.columns:
        s = df[c]
        if s.dtype != object:
            continue
        for v in s.head(200):
            if isinstance(v, (list, np.ndarray, dict, tuple, set)):
                return c
    return None


def _canon_cell(v):
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(str(_canon_cell(x)) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return v


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, bool, str]:
    """(exact, approx, first-diff description)."""
    exact, approx, detail = True, True, ""
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            both_nan = pd.isna(av.astype(float)) & pd.isna(bv.astype(float))
            eq = (av == bv) | both_nan
            if not eq.all():
                exact = False
                close = np.isclose(
                    av.astype(float), bv.astype(float), rtol=1e-9, equal_nan=True
                )
                if not close.all():
                    approx = False
                i = int(np.argmin(eq))
                detail = detail or f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}"
        else:
            av_s, bv_s = a[c].astype(str), b[c].astype(str)
            eq = (av_s == bv_s).values
            if not eq.all():
                exact = approx = False
                i = int(np.argmin(eq))
                detail = detail or f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}"
    return exact, approx, detail


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    res: dict = {"rows": (len(sdf), len(odf))}
    res["rowcount_ok"] = len(sdf) == len(odf)
    res["cols_ok"] = sorted(sdf.columns) == sorted(odf.columns)
    if not res["cols_ok"]:
        res["detail"] = f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        return res
    if not res["rowcount_ok"]:
        res["detail"] = ""
        return res
    a, b = _canon(sdf), _canon(odf)
    res["exact"], res["approx"], res["detail"] = _values_equal(a, b)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("VERIFY_SF", "/root/testdata/sf0.001"))
    ap.add_argument("--cpus", default="8")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from etl_8x8_spark.session import get_spark

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or sorted(qs)

    spark = get_spark("verify_queries", cpus=args.cpus, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if name not in qs:
            print(f"{name:32s} UNKNOWN")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} SPARK-ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        finally:
            # release persist barriers (dedup/similarity) so cached
            # blocks don't accumulate across the 124-query session
            spark.catalog.clearCache()
        bad_col = _driver_canon_lint(sdf)
        if bad_col is not None:
            print(
                f"{name:32s} NON-SCALAR col={bad_col} — driver canonicalizer "
                f"would die (unhashable cell); emit scalars only"
            )
            n_fail += 1
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only rows={len(sdf)} ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ORACLE-ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        r = compare(sdf, odf)
        ok = r.get("exact", False)
        status = "PASS" if ok else ("APPROX" if r.get("approx") else "FAIL")
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(
            f"{name:32s} {status} rows={r['rows']} ({time.time()-t0:.1f}s)"
            + (f"  {r.get('detail','')}" if not ok else "")
        )
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
