"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB over the same parquet tables, then compares row count,
column names, and order-insensitive values (exact for ints/strings,
bit-exact for doubles — rounding differences are treated as FAILURES since
the driver value-hashes).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        errs.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return errs
    # The driver hashes NATIVE values: a DuckDB decimal128 (sum(int)) vs a
    # Spark bigint hash-mismatches even when numerically equal.  Flag any
    # pre-normalization dtype-kind drift as a failure so it's caught here.
    for c in sdf.columns:
        sk, ok_ = sdf[c].dtype.kind, odf[c].dtype.kind
        if sk != ok_ and {sk, ok_} != {"i", "u"}:
            errs.append(
                f"col {c}: native dtype drift (driver-hash hazard): "
                f"spark={sdf[c].dtype} oracle={odf[c].dtype} — cast the "
                f"oracle (e.g. CAST(sum(..) AS BIGINT)) to match"
            )
    if errs:
        return errs
    a, b = normalize(sdf), normalize(odf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            ok = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not ok.all():
                i = int(np.argmin(ok))
                errs.append(
                    f"col {c}: {int((~ok).sum())} mismatches, first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r} (diff={av[i]-bv[i]!r})"
                )
        else:
            ok = av == bv
            if not np.asarray(ok).all():
                i = int(np.argmin(ok))
                errs.append(
                    f"col {c}: {int((~np.asarray(ok)).sum())} mismatches, "
                    f"first at row {i}: spark={av[i]!r} oracle={bv[i]!r}"
                )
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from ionex_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[weak] {name}: rows={len(sdf)} (no oracle, rows-only)")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle error: {e}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        dt = time.time() - t0
        if errs:
            print(f"[FAIL] {name} ({dt:.1f}s, {len(sdf)} rows)")
            for e in errs[:5]:
                print(f"       {e}")
            n_fail += 1
        else:
            print(f"[ok]   {name} ({dt:.1f}s, {len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_weak} weak (rows-only), {n_fail} FAILED")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
