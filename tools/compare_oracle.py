"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in ``__spark_entry__`` on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values.

Usage:  python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        errs.append(f"columns spark={sc} duck={dc}")
        return errs
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) != len(b):
        return errs
    for c in a.columns:
        # The driver hashes TYPED values, so an int64 Spark column vs a
        # float64 oracle column ("43200" vs "43200.0") is a red row even
        # when every value is numerically equal (the twa_1h_cascade r03
        # lesson: DuckDB sum(BIGINT) -> HUGEINT -> float64 in .df()).
        # Surface dtype-kind drift as a hard failure here so it never
        # reaches a driver window.
        if a[c].dtype.kind != b[c].dtype.kind:
            errs.append(
                f"dtype kind mismatch in column {c}: "
                f"spark={a[c].dtype} duck={b[c].dtype}"
            )
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            ok = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
        else:
            ok = (pd.isna(av) == pd.isna(bv)).all() and (
                (av == bv) | pd.isna(av)
            ).all()
        if not ok:
            bad = np.where(
                ~np.isclose(av.astype(float), bv.astype(float), equal_nan=True)
                if av.dtype.kind in "fiu"
                else av != bv
            )[0][:3] if av.dtype.kind in "fiu" else None
            detail = ""
            if bad is not None and len(bad):
                i = bad[0]
                detail = f" e.g. row {i}: spark={av[i]!r} duck={bv[i]!r}"
            errs.append(f"values differ in column {c}{detail}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from influxer_spark.session import get_spark

    spark = get_spark("compare_oracle")
    con = duck_con(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            failed.append(name)
            continue
        if sql is None:
            print(f"ok   {name}: rows={len(sdf)} (rows-only, no oracle)")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {exc}")
            failed.append(name)
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            failed.append(name)
        else:
            print(f"ok   {name}: rows={len(sdf)}")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
