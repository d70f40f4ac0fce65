"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same
parquet tables and compares row count, column names/dtypes and values
(order-insensitive, float-tolerant). Strictly *harsher* than a value
hash on dtypes so that passing here means passing the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = (
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
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
    sort_keys = [
        np.round(df[c], 7) if pd.api.types.is_float_dtype(df[c]) else df[c] for c in df.columns
    ]
    order = np.lexsort([k.to_numpy() for k in reversed(sort_keys)])
    return df.iloc[order].reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str, float_rtol: float = 1e-9) -> None:
    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spdf) == len(oracle_pdf), f"{name}: rows spark={len(spdf)} oracle={len(oracle_pdf)}"
    a, b = canonicalize(spdf), canonicalize(oracle_pdf)
    for c in a.columns:
        assert str(a[c].dtype) == str(b[c].dtype), (
            f"{name}.{c}: dtype spark={a[c].dtype} oracle={b[c].dtype}"
        )
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            nan_match = np.isnan(av) == np.isnan(bv)
            ok = nan_match & (np.isnan(av) | np.isclose(av, bv, rtol=float_rtol, atol=1e-9))
            assert ok.all(), (
                f"{name}.{c}: value mismatch at rows {np.where(~ok)[0][:5]}: "
                f"spark={av[~ok][:5]} oracle={bv[~ok][:5]}"
            )
        else:
            mism = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
            assert not mism.any(), (
                f"{name}.{c}: value mismatch at rows {np.where(mism)[0][:5]}: "
                f"spark={a[c][mism].head().tolist()} oracle={b[c][mism].head().tolist()}"
            )
