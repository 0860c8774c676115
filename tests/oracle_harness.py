"""Local re-implementation of the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables; compare row count, column names, and order-insensitive
values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors = []
    s = _normalize(spark_df.toPandas())
    o = _normalize(oracle_df)
    if len(s) != len(o):
        errors.append(f"{name}: row count {len(s)} vs oracle {len(o)}")
    if list(s.columns) != list(o.columns):
        errors.append(f"{name}: columns {list(s.columns)} vs {list(o.columns)}")
        return errors
    if errors:
        return errors
    for c in s.columns:
        a, b = s[c], o[c]
        if pd.api.types.is_float_dtype(a):
            ok = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
        else:
            ok = (a == b) | (a.isna() & b.isna())
        if not ok.all():
            bad = (~ok).idxmax()
            errors.append(
                f"{name}: column {c!r} first mismatch at row {bad}: "
                f"{a.iloc[bad]!r} vs {b.iloc[bad]!r} ({int((~ok).sum())} rows differ)"
            )
    return errors


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: SPARK ERROR {type(e).__name__}: {e}"]
            continue
        if name not in oracles:
            try:
                n = sdf.count()
                results[name] = [] if n >= 0 else [f"{name}: no rows"]
                results[name + " (rows-only)"] = []
            except Exception as e:  # noqa: BLE001
                results[name] = [f"{name}: SPARK ERROR {type(e).__name__}: {e}"]
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: ORACLE ERROR {type(e).__name__}: {e}"]
            continue
        try:
            results[name] = compare(sdf, odf, name)
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: COMPARE ERROR {type(e).__name__}: {e}"]
    return results
