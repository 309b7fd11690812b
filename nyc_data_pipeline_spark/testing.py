"""Local replica of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive).  Used by the pytest suite so oracle drift is caught
before the driver runs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from .catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by every sortable column."""
    df = df.reindex(sorted(df.columns), axis=1)
    sort_cols = [
        c
        for c in df.columns
        if df[c].dtype != object
        or df[c].map(lambda v: isinstance(v, (str, int, float, type(None)))).all()
    ]
    if sort_cols:
        df = df.sort_values(by=sort_cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, float_tol: float = 0.0
) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    errors: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        errors.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        errors.append(f"columns: spark={s_cols} oracle={o_cols}")
        return errors
    if errors:
        return errors
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    # The driver hashes the pandas-converted values, so an int64 Spark
    # column vs a float64 oracle column (DuckDB HUGEINT → float64, e.g.
    # SUM over integers) hash-mismatches even though 1981 == 1981.0.
    # Mirror that strictness here: integer-vs-float dtype kinds differ
    # is a failure on its own.
    for col in s.columns:
        sk, ok = s[col].dtype.kind, o[col].dtype.kind
        if (sk in "iu") != (ok in "iu") and {sk, ok} <= set("iuf"):
            errors.append(
                f"col {col!r} dtype family: spark={s[col].dtype} "
                f"oracle={o[col].dtype} (driver hash would diverge; "
                f"CAST the oracle aggregate, e.g. SUM→BIGINT)"
            )
    if errors:
        return errors
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
                same = (a is None or (isinstance(a, float) and math.isnan(a))) and (
                    b is None or (isinstance(b, float) and math.isnan(b))
                )
            elif isinstance(a, float) or isinstance(b, float):
                same = (a == b) or (
                    float_tol > 0 and abs(float(a) - float(b)) <= float_tol
                )
            elif isinstance(a, (list, tuple)) or hasattr(a, "tolist"):
                same = list(a) == list(b)
            else:
                same = a == b
            if not same:
                errors.append(
                    f"col {col!r} row {i}: spark={a!r} oracle={b!r}"
                )
                if len(errors) > 10:
                    return errors
    return errors


def check_query(spark, name: str, sf_dir: str, float_tol: float = 0.0) -> list[str]:
    """Run one registered query against its oracle; [] means match."""
    from . import registry

    registry.load_all()
    fn = registry.QUERIES[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    if name not in registry.ORACLE:
        # Rows-only queries still must produce something with a schema;
        # an empty frame would sail through the driver's weak check
        # while meaning the operator did nothing.
        if len(spark_pdf.columns) == 0:
            return ["no-oracle query returned no columns"]
        if len(spark_pdf) == 0:
            return ["no-oracle query returned 0 rows"]
        return []
    oracle_pdf = run_oracle(registry.ORACLE[name], sf_dir)
    return compare_frames(spark_pdf, oracle_pdf, float_tol=float_tol)
