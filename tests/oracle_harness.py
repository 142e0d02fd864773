"""Local replica of the driver's DuckDB-oracle compare (row count + sorted-by-
column-name value hash), so query parity is verified before the driver runs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from spookystuff_spark.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(round(v, 6))
            elif v is None or v is pd.NaT:
                canon_row.append(None)
            else:
                canon_row.append(str(v))
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(oracle_pdf.columns)}"
    )
    assert len(got) == len(oracle_pdf), (
        f"{name}: row count {len(got)} != {len(oracle_pdf)}"
    )
    got_rows, exp_rows = _canon(got), _canon(oracle_pdf)
    mismatches = [
        (g, e) for g, e in zip(got_rows, exp_rows) if g != e
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
