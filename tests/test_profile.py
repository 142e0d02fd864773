"""Column profiler (operators/profile.py): closed-form metrics on a
hand-built frame with nulls, and DuckDB parity on a real table."""

from __future__ import annotations

import duckdb

from spookystuff_spark.operators.profile import profile_sql, profile_table


def test_closed_form_metrics(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (2, "bbbb"), (None, "aa")],
        "x long, s string",
    )
    got = {
        (r["column"], r["metric"]): r["v_num"]
        for r in profile_table(df, ["x", "s"]).collect()
    }
    assert got[("x", "n_rows")] == 4 and got[("x", "n_null")] == 1
    assert got[("x", "n_distinct")] == 2
    assert got[("x", "min")] == 1.0 and got[("x", "max")] == 2.0
    assert got[("x", "mean")] == round(5 / 3 + 1e-6, 4)
    assert got[("s", "n_null")] == 1 and got[("s", "n_distinct")] == 2
    assert got[("s", "min")] == 2.0 and got[("s", "max")] == 4.0  # lengths


def test_matches_duckdb_on_orders(spark):
    from spookystuff_spark.tables import table

    sf = "/root/testdata/sf0.001"
    cols = [("o_orderkey", "numeric"), ("o_totalprice", "numeric"),
            ("o_orderpriority", "string")]
    got = {
        (r["column"], r["metric"]): r["v_num"]
        for r in profile_table(
            table(spark, sf, "orders"), [c for c, _ in cols]
        ).collect()
    }
    want = {
        (r[0], r[1]): r[2]
        for r in duckdb.connect()
        .execute(
            profile_sql(
                f"SELECT * FROM read_parquet('{sf}/orders.parquet')", cols
            )
        )
        .fetchall()
    }
    assert got == want and len(got) == 18
