"""Full local replica of the driver's sf0.01 correctness gate: runs every
``queries()`` entry AND its ``oracle_sql()`` DuckDB twin, compares row count /
schema / canonical value hash, prints one status line per query and a summary.

Usage: ``timeout 900 python tools/oracle_sweep.py [sf_dir]``
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from tests.oracle_harness import compare, duck_con

    qs, osql = e.queries(), e.oracle_sql()
    con = duck_con(sf)
    failed = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf)
            if name in osql:
                compare(df, con.execute(osql[name]).fetchdf(), name)
                status = "ok"
            else:
                n = df.count()
                status = f"rows-only({n})"
        except Exception as ex:  # noqa: BLE001 - sweep must report, not die
            status = f"FAIL {type(ex).__name__}: {str(ex)[:200]}"
            failed.append(name)
        print(f"{name:40s} {time.time() - t0:6.2f}s  {status}", flush=True)
    print(f"\n{len(qs) - len(failed)}/{len(qs)} green; failed: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
