"""Table-level CHECK constraints (Delta ``ADD CONSTRAINT`` / DLT
expectations) for versioned tables.

Checks are named SQL boolean expressions stored in ``_CHECKS.json`` at
the TABLE root — deliberately not in any one version's manifest, because
a constraint must outlive every commit kind (content-changing commits
don't blind-carry snapshot extras, by design). The file is tiny and
updated via fsio's atomic publish.

Enforcement is writer-side, where Delta does it: every native writer
(``write_table``/``upsert``/``append_rows`` and the partitioned trio)
calls :func:`enforce_checks` on its incoming batch BEFORE writing
anything — one extra aggregate pass over the batch (a single job
counting all checks' violations at once), never a table scan. A
violation raises :class:`CheckViolation` naming each failing check and
its count; nothing is committed, the table is untouched. Callers who
prefer DLT's expectation flavors use :func:`validate` to split a batch
into (passing, violating) frames and decide — drop, quarantine, or fail
— before handing the clean side to a writer.

NULL semantics follow SQL CHECK: a row violates only when the predicate
is definitively FALSE (NULL passes) — enforce ``x IS NOT NULL``
explicitly when you mean it.

The ``spooky_versioned`` DataSource writer enforces CHECKs too —
EXECUTOR-SIDE, per Arrow batch, evaluated through DuckDB
(sources/versioned_source.py::_enforce_on_batch; the commit worker has no
Spark session to run a validation job, so enforcement rides the write
tasks and a violation aborts the two-phase commit with the table
untouched). That is why expressions must be ENGINE-PORTABLE SQL —
:func:`add_constraint` dry-runs each expression on BOTH engines against
an empty relation with the table schema and rejects non-portable ones at
registration time instead of failing every future DataSource write with
a binder error.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark import fsio

_CHECKS = "_CHECKS.json"


class CheckViolation(ValueError):
    """A write batch violated one or more table CHECK constraints."""


def _checks_path(table_dir: str) -> str:
    return fsio.join(table_dir, _CHECKS)


def list_constraints(table_dir: str) -> dict:
    p = _checks_path(table_dir)
    if not fsio.exists(p):
        return {}
    return json.loads(fsio.read_bytes(p))


def _dry_run_portability(table_dir: str, expr_sql: str) -> None:
    """Reject a non-engine-portable expression at ADD CONSTRAINT time:
    native writers evaluate checks via Spark SQL, the DataSource writer
    via DuckDB per Arrow batch — an expression only one engine can bind
    (backtick quoting, engine-only functions) would otherwise fail every
    future write on the other path with a binder error instead of a
    CheckViolation. Both engines dry-run against an EMPTY relation with
    the table's current schema (zero data IO); a table with no committed
    schema yet skips the dry-run (documented: the first write surfaces
    any mismatch)."""
    from spookystuff_spark.sources import upsert as U

    cur = U._latest(table_dir) if fsio.is_dir(table_dir) else None
    schema_json = U.snapshot_schema_json(table_dir, cur) if cur else None
    if not schema_json:
        return
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(schema_json))
    # DuckDB half (the DataSource writer's engine)
    import duckdb
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    empty = pa.Table.from_pylist([], schema=to_arrow_schema(schema))
    con = duckdb.connect()
    con.register("t", empty)
    try:
        con.execute(f"SELECT count(*) FROM t WHERE NOT coalesce(({expr_sql}), TRUE)")
    except Exception as ex:
        raise ValueError(
            f"{table_dir}: CHECK expression {expr_sql!r} is not portable — "
            f"DuckDB (the DataSource writer's executor-side engine) "
            f"rejects it: {ex}"
        ) from ex
    # Spark half (the native writers' engine) — bind against the schema
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            spark.createDataFrame([], schema).where(F.expr(expr_sql)).schema
        except Exception as ex:
            raise ValueError(
                f"{table_dir}: CHECK expression {expr_sql!r} is not "
                f"portable — Spark SQL rejects it: {ex}"
            ) from ex


def add_constraint(table_dir: str, name: str, expr_sql: str) -> None:
    """Register ``expr_sql`` (a boolean SQL expression over the table's
    columns) under ``name``. Applies to every FUTURE write; existing data
    is not rescanned (Delta's contract is to verify history on ADD — at
    100 TB that is a caller-initiated audit, run ``validate`` on
    ``read_table`` output if wanted). The expression is dry-run on BOTH
    evaluation engines first (:func:`_dry_run_portability`)."""
    _dry_run_portability(table_dir, expr_sql)
    checks = list_constraints(table_dir)
    checks[name] = expr_sql
    fsio.mkdirs(table_dir)
    fsio.write_bytes(
        _checks_path(table_dir), json.dumps(checks, indent=1).encode()
    )


def drop_constraint(table_dir: str, name: str) -> bool:
    checks = list_constraints(table_dir)
    if name not in checks:
        return False
    del checks[name]
    fsio.write_bytes(
        _checks_path(table_dir), json.dumps(checks, indent=1).encode()
    )
    return True


def _violation_flags(df: DataFrame, checks: dict) -> DataFrame:
    # SQL CHECK semantics: violation == predicate IS FALSE (NULL passes)
    return df.select(
        *[
            (~F.coalesce(F.expr(sql), F.lit(True))).cast("int").alias(f"_v_{i}")
            for i, sql in enumerate(checks.values())
        ]
    )


def enforce_checks(spark: SparkSession, table_dir: str, df: DataFrame) -> None:
    """Raise :class:`CheckViolation` when any registered check fails on
    ``df``. One aggregate job counting every check at once; no-op (zero
    jobs) when the table has no checks."""
    checks = list_constraints(table_dir)
    if not checks:
        return
    counts = _violation_flags(df, checks).agg(
        *[F.sum(f"_v_{i}").alias(f"_v_{i}") for i in range(len(checks))]
    ).first()
    bad = {
        name: int(counts[i] or 0)
        for i, name in enumerate(checks)
        if counts[i]
    }
    if bad:
        detail = ", ".join(f"{n} ({c} rows)" for n, c in sorted(bad.items()))
        raise CheckViolation(
            f"{table_dir}: write batch violates CHECK constraint(s): "
            f"{detail} — nothing was committed"
        )


def validate(
    spark: SparkSession, table_dir: str, df: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(passing, violating) split of ``df`` under the table's checks — the
    DLT expectation pattern: drop/quarantine the violating side, write the
    clean side. The violating frame carries a ``_failed_checks`` array
    column naming each failed constraint."""
    checks = list_constraints(table_dir)
    if not checks:
        return df, df.limit(0).withColumn(
            "_failed_checks", F.array().cast("array<string>")
        )
    failed = F.filter(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(sql), F.lit(True)), F.lit(name)
                ).otherwise(F.lit(None))
                for name, sql in checks.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    flagged = df.withColumn("_failed_checks", failed)
    ok = flagged.where(F.size("_failed_checks") == 0).drop("_failed_checks")
    bad = flagged.where(F.size("_failed_checks") > 0)
    return ok, bad


def quarantining_append(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    quarantine_dir: str,
    batch_tag: str | None = None,
):
    """The third DLT expectation flavor (fail = writer enforcement, drop =
    ``validate`` + discard, QUARANTINE = this): split the batch, append the
    passing side to the table, and land the violating side — with its
    ``_failed_checks`` diagnosis and an optional ``_batch_tag`` — in a
    versioned quarantine table of its own, so bad records are queryable,
    replayable after a fix, and vacuumable, never silently gone. Returns
    (n_ok, n_quarantined). The quarantine write happens FIRST: a crash
    between the two writes can duplicate quarantine rows (dedupable by
    tag) but can never lose a violating record."""
    import pyspark.sql.functions as F

    from spookystuff_spark.sources import upsert as U

    ok, bad = validate(spark, table_dir, df)
    bad = bad.withColumn(
        "_failed_checks", F.array_join("_failed_checks", ",")
    )
    if batch_tag is not None:
        bad = bad.withColumn("_batch_tag", F.lit(batch_tag))
    bad = bad.localCheckpoint(eager=True)  # split consumed twice, pin once
    ok = ok.localCheckpoint(eager=True)
    n_bad = bad.count()
    if n_bad:
        fsio.mkdirs(quarantine_dir)
        U.append_rows(spark, quarantine_dir, bad, change_feed=False)
    n_ok = ok.count()
    if n_ok:
        U.append_rows(spark, table_dir, ok)
    return n_ok, n_bad
