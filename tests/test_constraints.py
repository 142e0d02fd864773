"""Table CHECK constraints (sources/constraints.py): writer-side
enforcement across all six native writers, SQL NULL semantics, the
validate() expectation split, and constraint lifecycle."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.constraints import (
    CheckViolation,
    add_constraint,
    drop_constraint,
    list_constraints,
    validate,
)
from spookystuff_spark.sources.partitioned_table import (
    append_partitioned,
    upsert_partitioned,
    write_table_partitioned,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "k long, region string, val long")


GOOD = [(1, "eu", 10), (2, "us", 20)]
BAD = [(3, "eu", -5), (4, None, 40)]


@pytest.fixture
def tdir(spark, tmp_path):
    d = str(tmp_path / "ctbl")
    U.write_table(_rows(spark, GOOD), d)
    add_constraint(d, "val_nonneg", "val >= 0")
    add_constraint(d, "region_set", "region IN ('eu', 'us', 'ap')")
    return d


def test_every_writer_enforces(spark, tmp_path, tdir):
    bad = _rows(spark, BAD[:1])
    with pytest.raises(CheckViolation, match="val_nonneg \\(1 rows\\)"):
        U.append_rows(spark, tdir, bad)
    with pytest.raises(CheckViolation):
        U.upsert(spark, tdir, bad, ["k"])
    with pytest.raises(CheckViolation):
        U.write_table(bad, tdir)
    # table untouched by all three refusals
    assert U.read_table(spark, tdir).count() == 2

    pdir = str(tmp_path / "ptbl")
    write_table_partitioned(_rows(spark, GOOD), pdir, "region")
    add_constraint(pdir, "val_nonneg", "val >= 0")
    with pytest.raises(CheckViolation):
        write_table_partitioned(bad, pdir, "region")
    with pytest.raises(CheckViolation):
        upsert_partitioned(spark, pdir, bad, ["k"], "region")
    with pytest.raises(CheckViolation):
        append_partitioned(spark, pdir, bad, "region")
    assert U.read_table(spark, pdir).count() == 2


def test_null_passes_unless_explicit(spark, tdir):
    # region IN (...) is NULL for a NULL region → passes (SQL CHECK)
    U.append_rows(spark, tdir, _rows(spark, [(5, None, 1)]))
    assert U.read_table(spark, tdir).count() == 3
    add_constraint(tdir, "region_notnull", "region IS NOT NULL")
    with pytest.raises(CheckViolation, match="region_notnull"):
        U.append_rows(spark, tdir, _rows(spark, [(6, None, 1)]))


def test_validate_split_and_lifecycle(spark, tdir):
    ok, bad = validate(spark, tdir, _rows(spark, GOOD + [(7, "xx", -1)]))
    assert ok.count() == 2
    b = bad.collect()
    assert len(b) == 1 and sorted(b[0]["_failed_checks"]) == [
        "region_set", "val_nonneg",
    ]
    assert drop_constraint(tdir, "region_set")
    assert not drop_constraint(tdir, "region_set")
    assert set(list_constraints(tdir)) == {"val_nonneg"}
    ok2, _ = validate(spark, tdir, _rows(spark, [(7, "xx", 1)]))
    assert ok2.count() == 1  # region check gone
    # good writes still flow
    U.append_rows(spark, tdir, _rows(spark, [(8, "ap", 0)]))


def test_quarantining_append(spark, tmp_path, tdir):
    from spookystuff_spark.sources.constraints import quarantining_append

    qdir = str(tmp_path / "quarantine")
    n_ok, n_bad = quarantining_append(
        spark, tdir, _rows(spark, GOOD[:1] + [(7, "xx", -1), (8, "ap", 5)]),
        qdir, batch_tag="b1",
    )
    assert (n_ok, n_bad) == (2, 1)
    assert U.read_table(spark, tdir).count() == 4  # 2 seed + 2 appended
    q = U.read_table(spark, qdir).collect()
    assert len(q) == 1 and q[0]["_batch_tag"] == "b1"
    assert sorted(q[0]["_failed_checks"].split(",")) == [
        "region_set", "val_nonneg",
    ]
    # clean batch: quarantine untouched
    n_ok2, n_bad2 = quarantining_append(
        spark, tdir, _rows(spark, [(9, "eu", 1)]), qdir, batch_tag="b2"
    )
    assert (n_ok2, n_bad2) == (1, 0)
    assert U.read_table(spark, qdir).count() == 1


def test_datasource_writer_enforces(spark, tdir):
    """The spooky_versioned two-phase writer validates its staged batch
    before the commit becomes visible — no enforce-upstream gap."""
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    bad = _rows(spark, [(3, "eu", -5)])
    with pytest.raises(Exception, match="val_nonneg"):
        bad.write.format("spooky_versioned").option("path", tdir).mode(
            "append"
        ).save()
    assert U.read_table(spark, tdir).count() == 2  # untouched
    _rows(spark, [(5, "ap", 5)]).write.format("spooky_versioned").option(
        "path", tdir
    ).mode("append").save()
    assert U.read_table(spark, tdir).count() == 3


def test_add_constraint_rejects_non_portable_expression(spark, tmp_path):
    """r6-ADVICE: checks run on BOTH engines (Spark SQL natively, DuckDB in
    the DataSource write tasks) — a one-engine expression must be rejected
    at ADD CONSTRAINT time, not at first write with a binder error."""
    import pytest

    from spookystuff_spark.sources import upsert as U
    from spookystuff_spark.sources.constraints import (
        add_constraint,
        list_constraints,
    )

    tdir = str(tmp_path / "ptab")
    U.write_table(
        spark.createDataFrame([(1, 10.0)], "k long, v double"), tdir,
        change_feed=False,
    )
    # portable ANSI expression: accepted
    add_constraint(tdir, "v_pos", "v > 0")
    assert "v_pos" in list_constraints(tdir)
    # Spark-only function: DuckDB can't bind it -> rejected with the reason
    with pytest.raises(ValueError, match="not portable"):
        add_constraint(tdir, "bad", "xxhash64(CAST(k AS STRING)) > 0")
    assert "bad" not in list_constraints(tdir)
    # unknown column: both engines refuse -> rejected at ADD time
    with pytest.raises(ValueError, match="not portable"):
        add_constraint(tdir, "bad2", "no_such_col > 0")
    # a table with no schema yet skips the dry-run (first write surfaces it)
    fresh = str(tmp_path / "fresh")
    add_constraint(fresh, "early", "v > 0")
    assert "early" in list_constraints(fresh)
