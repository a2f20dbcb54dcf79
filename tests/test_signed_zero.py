"""Signed-zero (-0.0) regression guard (VERDICT r4 §What's-wrong #1).

Spark's ``F.round`` (BigDecimal) returns ``+0.0`` for a tiny negative
that rounds to zero; DuckDB's ``ROUND`` keeps IEEE ``-0.0``.  The two
compare equal but hash/repr differently, so the driver's value-hash
gate flags a mismatch on numerically identical results (the r4
``dsir_importance_weights`` red row).  The fix is boundary
normalization in BOTH engines (``functions/numeric.nz`` /
``nz_sql``) — these tests pin the helper on planted tiny negatives and
sweep the whole oracle fleet for any -0.0 emission at the driver's
comparison scale (a -0.0 in DuckDB output means that column skipped
``nz_sql`` and WILL diverge the moment Spark rounds the same value).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mknssh_11_bigdata_spark.functions.numeric import nz, nz_sql
from mknssh_11_bigdata_spark.queries import QUERIES
from mknssh_11_bigdata_spark.sources.readers import TESTDATA_TABLES

from conftest import SF_ORACLE, SF_SMOKE


def _is_negzero(v) -> bool:
    if isinstance(v, float):
        return v == 0.0 and math.copysign(1.0, v) < 0
    if isinstance(v, (list, tuple)):
        return any(_is_negzero(x) for x in v)
    return False


def test_nz_normalizes_planted_tiny_negative(spark):
    """The planted case behind the r4 red row: an exact integer ledger
    sums to a tiny negative, one division + ROUND lands on zero.  With
    nz/nz_sql both engines must return +0.0; without, DuckDB returns
    -0.0 (asserted too, so this test fails loudly if either engine's
    rounding semantics ever change under us)."""
    from pyspark.sql import functions as F

    # Spark: F.round already normalizes; nz must keep that.
    row = (
        spark.range(1)
        .select(nz(F.round(F.lit(-3e-7), 4)).alias("v"))
        .collect()[0]
    )
    assert row.v == 0.0 and math.copysign(1.0, row.v) > 0

    con = duckdb.connect()
    raw = con.execute("SELECT ROUND(-3e-7, 4) AS v").fetchone()[0]
    assert _is_negzero(raw), "DuckDB ROUND stopped emitting -0.0?"
    fixed = con.execute(
        f"SELECT {nz_sql('ROUND(-3e-7, 4)')} AS v"
    ).fetchone()[0]
    assert fixed == 0.0 and not _is_negzero(fixed)
    con.close()


def test_nz_is_identity_off_zero(spark):
    """nz must be the exact identity for every non-(-0.0) double —
    including values far below the round scale and negatives."""
    from pyspark.sql import functions as F

    vals = [1.5, -1.5, 1e-300, -1e-300, 0.0, 123456.789, -0.25]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v double")
        .select(nz(F.col("v")).alias("v"))
        .collect()
    )
    assert [r.v for r in rows] == vals
    con = duckdb.connect()
    for v in vals:
        out = con.execute(
            f"SELECT {nz_sql(f'CAST({v!r} AS DOUBLE)')}"
        ).fetchone()[0]
        assert out == v and math.copysign(1.0, out) == math.copysign(1.0, v)
    con.close()


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_no_negative_zero_in_any_oracle_output(sf_dir):
    """Fleet sweep: no registered oracle may emit -0.0 at the driver's
    comparison scales.  DuckDB-only (fast); the spark-vs-duck parity
    suite covers value equality, and its canon is now sign-sensitive,
    so this is the early tripwire for a column that missed nz_sql."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = []
    for name, spec in sorted(QUERIES.items()):
        if spec.oracle is None:
            continue
        rows = con.execute(spec.oracle).fetchall()
        if any(_is_negzero(v) for r in rows for v in r):
            offenders.append(name)
    con.close()
    assert not offenders, (
        f"-0.0 in DuckDB oracle output at {sf_dir}: {offenders} — wrap "
        "the rounded column in nz()/nz_sql() in BOTH engines"
    )
