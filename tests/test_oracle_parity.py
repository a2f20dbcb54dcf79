"""Local mirror of the driver's t2 correctness gate (SURVEY.md §5.2).

For every registered query with an oracle, run the Spark side and the
DuckDB side on the same parquet tables and compare row count, column
names, and order-insensitive values. This is the same bar the driver's
CORRECTNESS_r{N}.json applies, so a green run here de-risks the gate.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mknssh_11_bigdata_spark.queries import QUERIES
from mknssh_11_bigdata_spark.sources.readers import TESTDATA_TABLES

from conftest import SF_ORACLE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round(v, 9) guards representation drift below the round scale
        # but MUST stay sign-sensitive: the driver's hash distinguishes
        # -0.0 from +0.0, and the old `+ 0.0` here erased exactly that
        # (it hid CORRECTNESS_r04's dsir red row from local parity).
        # Signed-zero normalization now lives in the queries themselves
        # (functions/numeric.nz, both engines), not in the comparator.
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF_ORACLE)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(spec.oracle)
    duck_cols = [c[0].lower() for c in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    canon_spark = _canon(spark_rows, spark_cols)
    canon_duck = _canon(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(canon_spark, canon_duck) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:5]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


#: DuckDB result type -> acceptable Spark simpleString families. The
#: local canonical compare is value-based (3 == 3.0 passes), but the
#: driver's gate hashes TYPED values — an int-vs-double drift between
#: an oracle and its Spark twin is a latent red row this test catches
#: at authoring time (it found join_skew_audit's FLOOR returning
#: DOUBLE in DuckDB vs BIGINT in Spark).
_DTYPE_OK = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
    "BOOLEAN": {"boolean"},
}


def test_testdata_table_schemas_sf_invariant(spark):
    """Every testdata table's parquet schema is identical at sf0.001
    and sf0.01. This is the premise that lets ``test_fleet_dtype_parity``
    compile Spark frames at sf0.001 (the shared fixture) while the
    DuckDB side runs at sf0.01: query output types are functions of the
    input table types plus static expressions, so equal table schemas
    across SFs ⇒ equal query schemas across SFs (post-r9-review gap
    closure). Footer reads only — no data scanned."""
    from mknssh_11_bigdata_spark.sources.readers import (
        TESTDATA_TABLES,
        load_table,
    )
    from conftest import SF_ORACLE, SF_SMOKE

    diff = [
        t
        for t in TESTDATA_TABLES
        if load_table(spark, SF_SMOKE, t).schema
        != load_table(spark, SF_ORACLE, t).schema
    ]
    assert diff == [], diff


def test_fleet_dtype_parity(fleet_frames, duck):
    """ONE pass over every oracle query comparing the Spark schema
    against the DuckDB result types (schema-only on the DuckDB side:
    LIMIT 0 execution, no data computed). Spark schemas come from the
    shared ``fleet_frames`` compile pass (sf0.001) — a query's schema
    is SF-independent GIVEN SF-invariant table schemas, which
    ``test_testdata_table_schemas_sf_invariant`` pins; rebuilding every
    frame at sf0.01 was the suite's single slowest test."""
    bad = []
    for name in ORACLE_QUERIES:
        spec = QUERIES[name]
        stypes = {
            f.name.lower(): f.dataType.simpleString()
            for f in fleet_frames[name][0].fields
        }
        rel = duck.execute(
            f"SELECT * FROM ({spec.oracle}) __t LIMIT 0"
        )
        for col, dt in ((d[0].lower(), str(d[1])) for d in rel.description):
            st = stypes.get(col)
            ok = _DTYPE_OK.get(dt.split("(")[0])
            if st is None:
                bad.append((name, col, f"missing in spark ({dt})"))
            elif ok is not None and st not in ok and not (
                dt.startswith("DECIMAL") and st.startswith("decimal")
            ):
                bad.append((name, col, f"duck={dt} spark={st}"))
    assert bad == [], bad
