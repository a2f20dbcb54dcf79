"""Numeric output-boundary helpers shared by every registered query.

Signed-zero normalization (``nz`` / ``nz_sql``)
-----------------------------------------------

Spark's ``F.round`` goes through ``java.math.BigDecimal``, which has no
negative zero — a tiny negative double that rounds to zero comes back as
``+0.0``.  DuckDB's ``ROUND`` keeps IEEE semantics and returns ``-0.0``
for the same input.  The two values compare equal under ``==`` but hash
and ``repr`` differently, so any cross-engine value-hash comparison (the
driver's t2 gate, our own parity tools) flags a mismatch on a value that
is numerically identical (CORRECTNESS_r04's one red row,
``dsir_importance_weights``: an exact integer ledger summed to a tiny
negative, divided, ROUNDed to 4 dp — ``0.0`` from Spark, ``-0.0`` from
DuckDB).

The IEEE-754 identity ``-0.0 + 0.0 == +0.0`` (round-to-nearest) makes
the fix a one-token boundary rule: every rounded/computed double OUTPUT
column that can be negative passes through ``nz`` in the Spark plan and
``nz_sql`` in the oracle SQL.  For every value other than ``-0.0`` the
addition is exact identity (adding the additive identity), so applying
it to an already-green query cannot change its hash.

Do NOT "fix" this in the comparison layer instead: the local tools used
to canonicalize with ``round(v, 9) + 0.0``, which erased the sign of
zero and HID this class from local parity while the driver's
sign-sensitive hash still failed (VERDICT r4 §What's-wrong #1).  The
tools are now sign-sensitive and the normalization lives here, at the
query boundary, in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nz(c: Column) -> Column:
    """Normalize IEEE negative zero to positive zero (identity
    otherwise): ``-0.0 + 0.0 == +0.0`` in round-to-nearest. Apply to
    every rounded/computed double output column that can be negative."""
    return c + F.lit(0.0)


def nz_sql(expr: str) -> str:
    """SQL twin of :func:`nz` for the DuckDB oracle side."""
    return f"({expr} + 0.0)"
