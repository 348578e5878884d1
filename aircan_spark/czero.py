"""Registry-wide signed-zero canonicalization (r8 verdict item #1).

The driver's correctness gate hashes typed values BIT-exactly, and IEEE
754 has two zeros: ``ROUND`` of a tiny negative double keeps the sign
bit in DuckDB and drops it in Spark, so a query can emit ``-0.0`` on one
side and ``+0.0`` on the other — numerically equal, hash-divergent. It
cost two driver checks in round 8 (``ext_quality_logit`` row 495's
``logit``, ``ext_mediation_effect``'s ``indirect_effect``), and the
class is data-dependent: ANY rounded float output can mint a ``-0.0`` at
some SF/fixture, so per-query patches cannot close it.

The fix is the IEEE identity ``x + 0.0 == x`` for every double EXCEPT
``-0.0``, which becomes ``+0.0`` (round-to-nearest; NULL and NaN pass
through). Both engines keep the ``+ 0.0`` in their optimized plans
(verified: Spark 4.1 Catalyst does not fold ``round(x,6) + 0.0``; DuckDB
likewise — see tests/test_signed_zero.py). Canonicalization is applied
MECHANICALLY to every declared query at registry build time
(aircan_spark/queries.py), never hand-edited per query:

- Spark side: :func:`canonicalize_floats` wraps each registry callable
  and appends one projection that adds ``+ 0.0`` to every float-typed
  output column (double, float, array<double>, array<float>), derived
  from the DataFrame's own schema at call time.
- DuckDB side: :func:`czero_sql` wraps the oracle SQL in one outer
  SELECT doing the same, using the column list codegen'd from
  ``DESCRIBE`` by scripts/gen_floatcols.py (aircan_spark/_floatcols.py)
  — the oracle string must carry its own canonicalization because the
  driver executes it verbatim.

Cost: one extra no-shuffle Project on the Spark side (whole-stage
codegen absorbs it), one outer projection in DuckDB. Queries with no
float output columns are returned untouched.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _czero_columns(df: DataFrame) -> list | None:
    """Projection list canonicalizing every float-typed column of ``df``,
    or None if the schema has no float-typed columns (caller should then
    skip the projection entirely — zero plan change)."""
    cols = []
    changed = False
    for f in df.schema.fields:
        c, dt = f.name, f.dataType
        if isinstance(dt, T.DoubleType):
            cols.append((df[c] + F.lit(0.0)).alias(c))
            changed = True
        elif isinstance(dt, T.FloatType):
            cols.append(((df[c].cast("double") + F.lit(0.0)).cast("float")).alias(c))
            changed = True
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.DoubleType):
            cols.append(F.transform(df[c], lambda x: x + F.lit(0.0)).alias(c))
            changed = True
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.FloatType):
            cols.append(
                F.transform(
                    df[c], lambda x: (x.cast("double") + F.lit(0.0)).cast("float")
                ).alias(c)
            )
            changed = True
        else:
            cols.append(df[c])
    return cols if changed else None


def canonicalize_floats(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Wrap a registry callable so its float output columns are
    signed-zero-canonicalized. Schema (names, types, order) unchanged."""

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = fn(spark, sf_dir)
        cols = _czero_columns(df)
        return df if cols is None else df.select(*cols)

    wrapped.__czero__ = True
    wrapped.__wrapped_query__ = fn
    return wrapped


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def czero_sql(sql: str, cols: list[tuple[str, str]]) -> str:
    """Wrap a DuckDB oracle in an outer SELECT that canonicalizes the
    float columns listed in ``cols`` ([(name, action)] in output order;
    actions: keep / f64 / f32 / f64list / f32list — codegen'd by
    scripts/gen_floatcols.py). Row order is NOT guaranteed through the
    outer projection, which is fine: the driver's compare (and the local
    mirrors) is row-order-insensitive."""
    sel = []
    for name, act in cols:
        q = _q(name)
        if act == "keep":
            sel.append(q)
        elif act == "f64":
            sel.append(f"({q} + 0e0) AS {q}")
        elif act == "f32":
            sel.append(f"CAST({q} + 0e0 AS REAL) AS {q}")
        elif act == "f64list":
            sel.append(f"list_transform({q}, __x -> __x + 0e0) AS {q}")
        elif act == "f32list":
            sel.append(
                f"list_transform({q}, __x -> CAST(__x + 0e0 AS REAL)) AS {q}"
            )
        else:  # unknown action: regenerate _floatcols.py, don't guess
            raise ValueError(f"czero_sql: unknown action {act!r} for column {name!r}")
    return "SELECT " + ",\n       ".join(sel) + "\nFROM (\n" + sql + "\n) __czero"
