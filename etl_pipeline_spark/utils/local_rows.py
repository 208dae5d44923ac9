"""Tiny driver-side literal tables as JVM LocalRelations.

``spark.createDataFrame(rows, schema)`` on classic PySpark parallelizes
the rows into ``defaultParallelism`` pickled-RDD partitions: a 4-row
mapping table becomes 32 near-empty partitions, and EVERY downstream
action then runs a 32-task stage whose tasks do nothing but a Python
worker round-trip each (measured: ~0.5 s per consuming stage at
local[32]; six such stages inside one mapping_resolution execution).
A SQL ``VALUES`` list parses to a ``LocalRelation`` instead: evaluated
on the driver as a ``LocalTableScan``, zero tasks, zero Python, and the
optimizer can constant-fold or broadcast it directly (measured: the same
5-action loop 2.68 s → 0.30 s).

``values_df`` builds that VALUES statement from plain Python rows for
the types the registered query paths need (strings, integers, doubles,
NULLs). Doubles are emitted as ``CAST('<repr>' AS DOUBLE)`` — ``repr``
round-trips IEEE doubles exactly, and the string-cast dodges the
decimal-literal parse that makes bare ``1.9`` a DECIMAL(2,1) (the PIP
ULP lesson). Rows must be small driver-side constants — this is a
literal-table device, not a data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SQL_TYPES = {"string", "bigint", "int", "double", "boolean", "array<double>"}


def _lit(v, sql_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {sql_type.upper()})"
    if sql_type == "string":
        escaped = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if sql_type in ("bigint", "int"):
        return f"CAST({int(v)} AS {sql_type.upper()})"
    if sql_type == "double":
        return f"CAST('{float(v)!r}' AS DOUBLE)"
    if sql_type == "boolean":
        return "true" if v else "false"
    if sql_type == "array<double>":
        if len(v) == 0:
            return "CAST(array() AS ARRAY<DOUBLE>)"
        return "array(" + ", ".join(_lit(x, "double") for x in v) + ")"
    raise ValueError(f"unsupported literal type: {sql_type}")


def sql_literal(v, sql_type: str) -> str:
    """Public literal encoder (same rules as values_df cells) for callers
    assembling richer literal expressions (named_struct arrays etc.)."""
    return _lit(v, sql_type)


def values_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """LocalRelation from literal ``rows`` and a DDL ``schema`` string
    (``"name type, name type, ..."`` with types in {string, bigint, int,
    double, boolean}). Empty ``rows`` yields an empty relation of the
    same schema (a WHERE-false projection, still task-free).

    Nullability caveat (not a drop-in for ``createDataFrame``): VALUES
    inline-table inference marks a column ``nullable=False`` when no row
    holds a NULL, where ``createDataFrame`` always yields
    ``nullable=True``. Harmless for the current consumers (joins/unions
    relax nullability) but schema-sensitive callers must normalize
    (tests/test_local_rows.py pins the behavior)."""
    cols = []
    for field in schema.split(","):
        name, sql_type = field.strip().split()
        if sql_type.lower() not in _SQL_TYPES:
            raise ValueError(f"unsupported type in schema: {field.strip()}")
        cols.append((name, sql_type.lower()))
    names = ", ".join(n for n, _ in cols)
    if not rows:
        null_row = ", ".join(f"CAST(NULL AS {t.upper()}) AS {n}" for n, t in cols)
        return spark.sql(f"SELECT {null_row} WHERE 1 = 0")
    # fail loudly on ragged rows: zip() would silently DROP extra cells
    # (a well-formed but wrong relation on a caller bug) and a short row
    # would surface only as an opaque inline-table AnalysisException
    for i, row in enumerate(rows):
        if len(row) != len(cols):
            raise ValueError(
                f"row {i} has {len(row)} values for {len(cols)} schema "
                f"columns: {row!r}"
            )
    encoded = ", ".join(
        "(" + ", ".join(_lit(v, t) for v, (_, t) in zip(row, cols)) + ")"
        for row in rows
    )
    return spark.sql(f"SELECT * FROM VALUES {encoded} AS t({names})")
