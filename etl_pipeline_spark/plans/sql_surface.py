"""Pure-SQL query surface — one SQL text, two engines.

The DataFrame plans elsewhere prove the programmatic API; this module
proves the `spark.sql(...)` path a reference user migrating ad-hoc SQL
would take: the star schema registers as temp views and the SAME ANSI SQL
string is both the Spark query and the DuckDB oracle — text-identical
differential testing, the strongest parity statement the contract allows.

Each query here also pins a plan shape the DataFrame modules don't:
- NOT IN over a subquery → Spark's null-aware anti join (the three-valued
  NULL semantics that a plain left-anti join gets wrong);
- correlated scalar subquery in the SELECT list → decorrelated to an
  outer-joined aggregate by Catalyst (reference analog: per-row lookup
  loops, etl/mapping.py:128-170).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.star import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every star-schema table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _sql_query(name: str, sql: str, doc: str, tags: tuple[str, ...]):
    @register(name, oracle=sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    return fn


# Null-aware anti join: NOT IN must treat a NULL in the subquery result as
# "unknown" (empty result), which Spark plans as NullAwareAntiJoin — a
# different (and costlier) operator than the left-anti of NOT EXISTS. The
# subquery column here is non-null in practice, but the PLAN must still be
# null-safe because the schema allows nulls.
_sql_query(
    "sql_not_in_null_aware",
    """
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        )
        GROUP BY c_mktsegment
    """,
    doc="customers with no jumbo order, per segment (null-aware anti join)",
    tags=("sql", "anti", "subquery"),
)

# Correlated scalar subquery in the projection — decorrelates to a
# left-outer-joined count aggregate; COALESCE supplies the zero row.
_sql_query(
    "sql_correlated_scalar_count",
    """
        SELECT c_custkey,
               COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderstatus = 'O'), 0) AS n_open_orders
        FROM customer
        WHERE c_custkey < 100
    """,
    doc="per-customer open-order count via correlated scalar subquery",
    tags=("sql", "subquery"),
)

# Derived table + windowed dedup in one SQL text — keep-first-per-key, the
# relational statement of the reference's "first file wins" staging rule.
_sql_query(
    "sql_keep_first_per_key",
    """
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        )
        WHERE rn = 1 AND o_custkey < 300
    """,
    doc="first order per customer (windowed keep-first dedup), pure SQL",
    tags=("sql", "window", "dedupe"),
)
