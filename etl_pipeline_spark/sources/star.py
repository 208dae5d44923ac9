"""Star-schema table catalog over the driver-generated parquet testdata.

The reference stages everything through a per-run staging store keyed by
source name (reference: etl/loaders/filegdb.py:65-96); our analog is a
catalog of named parquet tables. Tables are read with their parquet-embedded
schemas (columnar scan + pushdown for free); the expected schemas below act
as a *frozen contract* — SURVEY.md §1.3 calls out schema-on-write bypass
(`schema_type="NO_TEST"`, reference: etl/pipeline.py:692-695) as the
reference's biggest correctness hole, so we validate instead.

`events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet reader
rejects by default; we flip `spark.sql.legacy.parquet.nanosAsLong` at runtime
and expose `ts` as nanosecond epoch (bigint). Query code uses pure epoch
arithmetic on it — timezone-proof and identical in any session.
"""

from __future__ import annotations

from threading import Lock

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_spark.utils.session_cache import register_cache, session_key

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns we rely on, per table (subset contract — extra columns are fine).
EXPECTED_COLUMNS: dict[str, set[str]] = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


# Per-(session, sf_dir, table) memo of the ANALYZED relation. Every
# `spark.read.parquet` call pays a driver-side schema-inference job
# ("parquet at ..." in the UI) even for a path read moments ago in the
# same session; a suite that touches the catalog hundreds of times
# (register_views loads all 10 tables per SQL query) repays that job on
# every call. Memoizing the DataFrame object reuses the analyzed scan
# relation — the session-scoped analog of a catalog table's cached
# metadata (guide §6: file-listing caches exist for exactly this).
# NO persist() anywhere: the memo holds a lazy plan, so every action
# still recomputes from the parquet input — plan reuse, not result
# caching. Cleared with the other session memos via clear_caches().
_TABLE_MEMO: dict = register_cache({})
_TABLE_LOCK = Lock()


def load_table(spark: SparkSession, sf_dir: str, name: str, *, validate: bool = False) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (session_key(spark), sf_dir, name)
    with _TABLE_LOCK:
        df = _TABLE_MEMO.get(key)
    if df is None:
        if name == "events":
            # INT64 TIMESTAMP(NANOS) is unreadable as a Spark timestamp; read
            # the physical int64 and treat `ts` as epoch-ns downstream.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = _events_ts_to_epoch_ns(df)
        with _TABLE_LOCK:
            df = _TABLE_MEMO.setdefault(key, df)
    if validate:
        missing = EXPECTED_COLUMNS[name] - set(df.columns)
        if missing:
            raise ValueError(f"table {name!r} missing expected columns: {sorted(missing)}")
    return df


def _events_ts_to_epoch_ns(df: DataFrame) -> DataFrame:
    """Normalize `events.ts` to epoch-nanoseconds BIGINT whatever the
    parquet physical type is (the generator has shipped both INT64
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds). All query code
    downstream does pure integer epoch arithmetic on `ts`; the session
    timezone is pinned UTC so the timestamp branch is deterministic, and
    DuckDB oracles use epoch_ns(ts), which is physical-type-agnostic too."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "timestamp_ntz":
        from pyspark.sql import functions as F

        # NTZ wall clock == DuckDB's epoch_ns reading: pure NTZ arithmetic,
        # never a cast through the session timezone (the driver's session
        # tz is unknown — verified hostile-tz in scripts/drive_contract.py)
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            )
            * F.lit(1000),
        )
    elif ts_type == "timestamp":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.unix_micros(F.col("ts")) * F.lit(1000))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once: ``t = load_tables(spark, d, 'orders', 'lineitem')``."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
