"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03).

The local document-fingerprinting algorithm behind MOSS: hash every
character k-gram, slide a window of w consecutive hashes, keep the minimum
of each window, dedupe. Guarantees any shared substring of length
>= k + w - 1 contributes at least one shared fingerprint, while the
selected set is ~2/(w+1) of all grams — a bounded, content-addressed
signature.

Spark-first shape:
- fingerprint selection is one narrow Arrow-batched `mapInPandas` pass
  (per-document sequential rolling min — see the function docstring for
  why the column algebra can't express this efficiently) — ZERO exchange
  before the fingerprint join;
- shared-fingerprint pairing is an equi-join on the fingerprint value with
  a document-frequency cap (fingerprints present in more than `max_df`
  docs are dropped, the standard stop-fingerprint rule) — so the join has
  no hot keys and cost scales with true overlap, not |docs|².

The hash is md5 of the gram, compared lexicographically — a min-wise
family that evaluates identically in Spark and DuckDB (same trick the
MinHash family uses, `operators/dedup.py`), keeping the whole operator
oracle-checkable cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winnow_fingerprints(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """(doc_id, fp) — distinct winnowed fingerprints per document.

    ``docs`` needs (doc_id, text). Documents shorter than k chars still
    yield one fingerprint (the hash of their full text), so every doc is
    represented.

    Physical strategy: Arrow-batched ``mapInPandas`` (the §2.7 surface) —
    a narrow, partition-parallel pass with ZERO exchange between the
    corpus scan and the (doc_id, fp) output; the only shuffles left in a
    winnowing pipeline are the ones keyed on the fingerprint value.
    Winnowing is the rare operator where the built-in column algebra
    genuinely can't express the efficient plan: the rolling minimum needs
    the gram-hash array bound to a variable, and every SQL formulation
    measured re-evaluates it per window position (``slice`` inside a
    ``transform`` lambda collapses to O(n²·k) md5 calls; an
    ``aggregate`` fold copies the accumulator array per step; ``zip_with``
    doubling pays 2^log₂(w) tree duplication) — all 2.5-70× slower than
    this pass at sf0.1, and the posexplode + ``min() OVER (PARTITION BY
    doc_id)`` fallback shuffles every gram hash (|corpus text| × 32-char
    rows) to compute row-local minima. Values are pinned to the relational
    form by the DuckDB oracle (exploded grams + windowed min), which the
    driver hash-matches cell-for-cell.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    id_field = docs.schema["doc_id"]
    schema = StructType(
        [StructField("doc_id", id_field.dataType, id_field.nullable),
         StructField("fp", StringType(), False)]
    )

    def gen(batches):
        # Vectorized kernel (guide §4.2: hand whole batches to a native
        # columnar engine instead of looping rows in Python): the old
        # per-gram `hashlib.md5` loop paid ~1 Python call per CHARACTER
        # of corpus text; DuckDB executes the identical relational form
        # (k-gram substr → md5 → w-window rolling min → distinct) in
        # C++ over the whole batch. Same SQL shape the oracle pins, so
        # the produced (doc_id, fp) SET is definitionally identical:
        # md5() is lowercase hex in both, and VARCHAR MIN is the same
        # bytewise order as Python's str min on hex digits.
        import duckdb
        import pandas as pd

        con = duckdb.connect()  # once per task, in-process
        # rows 1-based: gram i = substr(text, i, k), i ≤ ng = max(len-k+1, 1);
        # window p covers grams [p, p+w); valid p ≤ max(ng-w+1, 1).
        sql = f"""
            WITH d AS (
                SELECT doc_id, text, GREATEST(LENGTH(text) - {k - 1}, 1) AS ng
                FROM batch_df WHERE doc_id IS NOT NULL AND text IS NOT NULL
            ),
            s AS (
                SELECT doc_id, ng, text,
                       UNNEST(GENERATE_SERIES(1, ng)) AS i
                FROM d
            ),
            g AS (
                SELECT doc_id, ng, i, md5(SUBSTR(text, i, {k})) AS h
                FROM s
            )
            SELECT DISTINCT doc_id, fp FROM (
                SELECT doc_id, ng, i,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                                    ROWS BETWEEN CURRENT ROW
                                    AND {w - 1} FOLLOWING) AS fp
                FROM g
            ) WHERE i <= GREATEST(ng - {w - 1}, 1)
        """
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"doc_id": [], "fp": []})
                continue
            batch_df = pdf[["doc_id", "text"]]  # noqa: F841 — duckdb scans it
            yield con.execute(sql).df()

    return docs.select("doc_id", "text").mapInPandas(gen, schema)


def shared_fingerprint_pairs(
    fps: DataFrame, min_shared: int = 5, max_df: int = 50
) -> DataFrame:
    """(doc_a, doc_b, n_shared) for pairs sharing >= min_shared fingerprints.

    Fingerprints in more than ``max_df`` docs are stop-fingerprints and are
    dropped before the join (kills hot keys; same role as stopword removal).
    """
    df_counts = fps.groupBy("fp").agg(F.count("*").alias("df"))
    kept = fps.join(
        df_counts.filter((F.col("df") >= 2) & (F.col("df") <= max_df)).select("fp"),
        on="fp",
    )
    a = kept.select(F.col("doc_id").alias("doc_a"), "fp")
    b = kept.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, on="fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
