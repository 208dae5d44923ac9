"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03).

The local document-fingerprinting algorithm behind MOSS: hash every
character k-gram, slide a window of w consecutive hashes, keep the minimum
of each window, dedupe. Guarantees any shared substring of length
>= k + w - 1 contributes at least one shared fingerprint, while the
selected set is ~2/(w+1) of all grams — a bounded, content-addressed
signature.

Spark-first shape (everything is column expressions + one window):
- gram hashing is a narrow per-row `transform(sequence(...))` projection —
  zero exchange;
- the window min partitions by doc_id — ONE shuffle, sized by |grams|;
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
from pyspark.sql.window import Window


def winnow_fingerprints(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """(doc_id, fp) — distinct winnowed fingerprints per document.

    ``docs`` needs (doc_id, text). Documents shorter than k chars still
    yield one fingerprint (the hash of their full text), so every doc is
    represented.
    """
    grams = docs.select(
        "doc_id",
        F.expr(f"greatest(length(text) - {k - 1}, 1)").alias("n_grams"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {k - 1}, 1)),"
                f" i -> md5(substring(text, i, {k})))"
            )
        ).alias("pos", "h"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    fps = (
        grams.withColumn("fp", F.min("h").over(win))
        # only full windows: n_grams - w + 1 of them (>= 1 for short docs);
        # pos is 0-based from posexplode
        .filter(F.col("pos") < F.greatest(F.col("n_grams") - F.lit(w - 1), F.lit(1)))
        .select("doc_id", "fp")
        .distinct()
    )
    return fps


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
