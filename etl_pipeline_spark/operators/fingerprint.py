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
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids: list = []
            fps: list[str] = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                # SQL null semantics: null text/id rows produce nothing
                # (matches the relational form the oracle pins). NULL
                # numeric ids arrive as float NaN through Arrow, so the
                # check must be pd.isna, not `is None`
                if pd.isna(did) or not isinstance(text, str):
                    continue
                ng = max(len(text) - k + 1, 1)
                grams = [
                    hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest()
                    for i in range(ng)
                ]
                seen: set[str] = set()
                for p in range(max(ng - w + 1, 1)):
                    m = min(grams[p : p + w])
                    if m not in seen:
                        seen.add(m)
                        ids.append(did)
                        fps.append(m)
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

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
