"""CDC changeset merge — MERGE INTO semantics as a relation.

The incremental-load primitive every warehouse pipeline needs: apply a
change stream (upserts + deletes, possibly several versions per key) onto a
base snapshot, latest-wins. The reference applies changes imperatively per
feature class (truncate-and-reload in `etl/loaders.py`); here the merge is
one declarative plan so Catalyst/AQE pick the physical join:

- latest change per key: one `row_number()` window over the change stream
  (shuffle sized by |changes|, not |base|);
- apply: ONE full-outer equi-join base ⟗ latest on the key. At scale the
  change batch is usually a small fraction of the base, so AQE turns this
  into a broadcast join for free; the base side is never re-shuffled more
  than once.

Semantics (standard ANSI MERGE, latest-wins):
- latest op 'D'            → row dropped (even if the key is base-only noise);
- latest op 'U', key in base  → base row with change columns applied ('updated');
- latest op 'U', key not in base → new row ('inserted');
- key untouched by changes → base row verbatim ('unchanged').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_changes(changes: DataFrame, key: str, seq: str = "seq") -> DataFrame:
    """Latest-wins collapse of a multi-version change stream.

    One window shuffle on the key; ties on ``seq`` are broken by op so the
    result is deterministic even for pathological equal-seq inputs.
    """
    w = Window.partitionBy(key).orderBy(F.col(seq).desc(), F.col("op"))
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_changeset(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    payload_cols: list[str],
    seq: str = "seq",
) -> DataFrame:
    """Apply a change stream onto ``base``: full-outer join + latest-wins.

    ``changes`` must carry ``key``, ``seq``, an ``op`` column ('U' or 'D'),
    and the ``payload_cols``. Output = base schema (key + payload) plus a
    ``src`` column in {'unchanged','updated','inserted'}.
    """
    latest = latest_changes(changes, key, seq)
    b = base.select(key, *payload_cols).withColumn("_in_base", F.lit(1))
    c = latest.select(key, "op", *[F.col(p).alias(f"_c_{p}") for p in payload_cols])
    joined = b.join(c, on=key, how="full_outer")
    merged = joined.filter((F.col("op").isNull()) | (F.col("op") != F.lit("D")))
    out_payload = [
        F.coalesce(F.col(f"_c_{p}"), F.col(p)).alias(p) for p in payload_cols
    ]
    src = (
        F.when(F.col("op").isNull(), F.lit("unchanged"))
        .when(F.col("_in_base").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    return merged.select(F.col(key), *out_payload, src.alias("src"))
