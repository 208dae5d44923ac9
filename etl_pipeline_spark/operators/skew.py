"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains necessary when one key dominates so hard
that even split partitions bottleneck, or when AQE is unavailable (e.g.
inside a streaming query). Classic construction:

- fact side: append a random-ish salt in [0, n) to the join key
  (deterministic here: a stable hash of a tiebreak column — reproducible
  runs, no ``rand()``);
- dim side: explode each row into all n salted copies;
- join on (key, salt) — the hot key's rows now spread across n partitions.

Cost: dim side inflates ×n — use for fact⋈dim or fact⋈medium joins where
the skew is on the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on ``key`` with the fact side salted across
    ``n_salts`` buckets. ``tiebreak`` (any fact column, defaults to the key)
    seeds the deterministic salt."""
    tb = tiebreak or key
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(tb).cast("string")), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[key] == salted_dim[key]) & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return out.drop(salted_dim[key]).drop(salted_fact["__salt"]).drop(salted_dim["__salt"])
