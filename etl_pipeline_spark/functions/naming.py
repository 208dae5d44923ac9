"""Naming/sanitization kernel as pure Column expressions.

The reference implements these as row-at-a-time Python string functions
(slugify: etl/utils/sanitize.py:8-13; sanitize_for_arcgis_name /
sanitize_sde_name: etl/utils/naming.py:25-96; generate_fc_name:
etl/utils/naming.py:35-57; ensure_unique_name: etl/utils/gdb_utils.py:17-106).
Here every rule is a built-in Column expression chain — JVM-side, inside
whole-stage codegen, no Python in the hot path — so the same kernel runs
unchanged over 10^11 rows.

Semantics (re-specified deterministically where the reference was
order-dependent, per SURVEY.md §7 "hard parts"):

- ``slugify``: transliterate å/ä/ö (both cases) → a/a/o, lowercase, any run
  of chars outside [a-z0-9_-] → single "_", collapse runs of "_".
- ``sanitize_name``: slugify, then "-" → "_", strip leading/trailing "_",
  prefix "_" when the name starts with a digit, truncate to 128 chars.
- ``generate_fc_name``: ``lower(authority) + '_' + sanitize(source)``,
  idempotent when the prefix is already present.
- ``unique_names``: case-insensitive collision suffixing ``_1, _2 …`` by
  deterministic ``row_number()`` order instead of the reference's
  first-come-first-served probing (an improvement: same input set → same
  names on any cluster, any partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MAX_NAME_LEN = 128


def slugify(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.translate(c, "åäöÅÄÖ", "aaoAAO"))
    c = F.regexp_replace(c, "[^a-z0-9_-]+", "_")
    return F.regexp_replace(c, "_+", "_")


def sanitize_name(col: Column | str, max_len: int = MAX_NAME_LEN) -> Column:
    # Collapsed from the literal slugify→replace→collapse→strip chain (5
    # regexp passes) to 2 passes with identical semantics: after
    # transliterate+lower, slugify turns every run outside [a-z0-9_-]
    # into one "_", then "-"→"_" and "_+"→"_" — the composition maps any
    # maximal run outside [a-z0-9] to a single "_", which is what the
    # first regexp below does directly. The strip/digit-prefix/truncate
    # steps are unchanged. Equivalence is property-tested against the
    # unchanged Python twin (sanitize_name_py, the spec) in
    # tests/test_functions_naming.py; each regexp pass is a full scan +
    # string rebuild per row, so this nearly halves the per-row kernel
    # cost of naming-heavy queries (guide §1.2 "per-task work").
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.translate(c, "åäöÅÄÖ", "aaoAAO"))
    c = F.regexp_replace(c, "[^a-z0-9]+", "_")
    c = F.regexp_replace(c, "^_+|_+$", "")
    c = F.when(c.rlike("^[0-9]"), F.concat(F.lit("_"), c)).otherwise(c)
    return F.substring(c, 1, max_len)


def generate_fc_name(authority: Column | str, source: Column | str) -> Column:
    auth = F.lower(F.col(authority) if isinstance(authority, str) else authority)
    base = sanitize_name(source)
    prefixed = F.concat(auth, F.lit("_"), base)
    already = base.startswith(F.concat(auth, F.lit("_")))
    return F.substring(F.when(already, base).otherwise(prefixed), 1, MAX_NAME_LEN)


def unique_names(name: Column | str, order_by: Column | str) -> Column:
    """Deterministic collision suffixing: first holder (by ``order_by``) keeps
    the bare name, later holders get ``_1, _2, …`` — the window-function
    re-expression of the reference's sequential probing loop."""
    c = F.col(name) if isinstance(name, str) else name
    o = F.col(order_by) if isinstance(order_by, str) else order_by
    rn = F.row_number().over(Window.partitionBy(F.lower(c)).orderBy(o))
    return F.when(rn == 1, c).otherwise(F.concat(c, F.lit("_"), (rn - 1).cast("string")))


# --------------------------------------------------------------------------
# Driver-side pure-Python twins. Pipeline orchestration needs one fc-name
# per SOURCE (a config-sized value, not data) — running a 1-row Spark job
# for a pure string function is a job-scheduling round trip for nothing.
# These mirror the Column chains above exactly (property-tested against
# them in tests/test_functions_naming.py).
# --------------------------------------------------------------------------
import re as _re

_TRANSLIT = str.maketrans("åäöÅÄÖ", "aaoAAO")


def slugify_py(s: str) -> str:
    s = s.translate(_TRANSLIT).lower()
    s = _re.sub(r"[^a-z0-9_-]+", "_", s)
    return _re.sub(r"_+", "_", s)


def sanitize_name_py(s: str, max_len: int = MAX_NAME_LEN) -> str:
    c = slugify_py(s)
    c = c.replace("-", "_")
    c = _re.sub(r"_+", "_", c)
    c = _re.sub(r"^_+|_+$", "", c)
    if _re.match(r"^[0-9]", c):
        c = "_" + c
    return c[:max_len]


def generate_fc_name_py(authority: str, source: str) -> str:
    auth = authority.lower()
    base = sanitize_name_py(source)
    out = base if base.startswith(auth + "_") else f"{auth}_{base}"
    return out[:MAX_NAME_LEN]
