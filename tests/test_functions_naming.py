"""Naming kernel unit + property tests — the reference's own unit-test edge
cases (Swedish chars, digit prefix, truncation, duplicate suffixing;
tests/unit/test_utils_naming.py in the reference) plus hypothesis fuzzing."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_spark.functions.naming import (
    generate_fc_name,
    sanitize_name,
    slugify,
    unique_names,
)


def _run_kernel(spark, values, col_fn):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r.out for r in df.select(col_fn(F.col("raw")).alias("out")).collect()]


def test_slugify_swedish(spark):
    got = _run_kernel(spark, ["Åkersberga Väg", "Ö-vik data!", "abc"], slugify)
    assert got == ["akersberga_vag", "o-vik_data_", "abc"]


def test_sanitize_rules(spark):
    got = _run_kernel(
        spark, ["123start", "x" * 200, "Hyphen-Name", "__pad__"], sanitize_name
    )
    assert got[0] == "_123start"  # digit prefix
    assert len(got[1]) == 128  # truncation
    assert got[2] == "hyphen_name"  # hyphen → underscore
    assert got[3] == "pad"  # strip padding underscores


def test_generate_fc_name_idempotent(spark):
    df = spark.createDataFrame(
        [("SKS", "Naturvärden Point"), ("SKS", "sks_already_prefixed")],
        "authority string, source string",
    )
    got = [
        r.fc for r in df.select(generate_fc_name("authority", "source").alias("fc")).collect()
    ]
    assert got == ["sks_naturvarden_point", "sks_already_prefixed"]


def test_unique_names_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "dup"), (2, "DUP"), (3, "dup"), (4, "solo")], "k bigint, n string"
    )
    got = {
        r.k: r.u for r in df.select("k", unique_names("n", "k").alias("u")).collect()
    }
    assert got == {1: "dup", 2: "DUP_1", 3: "dup_2", 4: "solo"}  # case-insensitive collisions


@settings(max_examples=20, deadline=None)
@given(st.text(min_size=0, max_size=160))
def test_sanitize_always_valid(spark, raw):
    """Property: output matches the table-name contract — no illegal chars,
    no leading digit, ≤128 chars."""
    out = _run_kernel(spark, [raw], sanitize_name)[0]
    assert len(out) <= 128
    assert re.fullmatch(r"[a-z0-9_]*", out) or out == ""
    assert not re.match(r"^[0-9]", out)


@settings(max_examples=40, deadline=None)
@given(
    st.text(min_size=0, max_size=160),
    st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll"), max_codepoint=0x2FF), min_size=1, max_size=12),
)
def test_py_twin_matches_column_kernel(spark, raw, auth):
    """Property: the driver-side pure-Python twins equal the Column kernel
    for any input — the invariant that lets the pipeline generate fc names
    without scheduling a Spark job."""
    from etl_pipeline_spark.functions.naming import (
        generate_fc_name,
        generate_fc_name_py,
        sanitize_name_py,
    )

    col_sanitized = _run_kernel(spark, [raw], sanitize_name)[0]
    assert sanitize_name_py(raw) == col_sanitized

    df = spark.createDataFrame([(auth, raw)], "a string, s string")
    col_fc = df.select(generate_fc_name("a", "s").alias("fc")).collect()[0].fc
    assert generate_fc_name_py(auth, raw) == col_fc
