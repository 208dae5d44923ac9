"""Random-data pins for the streaming twins' state recursions.

The twins' batch-equality tests run on fixture-derived streams; these
fuzz the stateful recursion itself on RANDOM demand series (including
multi-key, single-epoch, long-gap, and large-quantity series) against an
INDEPENDENT plain-Python derivation with the same op order — catching
state-carry and rounding-convention bugs the fixture can't reach. Plus a
direct midpoint pin: the croston closure's inlined `_r6` must equal
Spark ``F.round(x, 6)`` (its batch comparison target) on repr-level
6-dp midpoints — the exact convention round 8 fixed.
"""

from __future__ import annotations

import decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_spark.streaming.croston import croston_stream
from etl_pipeline_spark.streaming.joins import run_available_now_append

# per key: strictly-increasing months with random gaps, random quantities
_series = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=24),  # month gap
        st.integers(min_value=0, max_value=1_000_000),  # quantity
    ),
    min_size=1,
    max_size=8,
)


def _r6_spark_convention(v: float) -> float:
    return float(
        decimal.Decimal(repr(v)).quantize(
            decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _expected_rows(key: int, months_q: list[tuple[int, int]], m0: int):
    """The croston recursion, independently: alpha=1/2, S1 anchored to
    (q1, m1-m0+1), no re-association, emit from the second epoch on."""
    out = []
    n, last_m, z, y = 0, -1, 0.0, 0.0
    for m, q in months_q:
        if n == 0:
            z, y = float(q), float(m - m0 + 1)
        else:
            z = 0.5 * q + 0.5 * z
            y = 0.5 * (m - last_m) + 0.5 * y
        n += 1
        last_m = m
        if n >= 2:
            out.append(
                (
                    key,
                    m,
                    n,
                    _r6_spark_convention(z),
                    _r6_spark_convention(y),
                    _r6_spark_convention(z / y),
                )
            )
    return out


@settings(max_examples=6, deadline=None)
@given(st.dictionaries(st.integers(1, 4), _series, min_size=1, max_size=3))
def test_croston_stream_matches_independent_recursion(spark, tmp_path_factory, keyed):
    rows, expected = [], []
    base = 600
    all_first = []
    series_abs = {}
    for key, gaps in keyed.items():
        m = base
        months_q = []
        for gap, q in gaps:
            m += gap
            months_q.append((m, q))
        series_abs[key] = months_q
        all_first.append(months_q[0][0])
    m0 = min(all_first)
    for key, months_q in series_abs.items():
        rows.extend((key, m, q) for m, q in months_q)
        expected.extend(_expected_rows(key, months_q, m0))
    src = str(tmp_path_factory.mktemp("cr_fuzz") / "src")
    spark.createDataFrame(rows, "l_partkey bigint, m bigint, q bigint").write.parquet(src)
    stream = spark.readStream.schema("l_partkey bigint, m bigint, q bigint").parquet(src)
    name = f"cr_fuzz_{abs(hash(tuple(sorted(rows)))) % 10**9}"
    got = {
        (r.l_partkey, r.m): (r.n_epochs, r.size_ewma, r.interval_ewma, r.croston_forecast)
        for r in run_available_now_append(croston_stream(stream, m0=m0), name).collect()
    }
    want = {(k, m): (n, z, y, f) for k, m, n, z, y, f in expected}
    assert got == want


_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # day index
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),  # value
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=6, deadline=None)
@given(st.dictionaries(st.sampled_from(["a", "b"]), _events, min_size=1, max_size=2))
def test_ewma_stream_matches_independent_recursion(spark, tmp_path_factory, keyed):
    """ewma_stream on random (key, day, value) events — incl. negatives
    and multiple events per day — vs a plain-Python re-derivation of the
    cent quantization (HALF_UP on |v*100|) + day-collapsed dyadic EWMA."""
    import math

    from etl_pipeline_spark.streaming.ewma import ewma_stream

    day_ns = 86_400_000_000_000
    rows = []
    for key, evs in keyed.items():
        for i, (day, value) in enumerate(evs):
            rows.append((key, day * day_ns + (i % 7) * 3_600_000_000_000, value))
    src = str(tmp_path_factory.mktemp("ew_fuzz") / "src")
    spark.createDataFrame(
        rows, "event_type string, ts bigint, value double"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "event_type string, ts bigint, value double"
    ).parquet(src)
    name = f"ew_fuzz_{abs(hash(tuple(sorted(rows)))) % 10**9}"
    got = {
        (r.event_type, r.day): (r.day_cents, r.ewma_cents)
        for r in run_available_now_append(ewma_stream(stream), name).collect()
    }
    want = {}
    for key, evs in keyed.items():
        per_day: dict[int, int] = {}
        for day, value in evs:
            c = int(math.copysign(math.floor(abs(value * 100) + 0.5), value * 100))
            per_day[day] = per_day.get(day, 0) + c
        z = None
        for day in sorted(per_day):
            x = float(per_day[day])
            z = x if z is None else 0.5 * x + 0.5 * z
            want[(key, day)] = (per_day[day], z)
    assert got == want


# Doubles whose shortest repr is a 6-dp midpoint (…5) but whose exact
# binary value sits BELOW it: Decimal(repr).HALF_UP (Spark F.round's
# BigDecimal.valueOf path) rounds these UP; the binary-scaled
# floor(v*1e6+0.5) convention (DuckDB ROUND / the pre-round-8 closure)
# rounds them DOWN — verified discriminating at test-authoring time.
_MIDPOINTS = [
    2.0490375,
    132.9313365,
    258.2772035,
    258.4099295,
    262.0966385,
    265.8744005,
    518.2450375,
    519.5135065,
]


def test_croston_r6_matches_spark_fround_on_midpoints(spark):
    """The closure's rounding convention IS Spark F.round's: HALF_UP on
    the shortest decimal repr. Pin on curated repr-level midpoints where
    the binary-scaled convention (utils/rounding.round6_half_up)
    disagrees — the round-8 fix class."""
    sdf = spark.createDataFrame([(v,) for v in _MIDPOINTS], "v double")
    spark_rounded = {
        r.v: r.r for r in sdf.select("v", F.round("v", 6).alias("r")).collect()
    }
    for v in _MIDPOINTS:
        assert _r6_spark_convention(v) == spark_rounded[v], repr(v)


# ---------------------------------------------------------------------------
# Round-9 extension (VERDICT r8 §next-round 6): the Holt-Winters chain
# solve, fuzzed both cross-engine (full registered query vs its recursive-
# CTE oracle on random series) and stream-vs-independent-recursion on
# random gapped multi-key series.
# ---------------------------------------------------------------------------

_DAY_NS = 86_400_000_000_000

# (day, cents) series: random day gaps, negative/zero/large cents
_hw_series = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # day gap
        st.integers(min_value=-10**8, max_value=10**8),  # cents
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=6, deadline=None)
@given(series=_hw_series)
def test_holt_winters_daily_matches_oracle_on_random_series(
    spark, tmp_path_factory, series
):
    """The registered holt_winters_daily (driver-side _hw_solve chain) vs
    its DuckDB recursive-CTE oracle on RANDOM daily series — day gaps,
    negative and zero cents, lengths straddling the 15-day minimum — not
    just the fixture's dense positive series. Exact driver-style compare."""
    import datetime

    import duckdb

    from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
    from tests.conftest import canonicalize

    _ensure_loaded()
    day = 0
    rows = []
    eid = 0
    for gap, cents in series:
        day += gap
        ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            days=day, seconds=7
        )
        rows.append((eid, ts, 1, "purchase", cents / 100.0, "{}"))
        eid += 1
        # noise row on the same day that the purchase filter must drop
        rows.append((eid, ts, 1, "view", 999999.99, "{}"))
        eid += 1
    sf = str(tmp_path_factory.mktemp("hw_fuzz") / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    spec = REGISTRY["holt_winters_daily"]
    got = canonicalize(spec.spark_fn(spark, sf).toPandas())
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; duckdb needs the part-file glob
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    want = canonicalize(con.execute(spec.oracle).fetchdf())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()


def _hw_reference(cells: list[tuple[str, int, int]]):
    """Independent replay of the streaming recursion: per key, the batch
    _hw_solve init (left-assoc 7-day means) then one step per observed day
    from day 8 on — day gaps irrelevant by construction (the solver is
    index-based)."""
    by_key: dict[str, list] = {}
    for key, day, c in sorted(cells):
        by_key.setdefault(key, []).append((day, c))
    out = {}
    for key, seq in by_key.items():
        if len(seq) < 14:
            continue
        xs = [float(c) for _, c in seq]
        l = (((((xs[0] + xs[1]) + xs[2]) + xs[3]) + xs[4]) + xs[5] + xs[6]) / 7.0
        m2 = (((((xs[7] + xs[8]) + xs[9]) + xs[10]) + xs[11]) + xs[12] + xs[13]) / 7.0
        b = (m2 - l) / 7.0
        s = [xs[i] - l for i in range(7)]
        for j in range(7, len(xs)):
            ln = 0.5 * (xs[j] - s[0]) + 0.5 * (l + b)
            b = 0.5 * (ln - l) + 0.5 * b
            s = s[1:] + [0.5 * (xs[j] - ln) + 0.5 * s[0]]
            l = ln
            day, c = seq[j]
            out[(key, day)] = (c, l, b, l + b + s[0])
    return out


_hw_keyed = st.dictionaries(
    st.sampled_from(["purchase", "view"]),
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),  # day gap
            st.integers(min_value=-10**7, max_value=10**7),  # cents
        ),
        min_size=1,
        max_size=20,
    ),
    min_size=1,
    max_size=2,
)


@settings(max_examples=5, deadline=None)
@given(keyed=_hw_keyed)
def test_hw_stream_matches_independent_recursion_on_random_series(
    spark, tmp_path_factory, keyed
):
    """holt_winters_stream on RANDOM multi-key day series with gaps and
    negative cents (the fixture stream is dense and positive) vs the
    independent replay above — bit-exact on (cents, level, trend,
    forecast) per emitted row, across whatever micro-batch split the
    parquet source produces."""
    from etl_pipeline_spark.streaming.holtwinters import holt_winters_stream

    rows, cells = [], []
    for key, gaps in keyed.items():
        day = 10
        for gap, cents in gaps:
            day += gap
            # split each day's cents across two events to exercise the
            # within-batch per-day aggregation (c1 + c2 == cents)
            c1 = cents // 2
            c2 = cents - c1
            rows.append((key, day * _DAY_NS + 5_000, c1 / 100.0))
            rows.append((key, day * _DAY_NS + 9_000, c2 / 100.0))
            cells.append((key, day, cents))
    src = str(tmp_path_factory.mktemp("hw_sfuzz") / "src")
    spark.createDataFrame(
        rows, "event_type string, ts bigint, value double"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "event_type string, ts bigint, value double"
    ).parquet(src)
    name = f"hw_fuzz_{abs(hash(tuple(sorted(rows)))) % 10**9}"
    got = {
        (r.event_type, r.day): (r.day_cents, r.level, r.trend, r.forecast_next)
        for r in run_available_now_append(holt_winters_stream(stream), name).collect()
    }
    assert got == _hw_reference(cells)
