"""Scratch probe harness: run the randomized-fixture parity sweep over
FRESH seeds (and optional tiny truncations) without pytest overhead.

Usage: python scripts/probe_sweep.py SEED [SEED ...]
       python scripts/probe_sweep.py tiny401 401 419
       python scripts/probe_sweep.py empty401    # zero-row FACT tables
       python scripts/probe_sweep.py hostile401  # corrupt-input plants
                                                 # (EXTRA, beyond the ones
                                                 # adopted into _gen_star)

Reuses the sweep's fixture generator and canonical compare so a failure
here is exactly a failure the adopted sweep would show once the seed's
plants are merged. Prints one line per failing query with the first
differing cells; exit 1 if any query fails.
"""
from __future__ import annotations

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from etl_pipeline_spark.session import get_spark
from tests.conftest import canonicalize
from tests.test_random_fixture_sweep import _TABLES, _TINY_KEEP, _gen_star

_ensure_loaded()


def _plant_hostile(out: str) -> None:
    """Corrupt-input plants a 100 TB pipeline sees daily — malformed JSON
    event payloads and invalid embedding rows (NULL vector, NULL
    component, NaN/Inf component, wrong dimension). Found bugs 44-45 on
    first contact (16 queries); the core plants are since ADOPTED into
    _gen_star, so this mode now layers EXTRA hostile rows on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{out}/events.parquet").to_pandas()
    hostile_props = ["not json", "", None, '{"k": "abc"}', "[1, 2]",
                     '{"k": 99.5}', "{bad", '{"k": true}', '{"k": null}']
    for i, p in enumerate(hostile_props):
        ev.loc[i + 5, "props"] = p
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   f"{out}/events.parquet")

    tbl = pq.read_table(f"{out}/embeddings.parquet")
    vecs = tbl.column("embedding").to_pylist()
    labels = tbl.column("label").to_pylist()
    dim = 64
    base = [0.25] * dim
    extra = [
        None,                                  # NULL vector
        base[:-1] + [None],                    # NULL component
        base[:-1] + [float("nan")],            # NaN component
        base[:-1] + [float("inf")],            # +Inf component
        [0.25] * 32,                           # wrong dimension (short)
        [0.25] * (dim + 3),                    # wrong dimension (long)
        [],                                    # empty vector
    ]
    nv = len(vecs)
    vecs.extend(extra)
    labels.extend([7] * len(extra))
    schema = pa.schema([
        pa.field("vec_id", pa.int64()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("label", pa.int32()),
    ])
    out_tbl = pa.Table.from_pydict(
        {"vec_id": list(range(1, nv + len(extra) + 1)),
         "embedding": vecs, "label": labels},
        schema=schema,
    )
    pq.write_table(out_tbl, f"{out}/embeddings.parquet")


def _plant_nulls(out: str) -> None:
    """ADOPTED (r11): the missing-attribute plan now lives in
    ``_gen_star`` itself (tests/test_random_fixture_sweep.py::_NULL_PLAN)
    — every sweep fixture carries one NULL per nullable non-key column.
    This mode re-applies the same plan (idempotent), kept so old probe
    invocations keep working. Found 41 drop-at-use convention fixes
    across 10 fresh seeds before adoption (Spark ASC NULLS FIRST vs
    DuckDB NULLS LAST on every ordering/ranking/chain/series)."""
    from tests.test_random_fixture_sweep import _plant_nulls as _adopted

    _adopted(out)


def run_seed(spark, param: str) -> list[str]:
    tiny = param.startswith("tiny")
    empty = param.startswith("empty")
    one = param.startswith("one")
    hostile = param.startswith("hostile")
    nulls = param.startswith("nulls")
    seed = int(param.lstrip("tinyemptyonhstlu") or "11")
    out = tempfile.mkdtemp(prefix=f"probe_{param}_")
    _gen_star(out, seed=seed)
    if tiny or empty or one:
        import pyarrow.parquet as pq

        for t, k in _TINY_KEEP.items():
            keep = 0 if empty else 1 if one else k
            tbl = pq.read_table(f"{out}/{t}.parquet")
            pq.write_table(tbl.slice(0, keep), f"{out}/{t}.parquet")
    if hostile:
        _plant_hostile(out)
    if nulls:
        _plant_nulls(out)
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')")
    fails = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        try:
            got = canonicalize(spec.spark_fn(spark, out).toPandas())
            want = canonicalize(con.execute(spec.oracle).fetchdf())
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            assert list(got.columns) == list(want.columns), "columns"
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=True, obj=name
            )
        except Exception as exc:  # noqa: BLE001 — triage harness
            msg = str(exc).replace("\n", " | ")[:300]
            fails.append(f"{param}/{name}: {type(exc).__name__}: {msg}")
            print(fails[-1], flush=True)
            if "--trace" in sys.argv:
                traceback.print_exc()
    con.close()
    return fails


def main() -> int:
    params = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not params:
        print(__doc__)
        return 2
    spark = get_spark(app_name="probe-sweep", cpus=8, shuffle_partitions=8)
    all_fails: list[str] = []
    for param in params:
        print(f"=== seed {param} ===", flush=True)
        fails = run_seed(spark, param)
        print(f"=== seed {param}: {len(fails)} failures ===", flush=True)
        all_fails.extend(fails)
    print(f"\nTOTAL: {len(all_fails)} failures over {len(params)} seeds")
    return 1 if all_fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
