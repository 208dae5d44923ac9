"""Scratch probe harness: run the randomized-fixture parity sweep over
FRESH seeds (and optional tiny truncations) without pytest overhead.

Usage: python scripts/probe_sweep.py SEED [SEED ...]
       python scripts/probe_sweep.py tiny401 401 419
       python scripts/probe_sweep.py empty401   # zero-row FACT tables

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


def run_seed(spark, param: str) -> list[str]:
    tiny = param.startswith("tiny")
    empty = param.startswith("empty")
    one = param.startswith("one")
    seed = int(param.lstrip("tinyemptyone") or "11")
    out = tempfile.mkdtemp(prefix=f"probe_{param}_")
    _gen_star(out, seed=seed)
    if tiny or empty or one:
        import pyarrow.parquet as pq

        for t, k in _TINY_KEEP.items():
            keep = 0 if empty else 1 if one else k
            tbl = pq.read_table(f"{out}/{t}.parquet")
            pq.write_table(tbl.slice(0, keep), f"{out}/{t}.parquet")
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
