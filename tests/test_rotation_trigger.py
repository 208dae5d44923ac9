"""Rotation-trigger enforcement (round-10 verdict item #2).

The driver proves correctness only for ``PRIORITY[:50]`` per round, so
the invariant is: every query whose RESULT could have changed since its
last driver proof must sit inside that window. Round 10 broke this by
diffing only registered-function bodies — helper kernels and one oracle
string changed without the consuming queries rotating in.

``scripts/rotation_snapshot.py`` fingerprints each query as
md5(full oracle text + transitive reachable package source) and stores
the last driver-proven state in ``scripts/rotation_snapshot.json``.
These tests recompute the fingerprints at HEAD and fail if any changed
query is outside the window — making the rotation rule mechanical
instead of bookkeeping. Pointed retroactively at the round-10 commits
(efa9d64 snapshot → 3068aa9 check), the same predicate flags all four
multimodal misses the r10 verdict named PLUS pagerank_part_supplier /
textrank_keywords (their memoized-relation plumbing in
utils/session_cache.py changed that round) — both rotated into the
round-11 window alongside the four.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

sys.path.insert(0, os.path.join(_REPO, "scripts"))
import rotation_snapshot as rs  # noqa: E402


def test_snapshot_file_exists():
    assert os.path.exists(rs.SNAPSHOT_PATH), (
        "scripts/rotation_snapshot.json missing — run "
        "`python scripts/rotation_snapshot.py init` after a full local "
        "drive_contract proof"
    )


def test_snapshot_covers_registry():
    from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    snap = rs.load_snapshot()
    win = set(rs.window())
    missing = [n for n in REGISTRY if n not in snap and n not in win]
    assert not missing, (
        f"queries with no snapshot row and outside the window: {missing} "
        "— a new query must enter through PRIORITY[:50]"
    )


def test_changed_queries_are_inside_driver_window():
    win = set(rs.window())
    bad = {
        name: kind
        for name, kind in rs.changed_queries().items()
        if name not in win and name not in rs.ROTATION_EXEMPT
    }
    assert not bad, (
        "queries whose oracle text or reachable plan source changed since "
        f"their last driver proof are OUTSIDE PRIORITY[:50]: {sorted(bad)} — "
        "rotate them into the window (registry.py) or, for a proven "
        "result-neutral repo-wide refactor, add a ROTATION_EXEMPT entry "
        "with its justification"
    )


def test_fingerprints_are_process_deterministic():
    """Guards the failure mode that would make this check cry wolf:
    reprs of runtime state (cache dicts, object addresses) leaking into
    fingerprints. A fresh interpreter must reproduce ours exactly."""
    mine = rs.fingerprints()
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import rotation_snapshot as rs, json; "
        "print(json.dumps(rs.fingerprints()))" % os.path.join(_REPO, "scripts")
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=_REPO
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    theirs = json.loads(out.stdout.strip().splitlines()[-1])
    diff = {k for k in set(mine) | set(theirs) if mine.get(k) != theirs.get(k)}
    assert not diff, f"fingerprints differ across processes: {sorted(diff)[:10]}"


def test_trigger_catches_helper_and_oracle_changes():
    """Sensitivity: the fingerprint must move when (a) an oracle string
    moves, (b) a function-local-imported kernel's source moves — the two
    exact shapes of the round-10 miss."""
    from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    spec = REGISTRY["multimodal_audio_features"]
    parts = rs._transitive_parts(spec.spark_fn)
    # (b): the kernel is imported INSIDE the plan function, so only the
    # AST import walk can see it
    assert any("audio_band_energies" in k for k in parts), sorted(parts)[:20]
    base = rs.fingerprints()["multimodal_audio_features"]

    # (a): oracle text participates — rebuild the hash with a mutated
    # oracle and confirm it moves
    import hashlib

    h = hashlib.md5()
    h.update(((spec.oracle or "") + " -- mutated").encode())
    for key, text in sorted(parts.items()):
        h.update(key.encode())
        h.update(text.encode())
    assert h.hexdigest() != base
