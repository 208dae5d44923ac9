"""Lint pin for the engine-rounding convention (utils/rounding.py).

Two rounding-semantics incidents in two rounds (the markov/Holt-Winters
HALF_UP sweep in r7, the croston stream repr-convention fix in r8) share
one root cause: Python's builtin ``round()`` and numpy's
``rint``/``round``/``around`` are HALF-TO-EVEN and match NEITHER
engine's ROUND. This test walks the package AST and fails on any NEW
call to those functions, so the class of bug cannot be reintroduced
silently — a new legitimate use must be added to the allowlist below
with a justification.

Allowlisted (each is safe because the SAME Python-computed value feeds
BOTH engines, so no convention can diverge between them):

* ``operators/sampling.py`` — ``int(round(rate * _BUCKETS))`` bakes one
  integer threshold into the IDENTICAL SQL text both Spark and DuckDB
  execute; the rounding convention is irrelevant as long as it is
  deterministic.

String-embedded SQL ``round(...)`` (engine-side ROUND inside oracle /
expr text) never appears as an AST Call and is therefore naturally out
of scope — this lint targets DRIVER-side Python rounding only.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "etl_pipeline_spark"

# file (relative to package root) -> set of allowed builtin-round lines
_ALLOW_BUILTIN_ROUND = {
    "operators/sampling.py",  # identical-literal injection into both SQL texts
}

_NUMPY_HALF_EVEN = {"rint", "round", "around", "round_"}


def _numpy_aliases(tree: ast.Module) -> set[str]:
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name == "numpy":
                    names.add(a.asname or "numpy")
    return names


def test_no_half_to_even_rounding_on_driver_values():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        rel = py.relative_to(PKG).as_posix()
        tree = ast.parse(py.read_text(), filename=rel)
        np_names = _numpy_aliases(tree) | {"np", "numpy"}
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            f = node.func
            if isinstance(f, ast.Name) and f.id == "round":
                if rel not in _ALLOW_BUILTIN_ROUND:
                    offenders.append(f"{rel}:{node.lineno} builtin round()")
            elif (
                isinstance(f, ast.Attribute)
                and f.attr in _NUMPY_HALF_EVEN
                and isinstance(f.value, ast.Name)
                and f.value.id in np_names
            ):
                offenders.append(f"{rel}:{node.lineno} numpy {f.attr}()")
    assert not offenders, (
        "half-to-even rounding on driver-side values — use "
        "utils/rounding.round6_half_up (DuckDB ROUND) or "
        "operators/similarity._round6 (Spark F.round) per the comparison "
        "target, or extend the allowlist with a justification:\n"
        + "\n".join(offenders)
    )


def test_allowlist_entries_still_exist():
    """An allowlist entry whose file no longer uses builtin round() is
    stale — prune it so the lint stays tight."""
    for rel in _ALLOW_BUILTIN_ROUND:
        tree = ast.parse((PKG / rel).read_text(), filename=rel)
        uses = [
            n
            for n in ast.walk(tree)
            if isinstance(n, ast.Call)
            and isinstance(n.func, ast.Name)
            and n.func.id == "round"
        ]
        assert uses, f"stale allowlist entry: {rel}"
