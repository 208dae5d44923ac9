"""Ship executor-bound kernels by value, not by module reference.

Spark serializes Python UDFs with cloudpickle, which pickles functions from
importable modules *by reference* — the workers would then need
`etl_pipeline_spark` on their own sys.path, which is not guaranteed (the
engine may be driven from any cwd, and a cluster's executors don't share
the driver's PYTHONPATH). Registering our kernel modules for by-value
pickling makes every pandas UDF self-contained on the wire.
"""

from __future__ import annotations

import sys


def pickle_module_by_value(module_name: str) -> None:
    """Best-effort: register the module with pyspark's cloudpickle so its
    functions serialize by value into UDF closures."""
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - pyspark is a hard dependency
        return
    mod = sys.modules.get(module_name)
    if mod is not None and hasattr(cloudpickle, "register_pickle_by_value"):
        cloudpickle.register_pickle_by_value(mod)
