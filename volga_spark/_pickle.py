"""Self-contained UDF pickling.

Executor Python workers don't have this repo on sys.path when the driver
imports it from an arbitrary location, so every module whose functions are
captured in UDF closures must be registered for pickle-by-value."""

from __future__ import annotations


def register_by_value(*modules) -> None:
    try:
        from pyspark.cloudpickle import register_pickle_by_value

        for m in modules:
            register_pickle_by_value(m)
    except Exception:  # best effort — PYTHONPATH-propagated setups still work
        pass
