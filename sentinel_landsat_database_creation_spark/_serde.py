"""Worker-side serialization helpers.

Modules that define Python-executed closures (applyInPandas group maps,
mapInPandas decoders) register themselves for cloudpickle by-value
serialization, so their functions ship inside the task payload instead
of by module reference. Without this, executors whose Python workers
don't have the repo on PYTHONPATH die with ModuleNotFoundError — true on
any real cluster and for any driver process launched outside the repo.
"""

from __future__ import annotations

import sys


def register_self(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:
        # Best-effort: fall back to by-reference (works when the repo is
        # importable on workers, e.g. pytest running from the repo root).
        pass
