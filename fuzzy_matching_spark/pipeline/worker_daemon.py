"""Python worker daemon that pre-imports the heavy scientific stack.

Spark forks every Python worker from the daemon process
(``spark.python.daemon.module``), so anything imported HERE is shared with
all workers copy-on-write.  Without this, each of the N concurrent workers
of the first Python stage re-imports numpy/pandas/pyarrow independently —
~100 MB of first-touch page faults per worker, which some hypervisors
(including this sandbox's) serialize box-wide, turning session warm-up into
an O(N_workers) serial cost.  Pre-importing in the daemon pays that cost
once.

This is a deployment-level optimization with zero semantic effect: workers
run the exact same ``pyspark.daemon.manager`` loop.  On a real cluster the
same trick amortizes executor-side worker spin-up for short queries.

Enabled by ``session.build_session`` via
``spark.python.daemon.module=fuzzy_matching_spark.pipeline.worker_daemon``.
"""

# Heavy third-party stack first — these dominate the fault cost.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:  # the Arrow<->pandas bridge pyspark's serializers touch on first batch
    import pyarrow.pandas_compat  # noqa: F401
except ImportError:  # pragma: no cover - optional internal module
    pass

# The worker entrypoint itself (pyspark.worker pulls in the SQL serializer
# stack); failure is non-fatal — the worker imports it itself on first use.
try:
    import pyspark.worker  # noqa: F401
except Exception:  # pragma: no cover
    pass

# Our own kernels (referenced by every scoring / shingling UDF).  Guarded:
# the daemon must still come up if the package isn't importable on some
# node's PYTHONPATH — workers then import it per-process as usual.
try:
    import fuzzy_matching_spark.kernel.batchfuzz  # noqa: F401
    import fuzzy_matching_spark.kernel.batchlcs  # noqa: F401
    import fuzzy_matching_spark.operators.minhash  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
