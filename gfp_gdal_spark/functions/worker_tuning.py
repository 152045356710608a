"""Python-worker-side tuning, called once per worker process.

Measured on the sandbox VM (32 concurrent workers): pyarrow's bundled
jemalloc releases large extents back to the kernel immediately
(madvise storms -> TLB-shootdown IPIs -> sys-time-dominated walls,
2-4x slowdowns). Batching the release with a 10s decay removed the
pathology. Idempotent and safe to call in every mapInArrow/mapInPandas
generator.
"""

from __future__ import annotations

_done = False


def tune_worker() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(10_000)
    except Exception:
        pass  # non-jemalloc build: nothing to tune
