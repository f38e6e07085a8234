"""Allocator tuning for slow-page-fault sandboxes.

In this environment, freshly mmap'd pages fault at ~20 MB/s (Firecracker
lazy faulting), while warm memory runs at GB/s. glibc by default munmaps
large frees, so every numpy temporary above the mmap threshold re-faults
its pages — an effective 100x slowdown on vectorized kernels.

``tune_allocator()`` raises the malloc mmap/trim thresholds so big blocks
come from (and return to) the reusable heap. Called at the top of every
Arrow UDF and driver entry point; idempotent and a safe no-op where
mallopt is unavailable. The numpy kernels additionally process input in
bounded chunks so the one-time fault cost per worker stays small.
"""

from __future__ import annotations

_TUNED = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_allocator(threshold: int = 1 << 30) -> bool:
    global _TUNED
    if _TUNED:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, threshold)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, threshold)
        _TUNED = bool(ok1 and ok2)
    except Exception:  # noqa: BLE001 - non-glibc platforms
        _TUNED = False
    return _TUNED
