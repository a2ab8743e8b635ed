"""Self-reported device-memory high-water (time_eval budget analog).

The reference's timing harness runs submissions in a container with
`-m 28g` host RAM (baseline/cellseg_time_eval.py:69) and the challenge
caps GPU memory at 10 GB (README.md:127). The host side is observable
from outside (process-tree RSS, cli/time_eval.py), but device HBM is
only visible to the process that owns the backend — so the harness sets
``CELLSEG_RECORD_HBM=<path>`` in the child environment and our predict
CLIs call :func:`maybe_record_hbm` on exit to drop the device allocator's
high-water mark there.
"""

from __future__ import annotations

import json
import os


def maybe_record_hbm() -> None:
    """If CELLSEG_RECORD_HBM names a path, write the first local device's
    allocator stats (peak/current/limit bytes) there as JSON. Never raises:
    a missing stats API (CPU backend, some plugin backends) records the
    reason instead of failing the prediction run."""
    path = os.environ.get("CELLSEG_RECORD_HBM")
    if not path:
        return
    rec: dict = {}
    try:
        import jax

        dev = jax.local_devices()[0]
        rec["device"] = str(dev)
        stats = dev.memory_stats()
        if stats:
            for k in ("peak_bytes_in_use", "bytes_in_use", "bytes_limit",
                      "largest_alloc_size"):
                if k in stats:
                    rec[k] = int(stats[k])
        else:
            rec["error"] = "memory_stats() returned no data"
    except Exception as e:  # noqa: BLE001 — reporting must not kill the run
        rec["error"] = f"{type(e).__name__}: {e}"
    try:
        with open(path, "w") as f:
            json.dump(rec, f)
    except OSError:
        pass
