"""Shared platform/kill-switch gate for the Pallas TPU kernels.

Every Pallas entry point (scans, CC sweeps, watershed sweeps) consults
`pallas_allowed()` before compiling a kernel. Besides the platform check
it honors the CELLSEG_NO_PALLAS=1 environment kill-switch: flipping it
routes every caller onto the pure-XLA fallback path (which is bit-parity
pinned by tests), so a suspected kernel fault on a flaky chip can be
bisected — or worked around in production — without a code change.
"""

from __future__ import annotations

import os

import jax


def pallas_allowed() -> bool:
    """True iff the backend is a TPU and the kill-switch is not set."""
    if os.environ.get("CELLSEG_NO_PALLAS", "").strip() in ("1", "true", "yes"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    return platform in ("tpu", "axon")
