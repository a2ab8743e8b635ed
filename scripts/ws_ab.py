"""A/B microbench: block-local watershed flood vs the plain-XLA relax
flood, on the distance bench's realistic EDT-target workload (VERDICT r5
item 3). Subprocess-isolated via CELLSEG_NO_PALLAS; chained timing with
forced materialization (block_until_ready returns at enqueue on the axon
tunnel).

The round-4 k-fold sweep kernel (CELLSEG_NO_WSLOCAL=1 alone) no longer
compiles at 2048² under the current libtpu: XLA places the custom-call
result tuple in scoped VMEM inside the while body (18.12M vs the 16M
scoped limit) — a toolchain regression on the legacy escape-hatch path,
not the default (ws_local) route. Its round-4 on-chip number (30.7 ms
net at 4.2 MP, BENCH_EXTRA_r04.json) is the historical reference; the
measured baseline here is the XLA relax loop.

Run on the real chip: python scripts/ws_ab.py [H]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_GEN = """
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
from bench import make_slide
from cellseg_tpu.pipeline.distance_labels import distance_label_2d

H = W = %(H)d
n_cells = max(8, int(1200 * (H * W) / (2048 * 2048)))
_, labels = make_slide(H, W, n_cells=n_cells, seed=0, return_labels=True)
cell_t, neigh_t = distance_label_2d(labels, cell_radius=25,
                                    neighbor_radius=50)
np.savez(%(cache)r, cell=cell_t.astype(np.float32),
         neigh=neigh_t.astype(np.float32))
print("cached", %(cache)r)
"""

_CHILD = """
import json, sys, time
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np
from cellseg_tpu.decode.distance import _flood, _seeds_and_mask

H = W = %(H)d
_z = np.load(%(cache)r)
border_d = jnp.asarray(_z["neigh"])
cell_d = jnp.asarray(_z["cell"])
th_cell, th_seed = jnp.float32(0.07), jnp.float32(0.45)
cell_s, mask, seeds = _seeds_and_mask(cell_d, border_d, th_cell, th_seed)

def sync(o):
    return float(jnp.max(o))

out = _flood(cell_s, seeds, mask)
sync(out)
np.save(%(out)r, np.asarray(out))
tiny = jnp.zeros((8,), jnp.float32)
sync(tiny)
_rs = []
for _ in range(5):
    t0 = time.perf_counter(); sync(tiny)
    _rs.append(time.perf_counter() - t0)
rtt = float(np.median(_rs))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    outs = [_flood(cell_s, seeds, mask) for _ in range(10)]
    sync(outs[-1])
    ts.append(((time.perf_counter() - t0) - rtt) * 1e3 / 10)
# seeds stage too (shares the CC machinery)
ss = []
for _ in range(5):
    t0 = time.perf_counter()
    outs = [_seeds_and_mask(cell_d, border_d, th_cell, th_seed)[2]
            for _ in range(10)]
    sync(outs[-1])
    ss.append(((time.perf_counter() - t0) - rtt) * 1e3 / 10)
print(json.dumps({"flood_ms": float(np.median(ts)),
                  "seeds_ms": float(np.median(ss)),
                  "rtt_ms": rtt * 1e3,
                  "instances": int(np.asarray(out).max())}))
"""


def _cache_path(H: int) -> str:
    return f"/tmp/ws_ab_inputs_{H}.npz"


def ensure_inputs(H: int) -> None:
    """Generate the EDT-target workload ONCE (host-side distance_label_2d
    at 2048² costs ~15 min on this 1-core box — the two A/B children load
    the cached npz instead of regenerating)."""
    if os.path.exists(_cache_path(H)):
        return
    code = _GEN % {"repo": REPO, "H": H, "cache": _cache_path(H)}
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=3600,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))
    if r.returncode != 0:
        print(r.stderr[-3000:])
        raise SystemExit("input generation failed")


def run(tag: str, H: int, env_extra: dict) -> dict:
    env = dict(os.environ, **env_extra)
    out_npy = f"/tmp/ws_ab_{tag}.npy"
    code = _CHILD % {"repo": REPO, "H": H, "out": out_npy,
                     "cache": _cache_path(H)}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout)
        print(r.stderr[-3000:])
        raise SystemExit(f"{tag} child failed")
    res = json.loads(r.stdout.strip().splitlines()[-1])
    res["npy"] = out_npy
    return res


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    import numpy as np

    ensure_inputs(H)
    new = run("new", H, {})
    old = run("old", H, {"CELLSEG_NO_PALLAS": "1"})
    a = np.load(old["npy"])
    b = np.load(new["npy"])
    if np.array_equal(a, b):
        print(f"parity EXACT: {a.max()} instances at {H}x{H}")
    else:
        diff = int((a != b).sum())
        print(f"parity: {diff} px differ ({diff / a.size:.2e} of image), "
              f"{a.max()} vs {b.max()} instances "
              f"(lex-tie residue is order-dependent — see ws_local.py)")
    for tag, r in (("old", old), ("new", new)):
        print(f"{tag}: flood {r['flood_ms']:.1f} ms  seeds "
              f"{r['seeds_ms']:.1f} ms  (rtt {r['rtt_ms']:.1f})")
    print(f"flood speedup: {old['flood_ms'] / new['flood_ms']:.2f}x")


if __name__ == "__main__":
    main()
