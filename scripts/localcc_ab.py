"""A/B microbench: block-local-converge CC decode vs the round-4 global
propagation decode, same 4.2 MP synthetic slide (VERDICT r5 item 1).

Old/new run in SEPARATE subprocesses (the decode's inner @jax.jit stages
are module-level caches, so in-process monkeypatching silently reuses the
first trace) — gated by CELLSEG_NO_LOCALCC. Chained timing: dispatch n
calls back-to-back and sync once, so the ~28 ms tunnel RTT is amortized.

Run on the real chip: python scripts/localcc_ab.py [H]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_CHILD = """
import json, sys, time
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np
from bench import make_slide
from cellseg_tpu.decode.threeclass import decode_interior_prob

H = %(H)d
img = make_slide(H, H, n_cells=2000 * (H * H) // (2048 * 2048))
prob = jnp.asarray((img.astype(np.float32) - 30.0) / 150.0).clip(0, 1)
def sync(o):
    # block_until_ready returns at enqueue on the axon tunnel; force a
    # dependent scalar fetch instead
    return float(jnp.max(o))

out = decode_interior_prob(prob)
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
    outs = [decode_interior_prob(prob) for _ in range(20)]
    sync(outs[-1])
    ts.append(((time.perf_counter() - t0) - rtt) * 1e3 / 20)
# single-call (one sync per call) timing too
ss = []
for _ in range(10):
    t0 = time.perf_counter()
    sync(decode_interior_prob(prob))
    ss.append((time.perf_counter() - t0 - rtt) * 1e3)
print(json.dumps({"chained_ms": float(np.median(ts)),
                  "single_ms": float(np.median(ss)),
                  "rtt_ms": rtt * 1e3,
                  "instances": int(np.asarray(out).max())}))
"""


def run(tag: str, H: int, env_extra: dict) -> dict:
    env = dict(os.environ, **env_extra)
    out_npy = f"/tmp/localcc_ab_{tag}.npy"
    code = _CHILD % {"repo": REPO, "H": H, "out": out_npy}
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

    new = run("new", H, {"CELLSEG_LOCALCC": "1"})
    old = run("old", H, {})
    a = np.load(old["npy"])
    b = np.load(new["npy"])
    assert np.array_equal(a, b), (
        f"local-converge decode is not bit-identical! "
        f"{(a != b).sum()} px differ, {a.max()} vs {b.max()} instances")
    print(f"parity OK: {a.max()} instances at {H}x{H}")
    print(f"old decode: chained {old['chained_ms']:.1f} ms"
          f"  single {old['single_ms']:.1f} ms")
    print(f"new decode: chained {new['chained_ms']:.1f} ms"
          f"  single {new['single_ms']:.1f} ms")
    print(f"speedup (chained): {old['chained_ms'] / new['chained_ms']:.2f}x")


if __name__ == "__main__":
    main()
