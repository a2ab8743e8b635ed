"""Spatially-sharded flow-field instance decoding (gigapixel cellpose
capability — VERDICT r4 item 4, BASELINE.json config #5).

Shards the gather-free `propagate` tracker (decode/flow.py:_decode_propagate)
over a row-striped mesh. Every pointer-graph operation in that tracker is a
static ±2 px window select (the 2-hop seeded successor of unit flows fits a
5×5 window), so the halo contract is tiny and exact:

  - successor code plane: built once from 1-row flow ghosts (hop 2 samples
    the flow at a ±1 offset), then shipped with 2-row ghosts;
  - mass push: each hop moves mass ≤ 2 px → 2-row mass ghosts per hop;
  - attractor cores: 3×3 dilation + global CC via the sharded
    spatial_label_components (global root ids);
  - basin assignment: backward label propagation, 2-row label ghosts per
    round, pmax change flag — identical fixed point to the single-device
    tracker, so after the final sequential relabel the instance maps are
    bit-equal (pinned by tests/test_spatial_flow.py seam cases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .spatial import AXIS, _perm, spatial_label_components

_OFFS = [(k // 5 - 2, k % 5 - 2) for k in range(25)]


def _read_at_ext(arr, dy, dx, fill):
    """out[y, x] = arr[y + dy, x + dx] on a VMEM-resident block (static
    offset, `fill` outside) — decode/flow.py:_read_at."""
    h, w = arr.shape
    pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
    padded = jnp.pad(arr, pad, constant_values=fill)
    return jax.lax.dynamic_slice(padded, (max(dy, 0), max(dx, 0)), (h, w))


def _ghosts(arr, k, n_dev, fill):
    """k boundary rows from each stripe neighbor (fill at canvas edges)."""
    idx = jax.lax.axis_index(AXIS)
    top = jax.lax.ppermute(arr[-k:], AXIS, _perm(n_dev, True))
    top = jnp.where(idx == 0, jnp.full_like(top, fill), top)
    bot = jax.lax.ppermute(arr[:k], AXIS, _perm(n_dev, False))
    bot = jnp.where(idx == n_dev - 1, jnp.full_like(bot, fill), bot)
    return jnp.concatenate([top, arr, bot], axis=0)


def spatial_decode_flow(flow, cellprob, mesh: Mesh,
                        prob_threshold: float = 0.0,
                        n_iter: int = 100) -> np.ndarray:
    """flow (H_pad, W_pad, 2) + cellprob (H_pad, W_pad), row-sharded over
    `mesh`; returns host int32 instance labels (sequential ids), bit-equal
    to decode_flow(method='propagate') + relabel_sequential on the same
    canvas. H_pad must be a multiple of n_dev (stripe ≥ 8)."""
    from ..metrics import relabel_sequential

    n_dev = mesh.shape[AXIS]
    h_pad, w_pad = cellprob.shape
    stripe = h_pad // n_dev
    if stripe * n_dev != h_pad or stripe < 8:
        raise ValueError(f"H_pad {h_pad} must split into n_dev={n_dev} "
                         f"stripes of ≥ 8 rows")
    sharding = NamedSharding(mesh, P(AXIS, None))
    fy = jax.device_put(jnp.asarray(flow[..., 0], jnp.float32), sharding)
    fx = jax.device_put(jnp.asarray(flow[..., 1], jnp.float32), sharding)
    prob = jax.device_put(jnp.asarray(cellprob, jnp.float32), sharding)

    t_push = max(4, min(16, n_iter // 8))

    def code_and_mass(fy_s, fx_s, prob_s):
        """Successor code plane + landing-mass plane for one stripe."""
        fy_s = fy_s.reshape(stripe, w_pad)
        fx_s = fx_s.reshape(stripe, w_pad)
        mask = prob_s.reshape(stripe, w_pad) > prob_threshold
        idx = jax.lax.axis_index(AXIS)

        # hop arithmetic on 1-row-extended stripes with GLOBAL row coords
        fye = _ghosts(fy_s, 1, n_dev, 0.0)
        fxe = _ghosts(fx_s, 1, n_dev, 0.0)
        he = stripe + 2
        y0 = (idx * stripe - 1).astype(jnp.float32)
        yf = (jax.lax.broadcasted_iota(jnp.float32, (he, w_pad), 0) + y0)
        xf = jax.lax.broadcasted_iota(jnp.float32, (he, w_pad), 1)
        p1y = jnp.clip(yf + fye, 0.0, h_pad - 1.0)
        p1x = jnp.clip(xf + fxe, 0.0, w_pad - 1.0)
        o1y = jnp.clip(jnp.round(p1y) - yf, -1, 1).astype(jnp.int32)
        o1x = jnp.clip(jnp.round(p1x) - xf, -1, 1).astype(jnp.int32)
        c1 = (o1y + 1) * 3 + (o1x + 1)
        d2y, d2x = fye, fxe
        for k in range(9):
            oy, ox = k // 3 - 1, k % 3 - 1
            if oy == 0 and ox == 0:
                continue
            sel = c1 == k
            d2y = jnp.where(sel, _read_at_ext(fye, oy, ox, 0.0), d2y)
            d2x = jnp.where(sel, _read_at_ext(fxe, oy, ox, 0.0), d2x)
        p2y = jnp.clip(p1y + d2y, 0.0, h_pad - 1.0)
        p2x = jnp.clip(p1x + d2x, 0.0, w_pad - 1.0)
        oy2 = jnp.clip(jnp.round(p2y) - yf, -2, 2).astype(jnp.int32)
        ox2 = jnp.clip(jnp.round(p2x) - xf, -2, 2).astype(jnp.int32)
        code = ((oy2 + 2) * 5 + (ox2 + 2)).astype(jnp.int8)[1:-1]

        # mass push: transit mass decays, attractor mass accumulates
        code_e = _ghosts(code, 2, n_dev, -1)
        m = mask.astype(jnp.int8)

        def push(_, m):
            m_e = _ghosts(m, 2, n_dev, 0)
            acc = jnp.zeros((stripe + 4, w_pad), jnp.int32)
            for k, (dy, dx) in enumerate(_OFFS):
                src_code = _read_at_ext(code_e, -dy, -dx, -1)
                src_m = _read_at_ext(m_e, -dy, -dx, 0).astype(jnp.int32)
                acc = acc + jnp.where(src_code == k, src_m, 0)
            return jnp.minimum(acc, 100).astype(jnp.int8)[2:-2]

        mass = jax.lax.fori_loop(0, t_push, push, m)
        return code, mass, mask

    code, mass, mask = jax.jit(shard_map(
        code_and_mass, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
        check_vma=False,
    ))(fy, fx, prob)

    # attractor cores → global component ids (sharded CC); reduce_window
    # under jit auto-partitions with its own halo exchange
    @jax.jit
    def dilate(mass):
        core = (mass > 2).astype(jnp.int32)
        return jax.lax.reduce_window(
            core, 0, jax.lax.max, (3, 3), (1, 1), "SAME") > 0

    basins = spatial_label_components(dilate(mass), mesh, connectivity=2)

    def assign(code_s, basins_s, mask_s):
        code_s = code_s.reshape(stripe, w_pad)
        lab = basins_s.reshape(stripe, w_pad)
        mask_s = mask_s.reshape(stripe, w_pad)
        # the code ghosts are loop-invariant: ship them once
        code_e = _ghosts(code_s, 2, n_dev, -1)

        def body(state):
            lab, _, it = state
            lab_e = _ghosts(lab, 2, n_dev, 0)
            cand = lab_e
            for k, (dy, dx) in enumerate(_OFFS):
                if dy == 0 and dx == 0:
                    continue
                cand = jnp.where(code_e == k,
                                 _read_at_ext(lab_e, dy, dx, 0), cand)
            new = jnp.where(lab_e > 0, lab_e, cand)[2:-2]
            changed = jax.lax.pmax(jnp.any(new != lab), AXIS)
            return new, changed, it + 1

        def cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < n_iter)

        lab = jax.lax.while_loop(
            cond, body, (lab, jnp.bool_(True), jnp.int32(0)))[0]
        return jnp.where(mask_s, lab, 0)

    labels = jax.jit(shard_map(
        assign, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=P(AXIS, None),
        check_vma=False,
    ))(code, basins, mask)
    host = np.asarray(jax.device_get(labels)).astype(np.int32)
    return relabel_sequential(host)
