"""On-device connected-components labeling (XLA, static shapes).

The reference decodes instances on host with skimage.measure.label /
remove_small_objects / remove_small_holes (baseline/predict.py:113), a
Cython hot path with a full-image device→host round trip. Here labeling
runs entirely on device.

TPU cost model (measured on v5e): windowed min sweeps cost ~0.1 ms per
4.2 MP pass, while arbitrary gathers/scatters cost 30–40 ms. The labeling
loop therefore uses ONLY window/scan primitives:

  - 3×3 (or plus-shaped) reduce_window min sweeps propagate labels locally;
  - segmented min-scans along rows and columns jump labels across entire
    mask runs in one pass (log-depth associative scan), which collapses
    blob interiors in a couple of outer iterations.

A fixed point of the sweep (no pixel changed) is exactly full convergence,
so the while_loop's exit condition is also the correctness proof. The only
gather in the whole pipeline is the final rank lookup for sequential
relabeling (one pass), and areas use one scatter-add — both unavoidable
and paid once, not per iteration.

Label order parity: a component's converged label is its minimum linear
index == its first pixel in raster order, so ranking roots reproduces
scipy/skimage first-encounter ordering exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF_I = 2**31 - 1  # python int for pad fills / reduce_window init
_INF = jnp.int32(_INF_I)


def _fused_sweeps_config(h: int, w: int):
    """Pick a (stripe, k) for the Pallas fused-sweep kernel, or None.

    VMEM budget: the kernel keeps ~8 live (stripe+2k, w) int32 blocks on
    the scoped-VMEM stack; cap that at ~12 MB. Wider images get smaller
    stripes/k; beyond the budget the caller falls back to plain sweeps.
    """
    from .pallas.gate import pallas_allowed

    if not pallas_allowed():
        return None
    if w % 128 != 0:
        return None
    budget = 12 * 2**20
    for stripe, k in ((128, 16), (64, 8), (32, 8)):
        if h % stripe != 0 or h < 2 * stripe or stripe < k:
            continue
        if (stripe + 2 * k) * w * 4 * 8 <= budget:
            return stripe, k
    return None


def _sweep_min(lab: jax.Array, mask: jax.Array, connectivity: int) -> jax.Array:
    """One masked neighbor-min sweep via reduce_window (no gathers)."""
    if connectivity == 2:
        m = jax.lax.reduce_window(lab, 2**31 - 1, jax.lax.min,
                                  (3, 3), (1, 1), "SAME")
    else:
        mv = jax.lax.reduce_window(lab, 2**31 - 1, jax.lax.min,
                                   (3, 1), (1, 1), "SAME")
        mh = jax.lax.reduce_window(lab, 2**31 - 1, jax.lax.min,
                                   (1, 3), (1, 1), "SAME")
        m = jnp.minimum(mv, mh)
    return jnp.where(mask, m, _INF)


def _shift(arr: jax.Array, d: int, axis: int, fill) -> jax.Array:
    """Shift along axis by d (positive = toward higher index), filling."""
    h, w = arr.shape
    if axis == 0:
        pad = ((d, 0), (0, 0)) if d > 0 else ((0, -d), (0, 0))
        start = (0, 0) if d > 0 else (-d, 0)
    else:
        pad = ((0, 0), (d, 0)) if d > 0 else ((0, 0), (0, -d))
        start = (0, 0) if d > 0 else (0, -d)
    padded = jnp.pad(arr, pad, constant_values=fill)
    return jax.lax.dynamic_slice(padded, start, (h, w))


def _segmented_min_scan(lab: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """Propagate the min label across contiguous mask runs along an axis.

    Hand-lowered log-doubling segmented scan (Hillis–Steele): at step d a
    pixel absorbs the running min from distance d away unless a segment
    boundary (unmasked pixel) lies between. Both directions fused. The
    explicit shift formulation compiles orders of magnitude faster than
    lax.associative_scan's generic lowering at these sizes.
    """
    size = lab.shape[axis]
    # forward state: (value = running prefix min, open = no boundary yet
    # between the segment start candidate and this pixel)
    fv, fo = lab, mask
    bv, bo = lab, mask
    d = 1
    while d < size:
        fv = jnp.where(fo, jnp.minimum(fv, _shift(fv, d, axis, _INF_I)), fv)
        fo = jnp.logical_and(fo, _shift(fo, d, axis, False))
        bv = jnp.where(bo, jnp.minimum(bv, _shift(bv, -d, axis, _INF_I)), bv)
        bo = jnp.logical_and(bo, _shift(bo, -d, axis, False))
        d *= 2
    return jnp.where(mask, jnp.minimum(fv, bv), _INF)


def _scan_rows_cols(lab: jax.Array, mask: jax.Array) -> jax.Array:
    """Row scan then column scan, via the Pallas VMEM kernels when the
    platform/shape gates allow (3 HBM passes per axis instead of ~20 —
    ops/pallas/scans.py), else the XLA log-doubling scans."""
    from .pallas.scans import (
        col_segmented_min_scan,
        row_segmented_min_scan,
        scans_supported,
    )

    h, w = lab.shape
    if scans_supported(h, w):
        lab = row_segmented_min_scan(lab, mask)
        return col_segmented_min_scan(lab, mask)
    lab = _segmented_min_scan(lab, mask, axis=1)
    return _segmented_min_scan(lab, mask, axis=0)


def _region_min_scan(lab: jax.Array, m: jax.Array, axis: int) -> jax.Array:
    """Propagate the min label across runs of EQUAL m-value along an axis.

    Region variant of _segmented_min_scan: instead of treating unmasked
    pixels as boundaries, EVERY pixel belongs to a segment — a maximal run
    of equal `m` values — so object runs and background runs are scanned
    simultaneously in one pass. Openness between i and i-d means all the
    m values in [i-d, i] are equal (log-doubling AND-composition).
    """
    size = lab.shape[axis]
    fo = (m == _shift(m, 1, axis, -1))
    bo = (m == _shift(m, -1, axis, -1))
    fv, bv = lab, lab
    d = 1
    while d < size:
        fv = jnp.where(fo, jnp.minimum(fv, _shift(fv, d, axis, _INF_I)), fv)
        fo = jnp.logical_and(fo, _shift(fo, d, axis, False))
        bv = jnp.where(bo, jnp.minimum(bv, _shift(bv, -d, axis, _INF_I)), bv)
        bo = jnp.logical_and(bo, _shift(bo, -d, axis, False))
        d *= 2
    return jnp.minimum(fv, bv)


def _scan_rows_cols_region(lab: jax.Array, m: jax.Array) -> jax.Array:
    """Row then column REGION min-scans (Pallas VMEM kernels when gated)."""
    from .pallas.scans import (
        col_segmented_min_scan,
        row_segmented_min_scan,
        scans_supported,
    )

    h, w = lab.shape
    if scans_supported(h, w):
        lab = row_segmented_min_scan(lab, m, region=True)
        return col_segmented_min_scan(lab, m, region=True)
    lab = _region_min_scan(lab, m, axis=1)
    return _region_min_scan(lab, m, axis=0)


def _propagate_region(lab: jax.Array, m: jax.Array,
                      max_iters: int = 1024) -> jax.Array:
    """Label propagation to the fixed point over EQUAL-m regions (4-conn).

    Same monotone fixed-point certificate as _propagate: body(S) == S
    forces the row/col region scans to be identities, i.e. every
    horizontal/vertical neighbor with the same m value already shares the
    pixel's label — exact 4-conn convergence for every region at once.

    Fast path: block-local convergence (ops/pallas/local_cc.py) — each
    row-stripe block iterates the scans to its LOCAL fixed point in VMEM
    (one HBM round trip buys all local iterations), then one full-height
    column region scan transports labels across stripe boundaries. The
    outer certificate is unchanged: identity of the stripe converge
    covers every horizontal adjacency (full-width rows), identity of the
    column scan every vertical one (full-height columns).
    """
    from .pallas.local_cc import local_cc_supported, stripe_converge
    from .pallas.scans import col_segmented_min_scan

    h, w = lab.shape
    if local_cc_supported(h, w):
        def body(state):
            lab, _, it = state
            new = stripe_converge(lab, m, region=True)
            new = col_segmented_min_scan(new, m, region=True)
            return new, jnp.any(new != lab), it + 1
    else:
        def body(state):
            lab, _, it = state
            new = _scan_rows_cols_region(lab, m)
            return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    state = jax.lax.while_loop(
        cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
    return state[0]


@functools.partial(jax.jit, static_argnames=("max_iters",))
def region_roots(mask: jax.Array, max_iters: int = 1024) -> jax.Array:
    """4-conn component roots of BOTH the mask and its complement, fused.

    One propagation labels every pixel with the min linear index of its
    4-conn equal-mask-value component — the object components AND the
    background components in a single full-image pass (the label plane is
    full-image-sized either way, so fusing the two halves the propagation
    HBM traffic vs back-to-back _root_labels(mask) + _root_labels(~mask);
    this is the hole-fill + object-filter decode's hot pair).
    """
    h, w = mask.shape
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    return _propagate_region(lin, mask.astype(jnp.int32), max_iters)


def _cheap_body(lab: jax.Array, mask: jax.Array,
                connectivity: int) -> jax.Array:
    """One cheap propagation iteration: (leading 3×3 sweep for 8-conn) +
    row/col segmented scans. No trailing sweep — it is redundant for the
    fixed-point certificate: every op is monotone non-increasing, so
    body(S) == S forces each constituent op to be the identity at S;
    row/col scans identity ⟹ every horizontal/vertical mask neighbor
    shares the pixel's label (runs cover immediate neighbors), and for
    8-conn the leading 3×3 sweep identity ⟹ diagonals agree too. A
    fixed point is therefore exact CC convergence for the requested
    connectivity, sweep or not — and the sweep was ~half the per-
    iteration HBM traffic once the scans moved into VMEM kernels."""
    new = lab
    if connectivity == 2:
        new = _sweep_min(new, mask, connectivity)
    return _scan_rows_cols(new, mask)


def _propagate(lab: jax.Array, mask: jax.Array, connectivity: int,
               max_iters: int, cheap_iters: int = 12) -> jax.Array:
    """Run label propagation to the exact fixed point.

    Two phases: a cheap body (2 reduce_window sweeps + row/col segmented
    scans) that converges compact cell masks in a handful of iterations,
    then — only if still unconverged (labyrinthine masks, e.g. inverted
    backgrounds for hole filling) — a heavy body whose 16 sweeps per
    iteration run as one Pallas kernel pass (ops/pallas/sweeps.py),
    tripling the corner-turning rate per HBM round trip.
    """

    from .pallas.local_cc import local_cc_supported, stripe_converge
    from .pallas.scans import col_segmented_min_scan

    h, w = mask.shape
    if local_cc_supported(h, w):
        # block-local two-phase fast path: each body converges every
        # row-stripe block to its local fixed point in VMEM (one HBM
        # round trip buys all local iterations), then one full-height
        # column scan transports labels across stripe boundaries, so the
        # outer while only pays for cross-stripe label chains.
        # Certificate: at the outer fixed point the stripe converge is
        # the identity (covers every horizontal pair — full-width rows),
        # the column scan too (every vertical pair — full-height
        # columns), and for 8-conn the trailing global 3×3 sweep covers
        # the diagonal pairs that straddle a stripe boundary; all ops are
        # non-increasing, so the argument of _cheap_body applies
        # verbatim and the unique fixed point keeps bit-parity.
        mi = mask.astype(jnp.int32)

        def body_local(state):
            lab, _, it = state
            new = stripe_converge(lab, mi, connectivity=connectivity)
            new = col_segmented_min_scan(new, mi)
            if connectivity == 2:
                new = _sweep_min(new, mask, connectivity)
            return new, jnp.any(new != lab), it + 1

        def cond_local(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < max_iters)

        state = jax.lax.while_loop(
            cond_local, body_local, (lab, jnp.bool_(True), jnp.int32(0)))
        return state[0]

    def make_body(fused_cfg):
        def body(state):
            lab, _, it = state
            if fused_cfg is not None:
                from .pallas.sweeps import fused_sweeps

                stripe_sz, k = fused_cfg
                # no trailing sweep: same monotone-composition argument as
                # _cheap_body — fused_sweeps identity at the fixed point
                # already certifies the full neighbor relation
                new = fused_sweeps(lab, mask, k=k, stripe=stripe_sz,
                                   connectivity=connectivity)
                new = _scan_rows_cols(new, mask)
            else:
                # conn-1 paths are fully covered by the row/col scans, so
                # the 4-conn body skips leading sweeps entirely (measured
                # 16.7 → 7.4 ms for the 4.2 MP background pass); 8-conn
                # keeps one leading 3×3 sweep to merge diagonals
                new = _cheap_body(lab, mask, connectivity)
            changed = jnp.any(new != lab)
            return new, changed, it + 1

        return body

    h, w = mask.shape
    phase1_cap = min(cheap_iters, max_iters)

    def cond1(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < phase1_cap)

    state = jax.lax.while_loop(
        cond1, make_body(None), (lab, jnp.bool_(True), jnp.int32(0)))

    def cond2(s):
        _, changed, it = s
        return jnp.logical_and(changed, it < max_iters)

    state = jax.lax.while_loop(
        cond2, make_body(_fused_sweeps_config(h, w)), state)
    return state[0]


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label_components(mask: jax.Array, connectivity: int = 2,
                     max_iters: int = 1024) -> jax.Array:
    """Label connected components of a bool mask, skimage-order 1..K.

    connectivity: 1 → 4-neighborhood, 2 → 8-neighborhood
    (skimage.measure.label 2D default is 2).
    """
    h, w = mask.shape
    n = h * w
    lin = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(mask, lin, _INF)
    lab = _propagate(lab, mask, connectivity, max_iters)
    return sequential_from_roots(lab, mask, connectivity)


def sequential_from_roots(lab: jax.Array, mask: jax.Array,
                          connectivity: int = 1) -> jax.Array:
    """Converged root-index labels → sequential ids 1..K in raster order
    of the roots (the relabel tail shared by the decoders).

    Gather-free: the obvious `seq[root[p]]` lookup is a 4.2M-element random
    gather that costs 30-40 ms at 4 MP on v5e (ops/cc.py cost model, and
    exactly the unaccounted tail in the round-2 decode budget). Instead the
    root's sequential id is planted at the root pixel and broadcast over
    its component by the same seeded min-propagation the labeling uses —
    the segmented row/col scans flood a single-seed component in ~2
    iterations (~1 ms). `connectivity` must match the connectivity the
    roots were computed with, or diagonal-neighbor components could leak.
    """
    h, w = mask.shape
    n = h * w
    flat = lab.ravel()
    is_root = jnp.logical_and(flat == jnp.arange(n, dtype=jnp.int32),
                              mask.ravel())
    seq = jnp.cumsum(is_root.astype(jnp.int32))
    val0 = jnp.where(is_root, seq, _INF).reshape(h, w)
    out = _propagate(val0, mask, connectivity, max_iters=1024)
    return jnp.where(mask, out, 0)


def sequential_from_ranks(lab_ranks: jax.Array, r_plane: jax.Array,
                          roots: jax.Array, mask: jax.Array,
                          connectivity: int = 2) -> jax.Array:
    """Sequential 1..K relabel when the converged plane holds DENSE RANKS
    (rank_areas flow) instead of linear root indices.

    A pixel is its final component's representative iff it is a region
    root (roots == linear index) whose own rank won the merge
    (lab_ranks == r_plane there). Ranks are monotone in the root's linear
    index, so raster order of representatives reproduces skimage
    first-encounter label order exactly — same argument as
    sequential_from_roots, one seeded flood.
    """
    h, w = mask.shape
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    is_rep = jnp.logical_and(mask, jnp.logical_and(roots == lin,
                                                   lab_ranks == r_plane))
    seq = jnp.cumsum(is_rep.ravel().astype(jnp.int32)).reshape(h, w)
    val0 = jnp.where(is_rep, seq, _INF)
    out = _propagate(val0, mask, connectivity, max_iters=1024)
    return jnp.where(mask, out, 0)


def sequential_from_ranks_table(lab_ranks: jax.Array, r_plane: jax.Array,
                                roots: jax.Array, mask: jax.Array,
                                k_total: jax.Array,
                                connectivity: int = 2) -> jax.Array:
    """sequential_from_ranks without the final seeded propagation.

    The converged plane already holds DENSE ranks, so the sequential id of
    every pixel is a pure function of its rank: table[r] = #surviving
    representatives with rank ≤ r. The table is built with one MXU one-hot
    histogram over the representative pixels and applied with the 2×7-bit
    MXU value lookup (ops/rank_areas.py) — ~1.5 ms vs the ~5 ms seeded
    flood at 4.2 MP. Representative raster order is monotone in rank, so
    ids match sequential_from_ranks exactly; parity pinned by the decode
    goldens. Guarded: ranks above the 65536-bin budget (or a non-MXU
    backend) fall back to the propagation path.
    """
    from .rank_areas import (
        _BINS_SMALL,
        _RANK_BINS,
        _SIDE_SMALL,
        _mxu_dtype,
        counts_by_rank,
        rank_value_lookup,
    )

    if _mxu_dtype() is not jnp.bfloat16:
        return sequential_from_ranks(lab_ranks, r_plane, roots, mask,
                                     connectivity)

    def table_path(lab_ranks, r_plane, roots, mask, bins, side):
        h, w = mask.shape
        lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
        is_rep = jnp.logical_and(
            mask, jnp.logical_and(roots == lin, lab_ranks == r_plane))
        dense0 = jnp.clip(lab_ranks - 1, 0, bins - 1)
        hist = counts_by_rank(dense0, is_rep, side)
        table = jnp.cumsum(hist)
        out = rank_value_lookup(dense0, table, side)
        return jnp.where(mask, out, 0)

    # tiered by runtime rank count (see rank_areas.small_mask_guarded)
    return jax.lax.cond(
        k_total <= _BINS_SMALL,
        lambda lr, rp, r, m: table_path(lr, rp, r, m, _BINS_SMALL,
                                        _SIDE_SMALL),
        lambda lr, rp, r, m: jax.lax.cond(
            k_total <= _RANK_BINS,
            lambda a, b, c, d: table_path(a, b, c, d, _RANK_BINS, 256),
            lambda a, b, c, d: sequential_from_ranks(a, b, c, d,
                                                     connectivity),
            lr, rp, r, m),
        lab_ranks, r_plane, roots, mask)


def _coarse_seed_init(mask: jax.Array, connectivity: int,
                      block: int = 8) -> jax.Array:
    """Multigrid initial labels: pre-merge all-true 8×8 blocks on a 64×
    smaller grid so the fine propagation only resolves the block crust.

    Correctness: every seed value is the linear index of a pixel in the
    SAME fine component (an all-true block is internally connected, and
    face-adjacent all-true blocks share a full edge, so the coarse CC
    never unifies across distinct fine components). Min-propagation's
    fixed point — the component-min index — is therefore unchanged; only
    the iteration count drops. Pays off when masks contain huge components
    (e.g. the inverted background during hole filling: 65 → ~25 ms at
    4.2 MP on v5e).
    """
    h, w = mask.shape
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    if h % block or w % block:
        return jnp.where(mask, lin, _INF)
    hb, wb = h // block, w // block
    blocks_all = jnp.all(
        mask.reshape(hb, block, wb, block), axis=(1, 3))

    # coarse CC on the (hb, wb) block grid — same machinery, 64x smaller;
    # diagonal block adjacency shares only a corner pixel pair, which is
    # 8-conn fine-connected but NOT 4-conn, so coarse connectivity matches
    # the fine connectivity exactly.
    clin = jnp.arange(hb * wb, dtype=jnp.int32).reshape(hb, wb)
    clab = jnp.where(blocks_all, clin, _INF)
    clab = _propagate(clab, blocks_all, connectivity,
                      max_iters=64, cheap_iters=64)
    # coarse root block -> linear index of its top-left fine pixel
    cfine = (clab // wb) * (block * w) + (clab % wb) * block
    cfine = jnp.where(blocks_all, cfine, _INF)
    seeds = jnp.repeat(jnp.repeat(cfine, block, axis=0), block, axis=1)
    in_block = jnp.repeat(jnp.repeat(blocks_all, block, axis=0),
                          block, axis=1)
    return jnp.where(mask, jnp.where(in_block, seeds, lin), _INF)


@functools.partial(jax.jit,
                   static_argnames=("connectivity", "max_iters",
                                    "coarse_seed"))
def _root_labels(mask: jax.Array, connectivity: int = 1,
                 max_iters: int = 1024,
                 coarse_seed: bool = False) -> jax.Array:
    """Converged root-index labels (no sequential relabel; INF outside)."""
    h, w = mask.shape
    if coarse_seed:
        lab = _coarse_seed_init(mask, connectivity)
    else:
        lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
        lab = jnp.where(mask, lin, _INF)

    return _propagate(lab, mask, connectivity, max_iters)


def component_areas_by_sort(roots_flat: jax.Array,
                            mask_flat: jax.Array) -> jax.Array:
    """Per-pixel component area from converged root labels — no scatter.

    TPU cost model: sort-with-payload ≈ 35 ms at 4.2 MP vs scatter-add +
    gather ≈ 100 ms. Pixels are sorted by root id; segment lengths come
    from cummax scans over the run boundaries; a second sort by the
    original index restores pixel order. Background (root == INF) forms
    one segment that callers mask out.
    """
    si, area_sorted = _segment_areas_sorted(roots_flat)
    _, area_px = jax.lax.sort((si, area_sorted), num_keys=1, is_stable=False)
    return jnp.where(mask_flat, area_px, 0)


def _segment_areas_sorted(roots_flat: jax.Array):
    """Sort pixels by root id and compute per-pixel segment lengths in
    SORTED order. Returns (original-index payload, sorted areas); callers
    unsort with their own (thin) payload.

    Unstable sorts throughout: segment membership and the index payload
    are all the downstream math uses, and dropping the stability
    bookkeeping on these massively-duplicated keys measures ~7 ms faster
    per call at 4.2 MP.
    """
    n = roots_flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sr, si = jax.lax.sort((roots_flat, idx), num_keys=1, is_stable=False)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sr[1:] != sr[:-1]])
    is_end = jnp.concatenate(
        [sr[1:] != sr[:-1], jnp.ones((1,), jnp.bool_)])
    start_pos = jax.lax.cummax(jnp.where(is_start, idx, -1))
    end_pos = -jax.lax.cummax(jnp.where(is_end, -idx, -(n + 1))[::-1])[::-1]
    return si, end_pos - start_pos + 1


def small_component_mask_by_sort(roots_flat: jax.Array,
                                 mask_flat: jax.Array,
                                 threshold: int) -> jax.Array:
    """Per-pixel bool: pixel's component area < threshold (False outside).

    Same machinery as component_areas_by_sort, but the unsort pass carries
    only the 1-byte threshold decision instead of the int32 area — the
    second sort moves 5/8 of the bytes (a measurable slice of the ~11 ms
    areas budget at 4.2 MP; see the ops/cc.py cost model).

    A bounded-propagation "completeness certificate" variant was also
    built and measured for the hole pass: it LOSES on realistic cell
    masks (65.8 vs 23.1 ms at 4.2 MP) because a handful of narrow
    background channels stay "small incomplete pieces" until iteration
    8 of 11, and every fallback round pays a full certificate sort.
    Full convergence + this lighter unsort is the winning shape.
    """
    si, area_sorted = _segment_areas_sorted(roots_flat)
    small = area_sorted < threshold
    _, small_px = jax.lax.sort(
        (si, small.astype(jnp.int8)), num_keys=1, is_stable=False)
    return jnp.logical_and(mask_flat, small_px.astype(jnp.bool_))


def _area_filter(mask: jax.Array, threshold: int, connectivity: int,
                 keep_large: bool, coarse_seed: bool = False) -> jax.Array:
    """Shared area-filter core (sort-based segmented areas, gather-free)."""
    h, w = mask.shape
    roots = _root_labels(mask, connectivity,
                         coarse_seed=coarse_seed).ravel()
    small = small_component_mask_by_sort(
        roots, mask.ravel(), threshold).reshape(h, w)
    if keep_large:
        return jnp.logical_and(mask, ~small)
    return small


@functools.partial(jax.jit, static_argnames=("min_size", "connectivity"))
def remove_small_objects_jax(mask: jax.Array, min_size: int = 16,
                             connectivity: int = 1) -> jax.Array:
    """Drop components with area < min_size (skimage semantics, on device)."""
    return _area_filter(mask, min_size, connectivity, keep_large=True)


@functools.partial(jax.jit, static_argnames=("area_threshold", "connectivity"))
def remove_small_holes_jax(mask: jax.Array, area_threshold: int = 64,
                           connectivity: int = 1) -> jax.Array:
    """Fill background components with area < area_threshold (on device).

    Note: multigrid coarse seeding (_coarse_seed_init) was re-measured for
    this pass in the round-3 relay environment and still does not pay
    (11.9 vs 11.4 ms roots at 4.2 MP — the 2-3 iterations it saves are
    cancelled by the block-reduce + coarse CC + upsample overhead). It
    remains available via _root_labels(coarse_seed=True) for mask
    families where propagation is genuinely iteration-bound."""
    inv = jnp.logical_not(mask)
    fill = _area_filter(inv, area_threshold, connectivity,
                        keep_large=False)
    return jnp.logical_or(mask, fill)


@jax.jit
def relabel_sequential_device(labels: jax.Array) -> jax.Array:
    """Order-preserving sequential relabel on device (sort-based).

    Input labels are arbitrary non-negative ids (0 = background); output is
    1..K in increasing-id order — identical to
    metrics.relabel_sequential / skimage.segmentation.relabel_sequential.
    Works on sharded inputs too (XLA partitions the sorts with collectives).
    """
    shape = labels.shape
    flat = labels.ravel().astype(jnp.int32)
    n = flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sv, si = jax.lax.sort((flat, idx), num_keys=1, is_stable=False)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sv[:-1]])
    is_new = jnp.logical_and(sv != prev, sv > 0)
    seq = jnp.cumsum(is_new.astype(jnp.int32))
    seq = jnp.where(sv > 0, seq, 0)
    _, out = jax.lax.sort((si, seq), num_keys=1, is_stable=False)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def component_areas_map(mask: jax.Array, connectivity: int = 1):
    """Per-pixel component area for a bool mask (0 on background).

    Returns (labels, area_map)."""
    lab = label_components(mask, connectivity=connectivity)
    n = mask.shape[0] * mask.shape[1]
    flat = lab.ravel()
    areas = jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)
    area_map = areas[flat].reshape(mask.shape)
    return lab, jnp.where(mask, area_map, 0)
