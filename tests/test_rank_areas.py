"""rank_areas: sort-free dense ranks / per-rank histograms / lookups."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cellseg_tpu.ops.cc import region_roots  # noqa: E402
from cellseg_tpu.ops.rank_areas import (  # noqa: E402
    counts_by_rank,
    dense_region_ranks,
    rank_flag_lookup,
    small_mask_by_rank_hist,
    small_mask_by_rank_sort,
    small_mask_guarded,
)


def test_counts_by_rank_matches_bincount():
    rng = np.random.default_rng(0)
    d = rng.integers(0, 65536, (400, 300)).astype(np.int32)
    w = rng.random((400, 300)) < 0.6
    got = np.asarray(counts_by_rank(jnp.asarray(d), jnp.asarray(w)))
    want = np.bincount(d[w].ravel(), minlength=65536)
    np.testing.assert_array_equal(got, want)


def test_rank_flag_lookup_matches_indexing():
    rng = np.random.default_rng(1)
    d = rng.integers(0, 65536, (256, 256)).astype(np.int32)
    flags = rng.random(65536) < 0.5
    got = np.asarray(rank_flag_lookup(jnp.asarray(d), jnp.asarray(flags)))
    np.testing.assert_array_equal(got, flags[d])


def test_dense_region_ranks_structure():
    rng = np.random.default_rng(2)
    mask = rng.random((96, 128)) < 0.45
    roots = region_roots(mask)
    dense, r_plane, k = dense_region_ranks(
        roots, jnp.asarray(mask.astype(np.int32)))
    dense, roots_np = np.asarray(dense), np.asarray(roots)
    k = int(k)
    # ranks are a bijection root -> 1..K preserving raster order of roots
    uniq_roots = np.unique(roots_np)
    assert k == uniq_roots.size
    rank_of = {r: i + 1 for i, r in enumerate(uniq_roots)}
    want = np.vectorize(rank_of.get)(roots_np)
    np.testing.assert_array_equal(dense, want)


@pytest.mark.parametrize("threshold", [4, 64])
def test_small_mask_hist_matches_sort(threshold):
    rng = np.random.default_rng(3)
    mask = rng.random((128, 128)) < 0.5
    roots = region_roots(mask)
    dense, _, k = dense_region_ranks(roots, jnp.asarray(mask.astype(np.int32)))
    for domain in (mask, ~mask):
        dom = jnp.asarray(domain)
        h = np.asarray(small_mask_by_rank_hist(dense, dom, threshold))
        s = np.asarray(small_mask_by_rank_sort(dense, dom, threshold))
        g = np.asarray(small_mask_guarded(dense, k, dom, threshold))
        np.testing.assert_array_equal(h, s)
        np.testing.assert_array_equal(g, s)


def test_rank_value_lookup_exact():
    rng = np.random.default_rng(4)
    from cellseg_tpu.ops.rank_areas import _RANK_BINS, rank_value_lookup

    dense0 = jnp.asarray(rng.integers(0, _RANK_BINS, size=(64, 128)),
                         jnp.int32)
    values = jnp.asarray(rng.integers(0, _RANK_BINS + 1, size=(_RANK_BINS,)),
                         jnp.int32)
    got = np.asarray(rank_value_lookup(dense0, values))
    want = np.asarray(values)[np.asarray(dense0)]
    np.testing.assert_array_equal(got, want)


def test_sequential_from_ranks_table_matches_propagation(monkeypatch):
    """The table relabel must reproduce sequential_from_ranks exactly
    (force the MXU gate open on CPU: the einsums are exact in f32 too)."""
    import cellseg_tpu.ops.rank_areas as ra
    from cellseg_tpu.ops.cc import (
        _INF,
        _propagate,
        sequential_from_ranks,
        sequential_from_ranks_table,
    )

    rng = np.random.default_rng(5)
    mask = rng.random((96, 128)) < 0.55
    mj = jnp.asarray(mask)
    roots = region_roots(mask)
    dense, r_plane, k = dense_region_ranks(
        roots, mj.astype(jnp.int32))
    # drop some components (an area filter stand-in), then 8-conn merge
    keep = np.asarray(small_mask_by_rank_sort(dense, mj, 6)) == 0
    mask2 = jnp.asarray(mask & keep)
    lab = _propagate(jnp.where(mask2, dense, _INF), mask2,
                     connectivity=2, max_iters=1024)

    want = np.asarray(sequential_from_ranks(lab, r_plane, roots, mask2, 2))
    # bf16 one-hots are exact on CPU as well — only slower
    monkeypatch.setattr(ra, "_mxu_dtype", lambda: jnp.bfloat16)
    got = np.asarray(sequential_from_ranks_table(
        lab, r_plane, roots, mask2, k, 2))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("side", [64, 256])
def test_counts_and_lookups_small_tier(side):
    """The 64x64-bin tier (16x fewer einsum FLOPs) is exact like the
    256x256 tier for ranks within its 4096-bin budget."""
    from cellseg_tpu.ops.rank_areas import rank_value_lookup

    rng = np.random.default_rng(6)
    bins = side * side
    d = rng.integers(0, bins, (200, 300)).astype(np.int32)
    w = rng.random((200, 300)) < 0.6
    got = np.asarray(counts_by_rank(jnp.asarray(d), jnp.asarray(w), side))
    np.testing.assert_array_equal(got,
                                  np.bincount(d[w].ravel(), minlength=bins))
    flags = rng.random(bins) < 0.5
    got = np.asarray(rank_flag_lookup(jnp.asarray(d), jnp.asarray(flags),
                                      side))
    np.testing.assert_array_equal(got, flags[d])
    values = jnp.asarray(rng.integers(0, 65537, size=(bins,)), jnp.int32)
    got = np.asarray(rank_value_lookup(jnp.asarray(d), values, side))
    np.testing.assert_array_equal(got, np.asarray(values)[d])


def test_small_mask_guarded_tier_selection(monkeypatch):
    """With the MXU gate forced open, the tiered guard must agree with the
    sort path both below and above the 4096-rank small-tier boundary."""
    import cellseg_tpu.ops.rank_areas as ra

    monkeypatch.setattr(ra, "_mxu_dtype", lambda: jnp.bfloat16)
    rng = np.random.default_rng(7)
    mask = rng.random((128, 128)) < 0.5
    roots = region_roots(mask)
    dense, _, k = dense_region_ranks(roots,
                                     jnp.asarray(mask.astype(np.int32)))
    assert int(k) <= ra._BINS_SMALL  # exercises the 64-bin tier
    dom = jnp.asarray(mask)
    got = np.asarray(ra.small_mask_guarded(dense, k, dom, 6))
    want = np.asarray(small_mask_by_rank_sort(dense, dom, 6))
    np.testing.assert_array_equal(got, want)
    # synthetic ranks above the small tier: the 256-bin branch must run
    d_big = jnp.asarray(
        rng.integers(1, 9000, (128, 128)).astype(np.int32))
    k_big = jnp.int32(9000)
    got = np.asarray(ra.small_mask_guarded(d_big, k_big, dom, 3))
    want = np.asarray(small_mask_by_rank_sort(d_big, dom, 3))
    np.testing.assert_array_equal(got, want)
