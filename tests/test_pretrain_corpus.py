"""Autoencoder-pretraining corpus heuristics (fast tier).

Reference semantics: autoencoder_dataset.py:8-85 — frame subsampling of
long CTC sequences and random above-mean z-slice selection for 3D inputs.
"""

import os

import numpy as np


def _make_ctc_dir(root, n01, n02, shape=(24, 24), shape02=None):
    from cellseg_tpu.io import imwrite

    for sub, n, shp in (("01", n01, shape), ("02", n02, shape02 or shape)):
        d = os.path.join(root, sub)
        os.makedirs(d)
        for t in range(n):
            arr = np.full(shp, t % 7 + 1, np.uint16)
            imwrite(os.path.join(d, f"t{t:04d}.tif"), arr)


def test_frame_subsampling_caps_corpus(tmp_path):
    """A 300-frame sequence must be decimated (stride 5 to ≤75, then random
    cap 15) — the corpus never loads every frame."""
    from cellseg_tpu.train.pretrain import load_pretrain_corpus

    _make_ctc_dir(str(tmp_path), n01=300, n02=4)
    corpus = load_pretrain_corpus(str(tmp_path), seed=0)
    # 01 contributes ≤15 frames, 02 contributes its 4
    assert len(corpus) <= 19
    assert all(im.shape == (24, 24) for im in corpus)
    # scaled to [-1, 1]
    assert all(im.min() >= -1.0 and im.max() <= 1.0 for im in corpus)


def test_long_sequence_drops_sparse_head():
    """>1000-frame sequences drop the first 1000 frames before decimating
    (the early frames of long CTC sequences are nearly empty)."""
    from cellseg_tpu.train.pretrain import _subsample_frames

    rs = np.random.RandomState(0)
    files = [f"t{t:05d}.tif" for t in range(1200)]
    picked = _subsample_frames(files, rs)
    assert len(picked) <= 15
    assert all(int(f[1:6]) >= 1000 for f in picked)


def test_mismatched_subsets_fall_back_to_01(tmp_path):
    from cellseg_tpu.train.pretrain import load_pretrain_corpus

    _make_ctc_dir(str(tmp_path), n01=3, n02=3, shape=(24, 24),
                  shape02=(32, 32))
    corpus = load_pretrain_corpus(str(tmp_path), seed=0)
    assert len(corpus) == 3
    assert all(im.shape == (24, 24) for im in corpus)


def test_z_slice_rejects_dim_planes():
    """3D volumes draw a random z-slice, re-drawing while the slice is
    dimmer than the volume mean."""
    from cellseg_tpu.train.pretrain import _draw_plane

    vol = np.zeros((8, 16, 16), np.float32)
    vol[3] = 1.0  # the only bright plane
    rs = np.random.RandomState(0)
    draws = [_draw_plane(vol, rs) for _ in range(50)]
    assert all(p.shape == (16, 16) for p in draws)
    # uniform sampling would hit the bright plane 1/8 of the time; the
    # rejection loop (≤10 retries, reference semantics) lifts it to ~77%+
    hit = np.mean([p.mean() == 1.0 for p in draws])
    assert hit >= 0.6, hit


def test_draw_plane_rgb_frame_not_sliced():
    """(H, W, 3) RGB frames are luminance-collapsed, NOT z-sliced into
    (W, 3) slivers (load_pretrain_corpus admits .png RGB files)."""
    import numpy as np

    from cellseg_tpu.train.pretrain import _draw_plane

    rs = np.random.RandomState(0)
    rgb = rs.rand(48, 64, 3).astype(np.float32)
    plane = _draw_plane(rgb, rs)
    assert plane.shape == (48, 64)
    np.testing.assert_allclose(plane, rgb.mean(axis=-1), rtol=1e-6)

    vol = rs.rand(12, 48, 64).astype(np.float32)  # genuine z-stack
    assert _draw_plane(vol, rs).shape == (48, 64)
