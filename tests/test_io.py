import numpy as np

from cellseg_tpu.io import imread, imwrite, imwrite_instance_tiff, list_images


def test_roundtrip_png_uint8(tmp_path):
    x = (np.arange(64 * 48 * 3).reshape(64, 48, 3) % 251).astype(np.uint8)
    p = str(tmp_path / "a.png")
    imwrite(p, x)
    assert np.array_equal(imread(p), x)


def test_roundtrip_tiff_uint16(tmp_path):
    x = (np.arange(100 * 80).reshape(100, 80) % 60000).astype(np.uint16)
    p = str(tmp_path / "a.tiff")
    imwrite(p, x)
    y = imread(p)
    assert y.dtype == np.uint16
    assert np.array_equal(y, x)


def test_instance_tiff_dtype_promotion(tmp_path):
    small = np.zeros((10, 10), dtype=np.int64)
    small[2:4, 2:4] = 7
    p = str(tmp_path / "s_label.tiff")
    imwrite_instance_tiff(p, small)
    y = imread(p)
    assert y.dtype == np.uint16
    assert int(y.max()) == 7

    big = np.zeros((10, 10), dtype=np.int64)
    big[0, 0] = 70000
    p2 = str(tmp_path / "b_label.tiff")
    imwrite_instance_tiff(p2, big)
    y2 = imread(p2)
    assert int(y2.max()) == 70000


def test_read_bundled(bundled_samples):
    for name, img, lbl in bundled_samples:
        assert img.ndim in (2, 3)
        assert lbl.ndim == 2
        assert lbl.max() > 0


def test_list_images(tmp_path):
    for n in ["b.png", "a.tiff", "c.txt"]:
        (tmp_path / n).write_bytes(b"x")
    assert list_images(str(tmp_path)) == ["a.tiff", "b.png"]


def test_multipage_tiff(tmp_path):
    from PIL import Image

    pages = [Image.fromarray((np.ones((8, 8)) * i).astype(np.uint8))
             for i in range(3)]
    p = str(tmp_path / "multi.tiff")
    pages[0].save(p, save_all=True, append_images=pages[1:])
    arr = imread(p)
    assert arr.shape == (3, 8, 8)
    assert arr[2].max() == 2


def test_to_hwc3_layouts():
    from cellseg_tpu.io import to_hwc3

    # grayscale → repeat
    g = to_hwc3(np.ones((8, 9), np.uint8))
    assert g.shape == (8, 9, 3)
    # RGBA → first 3
    assert to_hwc3(np.ones((8, 9, 4), np.uint8)).shape == (8, 9, 3)
    # 2-channel → zero-padded third
    two = to_hwc3(np.ones((8, 9, 2), np.uint8))
    assert two.shape == (8, 9, 3) and two[..., 2].max() == 0
    # multipage stack (N, H, W): pages become channel planes
    stack = np.stack([np.full((16, 32), i, np.uint8) for i in range(3)])
    out = to_hwc3(stack)
    assert out.shape == (16, 32, 3)
    assert out[..., 1].max() == 1 and out[..., 2].max() == 2
    # 2-page stack → third channel zero-filled
    out2 = to_hwc3(stack[:2])
    assert out2.shape == (16, 32, 3) and out2[..., 2].max() == 0
    # genuine many-channel (H, W, C>4) stays channels-last, truncated
    many = np.ones((64, 64, 8), np.uint8)
    assert to_hwc3(many).shape == (64, 64, 3)


def test_predictor_accepts_multipage_stack():
    """Round-1 flaw: (N, H, W) stacks had the W axis sliced as channels
    (infer/predictor.py:126). Pages must now flow through as channels."""
    import jax.numpy as jnp

    from cellseg_tpu.infer.predictor import Predictor

    def apply_fn(params, tiles):
        # fake 3-class logits favoring interior where channel 0 is bright
        bright = tiles[..., 0] > 0.5
        interior = jnp.where(bright, 5.0, -5.0)
        bg = -interior
        return jnp.stack([bg, interior, jnp.full_like(interior, -5.0)],
                         axis=-1)

    pred = Predictor(apply_fn, params={}, roi=32, sw_batch=2, bucket=32)
    stack = np.zeros((2, 48, 40), np.uint8)
    stack[0, 10:30, 10:30] = 255  # one bright square on page 0
    labels = pred.predict(stack)
    assert labels.shape == (48, 40)  # (H, W), not (48, 2) nonsense
    assert labels.max() == 1
    assert labels[20, 20] == 1 and labels[2, 2] == 0


def test_predictor_grayscale_device_expansion_parity():
    """Grayscale uploads 1 channel and expands on device; labels must be
    identical to feeding the host-expanded 3-channel image."""
    import jax.numpy as jnp

    from cellseg_tpu.infer.predictor import Predictor
    from cellseg_tpu.io import to_hwc3

    def apply_fn(params, tiles):
        bright = tiles[..., :3].mean(-1) > 0.5
        interior = jnp.where(bright, 5.0, -5.0)
        return jnp.stack([-interior, interior,
                          jnp.full_like(interior, -5.0)], axis=-1)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 60, (70, 50)).astype(np.uint8)
    img[10:30, 10:30] = 220
    img[40:60, 20:45] = 200

    pred = Predictor(apply_fn, params={}, roi=32, sw_batch=2, bucket=32)
    lab_grey = pred.predict(img)            # (H, W) → 1-channel upload
    lab_rgb = pred.predict(to_hwc3(img))    # host-expanded 3-channel
    np.testing.assert_array_equal(lab_grey, lab_rgb)
    assert lab_grey.max() >= 2


def test_predictor_sw_batch_auto_matches_explicit():
    """sw_batch='auto' (MXU-sized tile batches, infer/predictor.py) must be
    bit-identical to any explicit sw_batch: the tile set and blend are the
    same, only the per-step batching differs."""
    import jax.numpy as jnp

    from cellseg_tpu.infer.predictor import Predictor

    def apply_fn(params, tiles):
        bright = tiles[..., :3].mean(-1) > 0.45
        interior = jnp.where(bright, 5.0, -5.0)
        return jnp.stack([-interior, interior,
                          jnp.full_like(interior, -5.0)], axis=-1)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 60, (80, 96)).astype(np.uint8)
    img[8:24, 10:30] = 230
    img[40:70, 30:60] = 210
    img[12:28, 60:88] = 220

    lab_auto = Predictor(apply_fn, params={}, roi=32, bucket=32).predict(img)
    lab_2 = Predictor(apply_fn, params={}, roi=32, sw_batch=2,
                      bucket=32).predict(img)
    np.testing.assert_array_equal(lab_auto, lab_2)
    assert lab_auto.max() >= 3
