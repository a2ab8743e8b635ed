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
