"""Host-side image IO for TIFF/PNG/BMP microscopy files.

The reference pipeline reads TIFF via tifffile and everything else via
skimage.io (reference: data/pre_process_3class.py:79-83,
baseline/predict.py:88-91), and writes zlib-compressed instance TIFFs
(baseline/predict.py:114). We provide the same capability on top of PIL
(dtype-preserving, RGB channel order) with no external TIFF dependency.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

# Allow very large microscopy slides (PIL's decompression-bomb guard would
# otherwise reject gigapixel whole-slide images).
Image.MAX_IMAGE_PIXELS = None

IMAGE_EXTENSIONS = (".tif", ".tiff", ".png", ".bmp", ".jpg", ".jpeg")


def imread(path: str) -> np.ndarray:
    """Read an image preserving dtype and (for color) RGB channel order."""
    with Image.open(path) as im:
        frames = getattr(im, "n_frames", 1)
        if frames > 1:
            # Multi-page TIFF: stack pages along a leading axis.
            pages = []
            for i in range(frames):
                im.seek(i)
                pages.append(np.asarray(im))
            return np.stack(pages, axis=0)
        return np.asarray(im)


def _pages_to_channels(img: np.ndarray) -> np.ndarray:
    """Move a leading page axis of an (N, H, W) stack to the channel slot.

    A 3D array whose trailing axis cannot be channels (>4) is a page stack
    when the leading axis is much smaller than both spatial axes (multipage
    channel-plane TIFFs, z-stacks with many slices). Ambiguous near-cubic
    layouts raise instead of silently slicing the width axis to 3 pixels.
    """
    n, h, w = img.shape
    if n <= 16 or 4 * n <= min(h, w):
        return np.moveaxis(img, 0, -1)
    if 4 * w <= min(n, h):
        # (H, W, C>4) many-channel image: already channels-last.
        return img
    raise ValueError(
        f"ambiguous 3D image layout {img.shape}: trailing axis is too large "
        "to be channels and the leading axis is too large to be pages; "
        "pass an explicit (H, W, C) array instead"
    )


def to_hwc_raw(img: np.ndarray) -> np.ndarray:
    """Like to_hwc3 but WITHOUT materializing the 3-channel expansion:
    returns (H, W, C) with C in {1, 2, 3}. Callers that upload to an
    accelerator should expand channels on device — repeating grayscale on
    the host triples the H2D transfer for nothing."""
    img = np.asarray(img)
    if img.ndim == 2:
        return img[..., None]
    if img.ndim != 3:
        raise ValueError(f"unsupported image rank {img.ndim}: {img.shape}")
    if img.shape[-1] > 4:
        img = _pages_to_channels(img)
    return img[..., :3]


def to_hwc3(img: np.ndarray) -> np.ndarray:
    """Coerce any supported raw input layout to (H, W, 3).

    Mirrors the reference channel fixup (data/pre_process_3class.py:86-91:
    grayscale→3-channel repeat, >3 channels→first 3) and additionally makes
    multipage-TIFF stacks coherent: imread returns pages as (N, H, W), and
    in multi-modality microscopy each page is a channel plane, so pages are
    moved to the trailing axis and treated as channels (the reference would
    mis-slice the W axis here). A trailing axis of size ≤4 on a 3D array is
    already channels.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        return np.repeat(img[..., None], 3, axis=-1)
    if img.ndim != 3:
        raise ValueError(f"unsupported image rank {img.ndim}: {img.shape}")
    if img.shape[-1] > 4:
        # (N, H, W) page stack (small leading page axis, non-channel
        # trailing axis) → (H, W, N) channel planes. A genuine
        # many-channel (H, W, C>4) image keeps channels-last and is
        # truncated to 3 below, like the reference.
        img = _pages_to_channels(img)
    c = img.shape[-1]
    if c == 1:
        return np.repeat(img, 3, axis=-1)
    if c == 2:
        # two acquisition channels: zero-fill the third
        pad = np.zeros_like(img[..., :1])
        return np.concatenate([img, pad], axis=-1)
    return img[..., :3]


def _pil_mode_for(arr: np.ndarray) -> Image.Image:
    """Build a PIL image from an array, preserving integer dtypes."""
    if arr.ndim == 2 and arr.dtype in (np.int64, np.uint64):
        # PIL has no 64-bit mode; instance maps fit comfortably in int32.
        arr = arr.astype(np.int32)
    if arr.ndim == 2 and arr.dtype == np.uint32:
        arr = arr.astype(np.int32)
    return Image.fromarray(arr)


def imwrite(path: str, arr: np.ndarray, compress: bool = True) -> None:
    """Write an image; TIFFs get zlib (deflate) compression by default.

    A 3D integer array with a non-channel trailing axis is written as a
    multipage TIFF (one page per leading-axis slice — z-stack labels)."""
    arr = np.asarray(arr)
    ext = os.path.splitext(path)[1].lower()
    kw = ({"compression": "tiff_deflate"}
          if ext in (".tif", ".tiff") and compress else {})
    if arr.ndim == 3 and arr.shape[-1] > 4:
        pages = [_pil_mode_for(arr[z]) for z in range(arr.shape[0])]
        pages[0].save(path, save_all=True, append_images=pages[1:], **kw)
        return
    _pil_mode_for(arr).save(path, **kw)


def imwrite_instance_tiff(path: str, labels: np.ndarray) -> None:
    """Write an instance-label map as a zlib-compressed TIFF.

    Matches the reference submission format `{name}_label.tiff`
    (baseline/predict.py:114). Labels are stored in the smallest integer
    dtype that holds the max label, like tifffile would for numpy input.
    """
    labels = np.asarray(labels)
    mx = int(labels.max()) if labels.size else 0
    if mx < 2**16:
        labels = labels.astype(np.uint16)
    else:
        labels = labels.astype(np.int32)
    imwrite(path, labels, compress=True)


def list_images(directory: str) -> list[str]:
    """Sorted image file names in a directory (reference predict.py:40)."""
    return sorted(
        f for f in os.listdir(directory)
        if f.lower().endswith(IMAGE_EXTENSIONS)
    )
