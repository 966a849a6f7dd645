"""Image IO helpers: save/load renders, side-by-side strips, tonemap."""

from __future__ import annotations

import numpy as np


def oracle_edge_mask(want, contrast=0.25):
    """[H,W] bool: pixels whose 3×3 neighbourhood in the reference image
    spans ≥ ``contrast`` in some channel — exactly where a 1-ulp root
    difference between backends can legitimately flip the nearest-hit
    winner and show a neighbouring surface's colour.  The golden criterion
    (tests/test_golden.py, bench.py gate) bounds the worst error on the
    COMPLEMENT of this mask: a gross outlier in a flat region cannot be a
    silhouette branch flip and means a real bug."""
    want = np.asarray(want, np.float64)
    p = np.pad(want, ((1, 1), (1, 1), (0, 0)), mode="edge")
    mx = np.full(want.shape, -np.inf)
    mn = np.full(want.shape, np.inf)
    H, W = want.shape[:2]
    for dy in range(3):
        for dx in range(3):
            sl = p[dy:dy + H, dx:dx + W]
            mx = np.maximum(mx, sl)
            mn = np.minimum(mn, sl)
    return ((mx - mn) >= contrast).any(axis=-1)


def to_uint8(img, clip=True):
    img = np.asarray(img, np.float64)
    if clip:
        img = np.clip(img, 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(np.uint8)


def save_png(path, img):
    """Save [H,W,3] float (0..1) or uint8 image."""
    from PIL import Image

    arr = img if np.asarray(img).dtype == np.uint8 else to_uint8(img)
    Image.fromarray(arr).save(path)
    return path


def load_image(path, dtype=np.float32):
    """Load an image file → [H,W,4] float RGBA in [0,1] (for TextureSet).

    Decodes PNG and baseline JPEG with the native codec (txr/native — the
    stb_image equivalent); anything else (or progressive JPEG) falls back
    to PIL."""
    arr = None
    try:
        from txr import native

        if native.AVAILABLE:
            with open(path, "rb") as f:
                data = f.read()
            if data[:8] == b"\x89PNG\r\n\x1a\n":
                arr = native.png_decode(data)
            elif data[:2] == b"\xff\xd8":
                arr = native.jpeg_decode(data)
    except Exception:
        arr = None
    if arr is not None:
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        if arr.shape[-1] == 2:  # gray+alpha
            a = arr[..., 1:2]
            arr = np.concatenate([np.repeat(arr[..., :1], 3, axis=-1), a], -1)
        if arr.shape[-1] == 3:
            arr = np.concatenate(
                [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], -1)
        return (arr.astype(np.float64) / 255.0).astype(dtype)

    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGBA"), np.float64) / 255.0
    return img.astype(dtype)


def side_by_side(*imgs, gap=4):
    h = max(i.shape[0] for i in imgs)
    parts = []
    for k, img in enumerate(imgs):
        img = np.asarray(img, np.float64)
        if img.shape[0] < h:
            pad = np.zeros((h - img.shape[0],) + img.shape[1:])
            img = np.concatenate([img, pad], axis=0)
        parts.append(img)
        if k != len(imgs) - 1:
            parts.append(np.ones((h, gap, img.shape[-1])))
    return np.concatenate(parts, axis=1)
