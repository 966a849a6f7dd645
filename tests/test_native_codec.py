"""Native image codec (txr/native): PNG round-trip and baseline-JPEG decode
vs PIL — the stb_image-equivalent layer (reference loads its textures/
cubemap through stb_image, GLWrapper.cpp:284-354)."""

import io

import numpy as np
import pytest

from txr import native

pytestmark = pytest.mark.skipif(
    native._load() is None, reason="native toolchain unavailable")


def test_png_roundtrip(rng):
    img = (rng.random((40, 56, 4)) * 255).astype(np.uint8)
    data = native.png_encode(img)
    back = native.png_decode(data)
    np.testing.assert_array_equal(back, img)


@pytest.mark.parametrize("subsampling", [0, 1, 2])
@pytest.mark.parametrize("size", [(64, 96), (37, 51)])
def test_jpeg_decode_matches_pil(rng, subsampling, size):
    from PIL import Image

    img = (rng.random(size + (3,)) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=90,
                              subsampling=subsampling)
    data = b.getvalue()
    got = native.jpeg_decode(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 4 and d.mean() < 1.0, (d.max(), d.mean())


def test_jpeg_grayscale(rng):
    from PIL import Image

    img = (rng.random((33, 47)) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=92)
    got = native.jpeg_decode(b.getvalue())
    want = np.asarray(Image.open(io.BytesIO(b.getvalue())).convert("L"))[..., None]
    d = np.abs(got.astype(int) - want.astype(int))
    assert got.shape == want.shape and d.max() <= 4


def test_jpeg_progressive_rejected(rng):
    from PIL import Image

    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=90, progressive=True)
    with pytest.raises(RuntimeError):
        native.jpeg_decode(b.getvalue())


def test_load_image_uses_native_jpeg(rng, tmp_path):
    from PIL import Image

    from txr.utils.image import load_image

    img = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
    p = tmp_path / "t.jpg"
    Image.fromarray(img).save(p, format="JPEG", quality=95, subsampling=0)
    arr = load_image(str(p))
    assert arr.shape == (24, 40, 4) and arr.dtype == np.float32
    want = np.asarray(Image.open(p).convert("RGB"), np.float64) / 255.0
    assert np.abs(arr[..., :3] - want).max() < 0.03
    assert (arr[..., 3] == 1.0).all()
