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


def _valid_jpeg_bytes(rng):
    from PIL import Image

    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=90)
    return bytearray(b.getvalue())


def _truncate_segment(data, marker, keep):
    """Shrink the payload of the first ``marker`` segment to ``keep`` bytes
    (patching its length field) and drop the removed bytes — a malformed but
    length-consistent stream that must be REJECTED, not over-read."""
    i = 2
    while i + 4 <= len(data):
        assert data[i] == 0xFF
        m = data[i + 1]
        if 0xD0 <= m <= 0xD8:
            i += 2
            continue
        ln = (data[i + 2] << 8) | data[i + 3]
        if m == marker:
            new_len = 2 + keep
            out = bytearray(data[: i + 2])
            out += bytes([new_len >> 8, new_len & 0xFF])
            out += data[i + 4 : i + 4 + keep]
            out += data[i + 2 + ln :]
            return bytes(out)
        i += 2 + ln
    raise AssertionError(f"marker {marker:#x} not found")


@pytest.mark.parametrize("marker,keep", [
    (0xDB, 1),   # DQT: pq/tq byte but no table payload (ADVICE r3 medium)
    (0xDB, 30),  # DQT: partial table
    (0xC0, 3),   # SOF0: truncated before dimensions (ADVICE r3 low)
    (0xC0, 7),   # SOF0: truncated component list
    (0xDA, 2),   # SOS: truncated component spec (ADVICE r3 low)
])
def test_jpeg_truncated_segments_rejected(rng, marker, keep):
    data = _truncate_segment(_valid_jpeg_bytes(rng), marker, keep)
    with pytest.raises(RuntimeError):
        native.jpeg_decode(data)


def test_jpeg_bad_sos_table_ids_rejected(rng):
    """SOS td/ta are 4-bit fields but baseline allows only tables 0-3; a
    crafted id > 3 must be rejected instead of indexing hdc[4]/hac[4] OOB
    (ADVICE r3 medium)."""
    data = _valid_jpeg_bytes(rng)
    i = 2
    while i + 4 <= len(data):
        m = data[i + 1]
        ln = (data[i + 2] << 8) | data[i + 3]
        if m == 0xDA:
            # first component's Td/Ta byte sits at payload offset 2
            data[i + 4 + 2] = 0x77
            break
        i += 2 + ln
    with pytest.raises(RuntimeError):
        native.jpeg_decode(bytes(data))


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
