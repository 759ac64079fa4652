"""Real-codec conformance (pre-written, skip-gated): the moment the
container gains PIL, these tests bind the gated production decode path
(operators/multimodal.decode_real_image) and the numpy bilinear
resampler (_bilinear) to the library's reference behavior. Until then
they skip cleanly — the Spark-side plumbing is exercised by
tests/test_multimodal.py on the deterministic fake codec."""

from __future__ import annotations

import numpy as np
import pytest

PIL = pytest.importorskip("PIL", reason="PIL absent in this container (expected)")

from PIL import Image  # noqa: E402

from cdc_demo_spark.operators.multimodal import _bilinear, decode_real_image  # noqa: E402


def _png_bytes(arr: np.ndarray) -> bytes:
    import io

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_real_image_roundtrips_png():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    got = decode_real_image(_png_bytes(arr))
    assert got.dtype == np.uint8 and got.shape == (24, 32)
    np.testing.assert_array_equal(got, arr)


@pytest.mark.parametrize("shape,out", [((32, 48), (16, 16)), ((17, 23), (8, 12))])
def test_numpy_bilinear_matches_pil_resize(shape, out):
    """_bilinear implements PIL's align_corners=False convention; the
    two engines may round a half-intensity differently, so conformance
    is max-abs-diff <= 1 uint8 step, exact on >=99% of pixels."""
    rng = np.random.default_rng(11)
    frame = rng.integers(0, 256, size=shape, dtype=np.uint8)
    ours = _bilinear(frame, *out)
    theirs = np.asarray(
        Image.fromarray(frame).resize((out[1], out[0]), Image.BILINEAR)
    )
    assert ours.shape == theirs.shape
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() >= 0.99
