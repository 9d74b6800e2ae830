"""Native C++ host ops vs their numpy fallbacks (and the reference oracle)."""

import numpy as np
import pytest

from tllod_tpu import native
from tllod_tpu.ops.nms import nms_numpy


def _boxes(rng, n):
    x1 = rng.rand(n) * 100
    y1 = rng.rand(n) * 100
    return np.stack([x1, y1, x1 + rng.rand(n) * 50 + 1,
                     y1 + rng.rand(n) * 50 + 1], 1).astype(np.float32)


def test_native_available():
    # the build is part of the repo contract (python setup.py build_ext)
    if not native.HAVE_NATIVE:
        pytest.skip("native extension not built in this environment")


def test_bbox_overlaps_matches_fallback(rng):
    a, b = _boxes(rng, 40), _boxes(rng, 25)
    got = native.bbox_overlaps(a, b)
    saved = native.HAVE_NATIVE
    try:
        native.HAVE_NATIVE = False
        want = native.bbox_overlaps(a, b)
    finally:
        native.HAVE_NATIVE = saved
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert got.shape == (40, 25)


def test_nms_matches_reference_oracle(rng):
    dets = np.concatenate([_boxes(rng, 150),
                           rng.rand(150, 1).astype(np.float32)], 1)
    np.testing.assert_array_equal(native.nms(dets, 0.5),
                                  nms_numpy(dets, 0.5))
