"""Anchor generation vs the reference generator
(``lib/model/rpn/generate_anchors.py:45-105``).

Oracle table below is the *executed* output of the reference code under
numpy 2.x. (The MATLAB table in the reference's comments, ``generate_anchors
.py:12-37``, differs by one pixel per coordinate — a historical banker's-
rounding artifact; behavioral parity means matching the code, not the
comment.)
"""

import numpy as np

from tllod_tpu.ops.anchors import generate_anchors, shift_anchors

REFERENCE_ANCHORS = np.array([
    [-84., -40., 99., 55.],
    [-176., -88., 191., 103.],
    [-360., -184., 375., 199.],
    [-56., -56., 71., 71.],
    [-120., -120., 135., 135.],
    [-248., -248., 263., 263.],
    [-36., -80., 51., 95.],
    [-80., -168., 95., 183.],
    [-168., -344., 183., 359.],
])


def test_default_anchors_match_reference():
    a = generate_anchors(base_size=16, ratios=(0.5, 1, 2), scales=(8, 16, 32))
    np.testing.assert_array_equal(a, REFERENCE_ANCHORS)


def test_cityscape_anchor_count():
    # cityscape recipe: scales [4,8,16,32] x ratios [0.5,1,2] = 12 anchors
    a = generate_anchors(scales=(4, 8, 16, 32))
    assert a.shape == (12, 4)


def test_shift_layout():
    base = generate_anchors()
    shifted = shift_anchors(2, 3, 16, base)
    assert shifted.shape == (2 * 3 * 9, 4)
    # Cell (0,0) holds the base anchors.
    np.testing.assert_allclose(shifted[:9], base)
    # Second cell is shifted by one stride in x.
    np.testing.assert_allclose(shifted[9:18, 0], base[:, 0] + 16)
    np.testing.assert_allclose(shifted[9:18, 1], base[:, 1])
    # Row stride: cell (1,0) shifted in y.
    np.testing.assert_allclose(shifted[3 * 9: 3 * 9 + 9, 1], base[:, 1] + 16)
