"""Pallas RoIAlign kernel vs the XLA formulation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tllod_tpu.ops.roi_align import roi_align, roi_align_avg
from tllod_tpu.ops.roi_align_pallas import (roi_align_avg_pallas,
                                            roi_align_pallas)


def _case(rng, b=2, h=16, w=24, c=128, r=10):
    feat = rng.randn(b, h, w, c).astype(np.float32)
    x1 = rng.rand(r) * (w - 5) * 16
    y1 = rng.rand(r) * (h - 5) * 16
    rois = np.stack([rng.randint(0, b, r).astype(np.float32), x1, y1,
                     x1 + rng.rand(r) * 50 + 16,
                     y1 + rng.rand(r) * 50 + 16], 1).astype(np.float32)
    return jnp.asarray(feat), jnp.asarray(rois)


def test_pallas_matches_xla(rng):
    feat, rois = _case(rng)
    want = roi_align(feat, rois, out_size=8, spatial_scale=1 / 16)
    got = roi_align_pallas(feat, rois, 8, 1 / 16, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_avg_matches_and_grads(rng):
    feat, rois = _case(rng, b=1, r=4)
    want = roi_align_avg(feat, rois, out_size=7, spatial_scale=1 / 16)
    got = roi_align_avg_pallas(feat, rois, out_size=7, spatial_scale=1 / 16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # custom VJP routes the backward through the XLA formulation: gradients
    # of both paths must agree
    g_x = jax.grad(lambda f: roi_align_avg(
        f, rois, out_size=7, spatial_scale=1 / 16).sum())(feat)
    g_p = jax.grad(lambda f: roi_align_avg_pallas(
        f, rois, out_size=7, spatial_scale=1 / 16, interpret=True).sum())(
        feat)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-5)
