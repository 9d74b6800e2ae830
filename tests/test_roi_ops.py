"""RoIAlign / RoIPool vs numpy oracles transcribing the reference CUDA kernel
semantics (``roi_align_kernel.cu:15-70``, ``roi_pooling_kernel.cu:24-87``)."""

import jax
import jax.numpy as jnp
import numpy as np

from tllod_tpu.ops.roi_align import roi_align, roi_align_avg
from tllod_tpu.ops.roi_pool import roi_pool


def _align_oracle(feat_chw, rois, p, scale):
    """Transcription of ROIAlignForward (roi_align_kernel.cu:15-70); NCHW in,
    (R, C, P, P) out."""
    c, h, w = feat_chw.shape[1:]
    out = np.zeros((len(rois), feat_chw.shape[1], p, p), np.float32)
    for n, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = roi[1] * scale, roi[2] * scale, roi[3] * scale, roi[4] * scale
        rw = max(x2 - x1 + 1.0, 0.0)
        rh = max(y2 - y1 + 1.0, 0.0)
        bh, bw = rh / (p - 1.0), rw / (p - 1.0)
        for ph in range(p):
            for pw in range(p):
                hh = ph * bh + y1
                ww = pw * bw + x1
                hs = int(min(np.floor(hh), h - 2))
                ws = int(min(np.floor(ww), w - 2))
                if hh < 0 or hh >= h or ww < 0 or ww >= w:
                    continue
                hr, wr = hh - hs, ww - ws
                val = (feat_chw[b, :, hs, ws] * (1 - hr) * (1 - wr)
                       + feat_chw[b, :, hs, ws + 1] * (1 - hr) * wr
                       + feat_chw[b, :, hs + 1, ws] * hr * (1 - wr)
                       + feat_chw[b, :, hs + 1, ws + 1] * hr * wr)
                out[n, :, ph, pw] = val
    return out


def _pool_oracle(feat_chw, rois, p, scale):
    """Transcription of ROIPoolForward (roi_pooling_kernel.cu:24-87)."""
    c, h, w = feat_chw.shape[1:]
    out = np.zeros((len(rois), c, p, p), np.float32)
    f32 = np.float32  # the CUDA kernel computes bin edges in float32
    for n, roi in enumerate(rois):
        b = int(roi[0])
        x1 = int(np.floor(f32(roi[1]) * f32(scale) + f32(0.5)))
        y1 = int(np.floor(f32(roi[2]) * f32(scale) + f32(0.5)))
        x2 = int(np.floor(f32(roi[3]) * f32(scale) + f32(0.5)))
        y2 = int(np.floor(f32(roi[4]) * f32(scale) + f32(0.5)))
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        bh, bw = f32(rh) / f32(p), f32(rw) / f32(p)
        for ph in range(p):
            for pw in range(p):
                hs = min(max(int(np.floor(f32(ph) * bh)) + y1, 0), h)
                he = min(max(int(np.ceil(f32(ph + 1) * bh)) + y1, 0), h)
                ws = min(max(int(np.floor(f32(pw) * bw)) + x1, 0), w)
                we = min(max(int(np.ceil(f32(pw + 1) * bw)) + x1, 0), w)
                if he <= hs or we <= ws:
                    continue
                out[n, :, ph, pw] = feat_chw[b, :, hs:he, ws:we].max((1, 2))
    return out


def _rand_case(rng, b=2, h=20, w=30, c=8, r=12, img_scale=16.0):
    feat = rng.randn(b, h, w, c).astype(np.float32)
    x1 = rng.rand(r) * (w - 5) * img_scale
    y1 = rng.rand(r) * (h - 5) * img_scale
    x2 = x1 + rng.rand(r) * 4 * img_scale + img_scale
    y2 = y1 + rng.rand(r) * 4 * img_scale + img_scale
    bi = rng.randint(0, b, r).astype(np.float32)
    rois = np.stack([bi, x1, y1, x2, y2], 1).astype(np.float32)
    return feat, rois


def test_roi_align_matches_cuda_semantics(rng):
    feat, rois = _rand_case(rng)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               out_size=7, spatial_scale=1.0 / 16))
    want = _align_oracle(feat.transpose(0, 3, 1, 2), rois, 7, 1.0 / 16)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_roi_align_avg_is_avgpooled_p_plus_1(rng):
    feat, rois = _rand_case(rng)
    got = np.asarray(roi_align_avg(jnp.asarray(feat), jnp.asarray(rois),
                                   out_size=7, spatial_scale=1.0 / 16))
    a8 = _align_oracle(feat.transpose(0, 3, 1, 2), rois, 8, 1.0 / 16)
    want = (a8[:, :, :-1, :-1] + a8[:, :, :-1, 1:]
            + a8[:, :, 1:, :-1] + a8[:, :, 1:, 1:]) / 4.0
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)
    assert got.shape == (len(rois), 7, 7, feat.shape[-1])


def test_roi_align_out_of_image_zero(rng):
    feat = rng.randn(1, 10, 10, 4).astype(np.float32)
    # RoI hanging past the right/bottom edge: outside samples must be 0.
    rois = np.array([[0, 8 * 16, 8 * 16, 14 * 16, 14 * 16]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               out_size=7, spatial_scale=1.0 / 16))
    want = _align_oracle(feat.transpose(0, 3, 1, 2), rois, 7, 1.0 / 16)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)
    assert (got == 0).any()


def test_roi_align_grads_flow(rng):
    feat, rois = _rand_case(rng, b=1, r=4)

    def f(x):
        return roi_align_avg(x, jnp.asarray(rois), out_size=7,
                             spatial_scale=1.0 / 16).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(feat)))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_roi_pool_matches_cuda_semantics(rng):
    feat, rois = _rand_case(rng)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                              out_size=7, spatial_scale=1.0 / 16))
    want = _pool_oracle(feat.transpose(0, 3, 1, 2), rois, 7, 1.0 / 16)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)


def test_dense_grid_sample_identity_and_shift(rng):
    """DenseAffineGridGen semantics (gridgen.py:108-140): zero offsets ==
    identity grid == align_corners bilinear resample of the full map; a
    constant +2px x-offset shifts the sample points exactly 2 columns."""
    from tllod_tpu.ops.roi_crop import dense_grid_sample

    h, w, c = 9, 13, 3
    feat = rng.rand(1, h, w, c).astype(np.float32)
    g = 5

    # identity: grid points land at linspace(0, dim-1, g) -> compare to a
    # direct bilinear oracle at those exact coordinates
    offs = np.zeros((2, g, g, 2), np.float32)
    got = np.asarray(dense_grid_sample(jnp.asarray(feat),
                                       jnp.asarray(offs),
                                       jnp.zeros((2,), np.int32)))
    ys = np.linspace(0, h - 1, g)
    xs = np.linspace(0, w - 1, g)

    def bilin(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        fy, fx = y - y0, x - x0
        return ((1 - fy) * (1 - fx) * feat[0, y0, x0]
                + (1 - fy) * fx * feat[0, y0, x1]
                + fy * (1 - fx) * feat[0, y1, x0]
                + fy * fx * feat[0, y1, x1])

    want = np.stack([np.stack([bilin(y, x) for x in xs]) for y in ys])
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[1], want, rtol=1e-5, atol=1e-5)

    # constant x-offset of 2 px (normalized 2 * 2/(w-1)): sampled column
    # coords shift by exactly 2
    offs2 = offs.copy()
    offs2[..., 1] = 2.0 * 2.0 / (w - 1)
    got2 = np.asarray(dense_grid_sample(jnp.asarray(feat),
                                        jnp.asarray(offs2),
                                        jnp.zeros((2,), np.int32)))
    want2 = np.stack([np.stack([bilin(y, min(x + 2, w - 1)) for x in xs])
                      for y in ys])
    np.testing.assert_allclose(got2[0], want2, rtol=1e-5, atol=1e-5)
