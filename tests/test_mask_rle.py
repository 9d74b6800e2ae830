"""COCO RLE mask protocol tests (tllod_tpu/data/mask_rle.py).

No pycocotools on this host, so the oracles are (a) dense-mask equivalence
(encode/decode/area/bbox/merge/iou must agree with direct numpy on the
decoded masks) and (b) hand-derived codec vectors computed from the spec
(maskApi.c rleToString:178-191 — 5-bit groups, 6th bit continuation,
ASCII+48, delta vs cnts[i-2] from the 4th count on).
"""

import numpy as np
import pytest

from tllod_tpu.data import mask_rle as M


def _rand_masks(h, w, n, seed=0, p=0.3):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, n) < p).astype(np.uint8)


class TestCodec:
    def test_small_values_single_byte(self):
        # 6 → '6'; [0,3,2] → "032" (all < 16, no continuation, no sign)
        assert M._counts_to_string(np.array([6])) == b"6"
        assert M._counts_to_string(np.array([0, 3, 2])) == b"032"

    def test_sign_bit_forces_continuation(self):
        # 20 = 0b10100: first group 20 has bit 4 set (reads as negative
        # terminator), so a second group 0 must follow: 'd' then '0'
        assert M._counts_to_string(np.array([20])) == b"d0"
        assert list(M._string_to_counts(b"d0")) == [20]

    def test_delta_from_fourth_count(self):
        # cnts[3] is stored as cnts[3]-cnts[1], cnts[4] as cnts[4]-cnts[2]
        s = M._counts_to_string(np.array([1, 2, 3, 4, 5]))
        assert list(M._string_to_counts(s)) == [1, 2, 3, 4, 5]
        # negative delta round-trips (4-2=2 ≥ 0 here, so force one: 2 < 9)
        s2 = M._counts_to_string(np.array([5, 9, 7, 2, 1]))
        assert list(M._string_to_counts(s2)) == [5, 9, 7, 2, 1]

    def test_large_counts_roundtrip(self):
        vals = np.array([0, 123456, 7, 1, 999999, 3])
        assert list(M._string_to_counts(M._counts_to_string(vals))) == \
            list(vals)


class TestEncodeDecode:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        m = _rand_masks(23, 31, 4, seed=seed)
        assert np.array_equal(M.decode(M.encode(m)), m)

    def test_leading_foreground_pixel(self):
        m = np.zeros((4, 5), np.uint8)
        m[0, 0] = 1
        r = M.encode(m)
        assert np.array_equal(M.decode(r), m)
        assert list(M._counts(r))[0] == 0  # first run counts zeros

    def test_column_major_runs(self):
        # one full column of ones → a single 4-run after 4 zeros (col 0 off)
        m = np.zeros((4, 3), np.uint8)
        m[:, 1] = 1
        assert list(M._counts(M.encode(m))) == [4, 4, 4]

    def test_all_zero_and_all_one(self):
        z = np.zeros((6, 7), np.uint8)
        o = np.ones((6, 7), np.uint8)
        assert np.array_equal(M.decode(M.encode(z)), z)
        assert np.array_equal(M.decode(M.encode(o)), o)
        assert int(M.area(M.encode(z))) == 0
        assert int(M.area(M.encode(o))) == 42


class TestAreaBbox:
    def test_area_matches_dense(self):
        m = _rand_masks(17, 19, 5, seed=3)
        a = M.area(M.encode(m))
        assert np.array_equal(a, m.reshape(-1, 5).sum(0).astype(np.uint32))

    def test_bbox_matches_dense(self):
        m = _rand_masks(20, 14, 6, seed=4, p=0.05)
        bbs = M.toBbox(M.encode(m))
        for i in range(6):
            ys, xs = np.nonzero(m[:, :, i])
            if xs.size == 0:
                expect = [0, 0, 0, 0]
            else:
                expect = [xs.min(), ys.min(), xs.max() - xs.min() + 1,
                          ys.max() - ys.min() + 1]
            assert np.array_equal(bbs[i], np.asarray(expect, np.float64))


class TestMergeIou:
    def test_merge_union_intersect(self):
        m = _rand_masks(15, 12, 3, seed=5)
        rles = M.encode(m)
        got_u = M.decode(M.merge(rles, intersect=False))
        got_i = M.decode(M.merge(rles, intersect=True))
        assert np.array_equal(got_u, m.any(axis=2).astype(np.uint8))
        assert np.array_equal(got_i, m.all(axis=2).astype(np.uint8))

    def test_merge_size_mismatch_is_empty(self):
        a = M.encode(np.ones((4, 4), np.uint8))
        b = M.encode(np.ones((5, 4), np.uint8))
        out = M.merge([a, b])
        assert out["size"] == [0, 0]

    def test_bbox_iou_and_crowd(self):
        dt = np.array([[0.0, 0.0, 10.0, 10.0]])
        gt = np.array([[5.0, 5.0, 10.0, 10.0]])
        o = M.iou(dt, gt, [0])
        assert o.shape == (1, 1)
        assert o[0, 0] == pytest.approx(25.0 / 175.0)
        # crowd: union = det area
        oc = M.iou(dt, gt, [1])
        assert oc[0, 0] == pytest.approx(25.0 / 100.0)

    def test_rle_iou_matches_dense(self):
        m = _rand_masks(18, 18, 4, seed=6, p=0.4)
        d_rles = M.encode(m[:, :, :2])
        g_rles = M.encode(m[:, :, 2:])
        o = M.iou(d_rles, g_rles, [0, 0])
        for d in range(2):
            for g in range(2):
                dm = m[:, :, d].astype(bool)
                gm = m[:, :, 2 + g].astype(bool)
                inter = np.logical_and(dm, gm).sum()
                union = np.logical_or(dm, gm).sum()
                expect = inter / union if inter else 0.0
                assert o[d, g] == pytest.approx(expect)

    def test_rle_iou_crowd_uses_det_area(self):
        big = np.zeros((10, 10), np.uint8)
        big[2:9, 2:9] = 1
        small = np.zeros((10, 10), np.uint8)
        small[3:5, 3:5] = 1  # fully inside the crowd region
        o = M.iou([M.encode(small)], [M.encode(big)], [1])
        assert o[0, 0] == pytest.approx(1.0)

    def test_rle_iou_size_mismatch_flags_minus_one(self):
        a = M.encode(np.ones((6, 6), np.uint8))
        b = M.encode(np.ones((7, 6), np.uint8))
        o = M.iou([a], [b], [0])
        assert o[0, 0] == -1


class TestFrPyObjects:
    def test_bbox_rasterizes_to_rectangle(self):
        h, w = 6, 8
        rles = M.frPyObjects([[1.0, 1.0, 3.0, 2.0]], h, w)
        got = M.decode(rles[0])
        expect = np.zeros((h, w), np.uint8)
        expect[1:3, 1:4] = 1  # [0,0,1,1] encloses the first pixel
        assert np.array_equal(got, expect)

    def test_polygon_triangle_sane(self):
        h, w = 12, 12
        # right triangle covering the lower-left half-ish
        r = M.frPyObjects([[0.0, 0.0, 0.0, 10.0, 10.0, 10.0]], h, w)[0]
        m = M.decode(r)
        a = int(M.area(r))
        assert a == m.sum()
        assert 30 <= a <= 70  # ~half of 10x10, rasterization-dependent
        # below the diagonal should be mostly filled, above mostly empty
        assert m[9, 1] == 1 and m[1, 9] == 0

    def test_uncompressed_rle_passthrough(self):
        raw = {"size": [4, 4], "counts": [3, 2, 11]}
        r = M.frPyObjects([raw], 4, 4)[0]
        dense = M.decode(r)
        flat = dense.flatten(order="F")
        assert list(flat) == [0, 0, 0, 1, 1] + [0] * 11

    def test_single_flat_bbox(self):
        r = M.frPyObjects([0.0, 0.0, 2.0, 2.0], 4, 4)
        assert isinstance(r, dict)
        assert int(M.area(r)) == 4
