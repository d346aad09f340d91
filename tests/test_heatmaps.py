import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from egotap_tpu.core.skeleton import get_skeleton
from egotap_tpu.data import heatmaps as H
from egotap_tpu.data import device_render as D


def _random_pose_2d(rng, n, spread=900.0, off=60.0):
    return rng.uniform(off, off + spread, size=(n, 2))


class TestJointHeatmapsNumpy:
    def test_peak_is_one(self, rng):
        coords = np.array([[512.0, 512.0], [160.0, 800.0]])
        hm = H.coord2d_to_heatmap(coords)
        assert hm.shape == (2, 64, 64)
        np.testing.assert_allclose(hm.max(axis=(1, 2)), 1.0, rtol=1e-6)

    def test_peak_location(self):
        coords = np.array([[512.0, 256.0]])  # x=512->32, y=256->16
        hm = H.coord2d_to_heatmap(coords)
        assert np.unravel_index(hm[0].argmax(), hm[0].shape) == (16, 32)

    def test_out_of_view_empty(self):
        coords = np.array([[-200.0, 512.0], [512.0, 2000.0], [1030.0, 512.0]])
        hm = H.coord2d_to_heatmap(coords)
        # x=1030 -> 64.375 >= res -> dropped (asymmetric condition)
        assert np.all(hm == 0.0)

    def test_margin_edge(self):
        # y slightly negative: int() truncates toward zero -> row 0
        coords = np.array([[512.0, -8.0]])  # y=-0.5 -> int -> 0
        hm = H.coord2d_to_heatmap(coords)
        assert hm[0].max() == pytest.approx(1.0, rel=1e-6)
        assert np.unravel_index(hm[0].argmax(), hm[0].shape)[0] == 0


class TestDeviceJointHeatmaps:
    def test_matches_numpy(self, rng):
        coords = np.concatenate([
            _random_pose_2d(rng, 40),
            np.array([[512.0, -8.0], [-200.0, 512.0], [512.0, 2000.0],
                      [1030.0, 512.0], [0.0, 0.0], [1023.0, 1023.0],
                      [-63.9, -63.9], [1023.9, 1087.0]]),
        ])
        want = H.coord2d_to_heatmap(coords)
        got = np.asarray(D.render_joint_heatmaps(coords))
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_batched_shape(self, rng):
        coords = rng.uniform(0, 1024, size=(3, 15, 2))
        got = D.render_joint_heatmaps(coords)
        assert got.shape == (3, 15, 64, 64)


class TestLineAA:
    def test_endpoints_full_intensity(self):
        rr, cc, val = H.line_aa(1, 1, 8, 4)
        img = np.zeros((10, 10))
        img[rr, cc] = val
        assert img[1, 1] == 1.0 and img[8, 4] == 1.0

    def test_horizontal_line(self):
        rr, cc, val = H.line_aa(3, 1, 3, 7)
        img = np.zeros((10, 10))
        ok = val > 0
        img[rr[ok], cc[ok]] = val[ok]
        np.testing.assert_allclose(img[3, 1:8], 1.0)
        assert img.sum() == pytest.approx(7.0)

    def test_diagonal_line(self):
        rr, cc, val = H.line_aa(0, 0, 5, 5)
        img = np.zeros((6, 6))
        ok = (rr >= 0) & (rr < 6) & (cc >= 0) & (cc < 6)
        img[rr[ok], cc[ok]] = val[ok]
        np.testing.assert_allclose(np.diag(img), 1.0)

    def test_degenerate_point(self):
        rr, cc, val = H.line_aa(2, 2, 2, 2)
        img = np.zeros((5, 5))
        img[rr, cc] = val
        assert img[2, 2] == 1.0 and img.sum() == 1.0

    def test_wu_intensity_conservation(self):
        # for each major-axis column, the two pixel weights sum to 1
        rr, cc, val = H.line_aa(0, 0, 3, 11)
        for c in range(12):
            assert val[cc == c].sum() == pytest.approx(1.0)


class TestLimbData:
    def _pose(self, rng, preset="UnrealEgo"):
        sk = get_skeleton(preset)
        pts3d = rng.normal(size=(sk.num_joints, 3)) * 20 + np.array([0, 0, -40.0])
        pts2d = rng.uniform(0, 1024, size=(sk.num_joints, 2))
        return sk, pts2d, pts3d

    def test_shapes_and_lengths(self, rng):
        sk, pts2d, pts3d = self._pose(rng)
        hm, lengths, theta = H.limb_data(pts2d, pts3d, sk.parents_array())
        assert hm.shape == (15, 64, 64)
        assert np.all(lengths >= 1.0)
        assert np.all(np.abs(theta) <= np.pi / 2 + 1e-6)

    def test_theta_formula(self, rng):
        sk, pts2d, pts3d = self._pose(rng)
        _, _, theta = H.limb_data(pts2d, pts3d, sk.parents_array())
        d = pts3d[sk.parents_array()[1:]] - pts3d[1:]
        want = np.arctan(d[:, 2] / np.linalg.norm(d[:, :2], axis=-1))
        np.testing.assert_allclose(theta, want, rtol=1e-6)

    def test_device_matches_numpy(self, rng):
        sk, pts2d, pts3d = self._pose(rng)
        want_hm, want_len, want_theta = H.limb_data(pts2d, pts3d, sk.parents_array())
        got_hm, got_len = D.render_limb_heatmaps(pts2d, sk.parents)
        got_theta = D.limb_theta(pts3d, sk.parents)
        np.testing.assert_allclose(np.asarray(got_hm), want_hm, atol=3e-6)
        np.testing.assert_allclose(np.asarray(got_len), want_len, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_theta), want_theta, rtol=2e-4, atol=1e-5)

    def test_device_out_of_view_bones(self):
        sk = get_skeleton("UnrealEgo")
        pts2d = np.full((16, 2), -500.0)
        hm, _ = D.render_limb_heatmaps(pts2d, sk.parents)
        assert np.all(np.asarray(hm) == 0.0)

    def test_degenerate_limbs_finite(self, rng):
        """Zero-length 3D limbs get the analytic theta limit, not the
        reference's NaN (utils/data.py:230): sign(dz)*pi/2 when only the
        xy part vanishes, 0 when the limb is fully degenerate."""
        import warnings
        sk, pts2d, pts3d = self._pose(rng)
        parents = sk.parents_array()
        pts3d[1] = pts3d[parents[1]]                       # fully degenerate
        pts3d[2, :2] = pts3d[parents[2], :2]               # vertical, dz > 0
        pts3d[2, 2] = pts3d[parents[2], 2] - 5.0
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            _, _, theta = H.limb_data(pts2d, pts3d, parents)
        got_theta = np.asarray(D.limb_theta(pts3d, sk.parents))
        assert np.isfinite(theta).all() and np.isfinite(got_theta).all()
        assert theta[0] == 0.0
        np.testing.assert_allclose(theta[1], np.pi / 2, rtol=1e-6)
        np.testing.assert_allclose(got_theta[:2], theta[:2], rtol=1e-6)

    def test_device_batched(self, rng):
        sk = get_skeleton("EgoCap")
        pts2d = rng.uniform(0, 1024, size=(2, 18, 2))
        hm, lengths = D.render_limb_heatmaps(pts2d, sk.parents)
        assert hm.shape == (2, 17, 64, 64)
        assert lengths.shape == (2, 17)
        # each batch element matches the per-sample numpy twin
        for i in range(2):
            want_hm, want_len, _ = H.limb_data(
                pts2d[i], np.ones((18, 3)), sk.parents_array())
            np.testing.assert_allclose(np.asarray(hm[i]), want_hm, atol=3e-6)


class TestSinMaps:
    def test_modulation(self, rng):
        raw = rng.random(size=(15, 64, 64)).astype(np.float32)
        theta = rng.uniform(-1.5, 1.5, size=15).astype(np.float32)
        cn, sn = H.sin_limb_heatmaps(raw, theta)
        dn_c, dn_s = D.sin_limb_heatmaps(raw, theta)
        np.testing.assert_allclose(np.asarray(dn_c), cn, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dn_s), sn, rtol=1e-6)
        np.testing.assert_allclose(np.sqrt(cn ** 2 + sn ** 2), raw, atol=1e-5)


class TestSampleLimbHeatmaps:
    """Depth-weighted limb sampler (reference utils/projection.py:291-335;
    dead upstream — the reference loop indexes out of bounds, see the
    docstring's documented divergence)."""

    def _pose(self, rng, preset="UnrealEgo"):
        sk = get_skeleton(preset)
        J = len(sk.parents_array())
        pts2d = _random_pose_2d(rng, J)
        depth = rng.uniform(-10.0, 120.0, size=J)
        return sk.parents_array(), pts2d, depth

    def test_unweighted_matches_manual_lines(self, rng):
        parents, pts2d, depth = self._pose(rng)
        out = H.sample_limb_heatmaps(pts2d, depth, parents, res=64)
        assert out.shape == (len(parents) - 2, 64, 64)
        # limb i is the blurred AA line joint (i+2) -> parent, reflect mode,
        # no normalization
        for joint in (2, 5, len(parents) - 1):
            p = np.rint(pts2d[parents[joint]] / 16.0).astype(int)
            q = np.rint(pts2d[joint] / 16.0).astype(int)
            img = np.zeros((64, 64), dtype=np.float32)
            rr, cc, val = H.line_aa(p[0], p[1], q[0], q[1])
            ok = (rr >= 0) & (rr < 64) & (cc >= 0) & (cc < 64)
            img[cc[ok], rr[ok]] = val[ok]
            np.testing.assert_allclose(out[joint - 2],
                                       gaussian_filter(img, sigma=1),
                                       atol=1e-6)

    def test_depth_weighting_interpolates_endpoints(self):
        parents = np.array([0, 0, 1, 2])
        pts2d = np.array([[160., 320.], [160., 320.], [160., 320.],
                          [800., 320.]])
        depth = np.array([0.0, 0.0, 2.0, 6.0])
        out = H.sample_limb_heatmaps(pts2d, depth, parents, res=64,
                                     weight_depth=True, depth_scale=2.0,
                                     depth_offset=1.0)
        # limb 1: horizontal line x 10..50 at y 20; pixel values before the
        # blur are depth-lerped then scaled/offset. The AA line's
        # zero-weight second row (y 21) still receives depth_offset —
        # reference quirk (val += depth_offset applies to every line pixel)
        img = np.zeros((64, 64))
        for x in range(10, 51):
            t = (x - 10) / 40.0
            img[20, x] = ((1 - t) * 2.0 + t * 6.0) * 2.0 + 1.0
            img[21, x] = 1.0
        np.testing.assert_allclose(out[1], gaussian_filter(img, sigma=1),
                                   atol=1e-5)

    def test_degenerate_limb_uses_min_depth_without_scale(self):
        parents = np.array([0, 0, 1])
        pts2d = np.array([[320., 320.], [480., 480.], [480., 480.]])
        depth = np.array([0.0, 3.0, 7.0])
        out = H.sample_limb_heatmaps(pts2d, depth, parents, res=64,
                                     weight_depth=True, depth_scale=100.0,
                                     depth_offset=50.0)
        # joint 2 == its parent: single pixel, min(3,7)=3, scale/offset
        # skipped (reference quirk)
        img = np.zeros((64, 64))
        img[30, 30] = 3.0
        np.testing.assert_allclose(out[0], gaussian_filter(img, sigma=1),
                                   atol=1e-6)

    def test_negative_depth_clamped(self):
        parents = np.array([0, 0, 1])
        pts2d = np.array([[320., 320.], [320., 320.], [640., 320.]])
        depth = np.array([0.0, -5.0, -1.0])
        out = H.sample_limb_heatmaps(pts2d, depth, parents, res=64,
                                     weight_depth=True)
        np.testing.assert_allclose(out[0], 0.0, atol=1e-7)


class TestPoseImage:
    """Full-skeleton line image (reference utils/projection.py:194-237);
    the weight_depth=True branch is the reference signature's default but
    has zero call sites upstream — ported for inventory completeness."""

    def test_unweighted_matches_line_heatmaps(self, rng):
        parents = get_skeleton("UnrealEgo").parents_array()
        pts2d = _random_pose_2d(rng, len(parents))
        out = H.pose_image(pts2d, parents, res=64)
        img = np.zeros((64, 64))
        for j in range(1, len(parents)):
            img = np.maximum(img, H.line_heatmap(
                np.rint(pts2d[parents[j]] / 16.0),
                np.rint(pts2d[j] / 16.0), 64))
        want = gaussian_filter(img, sigma=1) / H.GAUSSIAN_PEAK * 0.01
        np.testing.assert_allclose(out, want, atol=1e-9)

    def test_depth_weighting_interpolates_endpoints(self):
        parents = np.array([0, 0])
        pts2d = np.array([[160., 320.], [800., 320.]])
        depth = np.array([2.0, 6.0])
        out = H.pose_image(pts2d, parents, res=64, weight_depth=True,
                           camera_pose_depth=depth)
        img = np.zeros((64, 64))
        for x in range(10, 51):
            t = (x - 10) / 40.0
            img[20, x] = (1 - t) * 2.0 + t * 6.0
        want = gaussian_filter(img, sigma=1) / H.GAUSSIAN_PEAK * 0.01
        np.testing.assert_allclose(out, want, atol=1e-7)

    def test_degenerate_bone_takes_parent_depth(self):
        # single-pixel bone: the reference sets t = 0 for the whole bone
        # (projection.py:216-218), i.e. the PARENT's depth — not the
        # min-depth rule sample_limb_heatmaps uses
        parents = np.array([0, 0])
        pts2d = np.array([[480., 480.], [480., 480.]])
        depth = np.array([3.0, 7.0])
        out = H.pose_image(pts2d, parents, res=64, weight_depth=True,
                           camera_pose_depth=depth)
        img = np.zeros((64, 64))
        img[30, 30] = 3.0
        want = gaussian_filter(img, sigma=1) / H.GAUSSIAN_PEAK * 0.01
        np.testing.assert_allclose(out, want, atol=1e-7)

    def test_negative_depth_clamped_and_guard(self):
        parents = np.array([0, 0])
        pts2d = np.array([[320., 320.], [640., 320.]])
        out = H.pose_image(pts2d, parents, res=64, weight_depth=True,
                           camera_pose_depth=np.array([-5.0, -1.0]))
        np.testing.assert_allclose(out, 0.0, atol=1e-9)
        with pytest.raises(ValueError):
            H.pose_image(pts2d, parents, res=64, weight_depth=True)
