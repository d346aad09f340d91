"""Coverage for small utilities: image viz, metric writer, upsample edges."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from egotap_tpu.ops.upsample import upsample2x_align_corners
from egotap_tpu.utils import images
from egotap_tpu.utils.images import (
    denormalize_imagenet, normalize_imagenet, save_image, tensor2im)
from egotap_tpu.utils.logging import MetricWriter


class TestImages:
    def test_normalize_roundtrip(self, rng):
        x = rng.random((8, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(
            denormalize_imagenet(normalize_imagenet(x)), x, atol=1e-6)

    def test_tensor2im_heatmap_sum(self):
        hm = np.zeros((4, 4, 3), np.float32)
        hm[1, 1, 0] = 0.7
        hm[1, 1, 1] = 0.9  # sums beyond 1 -> clamped
        img = tensor2im(hm, is_heatmap=True)
        assert img.shape == (4, 4, 1)
        assert img[1, 1, 0] == 255
        assert img[0, 0, 0] == 0

    def test_tensor2im_rgb(self, rng):
        x = normalize_imagenet(rng.random((4, 4, 3)).astype(np.float32))
        img = tensor2im(x)
        assert img.dtype == np.uint8 and img.shape == (4, 4, 3)

    def test_save_image(self, tmp_path, rng):
        img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        path = str(tmp_path / "x.png")
        save_image(img, path)
        assert os.path.getsize(path) > 0
        gray = (rng.random((8, 8, 1)) * 255).astype(np.uint8)
        save_image(gray, str(tmp_path / "g.png"))


class TestMetricWriter:
    def test_jsonl_and_rotation(self, tmp_path):
        d = str(tmp_path / "exp" / "summary")
        w = MetricWriter(d, clear=True)
        w.scalar("Batch/loss", 1.5, 0)
        w.scalars("Validation", {"mpjpe": 3.0}, 1)
        w.close()
        lines = [json.loads(l) for l in
                 open(os.path.join(d, "metrics.jsonl"))]
        assert lines[0]["tag"] == "Batch/loss"
        assert lines[1]["value"] == 3.0

        # finished run (test_result.txt present) rotates summary -> summary_0
        open(str(tmp_path / "exp" / "test_result.txt"), "w").write("x")
        w2 = MetricWriter(d, clear=True)
        w2.close()
        assert os.path.isdir(d + "_0")
        assert os.path.exists(str(tmp_path / "exp" / "test_result_0.txt"))


class TestUpsampleEdges:
    def test_size_one_axis(self):
        x = jnp.ones((1, 1, 1, 2))
        out = upsample2x_align_corners(x)
        assert out.shape == (1, 2, 2, 2)
        np.testing.assert_allclose(np.asarray(out), 1.0)

    def test_values_interpolate(self):
        x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 1, 4, 1))
        out = np.asarray(upsample2x_align_corners(x))[0, 0, :, 0]
        # align-corners: endpoints preserved, monotonic in between
        assert out[0] == 0.0 and out[-1] == 3.0
        assert np.all(np.diff(out) >= 0)


class TestUpsampleOnePassKernel:
    """The one-pass Pallas upsample (bf16 TPU path) vs the two-pass einsum
    formulation: same linear map, interpret-mode check."""

    def test_interpret_matches_two_pass(self):
        from egotap_tpu.ops.upsample import (_upsample_pallas,
                                             _upsample_two_pass)
        rng = np.random.default_rng(0)
        for h, w, c in ((8, 8, 128), (16, 16, 256), (8, 16, 64)):
            x = jnp.asarray(rng.standard_normal((2, h, w, c)),
                            jnp.bfloat16)
            ref = np.asarray(_upsample_two_pass(x), np.float32)
            got = np.asarray(_upsample_pallas(x, interpret=True),
                             np.float32)
            scale = np.abs(ref).max()
            assert np.abs(got - ref).max() < 2e-2 * scale

    def test_f32_path_unchanged(self):
        """f32 inputs stay on the HIGHEST-precision two-pass formulation
        (the checkpoint-parity eval path)."""
        from egotap_tpu.ops.upsample import _upsample_two_pass
        x = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((1, 8, 8, 64)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(upsample2x_align_corners(x)),
            np.asarray(_upsample_two_pass(x)))

    def test_grad_matches_einsum_path(self, monkeypatch):
        """custom_vjp bwd (transposed interpolation) == einsum autodiff
        (one-pass path force-enabled; it ships off by default)."""
        import jax
        from egotap_tpu.ops import upsample as up
        monkeypatch.setattr(up, "ONE_PASS_ENABLE", True)
        x = jnp.asarray(np.random.default_rng(2)
                        .standard_normal((1, 8, 8, 64)), jnp.bfloat16)
        f = lambda t: jnp.sum(up.upsample2x_align_corners(t) ** 2)
        g = lambda t: jnp.sum(up._upsample_two_pass(t) ** 2)
        ga = np.asarray(jax.grad(f)(x), np.float32)
        gb = np.asarray(jax.grad(g)(x), np.float32)
        np.testing.assert_allclose(ga, gb, rtol=0, atol=2e-2 * np.abs(gb).max())


class TestConvertNormAngleToRgb:
    """reference utils/data.py:265-276 (upstream writes into a torch
    .expand() view -> RuntimeError; we implement the evident intent)."""

    def test_formula(self):
        rng = np.random.default_rng(0)
        raw = rng.random(size=(4, 16, 16)).astype(np.float32)
        theta = rng.uniform(-np.pi, np.pi, size=(4, 1, 1)).astype(np.float32)
        cos_hm = raw * np.cos(theta)
        sin_hm = raw * np.sin(theta)
        out = images.convert_norm_angle_to_rgb(cos_hm, sin_hm)
        assert out.shape == (4, 16, 16, 3)
        np.testing.assert_allclose(
            out[..., 0], np.broadcast_to(theta, raw.shape) / np.pi,
            atol=1e-5)
        np.testing.assert_allclose(out[..., 1], raw * 2 - 1, atol=1e-6)
        np.testing.assert_allclose(out[..., 2], 1.0)
