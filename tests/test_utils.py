"""Coverage for small utilities: image viz, metric writer, upsample edges."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from egotap_tpu.ops.upsample import upsample2x_align_corners
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
