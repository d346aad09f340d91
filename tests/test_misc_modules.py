"""Coverage for secondary modules: legacy conv encoder/decoder, ViT tile
permutation properties, calibration cache keying."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.core import camera
from egotap_tpu.models.encoders import ConvHeatmapEncoder, HeatmapDecoder
from egotap_tpu.models.vit import tile_permutation


class TestLegacyModules:
    def test_conv_encoder(self, rng):
        enc = ConvHeatmapEncoder(hidden_size=32)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 90)).astype(np.float32))
        v = enc.init(jax.random.PRNGKey(0), x)
        z = enc.apply(v, x)
        assert z.shape == (2, 32)
        zt, upd = enc.apply(v, x, train=True, mutable=["batch_stats"])
        assert zt.shape == (2, 32) and "batch_stats" in upd

    def test_heatmap_decoder(self, rng):
        dec = HeatmapDecoder(num_heatmap=30)
        z = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
        v = dec.init(jax.random.PRNGKey(0), z)
        y = dec.apply(v, z)
        assert y.shape == (2, 64, 64, 30)


class TestTilePermutation:
    def test_is_permutation(self):
        perm = tile_permutation(6, 4)
        assert sorted(perm.tolist()) == list(range(576))

    def test_tile_block_structure(self):
        # tile 0 occupies the top-left 4x4 patch block of the 24x24 grid
        perm = tile_permutation(6, 4)
        want = [r * 24 + c for r in range(4) for c in range(4)]
        assert perm[:16].tolist() == want
        # tile 7 (row 1, col 1) starts at patch (4, 4)
        assert perm[7 * 16] == 4 * 24 + 4


class TestCalibrationCache:
    def test_keyed_by_directory(self, tmp_path):
        """The reference's module-global cache is keyed only by side
        (utils/projection.py:15, 52) and serves stale calibrations when
        two datasets mix; ours keys on (dir, side)."""
        cache = camera.CalibrationCache()
        for i, d in enumerate(("a", "b")):
            os.makedirs(tmp_path / d, exist_ok=True)
            o = camera.synthetic_calibration(f=200.0 + 100 * i)
            with open(tmp_path / d / "fisheye.calibration_left.json", "w") as f:
                json.dump(camera.calibration_to_dict(o), f)
        o1 = cache.get(str(tmp_path / "a"), "left")
        o2 = cache.get(str(tmp_path / "b"), "left")
        assert not np.allclose(o1.invpol, o2.invpol)
        # cached object identity on repeat access
        assert cache.get(str(tmp_path / "a"), "left") is o1


class TestPackedAttention:
    """Packed (B,S,H*Dh) attention == the head-split BHSD formulation."""

    def test_fallback_matches_bhsd(self):
        import jax
        import jax.numpy as jnp
        from egotap_tpu.ops.attention import (multihead_attention,
                                              multihead_attention_packed)
        k = jax.random.PRNGKey(0)
        q, kk, v = (jax.random.normal(jax.random.fold_in(k, i), (2, 40, 512))
                    for i in range(3))
        out = multihead_attention_packed(q, kk, v, heads=8)
        qh, kh, vh = (x.reshape(2, 40, 8, 64).transpose(0, 2, 1, 3)
                      for x in (q, kk, v))
        ref = multihead_attention(qh, kh, vh, use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(ref.transpose(0, 2, 1, 3).reshape(2, 40, 512)),
            atol=2e-5)

    def test_grad_finite(self):
        import jax
        import jax.numpy as jnp
        from egotap_tpu.ops.attention import multihead_attention_packed
        k = jax.random.PRNGKey(1)
        q, kk, v = (jax.random.normal(jax.random.fold_in(k, i), (1, 16, 256))
                    for i in range(3))
        g = jax.grad(lambda q: jnp.sum(
            multihead_attention_packed(q, kk, v, 2) ** 2))(q)
        assert np.isfinite(np.asarray(g)).all()
