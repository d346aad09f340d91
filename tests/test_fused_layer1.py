"""Fused int8 layer1 Pallas kernel (ops/fused_layer1.py): interpret-mode
parity vs the pure-jnp twin, BN-fold correctness, and the encoder
integration's parameter-tree identity (covered transitively by
tests/test_quantized.py as well)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.ops.fused_layer1 import (fold_bn, fused_layer1_int8,
                                         fused_layer1_reference,
                                         pack_blocks)


def _block(rng, c):
    return {
        "conv1": jnp.asarray(rng.normal(size=(3, 3, c, c), scale=0.05),
                             jnp.float32),
        "bn1_scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
        "bn1_bias": jnp.asarray(rng.normal(size=c, scale=0.1), jnp.float32),
        "bn1_mean": jnp.asarray(rng.normal(size=c, scale=0.1), jnp.float32),
        "bn1_var": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
        "conv2": jnp.asarray(rng.normal(size=(3, 3, c, c), scale=0.05),
                             jnp.float32),
        "bn2_scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
        "bn2_bias": jnp.asarray(rng.normal(size=c, scale=0.1), jnp.float32),
        "bn2_mean": jnp.asarray(rng.normal(size=c, scale=0.1), jnp.float32),
        "bn2_var": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
    }


class TestFoldBN:
    def test_fold_matches_conv_then_bn(self):
        rng = np.random.default_rng(1)
        c = 8
        x = jnp.asarray(rng.normal(size=(2, 6, 6, c)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, c, c), scale=0.1),
                        jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
        bias = jnp.asarray(rng.normal(size=c), jnp.float32)
        mean = jnp.asarray(rng.normal(size=c), jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
        eps = 1e-5

        conv = lambda xx, ww: jax.lax.conv_general_dilated(  # noqa: E731
            xx, ww, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        want = (conv(x, w) - mean) / jnp.sqrt(var + eps) * scale + bias
        wf, bf = fold_bn(w, scale, bias, mean, var, eps)
        got = conv(x, wf) + bf
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)


class TestFusedKernelParity:
    @pytest.mark.parametrize("n_blocks,h", [(2, 16), (3, 8)])
    def test_interpret_matches_reference(self, n_blocks, h):
        rng = np.random.default_rng(0)
        c = 64
        blocks = [_block(rng, c) for _ in range(n_blocks)]
        wq, ws, b = pack_blocks(blocks, eps=1e-5)
        assert wq.shape == (2 * n_blocks, 9 * c, c)
        x = jnp.asarray(rng.normal(size=(3, h, h, c)), jnp.float32)
        ref = fused_layer1_reference(x, wq, ws, b)
        got = fused_layer1_int8(x, wq, ws, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)

    def test_per_image_scales_are_batch_invariant(self):
        rng = np.random.default_rng(2)
        c = 64
        blocks = [_block(rng, c)]
        wq, ws, b = pack_blocks(blocks, eps=1e-5)
        x0 = jnp.asarray(rng.normal(size=(1, 8, 8, c)), jnp.float32)
        out_alone = fused_layer1_int8(x0, wq, ws, b, interpret=True)
        batch = jnp.concatenate([x0, x0 * 100.0], axis=0)
        out_mixed = fused_layer1_int8(batch, wq, ws, b, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_alone[0]),
                                      np.asarray(out_mixed[0]))

    def test_close_to_fp32(self):
        """int8 path tracks the full-precision layer to a few percent."""
        rng = np.random.default_rng(3)
        c = 64
        blocks = [_block(rng, c) for _ in range(2)]
        wq, ws, b = pack_blocks(blocks, eps=1e-5)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, c)), jnp.float32)

        act, res = x, x
        for p in blocks:
            for ci in ("1", "2"):
                wf, bf = fold_bn(p[f"conv{ci}"], p[f"bn{ci}_scale"],
                                 p[f"bn{ci}_bias"], p[f"bn{ci}_mean"],
                                 p[f"bn{ci}_var"], 1e-5)
                out = jax.lax.conv_general_dilated(
                    act, wf, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf
                if ci == "1":
                    act = jnp.maximum(out, 0)
                else:
                    act = jnp.maximum(out + res, 0)
                    res = act
        fp = np.asarray(act)
        q = np.asarray(fused_layer1_reference(x, wq, ws, b))
        rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
        assert rel < 0.03, rel


class TestEncoderIntegration:
    def test_fused_flag_same_tree_and_close_outputs(self):
        from egotap_tpu.models.resnet import ResNetEncoder
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        fused = ResNetEncoder("resnet18", quant=True, fused_layer1=True)
        plain = ResNetEncoder("resnet18", quant=True)
        vf = fused.init(jax.random.PRNGKey(0), x, train=False)
        vp = plain.init(jax.random.PRNGKey(0), x, train=False)
        # identical parameter trees (shadow modules declare the same
        # conv/bn variables the BasicBlocks do) and identical init values
        assert jax.tree_util.tree_structure(vf) == \
            jax.tree_util.tree_structure(vp)
        for a, b in zip(jax.tree_util.tree_leaves(vf),
                        jax.tree_util.tree_leaves(vp)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        of = fused.apply(vp, x, train=False)
        op = plain.apply(vp, x, train=False)
        for i, (a, b) in enumerate(zip(of, op)):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
            assert rel < 0.06, (i, rel)
