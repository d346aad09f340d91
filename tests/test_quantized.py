"""int8 inference path (ops/quant.py): parameter-tree compatibility and
deviation bounds vs the full-precision graph."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.models.heatmap_net import HeatmapUNet
from egotap_tpu.ops.quant import QConv, quantized_conv


class TestQuantizedConv:
    def test_matches_fp_within_quant_error(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 64)) * 0.05
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = quantized_conv(x, w, 1, ((1, 1), (1, 1)))
        # int8 error bound: relative to the output magnitude
        scale = float(jnp.abs(ref).max())
        err = float(jnp.abs(got - ref).max())
        assert err < 0.03 * scale, (err, scale)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_1x1_as_dot_bitwise_matches_conv(self, stride, monkeypatch):
        """EGOTAP_1X1_AS_DOT lowers 1x1/VALID convs to subsample+matmul;
        int8 accumulation is exact so the two forms agree bitwise."""
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
        w = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64, 32)) * 0.1
        monkeypatch.delenv("EGOTAP_1X1_AS_DOT", raising=False)
        ref = quantized_conv(x, w, stride)
        monkeypatch.setenv("EGOTAP_1X1_AS_DOT", "1")
        got = quantized_conv(x, w, stride)
        assert got.shape == (2, 8 // stride, 8 // stride, 32)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_1x1_as_dot_bf16_qconv_path(self, monkeypatch):
        """The compute-dtype (non-quantized) QConv branch takes the dot
        form too; f32 matmul vs conv agree to float tolerance."""
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
        m = QConv(16, 1, 2, 0)
        v = m.init(jax.random.PRNGKey(1), x)
        monkeypatch.delenv("EGOTAP_1X1_AS_DOT", raising=False)
        ref = m.apply(v, x)
        monkeypatch.setenv("EGOTAP_1X1_AS_DOT", "1")
        got = m.apply(v, x)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-5)

    def test_param_tree_matches_nn_conv(self):
        from flax import linen as nn
        x = jnp.zeros((1, 8, 8, 16))
        q = QConv(24, 3, 1, 1, use_bias=True)
        c = nn.Conv(24, (3, 3), (1, 1), [(1, 1), (1, 1)], use_bias=True)
        qv = q.init(jax.random.PRNGKey(0), x)
        cv = c.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(qv) == \
            jax.tree_util.tree_structure(cv)
        for (_, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(qv),
                jax.tree_util.tree_leaves_with_path(cv)):
            assert a.shape == b.shape


class TestQuantizedUNet:
    def test_same_variables_drive_both_graphs(self):
        """The quantized net consumes the full-precision net's variables
        unchanged and stays within a few % of its outputs."""
        fp = HeatmapUNet(num_output_maps=15, model_name="resnet18")
        q = HeatmapUNet(num_output_maps=15, model_name="resnet18",
                        quant=True)
        rgb = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 64, 64, 3))
        variables = fp.init(jax.random.PRNGKey(1), rgb, train=False)
        out_fp = fp.apply(variables, rgb, train=False)
        out_q = q.apply(variables, rgb, train=False)
        assert out_q.shape == out_fp.shape
        scale = float(jnp.abs(out_fp).max())
        err = float(jnp.abs(out_q - out_fp).max())
        # 17 quantized convs compound; random weights are a worst-ish case
        assert err < 0.25 * scale, (err, scale)
        # and the relative energy of the difference stays small
        rel = float(jnp.linalg.norm(out_q - out_fp)
                    / jnp.linalg.norm(out_fp))
        assert rel < 0.08, rel

    def test_lifter_task_int8_flag(self, tmp_path):
        from egotap_tpu.data.synthetic import synthetic_config
        from egotap_tpu.train.tasks import LifterTask
        cfg = synthetic_config(
            str(tmp_path / "d"), "UnrealEgo", model="egotap_autoencoder",
            num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
            skel_layer="PU", ae_hidden_size=32, patched_heatmap_ae=True,
            load_size_heatmap=(16, 16), batch_size=2, niter=1, niter_decay=1,
            int8_heatmap_inference=True)
        task = LifterTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
        batch = {
            "input_rgb": jax.random.normal(jax.random.PRNGKey(2),
                                           (2, 2, 64, 64, 3)),
            "gt_local_pose": jnp.zeros((2, 16, 3)),
        }
        out = task.eval_step(state, batch)
        assert np.isfinite(np.asarray(out["pred_pose"])).all()
        # train path is NOT quantized: one step still runs and updates
        state2, losses = task.train_step(state, dict(batch))
        assert all(np.isfinite(float(v)) for v in losses.values())


class TestQuantizedLifter:
    def test_same_variables_bounded_deviation(self):
        from egotap_tpu.models.lifter import EgoTAPLifter
        kw = dict(num_heatmap=15, num_joints=16)
        fp = EgoTAPLifter(**kw)
        q = EgoTAPLifter(quant=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 90))
        variables = fp.init(jax.random.PRNGKey(1), x)
        a = fp.apply(variables, x, train=False)
        b = q.apply(variables, x, train=False)
        assert b.shape == a.shape
        # pose outputs in cm: quantized ViT must stay close (random-weight
        # bound; real-weight deviation is measured by check_tpu /
        # validate_released)
        dev = float(jnp.abs(a - b).max())
        ref = float(jnp.abs(a).max())
        assert dev < 0.05 * max(ref, 1.0), (dev, ref)

    def test_param_trees_identical(self):
        from egotap_tpu.models.lifter import EgoTAPLifter
        kw = dict(num_heatmap=5, num_joints=6, vit_layers=1)
        x = jnp.zeros((1, 64, 64, 30))
        fp_v = EgoTAPLifter(**kw).init(jax.random.PRNGKey(0), x)
        q_v = EgoTAPLifter(quant=True, **kw).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(fp_v) == \
            jax.tree_util.tree_structure(q_v)


class TestStaticWeightQuant:
    def test_qparams_path_bitwise_equals_dynamic(self):
        """Pre-quantized weights (quantize_conv_tree) must reproduce the
        dynamic path exactly — same rounding, just hoisted off the step."""
        from egotap_tpu.ops.quant import quantize_conv_tree
        q = HeatmapUNet(num_output_maps=15, model_name="resnet18",
                        quant=True)
        rgb = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 64, 64, 3))
        variables = dict(q.init(jax.random.PRNGKey(1), rgb, train=False))
        dyn = q.apply(variables, rgb, train=False)
        qtree = quantize_conv_tree(variables["params"])
        static = q.apply({**variables, "qparams": qtree}, rgb, train=False)
        # identical math; a few-ulp tolerance absorbs eager-vs-jit
        # reduction ordering in the scale computation
        np.testing.assert_allclose(np.asarray(dyn), np.asarray(static),
                                   atol=1e-5)
        assert jax.tree_util.tree_leaves(qtree), "no conv was pre-quantized"

    def test_dense_qparams_path_bitwise_equals_dynamic(self):
        """Pre-quantized dense weights (quantize_dense_tree) reproduce
        QDense's on-the-fly rounding exactly."""
        from flax import linen as nn

        from egotap_tpu.ops.quant import QDense, quantize_dense_tree

        class Tower(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = QDense(96, name="a")(x)
                x = nn.relu(x)
                return QDense(32, name="b")(x)

        m = Tower()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 128))
        v = dict(m.init(jax.random.PRNGKey(1), x))
        dyn = m.apply(v, x)
        qtree = quantize_dense_tree(v["params"])
        assert set(qtree["a"]) == {"kernel_q", "scale"}
        static = m.apply({**v, "qparams": qtree}, x)
        np.testing.assert_allclose(np.asarray(dyn), np.asarray(static),
                                   atol=1e-5)

    def test_dense_tree_skips_narrow_and_conv_kernels(self):
        from egotap_tpu.ops.quant import quantize_dense_tree
        params = {
            "narrow": {"kernel": jnp.ones((32, 8))},       # in_dim < 64
            "conv": {"kernel": jnp.ones((3, 3, 64, 8))},   # 4D
            "wide": {"kernel": jnp.ones((64, 8)),
                     "bias": jnp.zeros((8,))},
        }
        qtree = quantize_dense_tree(params)
        assert list(qtree) == ["wide"]

    def test_prepare_inference_prequantizes_lifter(self, tmp_path):
        """int8_lifter_inference installs pre-quantized dense weights even
        without calibration batches, and the eval output is unchanged
        (same rounding, hoisted off the step)."""
        from egotap_tpu.data.synthetic import synthetic_config
        from egotap_tpu.train.tasks import LifterTask
        cfg = synthetic_config(
            str(tmp_path / "d"), "UnrealEgo", model="egotap_autoencoder",
            num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
            skel_layer="PU", ae_hidden_size=32, patched_heatmap_ae=True,
            load_size_heatmap=(16, 16), batch_size=2, niter=1,
            niter_decay=1, int8_lifter_inference=True)
        task = LifterTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
        batch = {
            "input_rgb": jax.random.normal(jax.random.PRNGKey(2),
                                           (2, 2, 64, 64, 3)),
            "gt_local_pose": jnp.zeros((2, 16, 3)),
        }
        base = np.asarray(task.eval_step(state, batch)["pred_pose"])
        prepped = task.prepare_inference(state)
        flat = jax.tree_util.tree_leaves_with_path(
            prepped.frozen["lifter_q"])
        assert any("kernel_q" in jax.tree_util.keystr(p) for p, _ in flat)
        got = np.asarray(task.eval_step(prepped, batch)["pred_pose"])
        np.testing.assert_allclose(base, got, atol=1e-4)

    def test_prepare_inference_roundtrip(self, tmp_path):
        from egotap_tpu.data.synthetic import synthetic_config
        from egotap_tpu.train.tasks import LifterTask
        cfg = synthetic_config(
            str(tmp_path / "d"), "UnrealEgo", model="egotap_autoencoder",
            num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
            skel_layer="PU", ae_hidden_size=32, patched_heatmap_ae=True,
            load_size_heatmap=(16, 16), batch_size=2, niter=1, niter_decay=1,
            int8_heatmap_inference=True)
        task = LifterTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
        batch = {
            "input_rgb": jax.random.normal(jax.random.PRNGKey(2),
                                           (2, 2, 64, 64, 3)),
            "gt_local_pose": jnp.zeros((2, 16, 3)),
        }
        base = np.asarray(task.eval_step(state, batch)["pred_pose"])
        prepped = task.prepare_inference(state)
        assert "heatmap_q" in prepped.frozen and "heatmap_q" not in state.frozen
        got = np.asarray(task.eval_step(prepped, batch)["pred_pose"])
        np.testing.assert_allclose(base, got, atol=1e-4)  # cm; ulp-level
        # idempotent
        again = task.prepare_inference(prepped)
        assert again.frozen["heatmap_q"] is prepped.frozen["heatmap_q"]


class TestCalibratedScales:
    """Static calibrated activation scales (ops/quant.py): per-sample
    outputs must be batch-composition-independent, and calibration on the
    same data must reproduce the dynamic path exactly."""

    def test_qconv_calibration_freezes_the_dynamic_scale(self):
        from egotap_tpu.ops.quant import amax_to_qparams
        q = QConv(64, 3, 1, 1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
        v = dict(q.init(jax.random.PRNGKey(1), x))
        dyn, mut = q.apply(v, x, mutable=["calib"])
        assert float(mut["calib"]["amax"]) == pytest.approx(
            float(jnp.abs(x).max()))
        qp = amax_to_qparams(mut["calib"])
        static = q.apply({**v, "qparams": qp}, x)
        # calibrated on this exact tensor -> same scale -> same result
        np.testing.assert_allclose(np.asarray(dyn), np.asarray(static),
                                   atol=1e-6)

    def test_merge_qparams_deep_merges(self):
        from egotap_tpu.ops.quant import merge_qparams
        a = {"m": {"kernel_q": 1, "scale": 2}}
        b = {"m": {"a_scale": 3}, "n": {"a_scale": 4}}
        got = merge_qparams(a, b)
        assert got == {"m": {"kernel_q": 1, "scale": 2, "a_scale": 3},
                       "n": {"a_scale": 4}}

    def _task_and_batch(self, tmp_path):
        from egotap_tpu.data.synthetic import synthetic_config
        from egotap_tpu.train.tasks import LifterTask
        cfg = synthetic_config(
            str(tmp_path / "d"), "UnrealEgo", model="egotap_autoencoder",
            num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
            skel_layer="PU", ae_hidden_size=32, patched_heatmap_ae=True,
            load_size_heatmap=(16, 16), batch_size=2, niter=1,
            niter_decay=1, int8_heatmap_inference=True,
            int8_lifter_inference=True)
        task = LifterTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
        rgb = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 64, 64, 3))
        batch = {"input_rgb": rgb, "gt_local_pose": jnp.zeros((2, 16, 3))}
        return task, state, batch

    def test_calibration_installs_scales_everywhere(self, tmp_path):
        task, state, batch = self._task_and_batch(tmp_path)
        prepped = task.prepare_inference(state, calib_batches=[batch])
        flat = jax.tree_util.tree_leaves_with_path(
            prepped.frozen["heatmap_q"])
        assert any("a_scale" in jax.tree_util.keystr(p) for p, _ in flat)
        assert "lifter_q" in prepped.frozen
        out = task.eval_step(prepped, batch)
        assert np.isfinite(np.asarray(out["pred_pose"])).all()

    def test_calibrated_outputs_are_batch_invariant(self, tmp_path):
        """Same sample alone-in-batch vs next to a 100x outlier: with
        static scales the sample's pose must be identical (the dynamic
        path's scale would be dragged by the outlier)."""
        task, state, batch = self._task_and_batch(tmp_path)
        prepped = task.prepare_inference(state, calib_batches=[batch])

        rgb = np.asarray(batch["input_rgb"])
        plain = np.stack([rgb[0], rgb[1]])
        outlier = np.stack([rgb[0], rgb[1] * 100.0])
        gt = jnp.zeros((2, 16, 3))
        a = np.asarray(task.eval_step(
            prepped, {"input_rgb": jnp.asarray(plain),
                      "gt_local_pose": gt})["pred_pose"])
        b = np.asarray(task.eval_step(
            prepped, {"input_rgb": jnp.asarray(outlier),
                      "gt_local_pose": gt})["pred_pose"])
        np.testing.assert_array_equal(a[0], b[0])

    def test_calibrated_stays_close_to_dynamic(self, tmp_path):
        task, state, batch = self._task_and_batch(tmp_path)
        dyn = np.asarray(task.eval_step(
            task.prepare_inference(state), batch)["pred_pose"])
        cal = np.asarray(task.eval_step(
            task.prepare_inference(state, calib_batches=[batch]),
            batch)["pred_pose"])
        # calibration freezes the dynamic scales AND extends int8 to the
        # 64-channel layer1 convs (quantized only with static scales), so
        # the two paths differ by that extra quantization — bounded, not
        # bitwise (random weights; golden-weight deviation is gated by
        # tools/check_tpu.py)
        rel = np.linalg.norm(cal - dyn) / max(np.linalg.norm(dyn), 1e-9)
        # random-weight bound (measures ~0.058 at this tiny config); the
        # real-weight gate is tools/check_tpu.py: calibrated 0.030 vs
        # dynamic 0.029 relative deviation on the full-size net
        assert rel < 0.10, rel


class TestSharedQuantStub:
    """QuantStub + QDense(pre_q=...): one quantize pass shared by several
    consumers (the ViT q/k/v path) must reproduce the per-module quantize
    exactly — the scale is the same max|x| either way."""

    def test_pre_q_matches_per_module_quantize(self):
        from egotap_tpu.ops.quant import QDense, QuantStub
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
        d = QDense(16)
        v = d.init(jax.random.PRNGKey(1), x)
        solo = d.apply(v, x)
        stub = QuantStub()
        pre_q = stub.apply(stub.init(jax.random.PRNGKey(2), x), x)
        shared = d.apply(v, x, pre_q=pre_q)
        np.testing.assert_array_equal(np.asarray(solo), np.asarray(shared))

    def test_vit_block_quant_sows_one_qkv_calib_entry(self):
        from egotap_tpu.models.vit import ViTBlock
        from egotap_tpu.ops.quant import amax_to_qparams
        blk = ViTBlock(hidden_size=128, num_heads=1, mlp_dim=256,
                       quant=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 128))
        v = blk.init(jax.random.PRNGKey(1), x)
        dyn, mut = blk.apply(v, x, mutable=["calib"])
        calib = mut["calib"]
        # q/k/v share the stub's single entry; their own sows are skipped
        assert "qkv_in" in calib
        for name in ("query", "key", "value"):
            assert name not in calib
        # installing the calibrated scales reproduces the dynamic result
        # exactly (calibrated on this very tensor)
        static = blk.apply({**dict(v), "qparams": amax_to_qparams(calib)}, x)
        np.testing.assert_allclose(np.asarray(dyn), np.asarray(static),
                                   atol=1e-5)
