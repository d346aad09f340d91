"""Predictor API tests: loading converted reference .pth checkpoints and
native Orbax checkpoints through one fused program."""

import pytest as _pytest
pytestmark = _pytest.mark.slow

import os

import numpy as np
import pytest
import torch

import jax

from egotap_tpu.core.config import Config
from egotap_tpu.serving import Predictor


class TestFromReferencePth:
    @pytest.fixture(scope="class")
    def pth_files(self, tmp_path_factory):
        """Write torch-twin stage-1 checkpoints and a reference-layout
        lifter checkpoint (from the golden fixture) as .pth files."""
        from tests.test_cells import load_golden
        from tests.torch_twin import TorchHeatmapNet, randomize_bn_stats

        d = tmp_path_factory.mktemp("pth")
        torch.manual_seed(0)
        pos = TorchHeatmapNet(num_output_maps=15, views=2).eval()
        rot = TorchHeatmapNet(num_output_maps=30, views=2).eval()
        randomize_bn_stats(pos)
        randomize_bn_stats(rot)
        torch.save(pos.state_dict(), str(d / "best_net_HeatMap.pth"))
        torch.save(rot.state_dict(), str(d / "best_net_RotHeatMap.pth"))

        state, rest = load_golden("lifter_unrealego.npz")
        torch.save({k: torch.from_numpy(np.array(v)) for k, v in state.items()},
                   str(d / "best_net_AutoEncoder.pth"))
        return str(d), rest

    def test_end_to_end(self, pth_files, rng):
        d, rest = pth_files
        pred = Predictor.from_reference_checkpoints(
            os.path.join(d, "best_net_HeatMap.pth"),
            os.path.join(d, "best_net_RotHeatMap.pth"),
            os.path.join(d, "best_net_AutoEncoder.pth"),
            preset="UnrealEgo", bf16=False)
        rgb = rng.normal(size=(1, 2, 256, 256, 3)).astype(np.float32)
        poses = pred(rgb)
        assert poses.shape == (1, 16, 3)
        assert np.isfinite(poses).all()
        hm = pred.heatmaps(rgb)
        assert hm.shape == (1, 64, 64, 90)

    def test_lifter_only_parity(self, pth_files):
        """The converted lifter reproduces the golden pose given the golden
        heatmap input."""
        d, rest = pth_files
        pred = Predictor.from_reference_checkpoints(
            os.path.join(d, "best_net_HeatMap.pth"),
            os.path.join(d, "best_net_RotHeatMap.pth"),
            os.path.join(d, "best_net_AutoEncoder.pth"),
            preset="UnrealEgo", bf16=False)
        x = np.transpose(rest["x"], (0, 2, 3, 1))
        pose = pred.lifter.apply(pred._vars[2], x, train=False)
        np.testing.assert_allclose(np.asarray(pose), rest["out"],
                                   atol=5e-3, rtol=1e-3)


def test_from_orbax(tmp_path, rng):
    from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
    from egotap_tpu.train import state as state_lib
    from egotap_tpu.train.tasks import LifterTask

    root = str(tmp_path / "data")
    generate_dataset(root, "UnrealEgo", num_sequences=1, frames_per_seq=4,
                     image_size=16)
    cfg = synthetic_config(root, model="egotap_autoencoder", num_heatmap=15,
                           num_rot_heatmap=15, heatmap_type="sin",
                           skel_layer="PU", ae_hidden_size=32,
                           load_size_heatmap=(16, 16), batch_size=2,
                           log_dir=str(tmp_path / "log"),
                           experiment_name="srv")
    task = LifterTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0), 1)
    state_lib.save_checkpoint(cfg.experiment_dir, "best", state)

    pred = Predictor.from_orbax(cfg, cfg.experiment_dir, bf16=False)
    rgb = rng.normal(size=(2, 2, 64, 64, 3)).astype(np.float32)
    poses = pred(rgb)
    assert poses.shape == (2, 16, 3)


@pytest.mark.slow
class TestPredictorConfigs:
    def test_int8_mode(self, rng):
        """int8=True quantizes stage-1 convs + lifter matmuls; same
        variables, bounded deviation vs the bf16 predictor."""
        import jax
        import jax.numpy as jnp
        from egotap_tpu.core.config import Config
        cfg = Config(joint_preset="UnrealEgo", model="egotap_autoencoder",
                     num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
                     skel_layer="PU", ae_hidden_size=32,
                     patched_heatmap_ae=True).derive()
        from egotap_tpu.models.heatmap_net import HeatmapUNet
        from egotap_tpu.models.lifter import EgoTAPLifter
        rgbz = jnp.zeros((1, 2, 256, 256, 3))
        hv = dict(HeatmapUNet(num_output_maps=15).init(
            jax.random.PRNGKey(0), rgbz, train=False))
        rv = dict(HeatmapUNet(num_output_maps=30).init(
            jax.random.PRNGKey(1), rgbz, train=False))
        lv = dict(EgoTAPLifter(num_heatmap=15, num_joints=16,
                               hidden_size=32).init(
            jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 90))))
        p_fp = Predictor(cfg, dict(hv), dict(rv), dict(lv), bf16=True,
                         int8=False)
        p_q = Predictor(cfg, dict(hv), dict(rv), dict(lv), bf16=True,
                        int8=True)
        assert "qparams" in p_q._vars[0]  # pre-quantized weights attached
        rgb = rng.normal(size=(1, 2, 256, 256, 3)).astype(np.float32)
        a, b = p_fp(rgb), p_q(rgb)
        assert np.isfinite(b).all()
        scale = max(float(np.abs(a).max()), 1.0)
        assert float(np.abs(a - b).max()) < 0.1 * scale

    def test_unequal_counts(self, rng):
        """nh != nr serving config builds and runs (review regression)."""
        import jax
        import jax.numpy as jnp
        from egotap_tpu.core.config import Config
        from egotap_tpu.models.heatmap_net import HeatmapUNet
        from egotap_tpu.models.lifter import EgoTAPLifter
        from egotap_tpu.core.skeleton import get_skeleton
        cfg = Config(joint_preset="UnrealEgo", model="egotap_autoencoder",
                     num_heatmap=15, num_rot_heatmap=10, heatmap_type="sin",
                     skel_layer="PU", ae_hidden_size=32,
                     patched_heatmap_ae=True).derive()
        rgbz = jnp.zeros((1, 2, 256, 256, 3))
        hv = dict(HeatmapUNet(num_output_maps=15).init(
            jax.random.PRNGKey(0), rgbz, train=False))
        rv = dict(HeatmapUNet(num_output_maps=20).init(
            jax.random.PRNGKey(1), rgbz, train=False))
        sk = get_skeleton("UnrealEgo")
        lv = dict(EgoTAPLifter(num_heatmap=15, num_rot_heatmap=10,
                               num_joints=16, hidden_size=32,
                               parents=sk.parents).init(
            jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 70))))
        pred = Predictor(cfg, hv, rv, lv, bf16=False)
        rgb = rng.normal(size=(1, 2, 256, 256, 3)).astype(np.float32)
        out = pred(rgb)
        assert out.shape == (1, 16, 3) and np.isfinite(out).all()


class TestShardedServing:
    """Predictor.shard: data-parallel serving over the 8-virtual-device
    CPU mesh (conftest); parity with the single-device predictor."""

    @pytest.fixture(scope="class")
    def small_pred_parts(self, tmp_path_factory):
        import jax
        from egotap_tpu.data.synthetic import generate_dataset, \
            synthetic_config
        from egotap_tpu.train.tasks import LifterTask
        tmp = tmp_path_factory.mktemp("shard_srv")
        root = str(tmp / "data")
        generate_dataset(root, "UnrealEgo", num_sequences=1,
                         frames_per_seq=4, image_size=16)
        cfg = synthetic_config(root, model="egotap_autoencoder",
                               num_heatmap=15, num_rot_heatmap=15,
                               heatmap_type="sin", skel_layer="PU",
                               ae_hidden_size=32,
                               load_size_heatmap=(16, 16), batch_size=2,
                               log_dir=str(tmp / "log"),
                               experiment_name="shard")
        task = LifterTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), 1)
        frozen = state.frozen
        lv = {"params": state.params, "batch_stats": state.batch_stats}
        return cfg, dict(frozen["heatmap"]), dict(frozen["rot_heatmap"]), lv

    def test_sharded_matches_single_device(self, small_pred_parts, rng):
        cfg, hv, rv, lv = small_pred_parts
        rgb = rng.normal(size=(8, 2, 64, 64, 3)).astype(np.float32)
        single = Predictor(cfg, hv, rv, lv, bf16=False, int8=False)
        ref = single(rgb)
        sharded = Predictor(cfg, hv, rv, lv, bf16=False,
                            int8=False).shard(4)
        assert sharded._mesh is not None
        assert sharded._mesh.devices.size == 4
        out = sharded(rgb)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_indivisible_batch_raises_when_opted_out(self, small_pred_parts,
                                                     rng):
        cfg, hv, rv, lv = small_pred_parts
        pred = Predictor(cfg, hv, rv, lv, bf16=False, int8=False).shard(4)
        rgb = rng.normal(size=(3, 2, 64, 64, 3)).astype(np.float32)
        with pytest.raises(ValueError, match="not divisible"):
            pred(rgb, pad_ragged=False)

    def test_ragged_batch_auto_pads(self, small_pred_parts, rng):
        """Default: a ragged batch is zero-padded onto the mesh and the
        pad rows dropped — per-sample outputs identical to the
        single-device predictor on the unpadded batch."""
        cfg, hv, rv, lv = small_pred_parts
        rgb = rng.normal(size=(5, 2, 64, 64, 3)).astype(np.float32)
        ref = Predictor(cfg, hv, rv, lv, bf16=False, int8=False)(rgb)
        pred = Predictor(cfg, hv, rv, lv, bf16=False, int8=False).shard(4)
        out = pred(rgb)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_tensor_parallel_matches_single_device(self, small_pred_parts,
                                                    rng):
        """shard(num_model=2): Megatron column/row-parallel lifter weights
        over the 'model' axis (parallel/tp.py). GSPMD partitions the same
        program, so per-sample outputs are exact vs single-device."""
        import jax
        from jax.sharding import PartitionSpec as P
        cfg, hv, rv, lv = small_pred_parts
        rgb = rng.normal(size=(8, 2, 64, 64, 3)).astype(np.float32)
        ref = Predictor(cfg, hv, rv, lv, bf16=False, int8=False)(rgb)
        tp = Predictor(cfg, hv, rv, lv, bf16=False,
                       int8=False).shard(4, num_model=2)
        assert dict(tp._mesh.shape) == {"data": 4, "model": 2}
        # the ViT projections actually sharded (not silently replicated)
        vit = tp._vars[2]["params"]["pos_encoder"]["vit"]["layer0"]
        assert vit["query"]["kernel"].sharding.spec == P(None, "model")
        assert vit["mlp_out"]["kernel"].sharding.spec == P("model", None)
        out = tp(rgb)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_tensor_parallel_int8_calibrated(self, small_pred_parts, rng):
        """TP composes with int8 + calibration: kernel_q/scale shard with
        their kernels, fresh a_scales re-place on the mesh, outputs match
        the single-device int8 predictor exactly."""
        from jax.sharding import PartitionSpec as P
        cfg, hv, rv, lv = small_pred_parts
        rgb = rng.normal(size=(8, 2, 64, 64, 3)).astype(np.float32)
        single = Predictor(cfg, dict(hv), dict(rv), dict(lv), bf16=False,
                           int8=True).calibrate([rgb])
        tp = Predictor(cfg, dict(hv), dict(rv), dict(lv), bf16=False,
                       int8=True).shard(2, num_model=2).calibrate([rgb])
        kq = tp._vars[2]["qparams"]["pos_encoder"]["vit"]["layer0"][
            "mlp_in"]["kernel_q"]
        assert kq.sharding.spec == P(None, "model")
        np.testing.assert_allclose(tp(rgb), single(rgb),
                                   atol=1e-5, rtol=1e-5)

    def test_tp_indivisible_dims_fall_back_replicated(self,
                                                      small_pred_parts):
        """num_model that does not divide the hidden dims replicates leaf
        by leaf instead of failing."""
        from jax.sharding import PartitionSpec as P
        cfg, hv, rv, lv = small_pred_parts
        tp = Predictor(cfg, hv, rv, lv, bf16=False,
                       int8=False).shard(1, num_model=3)
        vit = tp._vars[2]["params"]["pos_encoder"]["vit"]["layer0"]
        # ViT hidden 1024 % 3 != 0 -> replicated
        assert vit["query"]["kernel"].sharding.spec == P()

    def test_calibrate_then_shard_int8(self, small_pred_parts, rng):
        """int8 + calibrated static scales compose with the mesh in either
        order; outputs stay finite and batch-invariant per sample."""
        cfg, hv, rv, lv = small_pred_parts
        rgb = rng.normal(size=(8, 2, 64, 64, 3)).astype(np.float32)
        pred = Predictor(cfg, dict(hv), dict(rv), dict(lv), bf16=True,
                         int8=True).shard(2)
        pred.calibrate([rgb])
        out = pred(rgb)
        assert out.shape == (8, 16, 3) and np.isfinite(out).all()


class TestPredictorCalibration:
    def test_calibrate_installs_scales_and_batch_invariance(self, rng):
        """Predictor.calibrate: static a_scales land in all three variable
        trees and per-sample outputs become batch-composition-independent."""
        import jax
        import jax.numpy as jnp
        from egotap_tpu.core.config import Config
        from egotap_tpu.models.heatmap_net import HeatmapUNet
        from egotap_tpu.models.lifter import EgoTAPLifter
        cfg = Config(joint_preset="UnrealEgo", model="egotap_autoencoder",
                     num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
                     skel_layer="PU", ae_hidden_size=32,
                     patched_heatmap_ae=True).derive()
        rgbz = jnp.zeros((1, 2, 256, 256, 3))
        hv = dict(HeatmapUNet(num_output_maps=15).init(
            jax.random.PRNGKey(0), rgbz, train=False))
        rv = dict(HeatmapUNet(num_output_maps=30).init(
            jax.random.PRNGKey(1), rgbz, train=False))
        lv = dict(EgoTAPLifter(num_heatmap=15, num_joints=16,
                               hidden_size=32).init(
            jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 90))))
        pred = Predictor(cfg, hv, rv, lv, bf16=True, int8=True)
        rgb = rng.normal(size=(2, 2, 256, 256, 3)).astype(np.float32)
        pred.calibrate([rgb])
        flat = jax.tree_util.tree_leaves_with_path(
            pred._vars[0]["qparams"])
        assert any("a_scale" in jax.tree_util.keystr(p) for p, _ in flat)
        assert "qparams" in pred._vars[2]  # lifter a_scales

        alone = pred(rgb[:1].repeat(2, axis=0))[0]
        mixed = pred(np.stack([rgb[0], rgb[1] * 100.0]))[0]
        np.testing.assert_array_equal(alone, mixed)
