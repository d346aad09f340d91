import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.compat.convert import (
    VariableBuilder, _fc_stack, convert_lifter, convert_vit)
from egotap_tpu.models.encoders import GridViTEncoder, LimbFCEncoder
from egotap_tpu.models.lifter import EgoTAPLifter
from tests.test_cells import load_golden


class TestGridViTEncoderParity:
    def test_matches_reference(self):
        state, rest = load_golden("vit_encoder.npz")
        b = VariableBuilder()
        convert_vit(state, b, "vit.", ("enc", "vit"), num_layers=3)
        _fc_stack(state, b, "", ("enc",), ("fc1", "fc2", "fc3"))
        variables = jax.tree.map(
            jnp.asarray,
            {"params": b.params["enc"], "batch_stats": b.batch_stats["enc"]})
        model = GridViTEncoder(num_tiles=30, hidden_size=128)
        got = model.apply(variables, jnp.asarray(rest["x"]), train=False)
        np.testing.assert_allclose(np.asarray(got), rest["out"],
                                   atol=2e-3, rtol=1e-3)


class TestLimbFCEncoderParity:
    def test_matches_reference(self):
        state, rest = load_golden("fc_encoder.npz")
        b = VariableBuilder()
        _fc_stack(state, b, "", ("enc",), ("fc1", "fc2", "fc3"))
        variables = jax.tree.map(
            jnp.asarray,
            {"params": b.params["enc"], "batch_stats": b.batch_stats["enc"]})
        model = LimbFCEncoder(hidden_size=128)
        got = model.apply(variables, jnp.asarray(rest["x"]), train=False)
        np.testing.assert_allclose(np.asarray(got), rest["out"],
                                   atol=1e-4, rtol=1e-4)


class TestLifterParity:
    @pytest.mark.parametrize("tag,nh,nj,offset", [
        ("unrealego", 15, 16, True),
        ("egocap", 17, 17, False),
    ])
    def test_matches_reference(self, tag, nh, nj, offset):
        state, rest = load_golden(f"lifter_{tag}.npz")
        variables = jax.tree.map(jnp.asarray, convert_lifter(state))
        model = EgoTAPLifter(num_heatmap=nh, num_joints=nj,
                             use_global_offset=offset)
        # fixture input is channels-first (B, C, H, W) like the reference
        x = jnp.asarray(rest["x"]).transpose(0, 2, 3, 1)
        got = model.apply(variables, x, train=False)
        assert got.shape == rest["out"].shape
        np.testing.assert_allclose(np.asarray(got), rest["out"],
                                   atol=5e-3, rtol=1e-3)

    def test_init_runs(self):
        model = EgoTAPLifter(num_heatmap=15, num_joints=16)
        x = jnp.zeros((1, 64, 64, 90))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 16, 3)


class TestUnequalHeatmapCounts:
    """nh != nr: limb bridges tail-align to the walked joints (the
    reference lifter asserts equality, net_architecture.py:598; the
    dataloader supports unequal counts, data_loader.py:149-164)."""

    @pytest.mark.parametrize("nr", [10, 15])
    def test_forward_unequal(self, nr):
        nh, ld, views = 15, 2, 2
        model = EgoTAPLifter(num_heatmap=nh, num_rot_heatmap=nr,
                             num_joints=16)
        chans = (nh + nr * ld) * views
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, chans))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = jax.jit(model.apply)(variables, x)
        assert out.shape == (2, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_equal_count_unchanged(self):
        """num_rot_heatmap=J must be the identical computation as the
        default (None)."""
        nh = 5
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, nh * 2 * 3))
        base = EgoTAPLifter(num_heatmap=nh, num_joints=6, vit_layers=1)
        explicit = EgoTAPLifter(num_heatmap=nh, num_rot_heatmap=nh,
                                num_joints=6, vit_layers=1)
        variables = base.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(
            np.asarray(base.apply(variables, x)),
            np.asarray(explicit.apply(variables, x)))

    def test_task_unequal_counts(self, tmp_path):
        """LifterTask end-to-end (gt-heatmap path) with nh != nr."""
        from egotap_tpu.data.synthetic import synthetic_config
        from egotap_tpu.train.tasks import LifterTask
        cfg = synthetic_config(
            str(tmp_path / "d"), "UnrealEgo", model="egotap_autoencoder",
            num_heatmap=15, num_rot_heatmap=10, heatmap_type="sin",
            skel_layer="PU", ae_hidden_size=32, patched_heatmap_ae=True,
            load_size_heatmap=(64, 64), batch_size=2, use_gt_heatmap=True,
            niter=1, niter_decay=1)
        task = LifterTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
        batch = {
            "gt_heatmap_left": jnp.zeros((2, 64, 64, 15)),
            "gt_heatmap_right": jnp.zeros((2, 64, 64, 15)),
            "gt_limb_heatmap_left": jnp.zeros((2, 64, 64, 20)),
            "gt_limb_heatmap_right": jnp.zeros((2, 64, 64, 20)),
            "gt_local_pose": jnp.zeros((2, 16, 3)),
        }
        out = task.eval_step(state, batch)
        assert out["pred_pose"].shape == (2, 16, 3)
        assert np.isfinite(np.asarray(out["pred_pose"])).all()
