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
