import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.models.skel_variants import LSTMTreeWalk, skel_output_size
from tests.test_cells import load_golden


def _convert_lstm(state, num_layers=2):
    params = {}
    for i in range(num_layers):
        p = f"lstm.weight_ih_l{i}"
        params[f"layer{i}"] = {
            "w_ih": np.ascontiguousarray(state[f"lstm.weight_ih_l{i}"].T),
            "w_hh": np.ascontiguousarray(state[f"lstm.weight_hh_l{i}"].T),
            "b_ih": state[f"lstm.bias_ih_l{i}"],
            "b_hh": state[f"lstm.bias_hh_l{i}"],
        }
    return jax.tree.map(jnp.asarray, params)


class TestLSTMTreeWalk:
    def test_matches_reference_skelnet_lstm(self):
        state, rest = load_golden("skel_lstm.npz")
        params = _convert_lstm(state)
        parents = (0, 0, 1, 1, 2, 3, 4, 5, 2, 3, 8, 9, 10, 11, 12, 13)
        model = LSTMTreeWalk(input_size=512, hidden_size=512, num_layers=2,
                             parents=parents)
        # fixture is seq-first (J, B, .): model takes (B, J, .) of the
        # concat(input, bridge) like SkelNet's LSTM mode
        x = np.swapaxes(rest["x"], 0, 1)
        br = np.swapaxes(rest["bridge"], 0, 1)
        both = jnp.asarray(np.concatenate([x, br], axis=-1))
        out = model.apply({"params": params}, both)
        want = np.swapaxes(rest["out"], 0, 1)
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-5,
                                   rtol=1e-4)

    def test_output_sizes(self):
        assert skel_output_size("PU", 256) == 512
        assert skel_output_size("LSTM", 256) == 512
        assert skel_output_size("None", 256) == 512
        assert skel_output_size("LSTMSplit", 256) == 256
        assert skel_output_size("NoneNoRel", 256) == 256
        with pytest.raises(ValueError):
            skel_output_size("FC", 256)


class TestLifterSkelModes:
    @pytest.mark.parametrize("mode", ["LSTM", "LSTMSplit", "LSTMNoRel",
                                      "None", "NoneNoRel"])
    def test_forward_all_modes(self, mode):
        from egotap_tpu.core.skeleton import get_skeleton
        from egotap_tpu.models.lifter import EgoTAPLifter
        sk = get_skeleton("UnrealEgo")
        model = EgoTAPLifter(num_heatmap=15, num_joints=16,
                             hidden_size=16, skel_layer=mode,
                             parents=sk.parents)
        x = jnp.zeros((1, 16, 16, 90))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 16, 3)
