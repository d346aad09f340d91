import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.models.heatmap_net import HeatmapUNet
from egotap_tpu.models.initializers import apply_reference_init, kaiming_fan_in


@pytest.fixture(scope="module")
def net_params():
    model = HeatmapUNet(num_output_maps=4, views=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)))
    return variables["params"]


def test_kaiming_statistics():
    w = kaiming_fan_in(jax.random.PRNGKey(0), (3, 3, 64, 128))
    std = float(jnp.std(w))
    assert std == pytest.approx(np.sqrt(2.0 / (3 * 3 * 64)), rel=0.05)


def test_apply_reference_init(net_params):
    out = apply_reference_init(net_params, jax.random.PRNGKey(1))
    # conv kernels re-drawn with kaiming scale
    k = out["conv_heatmap"]["kernel"]
    fan_in = int(np.prod(k.shape[:-1]))
    assert float(jnp.std(k)) == pytest.approx(np.sqrt(2 / fan_in), rel=0.2)
    # biases zeroed
    assert float(jnp.abs(out["conv_heatmap"]["bias"]).max()) == 0.0
    # BN2d scales in U[0.02, 1]
    s = out["backbone"]["bn1"]["scale"]
    assert float(s.min()) >= 0.02 and float(s.max()) <= 1.0
    assert float(s.std()) > 0.05  # actually randomized


def test_skip_backbone(net_params):
    out = apply_reference_init(net_params, jax.random.PRNGKey(1),
                               skip_prefixes=(("backbone",),))
    np.testing.assert_array_equal(
        np.asarray(out["backbone"]["conv1"]["kernel"]),
        np.asarray(net_params["backbone"]["conv1"]["kernel"]))
    assert not np.array_equal(
        np.asarray(out["conv_up1"]["conv"]["kernel"]),
        np.asarray(net_params["conv_up1"]["conv"]["kernel"]))


def test_deterministic(net_params):
    a = apply_reference_init(net_params, jax.random.PRNGKey(2))
    b = apply_reference_init(net_params, jax.random.PRNGKey(2))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
