import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from egotap_tpu.compat.convert import convert_heatmap_net
from egotap_tpu.models.heatmap_net import HeatmapUNet, split_views
from egotap_tpu.models.resnet import ResNetEncoder


class TestResNetShapes:
    @pytest.mark.parametrize("name,exp", [("resnet18", 1), ("resnet50", 4)])
    def test_pyramid_shapes(self, name, exp):
        model = ResNetEncoder(name)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        shapes = [f.shape for f in feats]
        assert shapes[0] == (1, 64, 64, 3)
        assert shapes[1] == (1, 32, 32, 64)
        assert shapes[2] == (1, 16, 16, 64 * exp)
        assert shapes[3] == (1, 8, 8, 128 * exp)
        assert shapes[4] == (1, 4, 4, 256 * exp)
        assert shapes[5] == (1, 2, 2, 512 * exp)


class TestHeatmapUNet:
    def test_output_shape_stereo(self):
        model = HeatmapUNet(num_output_maps=15, views=2)
        x = jnp.zeros((2, 2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 16, 16, 30)

    def test_split_views(self):
        x = jnp.arange(2 * 4 * 4 * 6, dtype=jnp.float32).reshape(2, 4, 4, 6)
        l, r = split_views(x, 2)
        assert l.shape == (2, 4, 4, 3)
        np.testing.assert_array_equal(np.asarray(l), np.asarray(x[..., :3]))


class TestTorchParity:
    """Full stage-1 parity: random torch twin -> converter -> flax."""

    @pytest.fixture(scope="class")
    def twin_and_flax(self):
        from tests.torch_twin import TorchHeatmapNet, randomize_bn_stats
        torch.manual_seed(0)
        twin = TorchHeatmapNet(num_output_maps=4, views=2).eval()
        randomize_bn_stats(twin)
        state = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
        variables = convert_heatmap_net(state, "resnet18")
        variables = jax.tree.map(jnp.asarray, variables)
        model = HeatmapUNet(num_output_maps=4, model_name="resnet18", views=2)
        return twin, model, variables

    def test_eval_parity(self, twin_and_flax, rng):
        twin, model, variables = twin_and_flax
        imgs = rng.normal(size=(2, 2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = twin(torch.from_numpy(imgs[:, 0]).permute(0, 3, 1, 2),
                        torch.from_numpy(imgs[:, 1]).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(imgs), train=False))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_converted_tree_matches_init(self, twin_and_flax):
        _, model, variables = twin_and_flax
        init_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)))
        want_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree_util.tree_leaves_with_path(init_vars)}
        got_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
        assert want_paths == got_paths
        shapes_want = {jax.tree_util.keystr(p): v.shape
                       for p, v in jax.tree_util.tree_leaves_with_path(init_vars)}
        shapes_got = {jax.tree_util.keystr(p): v.shape
                      for p, v in jax.tree_util.tree_leaves_with_path(variables)}
        assert shapes_want == shapes_got


class TestS2DStem:
    """Space-to-depth stem == the stored 7x7 stride-2 conv, bit-for-bit up
    to f32 summation order (models/resnet.py:S2DStemConv)."""

    def test_matches_dense_conv(self):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn
        from egotap_tpu.models.resnet import S2DStemConv
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
        ref = nn.Conv(64, (7, 7), (2, 2), [(3, 3), (3, 3)], use_bias=False)
        rv = ref.init(jax.random.PRNGKey(1), x)
        got = S2DStemConv(64, 3).apply(
            {"params": {"kernel": rv["params"]["kernel"]}}, x)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ref.apply(rv, x)), atol=2e-5)
