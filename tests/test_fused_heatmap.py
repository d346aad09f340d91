"""FusedHeatmapUNet: grouped-conv fusion of the two stage-1 nets must be
numerically identical to running them separately."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.models.heatmap_net import (
    FusedHeatmapUNet, HeatmapUNet, fuse_heatmap_variables)


@pytest.fixture(scope="module")
def nets():
    rng = np.random.default_rng(0)
    pos = HeatmapUNet(num_output_maps=15, views=2)
    rot = HeatmapUNet(num_output_maps=30, views=2)
    dummy = jnp.zeros((1, 2, 64, 64, 3))
    pv = pos.init(jax.random.PRNGKey(0), dummy)
    rv = rot.init(jax.random.PRNGKey(1), dummy)

    # non-trivial batch stats so BN eval paths are exercised
    def jitter(tree, seed):
        leaves, treedef = jax.tree.flatten(tree)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        out = []
        for k, l in zip(keys, leaves):
            out.append(l + 0.05 * jax.random.normal(k, l.shape, l.dtype))
        return jax.tree.unflatten(treedef, out)

    pv = {"params": pv["params"], "batch_stats": jitter(pv["batch_stats"], 2)}
    rv = {"params": rv["params"], "batch_stats": jitter(rv["batch_stats"], 3)}
    return pos, rot, pv, rv


def test_fused_matches_separate(nets, rng):
    pos, rot, pv, rv = nets
    imgs = jnp.asarray(rng.normal(size=(2, 2, 64, 64, 3)).astype(np.float32))

    want_pos = pos.apply(pv, imgs, train=False)
    want_rot = rot.apply(rv, imgs, train=False)
    want = np.concatenate([np.asarray(want_pos), np.asarray(want_rot)],
                          axis=-1)

    fused = FusedHeatmapUNet(out_maps=(15, 30), views=2)
    fv = fuse_heatmap_variables([pv, rv])
    # structure must match a fresh init
    init = fused.init(jax.random.PRNGKey(9), imgs)
    want_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(fv)}
    assert want_paths == got_paths

    got = np.asarray(fused.apply(fv, imgs, train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
