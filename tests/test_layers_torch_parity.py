"""Numerics parity of flax building blocks against torch equivalents."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
from flax import linen as nn

from egotap_tpu.ops.upsample import upsample2x_align_corners
from egotap_tpu.models.layers import FCBlock, leaky_relu


def test_upsample_align_corners_matches_torch(rng):
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         scale_factor=2, mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("kernel,stride,pad", [(7, 2, 3), (3, 1, 1), (1, 1, 0), (3, 2, 1), (4, 2, 1)])
def test_conv_matches_torch(rng, kernel, stride, pad):
    cin, cout = 6, 9
    x = rng.normal(size=(2, 16, 16, cin)).astype(np.float32)
    w = rng.normal(size=(cout, cin, kernel, kernel)).astype(np.float32) * 0.1
    b = rng.normal(size=(cout,)).astype(np.float32)

    want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(w), torch.from_numpy(b),
                    stride=stride, padding=pad)
    want = want.permute(0, 2, 3, 1).numpy()

    conv = nn.Conv(cout, kernel_size=(kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=True)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b)}}
    got = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_maxpool_matches_torch(rng):
    x = rng.normal(size=(2, 15, 15, 4)).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(nn.max_pool(jnp.asarray(x), (3, 3), (2, 2),
                                 padding=[(1, 1), (1, 1)]))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_batchnorm_eval_matches_torch(rng):
    feat = 7
    x = rng.normal(size=(10, feat)).astype(np.float32)
    weight = rng.normal(size=feat).astype(np.float32)
    bias = rng.normal(size=feat).astype(np.float32)
    mean = rng.normal(size=feat).astype(np.float32)
    var = rng.random(feat).astype(np.float32) + 0.5

    tbn = torch.nn.BatchNorm1d(feat).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(weight))
        tbn.bias.copy_(torch.from_numpy(bias))
        tbn.running_mean.copy_(torch.from_numpy(mean))
        tbn.running_var.copy_(torch.from_numpy(var))
    want = tbn(torch.from_numpy(x)).detach().numpy()

    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    got = np.asarray(bn.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batchnorm_train_matches_torch(rng):
    feat = 5
    x = rng.normal(size=(30, feat)).astype(np.float32) * 2 + 1
    tbn = torch.nn.BatchNorm1d(feat).train()
    with torch.no_grad():
        tbn.weight.fill_(1.0)
        tbn.bias.fill_(0.0)
    want = tbn(torch.from_numpy(x)).detach().numpy()

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.ones(feat), "bias": jnp.zeros(feat)},
        "batch_stats": {"mean": jnp.zeros(feat), "var": jnp.ones(feat)},
    }
    got, _ = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_leaky_relu_matches_torch(rng):
    x = rng.normal(size=(100,)).astype(np.float32)
    want = F.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    got = np.asarray(leaky_relu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_fcblock_rows_semantics(rng):
    """FCBlock over flattened (B*J, F) rows — train-mode BN spans all rows."""
    x = rng.normal(size=(4 * 3, 6)).astype(np.float32)
    block = FCBlock(8)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    y, _ = block.apply(variables, jnp.asarray(x), train=True,
                       mutable=["batch_stats"])
    assert y.shape == (12, 8)
