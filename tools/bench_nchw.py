"""Whole-net NCHW layout experiment for the stage-1 heatmap net (VERDICT
r3 item 5).

Round-3 isolated data: the 7x7 stem conv runs faster with NCHW operands
(0.374 ms vs 0.474 NHWC, docs/ROUND3.md), but an NCHW encoder "ripples
through the whole net" — so this tool measures the WHOLE net both ways
instead of extrapolating from the stem:

  * the shipped flax HeatmapUNet (NHWC, models/heatmap_net.py), vs
  * a pure-function NCHW twin consuming the SAME parameter tree
    (kernels stay HWIO; only dimension_numbers/axes change — this is the
    exact program a layout-transposed checkpoint conversion would run).

Parity is asserted in f32 on the host CPU before timing (max|diff| of
the two layouts' outputs), then both bf16 programs are timed at the
bench configuration (batch 32, 256x256 stereo, 90 output maps — the
reference's UnrealEgo sin config, scripts/test/unrealego.sh).

Reference compute being measured: model/net_architecture.py:45-173
(Encoder_Block + decoder).

Run: python tools/bench_nchw.py            # TPU timing (+ CPU parity)
     python tools/bench_nchw.py parity     # CPU parity check only
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

BATCH = 32
IMG = 256
NUM_MAPS = 45  # 15 joint + 15*2 sin-limb maps per view
VIEWS = 2


# --------------------------------------------------------------------------
# NCHW twin (pure functions over the flax HeatmapUNet parameter tree)
# --------------------------------------------------------------------------
def _conv(x, kernel, stride=1, pad=0, bias=None):
    """NCHW conv; kernel stays in the checkpoint's HWIO layout."""
    import jax
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    if bias is not None:
        out = out + bias.astype(out.dtype).reshape(1, -1, 1, 1)
    return out


def _bn(x, p, s):
    import jax.numpy as jnp
    from egotap_tpu.models.layers import BN_EPS
    inv = (p["scale"] / jnp.sqrt(s["var"] + BN_EPS)).astype(x.dtype)
    shift = (p["bias"] - p["scale"] * s["mean"]
             / jnp.sqrt(s["var"] + BN_EPS)).astype(x.dtype)
    return x * inv.reshape(1, -1, 1, 1) + shift.reshape(1, -1, 1, 1)


def _block(x, p, s, stride, downsample):
    import jax.nn
    out = _conv(x, p["conv1"]["kernel"], stride, 1)
    out = jax.nn.relu(_bn(out, p["bn1"], s["bn1"]))
    out = _bn(_conv(out, p["conv2"]["kernel"], 1, 1), p["bn2"], s["bn2"])
    identity = x
    if downsample:
        identity = _bn(_conv(x, p["downsample_0"]["kernel"], stride, 0),
                       p["downsample_1"], s["downsample_1"])
    return jax.nn.relu(out + identity)


def _upsample2x_nchw(x):
    """align-corners 2x bilinear, NCHW: same banded einsums as
    ops/upsample.py with the spatial axes in trailing position."""
    import jax
    import jax.numpy as jnp
    from egotap_tpu.ops.upsample import _interp_matrix
    h, w = x.shape[-2], x.shape[-1]
    Wh = jnp.asarray(_interp_matrix(h, 2 * h)).astype(x.dtype)
    Ww = jnp.asarray(_interp_matrix(w, 2 * w)).astype(x.dtype)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x = jnp.einsum("oh,bchw->bcow", Wh, x, precision=prec)
    x = jnp.einsum("pw,bcow->bcop", Ww, x, precision=prec)
    return x


def nchw_forward(params, batch_stats, images):
    """images: (B, V, 3, H, W) -> heatmaps (B, C, H/4, W/4).

    Same math as HeatmapUNet.__call__ (models/heatmap_net.py:57-94) with
    every tensor in NCHW; consumes the NHWC checkpoint tree unchanged.
    """
    import jax
    import jax.numpy as jnp
    bp, bs = params["backbone"], batch_stats["backbone"]
    b, v = images.shape[0], images.shape[1]
    x = images.reshape((b * v,) + images.shape[2:])

    out = _conv(x, bp["conv1"]["kernel"], 2, 3)
    layer0 = jax.nn.relu(_bn(out, bp["bn1"], bs["bn1"]))
    out = jax.lax.reduce_window(
        layer0, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))

    feats = []
    for li, width in enumerate((64, 128, 256, 512), start=1):
        for bi in range(2):
            stride = 2 if (li > 1 and bi == 0) else 1
            ds = stride != 1 or out.shape[1] != width
            key = f"layer{li}_{bi}"
            out = _block(out, bp[key], bs[key], stride, ds)
        feats.append(out)
    layer1, layer2, layer3, layer4 = feats

    def merge(f):  # (B*V, c, h, w) -> (B, V*c, h, w) view-major
        _, c, h, w = f.shape
        return f.reshape(b, v * c, h, w)

    def crelu(f, name, pad):
        pc = params[name]["conv"]
        return jax.nn.relu(_conv(f, pc["kernel"], 1, pad, pc["bias"]))

    x = crelu(merge(layer4), "layer4_1x1", 0)
    x = _upsample2x_nchw(x)
    x = jnp.concatenate([x, crelu(merge(layer3), "layer3_1x1", 0)], axis=1)
    x = crelu(x, "conv_up3", 1)
    x = _upsample2x_nchw(x)
    x = jnp.concatenate([x, crelu(merge(layer2), "layer2_1x1", 0)], axis=1)
    x = crelu(x, "conv_up2", 1)
    x = _upsample2x_nchw(x)
    x = jnp.concatenate([x, crelu(merge(layer1), "layer1_1x1", 0)], axis=1)
    x = crelu(x, "conv_up1", 1)
    ph = params["conv_heatmap"]
    return _conv(x, ph["kernel"], 1, 0, ph["bias"])


# --------------------------------------------------------------------------
def build():
    import jax
    import jax.numpy as jnp
    from egotap_tpu.models.heatmap_net import HeatmapUNet
    net = HeatmapUNet(num_output_maps=NUM_MAPS, views=VIEWS)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, VIEWS, 32, 32, 3), jnp.float32), train=False)
    return net, variables


def parity(net, variables):
    import jax
    import jax.numpy as jnp
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (2, VIEWS, 64, 64, 3), jnp.float32)
        ref = net.apply(variables, x, train=False)           # (B,h,w,C)
        got = nchw_forward(variables["params"], variables["batch_stats"],
                           x.transpose(0, 1, 4, 2, 3))       # (B,C,h,w)
        diff = float(jnp.max(jnp.abs(ref - got.transpose(0, 2, 3, 1))))
        scale = float(jnp.max(jnp.abs(ref)))
    print(f"parity (f32, CPU): max|NHWC - NCHW| = {diff:.3e} "
          f"(output scale {scale:.3e})")
    assert diff < 1e-4 * max(scale, 1.0), "layout twin diverged"


def main():
    import jax
    if "parity" in sys.argv[1:]:  # CPU-only run; stay off the TPU relay
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from egotap_tpu.core.cache import enable_compilation_cache
    from tools.perf_breakdown import timed_scan

    net, variables = build()
    parity(net, variables)
    if "parity" in sys.argv[1:]:
        return

    enable_compilation_cache()
    dev = jax.devices()[0]
    bf = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if a.dtype == jnp.float32 and a.ndim >= 2 else a,
                      variables)
    bf = jax.device_put(bf, dev)
    x = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, VIEWS, IMG, IMG, 3), jnp.bfloat16),
        dev)
    xc = jax.device_put(jnp.transpose(x, (0, 1, 4, 2, 3)), dev)

    def f_nhwc(i, v, x):
        out = net.apply(v, x + (i * 1e-6).astype(x.dtype), train=False)
        return jnp.mean(out.astype(jnp.float32))

    def f_nchw(i, v, xc):
        out = nchw_forward(v["params"], v["batch_stats"],
                           xc + (i * 1e-6).astype(xc.dtype))
        return jnp.mean(out.astype(jnp.float32))

    t_nhwc, _ = timed_scan(f_nhwc, bf, x, k=8, label="nhwc_fullnet")
    t_nchw, _ = timed_scan(f_nchw, bf, xc, k=8, label="nchw_fullnet")
    print(f"whole-net: NHWC {t_nhwc*1e3:.2f} ms vs NCHW {t_nchw*1e3:.2f} ms"
          f" ({(t_nhwc/t_nchw - 1)*100:+.1f}% NCHW speedup)")


if __name__ == "__main__":
    main()
