"""On-device validation suite (run on real TPU; pytest runs CPU-only).

Checks, on the actual chip:
  1. Pallas fused attention == jnp attention (f32).
  2. Pallas fused PU chain == lax.scan chain (f32).
  3. bf16 end-to-end lifter deviation vs f32 on converted golden weights
     (quantifies the use_amp accuracy cost; test-time eval forces f32
     like the reference, this is informational).
  4. eval_step pose output f32 TPU vs CPU (cross-backend drift).

Usage: python tools/check_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.core.cache import enable_compilation_cache


def check_attention():
    from egotap_tpu.ops.attention import multihead_attention
    k = jax.random.PRNGKey(0)
    q, kk, v = (jax.random.normal(jax.random.fold_in(k, i),
                                  (2, 8, 576, 128), jnp.float32)
                for i in range(3))
    a = jax.jit(lambda q, k, v: multihead_attention(q, k, v, True))(q, kk, v)
    b = jax.jit(lambda q, k, v: multihead_attention(q, k, v, False))(q, kk, v)
    diff = float(jnp.max(jnp.abs(a - b)))
    print(f"attention pallas-vs-jnp max diff: {diff:.2e}")
    assert diff < 1e-3, diff

    # the pallas forward must be differentiable (training path)
    def loss(q, k, v):
        return jnp.sum(multihead_attention(q, k, v, True) ** 2)
    g = jax.jit(jax.grad(loss))(q, kk, v)
    gd = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        multihead_attention(q, k, v, False) ** 2)))(q, kk, v)
    gdiff = float(jnp.max(jnp.abs(g - gd)))
    print(f"attention grad pallas-vs-jnp max diff: {gdiff:.2e}")
    assert gdiff < 1e-2, gdiff

    # packed (transpose-free) layout, the Grid-ViT's production path
    from egotap_tpu.ops.attention import multihead_attention_packed
    B, H, S, D = q.shape
    qs, ks, vs = (x.transpose(0, 2, 1, 3).reshape(B, S, H * D)
                  for x in (q, kk, v))
    a2 = jax.jit(lambda q, k, v: multihead_attention_packed(q, k, v, H, True)
                 )(qs, ks, vs)
    b2 = jax.jit(lambda q, k, v: multihead_attention_packed(q, k, v, H, False)
                 )(qs, ks, vs)
    d2 = float(jnp.max(jnp.abs(a2 - b2)))
    d3 = float(jnp.max(jnp.abs(
        a2.reshape(B, S, H, D).transpose(0, 2, 1, 3) - a)))
    print(f"packed attention pallas-vs-jnp {d2:.2e}, vs-bhsd {d3:.2e}")
    assert d2 < 1e-3 and d3 < 1e-3, (d2, d3)

    g2 = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        multihead_attention_packed(q, k, v, H, True) ** 2)))(qs, ks, vs)
    g2d = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        multihead_attention_packed(q, k, v, H, False) ** 2)))(qs, ks, vs)
    gd2 = float(jnp.max(jnp.abs(g2 - g2d)))
    print(f"packed attention grad pallas-vs-jnp max diff: {gd2:.2e}")
    assert gd2 < 1e-2, gd2


def check_pu_kernel():
    from egotap_tpu.models.cells import PUChain
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 15, 256))
    br = jax.random.normal(jax.random.PRNGKey(2), (8, 15, 256))
    scan = PUChain(256, 256, 512, 2, use_fused_kernel=False)
    fused = PUChain(256, 256, 512, 2, use_fused_kernel=True)
    v = scan.init(jax.random.PRNGKey(3), x, br)
    a = jax.jit(lambda v, x, b: scan.apply(v, x, b))(v, x, br)
    b = jax.jit(lambda v, x, b: fused.apply(v, x, b))(v, x, br)
    diff = float(jnp.max(jnp.abs(a - b)))
    print(f"PU fused-vs-scan max diff: {diff:.2e}")
    assert diff < 2e-2, diff  # fused kernel holds weights bf16 in VMEM


def check_bf16_lifter():
    golden = os.path.join(os.path.dirname(__file__), os.pardir,
                          "tests", "golden", "lifter_unrealego.npz")
    if not os.path.exists(golden):
        print("bf16 lifter check skipped (no golden fixture)")
        return
    from egotap_tpu.compat.convert import convert_lifter
    from egotap_tpu.models.lifter import EgoTAPLifter
    data = np.load(golden)
    state = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    variables = jax.tree.map(jnp.asarray, convert_lifter(state))
    model = EgoTAPLifter(num_heatmap=15, num_joints=16)
    x = jnp.asarray(data["x"]).transpose(0, 2, 3, 1)
    f32 = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    bf16 = jax.jit(lambda v, x: model.apply(
        v, x.astype(jnp.bfloat16), train=False))(variables, x)
    diff = float(jnp.max(jnp.abs(f32 - bf16.astype(jnp.float32))))
    ref_diff = float(np.max(np.abs(np.asarray(f32) - data["out"])))
    print(f"lifter f32-TPU vs reference-golden max diff: {ref_diff:.2e} cm")
    print(f"lifter bf16(+tanh-gelu) vs f32 max pose diff: {diff:.2e} cm "
          f"({diff * 10:.2e} mm)")
    assert ref_diff < 0.1, "f32 parity must stay within 1 mm"
    assert diff * 10 < 1.0, "bf16 fast path must stay within 1 mm"

    # int8 ViT-matmul serving mode: pose deviation vs f32 on the SAME
    # golden reference weights (real-weight deviation, not just random)
    qmodel = EgoTAPLifter(num_heatmap=15, num_joints=16, quant=True)
    q = jax.jit(lambda v, x: qmodel.apply(
        v, x.astype(jnp.bfloat16), train=False))(variables, x)
    qdiff = float(jnp.max(jnp.abs(f32 - q.astype(jnp.float32))))
    print(f"lifter int8-ViT vs f32 max pose diff: {qdiff:.2e} cm "
          f"({qdiff * 10:.2e} mm)")
    assert qdiff * 10 < 1.0, "int8 lifter mode must stay within 1 mm"


def check_int8_pipeline():
    """End-to-end pose deviation of the int8 heatmap-net inference path
    (random weights; real-weight deviation is validated with
    tools/validate_released.py once weights are provisioned)."""
    from egotap_tpu.models.heatmap_net import HeatmapUNet
    rgb = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 256, 256, 3))
    fp = HeatmapUNet(num_output_maps=15)
    q = HeatmapUNet(num_output_maps=15, quant=True)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = fp.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 2, 256, 256, 3)), train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    a = jax.jit(lambda v, x: fp.apply(
        v, x.astype(jnp.bfloat16), train=False))(variables, rgb)
    b = jax.jit(lambda v, x: q.apply(
        v, x.astype(jnp.bfloat16), train=False))(variables, rgb)
    a, b = a.astype(jnp.float32), b.astype(jnp.float32)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    print(f"int8 heatmap-net relative output deviation: {rel:.3f}")
    assert rel < 0.1, rel

    # calibrated static scales (the bench/serving config): also quantizes
    # the 64-channel layer1 convs — deviation vs bf16 must stay bounded
    import functools
    calib_apply = jax.jit(functools.partial(
        q.apply, train=False, mutable=["calib"]))
    _, mut = calib_apply(variables, rgb.astype(jnp.bfloat16))
    from egotap_tpu.ops.quant import amax_to_qparams, merge_qparams, \
        quantize_conv_tree
    qp = merge_qparams(quantize_conv_tree(variables["params"]),
                       amax_to_qparams(mut["calib"]))
    c = jax.jit(lambda v, x: q.apply(
        v, x.astype(jnp.bfloat16), train=False))(
        {**variables, "qparams": qp}, rgb)
    relc = float(jnp.linalg.norm(c.astype(jnp.float32) - a)
                 / jnp.linalg.norm(a))
    print(f"int8 heatmap-net CALIBRATED relative deviation: {relc:.3f}")
    assert relc < 0.12, relc


if __name__ == "__main__":
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    check_attention()
    check_pu_kernel()
    check_bf16_lifter()
    check_int8_pipeline()
    print("all TPU checks passed")
