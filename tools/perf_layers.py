"""Layer-level micro-benchmarks of the eval step's building blocks.

Usage: python tools/perf_layers.py [name ...]
Names: backbone stem decoder head upsample vit fc pu stages
(no-arg runs all EXCEPT `stages`; add `int8` to quantize the conv paths)

Isolates where the heatmap nets lose MFU (stem? layer1? decoder convs?
upsample? the narrow output head?) and what the lifter's time splits into.
Same timed-scan + cost-analysis methodology as tools/perf_breakdown.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from egotap_tpu.core.cache import enable_compilation_cache
from tools.perf_breakdown import timed_scan

B = 32
DT = jnp.bfloat16


def main():
    which = set(sys.argv[1:]) or {"backbone", "stem", "decoder", "head",
                                  "upsample", "vit", "fc", "pu"}
    int8 = "int8" in which  # e.g. `perf_layers.py backbone decoder int8`
    which.discard("int8")
    # `calib`: int8 with CALIBRATED static activation scales (the shipped
    # serving config; also quantizes 64-channel convs)
    calib = "calib" in which
    which.discard("calib")
    int8 = int8 or calib
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)

    def with_calib(module, v, x, **kw):
        if not calib:
            return v
        import functools
        from egotap_tpu.ops.quant import (amax_to_qparams, merge_qparams,
                                          quantize_conv_tree)
        _, mut = jax.jit(functools.partial(
            module.apply, mutable=["calib"], **kw))(v, x)
        return {**v, "qparams": merge_qparams(
            quantize_conv_tree(v["params"]),
            amax_to_qparams(mut["calib"]))}

    if {"backbone", "stem", "decoder", "head"} & which:
        from egotap_tpu.models.heatmap_net import HeatmapUNet
        from egotap_tpu.models.resnet import ResNetEncoder
        net = HeatmapUNet(num_output_maps=15, model_name="resnet18",
                          quant=int8)
        rgb = jax.random.normal(rng, (B, 2, 256, 256, 3), DT)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = net.init(jax.random.PRNGKey(1),
                                 jnp.zeros((1, 2, 256, 256, 3)), train=False)
        variables = jax.device_put(variables, jax.devices()[0])

        if "backbone" in which:
            enc = ResNetEncoder("resnet18", quant=int8)
            bvars = {"params": variables["params"]["backbone"],
                     "batch_stats": variables["batch_stats"]["backbone"]}
            bvars = with_calib(enc, bvars,
                               jnp.zeros((2, 256, 256, 3), DT), train=False)
            def f_bb(i, v, x):
                flat = (x + (i * 1e-6).astype(x.dtype)).reshape(B * 2, 256, 256, 3)
                feats = enc.apply(v, flat, train=False)
                return sum(jnp.mean(f.astype(jnp.float32)) for f in feats[1:])
            timed_scan(f_bb, bvars, rgb, label="backbone(2v)")

        if "stem" in which:
            from flax import linen as nn
            stem = nn.Conv(64, (7, 7), (2, 2), [(3, 3), (3, 3)],
                           use_bias=False, dtype=DT)
            with jax.default_device(cpu):
                sv = stem.init(rng, jnp.zeros((1, 256, 256, 3), DT))
            sv = jax.device_put(sv, jax.devices()[0])
            x = jax.random.normal(rng, (B * 2, 256, 256, 3), DT)
            def f_stem(i, v, x):
                return jnp.mean(stem.apply(v, x + (i * 1e-6).astype(x.dtype))
                                .astype(jnp.float32))
            timed_scan(f_stem, sv, x, label="stem(2v)")

        if "decoder" in which:
            variables = with_calib(net, variables,
                                   jnp.zeros((1, 2, 256, 256, 3), DT),
                                   train=False)
            # decoder given a fake merged pyramid (both views concatenated)
            def f_dec(i, v, x):
                out = net.apply(v, x + (i * 1e-6).astype(x.dtype), train=False)
                return jnp.mean(out.astype(jnp.float32))
            # full net minus backbone isn't separable through flax apply;
            # approximate: full net time here, subtract backbone(2v) above
            timed_scan(f_dec, variables, rgb, label="fullnet(1)")

        if "head" in which:
            from flax import linen as nn
            head = nn.Conv(30, (1, 1), padding="VALID", dtype=DT)
            with jax.default_device(cpu):
                hv = head.init(rng, jnp.zeros((1, 64, 64, 512), DT))
            hv = jax.device_put(hv, jax.devices()[0])
            x = jax.random.normal(rng, (B, 64, 64, 512), DT)
            def f_head(i, v, x):
                return jnp.mean(head.apply(v, x + (i * 1e-6).astype(x.dtype))
                                .astype(jnp.float32))
            timed_scan(f_head, hv, x, label="head1x1(N=30)")

    if "upsample" in which:
        from egotap_tpu.ops.upsample import upsample2x_align_corners
        for hw, c in ((8, 1024), (16, 1024), (32, 512)):
            x = jax.random.normal(rng, (B, hw, hw, c), DT)
            def f_up(i, x):
                return jnp.mean(
                    upsample2x_align_corners(x + (i * 1e-6).astype(x.dtype))
                    .astype(jnp.float32))
            timed_scan(f_up, x, label=f"up{hw}->{hw*2}x{c}")

    if "vit" in which:
        from egotap_tpu.models.vit import GridViT
        vit = GridViT(num_tiles=30, channels=1, quant=int8)
        x = jax.random.normal(rng, (B, 30, 1, 64, 64), DT)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            vv = vit.init(jax.random.PRNGKey(1), jnp.zeros((1, 30, 1, 64, 64)))
        vv = jax.device_put(vv, jax.devices()[0])
        if calib:
            import functools
            from egotap_tpu.ops.quant import amax_to_qparams
            _, mut = jax.jit(functools.partial(
                vit.apply, mutable=["calib"]))(vv, x)
            vv = {**vv, "qparams": amax_to_qparams(mut["calib"])}
        def f_vit(i, v, x):
            return jnp.mean(vit.apply(v, x + (i * 1e-6).astype(x.dtype)).astype(jnp.float32))
        tag = {(False, False): "", (True, False): "_i8",
               (True, True): "_i8c"}[(int8, calib)]
        timed_scan(f_vit, vv, x, label="gridvit" + tag)

    if "fc" in which:
        from egotap_tpu.models.encoders import LimbFCEncoder
        fc = LimbFCEncoder(hidden_size=128)
        x = jax.random.normal(rng, (B, 60, 2 * 64 * 64), DT)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            fv = fc.init(jax.random.PRNGKey(1), jnp.zeros((1, 60, 2 * 64 * 64)))
        fv = jax.device_put(fv, jax.devices()[0])
        def f_fc(i, v, x):
            return jnp.mean(fc.apply(v, x + (i * 1e-6).astype(x.dtype), train=False)
                            .astype(jnp.float32))
        timed_scan(f_fc, fv, x, label="limbfc")

    if "stages" in which:
        bench_stages(int8, calib)

    if "pu" in which:
        from egotap_tpu.models.cells import PUChain
        pu = PUChain(input_size=256, bridge_size=256, hidden_size=512)
        xs = jax.random.normal(rng, (B, 15, 256), DT)
        br = jax.random.normal(jax.random.PRNGKey(2), (B, 15, 256), DT)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            pv = pu.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 15, 256)), jnp.zeros((1, 15, 256)))
        pv = jax.device_put(pv, jax.devices()[0])
        def f_pu(i, v, x, b):
            return jnp.mean(pu.apply(v, x + (i * 1e-6).astype(x.dtype), b)
                            .astype(jnp.float32))
        timed_scan(f_pu, pv, xs, br, label="pu_scan")


def bench_stages(int8: bool, calib: bool = False):
    """Per-resnet-stage timings (both views of one net, B=32)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from egotap_tpu.models.resnet import BasicBlock
    rng = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    # (input hw, in_ch, width, blocks, stride of first block)
    stages = [("layer1", 64, 64, 64, 2, 1), ("layer2", 64, 64, 128, 2, 2),
              ("layer3", 32, 128, 256, 2, 2), ("layer4", 16, 256, 512, 2, 2)]
    for name, hw, cin, width, depth, s0 in stages:
        class Stage(nn.Module):
            @nn.compact
            def __call__(self, x):
                for bi in range(depth):
                    stride = s0 if bi == 0 else 1
                    ds = (stride != 1) or (x.shape[-1] != width)
                    x = BasicBlock(width, stride=stride, downsample=ds,
                                   quant=int8, name=f"b{bi}")(x, train=False)
                return x
        m = Stage()
        x = jax.random.normal(rng, (B * 2, hw, hw, cin), DT)
        with jax.default_device(cpu):
            v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, hw, hw, cin)))
        v = jax.device_put(v, jax.devices()[0])
        if calib:
            import functools
            from egotap_tpu.ops.quant import (amax_to_qparams,
                                              merge_qparams,
                                              quantize_conv_tree)
            _, mut = jax.jit(functools.partial(
                m.apply, mutable=["calib"]))(v, x[:2])
            v = {**v, "qparams": merge_qparams(
                quantize_conv_tree(v["params"]),
                amax_to_qparams(mut["calib"]))}
        def f(i, v, x):
            return jnp.mean(m.apply(v, x + (i * 1e-6).astype(x.dtype)).astype(jnp.float32))
        tag = "i8c" if calib else ("i8" if int8 else "")
        timed_scan(f, v, x, label=f"{name}{tag}(2v)")


if __name__ == "__main__":
    main()
