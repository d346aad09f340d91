"""Per-layer activation diffing harness (SURVEY §7.3 'hard parts').

Runs the reference lifter (from /root/reference, torchvision stubbed) and
the stage-1 torch twin (tests/torch_twin.py) side by side with the
converted flax models on the same random weights + input and reports
max-abs differences at every comparison point — for the f32 parity path
AND the serving fast path (bf16, int8+calibrated). Use it to localize
conversion or quantization regressions when validating released
checkpoints: when real weights arrive, any deviation is already
attributed to a layer and a precision rung.

    python tools/diff_activations.py [--preset UnrealEgo|EgoCap]
    python tools/diff_activations.py --table docs/PARITY_TABLE.md

All comparisons run on the CPU backend (forced) so the table is
deterministic and relay-independent; TPU bf16/int8 numerics match CPU
emulation to rounding (the golden-weight TPU gates live in
tools/check_tpu.py).
"""

import argparse
import importlib.machinery
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

MODES = ("f32", "bf16", "int8c")


def _stub_torchvision():
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tvm.__spec__ = importlib.machinery.ModuleSpec("torchvision.models", None)
    tv.__version__ = "0.15.0"
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm


def _maxdiff(ref: np.ndarray, got) -> float:
    return float(np.abs(ref.astype(np.float64).reshape(-1)
                        - np.asarray(got, dtype=np.float64).reshape(-1)
                        ).max())


def _calibrate(model, variables, x):
    """One calibration pass: collect per-module amax on `x`, return
    variables with merged static a_scale qparams (ops/quant.py)."""
    import jax
    import jax.numpy as jnp
    from egotap_tpu.ops.quant import amax_to_qparams, merge_qparams
    _, mut = model.apply(variables, x, train=False, mutable=["calib"])
    amax = jax.tree.map(jnp.asarray, mut["calib"])
    return {**variables, "qparams": merge_qparams(
        variables.get("qparams"), amax_to_qparams(amax))}


# --------------------------------------------------------------------------
def lifter_rows(preset: str, batch: int):
    """[(point, ref_scale, {mode: maxdiff})] for the EgoTAP lifter vs the
    real reference net (/root/reference/model/net_architecture.py)."""
    sys.path.insert(0, "/root/reference")
    import torch
    import model.net_architecture as na

    nh = 15 if preset == "UnrealEgo" else 17
    opt = argparse.Namespace(
        joint_preset=preset, ae_hidden_size=128, heatmap_type="sin",
        num_heatmap=nh, num_rot_heatmap=nh,
        estimate_head=(preset == "UnrealEgo"),
        patched_heatmap_ae=True, skel_layer="PU",
        load_size_heatmap=[64, 64])
    torch.manual_seed(0)
    net = na.EgoTAPAutoEncoder(opt, input_channel_scale=2).eval()

    captured = {}

    def hook(name):
        def fn(_m, _inp, out):
            o = out[0] if isinstance(out, tuple) else out
            captured[name] = o.detach().float().numpy()
        return fn

    net.pos_heatmap_encoder.register_forward_hook(hook("pos_embed"))
    net.rot_heatmap_encoder.register_forward_hook(hook("rot_embed"))
    net.skel_sequential_layer.register_forward_hook(hook("skel"))
    net.pose_mlp.register_forward_hook(hook("pose_mlp"))
    if hasattr(net, "global_mlp"):
        net.global_mlp.register_forward_hook(hook("global_mlp"))

    gen = torch.Generator().manual_seed(1)
    chans = nh * 2 + nh * 2 * 2  # pos(2V) + sin/cos limb (2V * 2)
    x = torch.randn(batch, chans, 64, 64, generator=gen)
    with torch.no_grad():
        ref_pose, _, _, _ = net(x)
    captured["final_pose"] = ref_pose.detach().numpy()
    # reference skel output is seq-first (J, B, H); flax is (B, J, H)
    captured["skel"] = np.swapaxes(captured["skel"], 0, 1)

    # ---- flax side, one run per precision rung ---------------------------
    import jax
    import jax.numpy as jnp
    from egotap_tpu.compat.convert import convert_lifter
    from egotap_tpu.models.lifter import EgoTAPLifter
    from egotap_tpu.ops.quant import quantize_dense_tree

    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    base_vars = jax.tree.map(jnp.asarray, convert_lifter(state))
    xs_f32 = jnp.asarray(x.numpy()).transpose(0, 2, 3, 1)

    points = [("pos_embed", "pos_encoder"), ("rot_embed", "rot_encoder"),
              ("skel", "skelnet"), ("pose_mlp", "pose_mlp")]
    if "global_mlp" in captured:
        points.append(("global_mlp", "global_mlp"))

    kw = dict(num_heatmap=nh, num_joints=nh + (1 if opt.estimate_head else 0),
              use_global_offset=(preset == "UnrealEgo"))
    diffs = {}
    for mode in MODES:
        model = EgoTAPLifter(quant=(mode == "int8c"), **kw)
        variables = base_vars
        xs = xs_f32 if mode == "f32" else xs_f32.astype(jnp.bfloat16)
        if mode == "int8c":
            variables = {**variables,
                         "qparams": quantize_dense_tree(base_vars["params"])}
            variables = _calibrate(model, variables, xs)
        want = {flax_name for _, flax_name in points}
        pose, inter = model.apply(
            variables, xs, train=False,
            # capture only the named top-level modules' outputs (a blanket
            # capture also records every NESTED submodule; first-match
            # lookup over the flattened tree would be order-dependent)
            capture_intermediates=lambda mdl, _m: mdl.name in want)
        got = {k: v["__call__"][0]
               for k, v in inter["intermediates"].items()}

        diffs[mode] = {ref_name: _maxdiff(captured[ref_name],
                                          got[flax_name])
                       for ref_name, flax_name in points}
        diffs[mode]["final_pose"] = _maxdiff(captured["final_pose"], pose)

    names = [p[0] for p in points] + ["final_pose"]
    return [(f"lifter/{n}", float(np.abs(captured[n]).max()),
             {m: diffs[m][n] for m in MODES}) for n in names]


# --------------------------------------------------------------------------
def heatmap_rows(batch: int):
    """[(point, ref_scale, {mode: maxdiff})] for the stage-1 UNet vs the
    torch twin (tests/torch_twin.py — state_dict-compatible with a
    reference *_net_HeatMap.pth, reference
    model/net_architecture.py:25-173)."""
    import torch
    from tests.torch_twin import TorchHeatmapNet, randomize_bn_stats

    torch.manual_seed(2)
    twin = TorchHeatmapNet(num_output_maps=15, views=2).eval()
    randomize_bn_stats(twin, torch.Generator().manual_seed(3))

    captured = {}

    def hook(name):
        def fn(_m, _inp, out):
            captured[name] = out
        return fn

    twin.backbone.register_forward_hook(hook("pyramids"))
    for blk in ("conv_up3", "conv_up2", "conv_up1"):
        getattr(twin.after_backbone, blk).register_forward_hook(hook(blk))

    gen = torch.Generator().manual_seed(4)
    left = torch.randn(batch, 3, 128, 128, generator=gen)
    right = torch.randn(batch, 3, 128, 128, generator=gen)
    with torch.no_grad():
        ref_out = twin(left, right).numpy()
    # per-view pyramid tuples -> (B*V, C, h, w) with view fastest, matching
    # HeatmapUNet's images.reshape(B*V, ...) fold
    ref_pyr = [torch.stack([v[i] for v in captured["pyramids"]], dim=1)
               .reshape(-1, *captured["pyramids"][0][i].shape[1:]).numpy()
               for i in range(6)]

    import jax
    import jax.numpy as jnp
    from egotap_tpu.compat.convert import convert_heatmap_net
    from egotap_tpu.models.heatmap_net import HeatmapUNet
    from egotap_tpu.ops.quant import quantize_conv_tree

    state = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    base_vars = jax.tree.map(jnp.asarray, convert_heatmap_net(
        state, "resnet18"))
    imgs_f32 = jnp.stack([jnp.asarray(left.numpy()),
                          jnp.asarray(right.numpy())],
                         axis=1).transpose(0, 1, 3, 4, 2)

    levels = ["input", "layer0", "layer1", "layer2", "layer3", "layer4"]
    diffs = {}
    for mode in MODES:
        model = HeatmapUNet(num_output_maps=15, views=2,
                            quant=(mode == "int8c"))
        variables = base_vars
        imgs = imgs_f32 if mode == "f32" else imgs_f32.astype(jnp.bfloat16)
        if mode == "int8c":
            variables = {**variables,
                         "qparams": quantize_conv_tree(base_vars["params"])}
            variables = _calibrate(model, variables, imgs)
        want = {"backbone", "conv_up3", "conv_up2", "conv_up1"}
        out, inter = model.apply(
            variables, imgs, train=False,
            capture_intermediates=lambda mdl, _m: mdl.name in want)
        got = {k: v["__call__"][0]
               for k, v in inter["intermediates"].items()}
        d = {}
        for i, lev in enumerate(levels):
            d[f"backbone/{lev}"] = _maxdiff(
                ref_pyr[i].transpose(0, 2, 3, 1), got["backbone"][i])
        for blk in ("conv_up3", "conv_up2", "conv_up1"):
            d[blk] = _maxdiff(captured[blk].numpy().transpose(0, 2, 3, 1),
                              got[blk])
        d["heatmap_out"] = _maxdiff(ref_out.transpose(0, 2, 3, 1), out)
        diffs[mode] = d

    names = ([f"backbone/{lev}" for lev in levels]
             + ["conv_up3", "conv_up2", "conv_up1", "heatmap_out"])
    scales = {f"backbone/{lev}": float(np.abs(ref_pyr[i]).max())
              for i, lev in enumerate(levels)}
    for blk in ("conv_up3", "conv_up2", "conv_up1"):
        scales[blk] = float(np.abs(captured[blk].numpy()).max())
    scales["heatmap_out"] = float(np.abs(ref_out).max())
    return [(f"heatmap/{n}", scales[n], {m: diffs[m][n] for m in MODES})
            for n in names]


def write_table(rows, path: str, preset: str, batch: int) -> None:
    lines = [
        "# Per-layer deviation: converted flax vs reference torch "
        "(random golden weights)",
        "",
        f"Generated by `python tools/diff_activations.py --table {path}` "
        f"(preset {preset}, batch {batch}, CPU backend).",
        "",
        "max|ref - flax| per comparison point and precision rung. `f32` is "
        "the reference-parity path (cli/test.py); `bf16` and `int8c` "
        "(int8 + calibrated static scales) are the serving fast path "
        "(bench.py / serving.Predictor). `ref scale` = max|ref| at that "
        "point. When released weights arrive, regenerate with them loaded "
        "to pre-localize any deviation (VERDICT r3 item 6; reference "
        "test.py:21-80 output equivalence).",
        "",
        "| point | ref scale | f32 | bf16 | int8c |",
        "|---|---|---|---|---|",
    ]
    for name, scale, d in rows:
        lines.append(
            f"| {name} | {scale:.3e} | " +
            " | ".join(f"{d[m]:.3e}" for m in MODES) + " |")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path} ({len(rows)} rows)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="UnrealEgo",
                    choices=["UnrealEgo", "EgoCap"])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--table", default=None,
                    help="write a markdown table here (runs all precision "
                         "rungs + the stage-1 net) instead of the f32 "
                         "lifter report")
    args = ap.parse_args()

    # deterministic + relay-independent: always diff on the CPU backend
    import jax
    jax.config.update("jax_platforms", "cpu")

    _stub_torchvision()

    if args.table:
        rows = heatmap_rows(args.batch) + lifter_rows(args.preset,
                                                      args.batch)
        write_table(rows, args.table, args.preset, args.batch)
        return

    rows = lifter_rows(args.preset, args.batch)
    for name, scale, d in rows:
        print(f"{name:22s} max|diff| = {d['f32']:.3e}   scale = {scale:.3e}")
    print("done")


if __name__ == "__main__":
    main()
