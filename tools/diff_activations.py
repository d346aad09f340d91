"""Per-layer activation diffing harness (SURVEY §7.3 'hard parts').

Runs the reference lifter (from /root/reference, torchvision stubbed) and
the converted flax lifter side by side on the same random weights + input
and reports max-abs differences at every comparison point: encoder
outputs, per-joint embeddings, the propagation chain output, and the
final pose. Use it to localize conversion regressions when validating
released checkpoints.

    python tools/diff_activations.py [--preset UnrealEgo|EgoCap]
"""

import argparse
import importlib.machinery
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def _stub_torchvision():
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tvm.__spec__ = importlib.machinery.ModuleSpec("torchvision.models", None)
    tv.__version__ = "0.15.0"
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="UnrealEgo",
                    choices=["UnrealEgo", "EgoCap"])
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    _stub_torchvision()
    sys.path.insert(0, "/root/reference")
    import torch
    import model.net_architecture as na

    nh = 15 if args.preset == "UnrealEgo" else 17
    opt = argparse.Namespace(
        joint_preset=args.preset, ae_hidden_size=128, heatmap_type="sin",
        num_heatmap=nh, num_rot_heatmap=nh,
        estimate_head=(args.preset == "UnrealEgo"),
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
    chans = nh * 2 * 3  # pos(2V) + rot(limb_dim * 2V)... = nh*2 + nh*2*2
    chans = nh * 2 + nh * 2 * 2
    x = torch.randn(args.batch, chans, 64, 64, generator=gen)
    with torch.no_grad():
        ref_pose, _, _, _ = net(x)

    # ---- flax side -------------------------------------------------------
    import jax
    import jax.numpy as jnp
    from egotap_tpu.compat.convert import convert_lifter
    from egotap_tpu.models.lifter import EgoTAPLifter

    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_lifter(state))
    model = EgoTAPLifter(num_heatmap=nh,
                         num_joints=nh + (1 if opt.estimate_head else 0),
                         use_global_offset=(args.preset == "UnrealEgo"))
    xs = jnp.asarray(x.numpy()).transpose(0, 2, 3, 1)
    pose, inter = model.apply(variables, xs, train=False,
                              capture_intermediates=True)
    flat = {"/".join(str(p) for p in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(
                inter["intermediates"])[0]}

    def get(prefix):
        for k, v in flat.items():
            if prefix in k and "__call__" in k:
                return np.asarray(v)
        raise KeyError(prefix)

    def report(name, ref, got):
        ref = ref.reshape(-1)
        got = np.asarray(got).reshape(-1)
        print(f"{name:14s} max|diff| = {np.abs(ref - got).max():.3e}   "
              f"scale = {np.abs(ref).max():.3e}")

    report("pos_embed", captured["pos_embed"], get("pos_encoder"))
    report("rot_embed", captured["rot_embed"], get("rot_encoder"))
    # reference skel output is seq-first (J, B, H); flax is (B, J, H)
    report("skel_chain", np.swapaxes(captured["skel"], 0, 1), get("skelnet"))
    report("pose_head", captured["pose_mlp"], get("pose_mlp"))
    if "global_mlp" in captured:
        report("global_head", captured["global_mlp"], get("global_mlp"))
    report("final_pose", ref_pose.detach().numpy(), np.asarray(pose))
    print("done")


if __name__ == "__main__":
    main()
