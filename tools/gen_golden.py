"""Generate golden parity fixtures from the reference implementation.

Runs the upstream EgoTAP modules (mounted read-only at /root/reference)
with random weights/inputs and saves (inputs, state_dict, outputs) bundles
to tests/golden/*.npz. Tests load these fixtures only — they never import
the reference — so the suite is self-contained.

Usage: python tools/gen_golden.py
"""

import importlib.machinery
import sys
import types

import numpy as np

# --- stub torchvision (the lifter never constructs resnets) ---------------
tv = types.ModuleType("torchvision")
tvm = types.ModuleType("torchvision.models")
tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
tvm.__spec__ = importlib.machinery.ModuleSpec("torchvision.models", None)
tv.__version__ = "0.15.0"
tv.models = tvm
sys.modules["torchvision"] = tv
sys.modules["torchvision.models"] = tvm

sys.path.insert(0, "/root/reference")

import argparse  # noqa: E402

import torch  # noqa: E402

import model.net_architecture as na  # noqa: E402
from model.custom_cells import PropagationUnit  # noqa: E402

OUT = "tests/golden"


def _state(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def _randomize_bn(net, gen):
    for m in net.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05, generator=gen)
                m.running_var.uniform_(0.8, 1.2, generator=gen)
                m.weight.normal_(1.0, 0.05, generator=gen)
                m.bias.normal_(0.0, 0.05, generator=gen)


def _opt(preset="UnrealEgo", nh=15, nr=15):
    return argparse.Namespace(
        joint_preset=preset, ae_hidden_size=128, heatmap_type="sin",
        num_heatmap=nh, num_rot_heatmap=nr,
        estimate_head=(preset == "UnrealEgo"),
        patched_heatmap_ae=True, skel_layer="PU",
        load_size_heatmap=[64, 64],
    )


def gen_pu_chain():
    torch.manual_seed(1)
    gen = torch.Generator().manual_seed(2)
    B, J, D, H = 3, 15, 256, 512
    pu = PropagationUnit(input_size=D, bridge_size=D, hidden_size=H,
                         num_layers=2, batch_first=True).eval()
    x = torch.randn(B, J, D, generator=gen)
    br = torch.randn(B, J, D, generator=gen)
    # emulate the SkelNet walk (flat chain due to in-place state aliasing)
    hs = torch.zeros(2, B, H)
    cs = torch.zeros(2, B, H)
    outs = []
    with torch.no_grad():
        for j in range(J):
            out, (hs, cs) = pu(x[:, [j]], br[:, [j]], (hs, cs))
            outs.append(out[:, 0])
    outs = torch.stack(outs, dim=1)
    np.savez(f"{OUT}/pu_chain.npz",
             x=x.numpy(), bridge=br.numpy(), out=outs.numpy(),
             **{"sd/" + k: v for k, v in _state(pu).items()})
    print("pu_chain:", outs.shape)


def gen_vit_encoder():
    torch.manual_seed(3)
    gen = torch.Generator().manual_seed(4)
    opt = _opt()
    enc = na.PatchedHeatmapFeatureExtractorViT(opt, num_heatmap=30,
                                               hidden_size=128).eval()
    _randomize_bn(enc, gen)
    x = torch.randn(2, 30, 1, 64, 64, generator=gen)
    with torch.no_grad():
        z = enc(x)
    np.savez(f"{OUT}/vit_encoder.npz", x=x.numpy(), out=z.numpy(),
             **{"sd/" + k: v for k, v in _state(enc).items()})
    print("vit_encoder:", z.shape)


def gen_fc_encoder():
    torch.manual_seed(5)
    gen = torch.Generator().manual_seed(6)
    opt = _opt()
    enc = na.HeatmapFeatureExtractorFC(opt, num_heatmap=60, hidden_size=128,
                                       channels=2).eval()
    _randomize_bn(enc, gen)
    x = torch.randn(2, 30, 2, 64, 64, generator=gen)
    with torch.no_grad():
        z = enc(x)
    np.savez(f"{OUT}/fc_encoder.npz", x=x.numpy(), out=z.numpy(),
             **{"sd/" + k: v for k, v in _state(enc).items()})
    print("fc_encoder:", z.shape)


def gen_lifter(preset, nh, tag):
    torch.manual_seed(7)
    gen = torch.Generator().manual_seed(8)
    opt = _opt(preset, nh, nh)
    net = na.EgoTAPAutoEncoder(opt, input_channel_scale=2).eval()
    _randomize_bn(net, gen)
    limb_dim = 2
    chans = nh * 2 + nh * limb_dim * 2
    x = torch.randn(2, chans, 64, 64, generator=gen)
    with torch.no_grad():
        pose, _, _, _ = net(x)
        pos_input = x[:, :nh * 2].reshape(2, nh * 2, 1, 64, 64)
        pos_embed = net.pos_heatmap_encoder(pos_input)
    np.savez(f"{OUT}/lifter_{tag}.npz", x=x.numpy(), out=pose.detach().numpy(),
             pos_embed=pos_embed.detach().numpy(),
             skel_embed=net.skel_embed.detach().numpy(),
             **{"sd/" + k: v for k, v in _state(net).items()})
    print(f"lifter_{tag}:", pose.shape)


def gen_skel_lstm():
    """Reference SkelNet in LSTM mode: a TRUE tree walk (nn.LSTM returns
    fresh state tensors, so no aliasing)."""
    torch.manual_seed(9)
    gen = torch.Generator().manual_seed(10)
    opt = _opt()
    skel = na.SkelNet(opt, input_size=256, bridge_size=256, num_layers=2,
                      batch_first=False, layer_type="LSTM").eval()
    B, J = 3, 15
    x = torch.randn(J, B, 256, generator=gen)
    br = torch.randn(J, B, 256, generator=gen)
    with torch.no_grad():
        out = skel(x, br)  # (J, B, 512)
    np.savez(f"{OUT}/skel_lstm.npz", x=x.numpy(), bridge=br.numpy(),
             out=out.numpy(),
             **{"sd/" + k: v for k, v in _state(skel).items()})
    print("skel_lstm:", out.shape)


if __name__ == "__main__":
    import os
    os.makedirs(OUT, exist_ok=True)
    gen_skel_lstm()
    gen_pu_chain()
    gen_vit_encoder()
    gen_fc_encoder()
    gen_lifter("UnrealEgo", 15, "unrealego")
    gen_lifter("EgoCap", 17, "egocap")
