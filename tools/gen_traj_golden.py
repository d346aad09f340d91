"""Generate N-step TRAINING-TRAJECTORY fixtures from the reference.

Drives the reference model drivers (model/heatmap_shared_model.py,
model/egotap_autoencoder_model.py) on CPU for a few optimizer steps with
fixed random batches, recording per-step losses and learning rates, the
initial and final state_dicts (params + BatchNorm running stats), and the
torch optimizer/scheduler state. tests/test_traj_parity.py replays the
same steps through egotap_tpu's jitted train_steps and asserts the
trajectories match — covering torch Adam/AdamW semantics, the
lambda / cos_anneal_warmup schedule stepping conventions
(train.py:129-130, 224), both stages' loss wiring
(heatmap_shared_model.py:110-153, egotap_autoencoder_model.py:284-296),
and the stage-2 frozen-net train-mode BN running-stat evolution
(egotap_autoencoder_model.py:177-216; train.py:91 model.train()).

Environment shims (this box has no GPU and no torchvision):
  * torchvision.models.resnet18 is stubbed with the state-dict-compatible
    TorchResNet18 twin (tests/torch_twin.py) — children order matches
    torchvision, so Encoder_Block's layer split is identical.
  * Tensor.cuda is patched to a no-op (set_input calls .cuda(device)
    unconditionally, heatmap_shared_model.py:85-96).
  * use_amp=False -> GradScaler disabled -> plain f32 steps.

Also writes the reference-layout checkpoint files (``{tag}_net_*.pth``,
``{tag}_optim_0.pth``, ``{tag}_scheduler_0.pth``, base_model.py:64-92)
into tests/golden/traj_pth/ for the checkpoint/optimizer interop tests.

Usage: python tools/gen_traj_golden.py [stage1|stage2]   (default: both)
"""

import argparse
import importlib.machinery
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.torch_twin import TorchResNet18  # noqa: E402

# --- stub torchvision: resnet18 -> the key-compatible twin -----------------
tv = types.ModuleType("torchvision")
tvm = types.ModuleType("torchvision.models")
tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
tvm.__spec__ = importlib.machinery.ModuleSpec("torchvision.models", None)
tv.__version__ = "0.15.0"
tvm.resnet18 = lambda pretrained=False, **kw: TorchResNet18()
tv.models = tvm
sys.modules["torchvision"] = tv
sys.modules["torchvision.models"] = tvm

# --- stub skimage: utils/projection.py imports line_aa at module scope, but
# nothing on the trajectory path renders lines (the batches carry
# pre-generated heatmaps) ----------------------------------------------------
sk = types.ModuleType("skimage")
skd = types.ModuleType("skimage.draw")
sk.__spec__ = importlib.machinery.ModuleSpec("skimage", None)
skd.__spec__ = importlib.machinery.ModuleSpec("skimage.draw", None)


def _line_aa_unavailable(*a, **kw):
    raise NotImplementedError("skimage stub: line_aa not needed for "
                              "trajectory fixtures")


skd.line_aa = _line_aa_unavailable
sk.draw = skd
sys.modules["skimage"] = sk
sys.modules["skimage.draw"] = skd

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

# --- CPU shims --------------------------------------------------------------
torch.Tensor.cuda = lambda self, *a, **kw: self
torch.nn.Module.cuda = lambda self, *a, **kw: self

from model.heatmap_shared_model import HeatmapSharedModel  # noqa: E402
from model.egotap_autoencoder_model import EgoTAPAutoEncoderModel  # noqa: E402
from model import network  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden")
PTH = os.path.join(OUT, "traj_pth")


def make_opt(**kw):
    base = dict(
        gpu_ids=[], isTrain=True, distributed=False, use_amp=False,
        log_dir=PTH, experiment_name="traj", model_name="resnet18",
        joint_preset="UnrealEgo", estimate_head=True, stereo=True,
        load_size_heatmap=[32, 32],
        init_type="kaiming", init_ImageNet=False,
        path_to_trained_heatmap=None, use_gt_heatmap=False,
        num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
        ae_hidden_size=128, skel_layer="PU", n_skel_layers=2,
        patched_heatmap_ae=True,
        # lr deliberately moderate: at 1e-3 the kaiming-init net's first
        # Adam steps blow the loss up ~4000x before it re-converges — a
        # chaotic trajectory amplifies f32 reduction-order noise past any
        # usable tolerance and tests nothing extra. 2e-4 keeps the
        # trajectory smooth while exercising identical semantics.
        # weight_decay nonzero so BOTH decay flavors are covered: stage-1
        # torch.optim.Adam COUPLES it into the gradient
        # (heatmap_shared_model.py:70-74), stage-2 AdamW decouples it
        # (network.py:64-70).
        optimizer_type="AdamW", lr=2e-4, weight_decay=1e-2, opt_eps=1e-4,
        lr_policy="lambda", lr_decay_iters_step=4,
        epoch_count=1, niter=1, niter_decay=3, epoch_iter_cnt=3,
        lambda_heatmap=1.0, lambda_rot_heatmap=1.0,
        lambda_mpjpe=0.1, lambda_cos_sim=-0.01,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def _sd(net):
    # .copy() is load-bearing: on CPU .numpy() ALIASES the parameter
    # storage, and the optimizer mutates params in place — without it the
    # "init" snapshot silently becomes the final state by save time
    return {k: v.detach().cpu().numpy().copy()
            for k, v in net.state_dict().items()}


def _randomize_bn(net, gen):
    for m in net.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05, generator=gen)
                m.running_var.uniform_(0.8, 1.2, generator=gen)


def _optim_arrays(net, optimizer):
    """Flatten torch Adam/AdamW state into name-keyed arrays. Torch keys
    moments by position in param_groups[0]['params']; the reference always
    builds the group from net.parameters() so positions align with
    named_parameters() order (heatmap_shared_model.py:70-74,
    network.py:58-78)."""
    names = [n for n, _ in net.named_parameters()]
    params = list(net.parameters())
    sd = optimizer.state_dict()
    out = {}
    idx_order = sd["param_groups"][0]["params"]
    assert len(idx_order) == len(names)
    for pos, idx in enumerate(idx_order):
        st = sd["state"].get(idx)
        if st is None:  # param never updated (shouldn't happen here)
            continue
        name = names[pos]
        # .copy(): .numpy() aliases the live moment buffers, which the
        # post-checkpoint continuation run keeps mutating in place
        out[f"optim/exp_avg/{name}"] = st["exp_avg"].numpy().copy()
        out[f"optim/exp_avg_sq/{name}"] = st["exp_avg_sq"].numpy().copy()
        out[f"optim/count/{name}"] = np.asarray(
            st["step"].item() if torch.is_tensor(st["step"]) else st["step"],
            np.int64)
        assert params[pos].shape == st["exp_avg"].shape
    return out, names


def _batch_stage1(rng, B=4, res=64):
    hm = res // 4
    # plength is tiled x limb_dim like the dataloader's
    # torch.cat([norm] * limb_dim) (data_loader.py:209-212)
    pl_l = rng.uniform(1, 40, size=(B, 15))
    pl_r = rng.uniform(1, 40, size=(B, 15))
    return {
        "input_rgb_left": rng.normal(size=(B, 3, res, res)),
        "input_rgb_right": rng.normal(size=(B, 3, res, res)),
        "gt_heatmap_left": rng.uniform(0, 1, size=(B, 15, hm, hm)),
        "gt_heatmap_right": rng.uniform(0, 1, size=(B, 15, hm, hm)),
        "gt_limb_heatmap_left": rng.uniform(0, 1, size=(B, 30, hm, hm)),
        "gt_limb_heatmap_right": rng.uniform(0, 1, size=(B, 30, hm, hm)),
        "gt_plength_left": np.concatenate([pl_l, pl_l], axis=1),
        "gt_plength_right": np.concatenate([pl_r, pl_r], axis=1),
        "gt_local_pose": rng.normal(scale=10, size=(B, 16, 3)),
        "gt_limb_theta": rng.normal(size=(B, 15)),
    }


def _batch_stage2(rng, B=2, hm=32):
    res = hm * 4
    b = _batch_stage1(rng, B, res)
    # stage-2 heatmap spatial dims follow load_size_heatmap
    for k in list(b):
        if "heatmap" in k:
            shape = list(b[k].shape)
            shape[-2:] = [hm, hm]
            b[k] = rng.uniform(0, 1, size=tuple(shape))
    b["gt_local_rot"] = rng.normal(size=(B, 16, 3))
    b["gt_pelvis_left"] = rng.normal(size=(B, 3))
    b["gt_pelvis_right"] = rng.normal(size=(B, 3))
    return b


def _to_torch(batch):
    return {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in
            batch.items()}


def _run(model, opt, batches, per_iter_sched):
    losses, lrs = [], []
    for i, batch in enumerate(batches):
        lrs.append(model.optimizers[0].param_groups[0]["lr"])
        model.set_input(_to_torch(batch))
        model.optimize_parameters()
        losses.append(dict(model.get_current_errors()))
        if per_iter_sched:
            model.update_learning_rate()       # train.py:129-130
        elif (i + 1) % opt.epoch_iter_cnt == 0:
            model.update_learning_rate()       # train.py:224 (epoch end)
    return losses, lrs


def _pack(losses, lrs):
    out = {"lr": np.asarray(lrs, np.float64)}
    for k in losses[0]:
        out[f"loss/{k}"] = np.asarray([d[k] for d in losses], np.float64)
    return out


def gen_stage1(steps=8):
    """HeatmapSharedModel: torch.optim.Adam (DEFAULT eps=1e-8,
    heatmap_shared_model.py:70-74) + per-epoch 'lambda' LambdaLR; both MSE
    loss branches active (num_heatmap=15, num_rot_heatmap=15 sin)."""
    torch.manual_seed(11)
    gen = torch.Generator().manual_seed(12)
    rng = np.random.default_rng(13)
    # lr=2e-5: Adam's first step moves EVERY param by +-lr regardless of
    # gradient scale, and at lr>=2e-4 the 36M-param net's loss spikes 4x+
    # at step 1 — a chaotic segment that amplifies f32 reduction-order
    # noise past any tight tolerance. wd=0.1 makes the COUPLED-decay
    # signal (decay grad ~ wd*|p| ~ 3e-3, comparable to real gradients,
    # flowing through the Adam moments) clearly distinguishable from
    # decoupled/missing decay within 8 steps.
    opt = make_opt(model="heatmap_shared", epoch_iter_cnt=4,
                   niter=1, niter_decay=3, lr=2e-5, weight_decay=0.1)
    model = HeatmapSharedModel()
    model.initialize(opt)
    _randomize_bn(model.net_HeatMap, gen)
    model.train()

    init_sd = _sd(model.net_HeatMap)
    batches = [_batch_stage1(rng) for _ in range(steps)]
    losses, lrs = _run(model, opt, batches, per_iter_sched=False)

    model.save_networks(which_epoch="traj1")   # base_model.py:64-92
    optim_arrays, names = _optim_arrays(model.net_HeatMap,
                                        model.optimizers[0])
    sched_last = model.schedulers[0].state_dict()["last_epoch"]
    final_sd = _sd(model.net_HeatMap)          # checkpoint-time snapshot
    # continuation AFTER the checkpoint: the resume-interop test restores
    # traj1_{net,optim,scheduler} into egotap_tpu and must reproduce these
    # exact steps (Adam moments + schedule step carried over)
    resume_batches = [_batch_stage1(rng) for _ in range(2)]
    r_losses, r_lrs = _run(model, opt, resume_batches, per_iter_sched=False)
    data = {"steps": np.asarray(steps),
            "resume_steps": np.asarray(len(resume_batches)),
            "sched_last_epoch": np.asarray(sched_last),
            "param_names": np.asarray(names, dtype=object),
            **_pack(losses, lrs), **optim_arrays}
    for k, v in _pack(r_losses, r_lrs).items():
        data[f"resume_{k}"] = v
    for i, b in enumerate(batches):
        for k, v in b.items():
            data[f"batch{i}/{k}"] = np.asarray(v, np.float32)
    for i, b in enumerate(resume_batches):
        for k, v in b.items():
            data[f"rbatch{i}/{k}"] = np.asarray(v, np.float32)
    for k, v in init_sd.items():
        data[f"init_sd/{k}"] = v
    for k, v in final_sd.items():
        data[f"final_sd/{k}"] = v
    np.savez(os.path.join(OUT, "traj_stage1.npz"),
             **{k: v for k, v in data.items()})
    print("traj_stage1:", steps, "steps; losses[0]:", losses[0])


def gen_stage2(steps=6):
    """EgoTAPAutoEncoderModel: frozen pretrained heatmap nets (train-mode
    BN, evolving running stats) + AdamW/cos_anneal_warmup on the lifter."""
    torch.manual_seed(21)
    gen = torch.Generator().manual_seed(22)
    rng = np.random.default_rng(23)

    # frozen stage-1 nets, saved in the sibling-dir layout the driver
    # loads from (egotap_autoencoder_model.py:113-126)
    for tag, nh, nr in (("pos", 15, 0), ("sin", 0, 15)):
        hopt = make_opt(model="heatmap_shared", num_heatmap=nh,
                        num_rot_heatmap=nr)
        net = network.define_HeatMap(hopt, model="heatmap_shared")
        _randomize_bn(net, gen)
        d = os.path.join(PTH, f"hm_{tag}")
        os.makedirs(d, exist_ok=True)
        torch.save(net.state_dict(), os.path.join(d, "best_net_HeatMap.pth"))

    opt = make_opt(model="egotap_autoencoder", optimizer_type="AdamW",
                   lr_policy="cos_anneal_warmup", epoch_iter_cnt=3,
                   niter=1, niter_decay=3,
                   path_to_trained_heatmap=os.path.join(
                       "hm", "best_net_HeatMap.pth"))
    model = EgoTAPAutoEncoderModel()
    model.initialize(opt)
    _randomize_bn(model.net_AutoEncoder, gen)
    model.train()                              # train.py:91

    init_lift = _sd(model.net_AutoEncoder)
    init_pos = _sd(model.net_HeatMap)
    init_rot = _sd(model.net_RotHeatMap)
    batches = [_batch_stage2(rng) for _ in range(steps)]
    losses, lrs = _run(model, opt, batches, per_iter_sched=True)

    model.save_networks(which_epoch="traj2")
    optim_arrays, names = _optim_arrays(model.net_AutoEncoder,
                                        model.optimizers[0])
    sched_last = model.schedulers[0].state_dict()["last_epoch"]
    final_lift = _sd(model.net_AutoEncoder)    # checkpoint-time snapshots
    final_frozen = {prefix: _sd(net)
                    for prefix, net in (("final_pos_bn", model.net_HeatMap),
                                        ("final_rot_bn",
                                         model.net_RotHeatMap))}
    # post-checkpoint continuation for the resume-interop test (AdamW
    # moments + per-iteration cos_anneal_warmup schedule step)
    resume_batches = [_batch_stage2(rng) for _ in range(2)]
    r_losses, r_lrs = _run(model, opt, resume_batches, per_iter_sched=True)
    data = {"steps": np.asarray(steps),
            "resume_steps": np.asarray(len(resume_batches)),
            "sched_last_epoch": np.asarray(sched_last),
            "param_names": np.asarray(names, dtype=object),
            **_pack(losses, lrs), **optim_arrays}
    for k, v in _pack(r_losses, r_lrs).items():
        data[f"resume_{k}"] = v
    for i, b in enumerate(batches):
        for k, v in b.items():
            data[f"batch{i}/{k}"] = np.asarray(v, np.float32)
    for i, b in enumerate(resume_batches):
        for k, v in b.items():
            data[f"rbatch{i}/{k}"] = np.asarray(v, np.float32)
    for k, v in init_lift.items():
        data[f"init_sd/{k}"] = v
    for k, v in init_pos.items():
        data[f"init_pos_sd/{k}"] = v
    for k, v in init_rot.items():
        data[f"init_rot_sd/{k}"] = v
    for k, v in final_lift.items():
        data[f"final_sd/{k}"] = v
    # frozen nets: only the BN running stats evolve (params are frozen);
    # record them to pin the train-mode-BN evolution parity
    for prefix, sd in final_frozen.items():
        for k, v in sd.items():
            if "running_" in k:
                data[f"{prefix}/{k}"] = v
    np.savez(os.path.join(OUT, "traj_stage2.npz"),
             **{k: v for k, v in data.items()})
    print("traj_stage2:", steps, "steps; losses[0]:", losses[0])


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(PTH, exist_ok=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("stage1", "both"):
        gen_stage1()
    if which in ("stage2", "both"):
        gen_stage2()
