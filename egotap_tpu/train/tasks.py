"""Task drivers: the model-lifecycle protocol, jitted end-to-end.

The reference drives training through a per-model protocol
(set_input / optimize_parameters / evaluate, model/base_model.py) with
three host<->device crossings per step; here each task compiles ONE
train_step and ONE eval_step containing the full pipeline (frozen heatmap
nets + lifter + losses + optimizer), so a step is a single device program.

  * `HeatmapTask`  — stage 1 (reference model/heatmap_shared_model.py).
  * `LifterTask`   — stage 2 (reference model/egotap_autoencoder_model.py):
    frozen pretrained pos/rot heatmap nets feed the EgoTAP lifter; only the
    lifter is optimized (:139-152). Parity quirks preserved: during
    training the frozen nets run with train-mode BatchNorm and their
    running stats update (the reference calls model.train() on everything,
    train.py:91), while eval uses running stats. Note the reference's
    "train_heatmap" mode (no --path_to_trained_heatmap) computes heatmap
    losses and gradients but constructs NO optimizer for the heatmap nets
    (:139-152), so their parameters never update — here the heatmap nets
    are always stop_gradient'ed, which yields identical parameter
    evolution without the wasted backward pass.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.core.config import Config
from egotap_tpu.core.skeleton import get_skeleton
from egotap_tpu.eval.metrics import pose_metrics
from egotap_tpu.models.heatmap_net import HeatmapUNet
from egotap_tpu.models.lifter import EgoTAPLifter
from egotap_tpu.train import losses as L
from egotap_tpu.train.optim import make_optimizer
from egotap_tpu.train.state import TrainState


def _dtype(cfg: Config):
    return jnp.bfloat16 if (cfg.use_amp or
                            cfg.compute_dtype == "bfloat16") else jnp.float32


def _load_heatmap_variables(cfg: Config, path: str):
    """Load HeatmapUNet variables from a converted .pth file or an Orbax
    checkpoint directory (``.../ckpt_{tag}`` or an experiment dir holding
    ``ckpt_best``)."""
    import os

    from egotap_tpu.compat.convert import convert_heatmap_net
    from egotap_tpu.compat.torch_loader import load_torch_checkpoint

    if path.startswith("./log/"):  # legacy path rewrite (base_model.py:140-142)
        path = os.path.join(cfg.log_dir, path[len("./log/"):])
    if os.path.isfile(path):
        variables = convert_heatmap_net(load_torch_checkpoint(path),
                                        cfg.model_name)
        return jax.tree.map(jnp.asarray, variables)
    ckpt = path if os.path.basename(path).startswith("ckpt_") \
        else os.path.join(path, "ckpt_best")
    if os.path.isdir(ckpt):
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(ckpt))
        return jax.tree.map(jnp.asarray, {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"]})
    raise FileNotFoundError(f"no heatmap checkpoint at {path}")


class HeatmapTask:
    """Stage-1 heatmap estimator training/eval."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.name = "Heatmap Shared model"
        self.eval_key = "mse_heatmap"
        self.nh, self.nr, self.ld = cfg.num_heatmap, cfg.num_rot_heatmap, cfg.limb_dim
        self.views = cfg.views
        self.model = HeatmapUNet(
            num_output_maps=self.nh + self.nr * self.ld,
            model_name=cfg.model_name, views=self.views)
        sides = ["left", "right"][: self.views]
        self.loss_names = []
        if self.nh > 0:
            self.loss_names += [f"heatmap_{s}" for s in sides]
        if self.nr > 0:
            self.loss_names += [f"limb_heatmap_{s}" for s in sides]

    # ------------------------------------------------------------------
    def init_state(self, rng, iters_per_epoch: int) -> TrainState:
        from egotap_tpu.models.initializers import (
            apply_reference_init, load_imagenet_backbone)
        dummy = jnp.zeros((1, self.views, self.cfg.image_size,
                           self.cfg.image_size, 3))
        r_init, r_w = jax.random.split(rng)
        variables = dict(self.model.init(r_init, dummy, train=False))
        # reference init protocol (network_utils.py:69-82): kaiming
        # everywhere, except a pretrained trunk is kept with init_ImageNet
        skip = (("backbone",),) if self.cfg.init_ImageNet else ()
        variables["params"] = apply_reference_init(
            variables["params"], r_w, skip_prefixes=skip)
        if self.cfg.init_ImageNet and self.cfg.imagenet_backbone:
            variables = load_imagenet_backbone(
                variables, self.cfg.imagenet_backbone, self.cfg.model_name)
        if self.cfg.path_to_trained_heatmap:
            # stage-1 warm start from a trained heatmap net (reference
            # model/heatmap_shared_model.py:59-64); accepts a converted
            # .pth or a native orbax checkpoint directory
            variables = _load_heatmap_variables(
                self.cfg, self.cfg.path_to_trained_heatmap)
        # stage 1 always trains with torch-default Adam (eps=1e-8): the
        # reference never routes HeatmapSharedModel through get_optimizer
        # (model/heatmap_shared_model.py:70-74)
        self.tx = make_optimizer(self.cfg, iters_per_epoch, stage1=True)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            frozen={},
        )

    def _split(self, out):
        """[posL, posR, limbL, limbR] channel groups
        (reference model/heatmap_shared_model.py:101-108)."""
        v, nh, nld = self.views, self.nh, self.nr * self.ld
        pos = [out[..., i * nh:(i + 1) * nh] for i in range(v)] if nh else []
        base = nh * v
        limb = [out[..., base + i * nld: base + (i + 1) * nld]
                for i in range(v)] if nld else []
        return pos, limb

    def _losses(self, out, batch) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        pos, limb = self._split(out)
        out_d: Dict[str, jnp.ndarray] = {}
        sides = ["left", "right"][: self.views]
        for i, side in enumerate(sides):
            if self.nh > 0:
                out_d[f"heatmap_{side}"] = cfg.lambda_heatmap * \
                    L.heatmap_mse(pos[i], batch[f"gt_heatmap_{side}"])
            if self.nr > 0:
                out_d[f"limb_heatmap_{side}"] = cfg.lambda_rot_heatmap * \
                    L.limb_heatmap_mse(limb[i],
                                       batch[f"gt_limb_heatmap_{side}"],
                                       batch[f"gt_plength_{side}"])
        return out_d

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        dt = _dtype(self.cfg)

        def loss_fn(params):
            out, upd = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["input_rgb"].astype(dt), train=True,
                mutable=["batch_stats"])
            loss_d = self._losses(out.astype(jnp.float32), batch)
            total = sum(loss_d.values())
            return total, (loss_d, upd["batch_stats"])

        (_, (loss_d, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt)
        return state, loss_d

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["input_rgb"], train=False).astype(jnp.float32)
        pos, limb = self._split(out)
        b = out.shape[0]
        mse = jnp.zeros((b,))
        sides = ["left", "right"][: self.views]
        for i, side in enumerate(sides):
            if self.nh > 0:
                d = (pos[i] - batch[f"gt_heatmap_{side}"]) ** 2
                mse = mse + jnp.mean(d, axis=(1, 2, 3))
            if self.nr > 0:
                norm = jnp.sqrt(batch[f"gt_plength_{side}"])[:, None, None, :]
                d = ((limb[i] - batch[f"gt_limb_heatmap_{side}"]) / norm) ** 2
                mse = mse + jnp.mean(d, axis=(1, 2, 3))
        return {"metrics": {"mse_heatmap": mse}, "pred_heatmap": out}


class LifterTask:
    """Stage-2 pose estimator: frozen heatmap nets + EgoTAP lifter."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.name = "EgoTAP AutoEncoder model"
        self.eval_key = "mpjpe"
        self.loss_names = ["pose", "cos_sim"]
        sk = get_skeleton(cfg.joint_preset)
        self.sk = sk
        self.nh, self.nr, self.ld = cfg.num_heatmap, cfg.num_rot_heatmap, cfg.limb_dim
        self.views = cfg.views

        self.pos_net = HeatmapUNet(num_output_maps=self.nh,
                                   model_name=cfg.model_name, views=self.views)
        self.rot_net = HeatmapUNet(num_output_maps=self.nr * self.ld,
                                   model_name=cfg.model_name, views=self.views)
        if cfg.int8_heatmap_inference:
            # int8 INFERENCE twins: identical parameter trees, quantized
            # convs (ops/quant.py); used only on the train=False path so
            # training and frozen-BN evolution are unchanged
            self.pos_net_eval = HeatmapUNet(
                num_output_maps=self.nh, model_name=cfg.model_name,
                views=self.views, quant=True)
            self.rot_net_eval = HeatmapUNet(
                num_output_maps=self.nr * self.ld,
                model_name=cfg.model_name, views=self.views, quant=True)
        else:
            self.pos_net_eval, self.rot_net_eval = self.pos_net, self.rot_net
        lifter_kw = dict(
            num_heatmap=self.nh, num_joints=cfg.num_joints_out,
            num_rot_heatmap=self.nr,
            views=self.views, limb_dim=self.ld,
            hidden_size=cfg.ae_hidden_size,
            skel_layer=cfg.skel_layer,
            num_pu_layers=cfg.n_skel_layers,
            use_global_offset=(cfg.joint_preset == "UnrealEgo"
                               and cfg.estimate_head),
            pu_semantics=cfg.pu_semantics, parents=sk.parents)
        self.lifter = EgoTAPLifter(**lifter_kw)
        # int8 INFERENCE twin (identical parameter tree; train unchanged)
        self.lifter_eval = EgoTAPLifter(quant=True, **lifter_kw) \
            if cfg.int8_lifter_inference else self.lifter

    # ------------------------------------------------------------------
    def init_state(self, rng, iters_per_epoch: int,
                   heatmap_vars: Optional[Dict] = None,
                   rot_heatmap_vars: Optional[Dict] = None) -> TrainState:
        from egotap_tpu.models.initializers import apply_reference_init
        cfg = self.cfg
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        dummy_rgb = jnp.zeros((1, self.views, cfg.image_size, cfg.image_size, 3))
        hv = heatmap_vars or self.pos_net.init(r1, dummy_rgb)
        rv = rot_heatmap_vars or self.rot_net.init(r2, dummy_rgb)
        chans = (self.nh + self.nr * self.ld) * self.views
        lv = dict(self.lifter.init(
            r3, jnp.zeros((1, cfg.heatmap_res, cfg.heatmap_res, chans))))
        # the reference always kaiming-inits the lifter after construction
        # (define_AutoEncoder passes init_ImageNet=False, network.py:24-33)
        lv["params"] = apply_reference_init(lv["params"], r4)
        self.tx = make_optimizer(cfg, iters_per_epoch)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=lv["params"],
            batch_stats=lv.get("batch_stats", {}),
            opt_state=self.tx.init(lv["params"]),
            frozen={"heatmap": hv, "rot_heatmap": rv},
        )

    def prepare_inference(self, state: TrainState,
                          calib_batches=None) -> TrainState:
        """Return a state augmented with pre-quantized frozen-net weights
        ('{key}_q' entries consumed by the int8 eval path) — per-step
        weight rounding costs ~0.3 ms per large conv on v5e. Call once
        before an eval session; do NOT checkpoint the result (the train
        loop and checkpoints keep the raw frozen tree).

        calib_batches: optional iterable of batches (each with
        'input_rgb') used to calibrate STATIC per-module activation
        scales (ops/quant.py). With calibrated scales, int8 outputs are
        batch-composition-independent and the dynamic max-reduction
        passes leave the hot path; without them the dynamic per-call
        scales are used."""
        cfg = self.cfg
        if not (cfg.int8_heatmap_inference or cfg.int8_lifter_inference):
            return state
        from egotap_tpu.ops.quant import (amax_to_qparams, merge_qparams,
                                          quantize_conv_tree,
                                          quantize_dense_tree)
        frozen = dict(state.frozen)
        if cfg.int8_heatmap_inference:
            for key in ("heatmap", "rot_heatmap"):
                if key in frozen and f"{key}_q" not in frozen:
                    frozen[f"{key}_q"] = quantize_conv_tree(
                        frozen[key]["params"])
        if cfg.int8_lifter_inference and "lifter_q" not in frozen:
            # pre-quantized int8 dense weights: removes the per-step
            # rounding AND the f32 kernel reads (~144 MB/step for the ViT)
            frozen["lifter_q"] = quantize_dense_tree(state.params)
        if calib_batches is None:
            return state.replace(frozen=frozen)

        dt = _dtype(cfg)
        nets = (("heatmap", self.pos_net_eval),
                ("rot_heatmap", self.rot_net_eval))
        hm_apply = {key: jax.jit(functools.partial(
            net.apply, train=False, mutable=["calib"]))
            for key, net in nets}
        lift_apply = jax.jit(functools.partial(
            self.lifter_eval.apply, train=False, mutable=["calib"]))

        amax = {"heatmap": None, "rot_heatmap": None, "lifter": None}
        for batch in calib_batches:
            rgb = jnp.asarray(batch["input_rgb"]).astype(dt)
            outs = []
            for key, _net in nets:
                variables = dict(frozen[key])
                if f"{key}_q" in frozen:
                    variables["qparams"] = frozen[f"{key}_q"]
                if cfg.int8_heatmap_inference:
                    out, mut = hm_apply[key](variables, rgb)
                    amax[key] = mut["calib"] if amax[key] is None else \
                        jax.tree.map(jnp.maximum, amax[key], mut["calib"])
                else:
                    out = _net.apply(variables, rgb, train=False)
                outs.append(out)
            if cfg.int8_lifter_inference:
                hm_cat = jnp.concatenate(outs, axis=-1).astype(dt)
                lv = {"params": state.params,
                      "batch_stats": state.batch_stats}
                if "lifter_q" in frozen:
                    # calibrate against the same pre-quantized weights
                    # the serving graph will use
                    lv["qparams"] = frozen["lifter_q"]
                _, mut = lift_apply(lv, hm_cat)
                amax["lifter"] = mut["calib"] if amax["lifter"] is None \
                    else jax.tree.map(jnp.maximum, amax["lifter"],
                                      mut["calib"])
        for key in ("heatmap", "rot_heatmap"):
            if amax[key] is not None:
                frozen[f"{key}_q"] = merge_qparams(
                    frozen.get(f"{key}_q"), amax_to_qparams(amax[key]))
        if amax["lifter"] is not None:
            frozen["lifter_q"] = merge_qparams(
                frozen.get("lifter_q"), amax_to_qparams(amax["lifter"]))
        return state.replace(frozen=frozen)

    def _forward_heatmaps(self, frozen, batch, train: bool):
        """Frozen stage-1 forward -> concatenated heatmap stack
        (reference forward_heatmap, egotap_autoencoder_model.py:177-216)."""
        cfg = self.cfg
        if cfg.use_gt_heatmap:
            parts = [batch["gt_heatmap_left"]]
            if cfg.stereo:
                parts.append(batch["gt_heatmap_right"])
            parts.append(batch["gt_limb_heatmap_left"])
            if cfg.stereo:
                parts.append(batch["gt_limb_heatmap_right"])
            return jnp.concatenate(parts, axis=-1), frozen

        rgb = batch["input_rgb"].astype(_dtype(cfg))
        new_frozen = dict(frozen)
        outs = []
        for key, net, eval_net in (("heatmap", self.pos_net,
                                    self.pos_net_eval),
                                   ("rot_heatmap", self.rot_net,
                                    self.rot_net_eval)):
            fv = frozen[key]
            if train:
                out, upd = net.apply(fv, rgb, train=True,
                                     mutable=["batch_stats"])
                new_frozen[key] = {"params": fv["params"],
                                   "batch_stats": upd["batch_stats"]}
            elif f"{key}_q" in frozen:
                out = eval_net.apply(
                    {**fv, "qparams": frozen[f"{key}_q"]}, rgb, train=False)
            else:
                out = eval_net.apply(fv, rgb, train=False)
            outs.append(out)  # compute dtype (bf16 under amp) end-to-end:
            # a f32 round-trip of the 90-channel stack costs two full HBM
            # passes and the lifter consumes the compute dtype anyway
        return jnp.concatenate(outs, axis=-1), new_frozen

    def _pose_losses(self, pose, batch) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        gt = batch["gt_local_pose"]
        return {
            "pose": cfg.lambda_mpjpe * L.mpjpe(pose, gt),
            "cos_sim": cfg.lambda_cos_sim * cfg.lambda_mpjpe * L.cos_sim(
                pose, gt, self.sk.parents_array(),
                estimate_head=cfg.estimate_head),
        }

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        dt = _dtype(self.cfg)
        hm_cat, new_frozen = self._forward_heatmaps(state.frozen, batch,
                                                    train=True)
        hm_cat = jax.lax.stop_gradient(hm_cat)

        def loss_fn(params):
            pose, upd = self.lifter.apply(
                {"params": params, "batch_stats": state.batch_stats},
                hm_cat.astype(dt), train=True, mutable=["batch_stats"])
            loss_d = self._pose_losses(pose.astype(jnp.float32), batch)
            return sum(loss_d.values()), (loss_d, upd["batch_stats"])

        (_, (loss_d, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt,
                              frozen=new_frozen)
        return state, loss_d

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch) -> Dict[str, Any]:
        hm_cat, _ = self._forward_heatmaps(state.frozen, batch, train=False)
        # the lifter follows the configured compute dtype at eval exactly
        # like train (the test CLI forces use_amp=False for f32 reference
        # parity, test_options.py:15; the serving/bench path runs bf16,
        # optionally with int8 ViT matmuls via int8_lifter_inference)
        lv = {"params": state.params, "batch_stats": state.batch_stats}
        if "lifter_q" in state.frozen:
            lv["qparams"] = state.frozen["lifter_q"]  # calibrated a_scales
        pose = self.lifter_eval.apply(
            lv, hm_cat.astype(_dtype(self.cfg)),
            train=False).astype(jnp.float32)
        metrics = pose_metrics(pose, batch["gt_local_pose"])
        return {"metrics": metrics, "pred_pose": pose,
                "gt_pose": batch["gt_local_pose"]}


def create_task(cfg: Config):
    """Model factory (reference model/models.py:2-18)."""
    if cfg.model == "heatmap_shared":
        return HeatmapTask(cfg)
    if cfg.model == "egotap_autoencoder":
        return LifterTask(cfg)
    raise ValueError(f"Model [{cfg.model}] not recognized.")
