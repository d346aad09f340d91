"""Inference/serving API: one fused program from stereo RGB to 3D pose.

The reference has no serving path (inference = test.py's eval loop). Here
`Predictor` wraps the whole pipeline — frozen stage-1 heatmap nets, the
Grid-ViT/PU lifter, optional on-device resize/normalization — into a
single jitted function with a fixed batch shape, loading either converted
reference ``.pth`` checkpoints or native Orbax checkpoints.

    pred = Predictor.from_reference_checkpoints(
        heatmap_pth, rot_heatmap_pth, lifter_pth, preset="UnrealEgo")
    poses = pred(rgb)          # (B, 2, 256, 256, 3) -> (B, J, 3) cm
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.compat.convert import convert_heatmap_net, convert_lifter
from egotap_tpu.compat.torch_loader import load_torch_checkpoint
from egotap_tpu.core.config import Config
from egotap_tpu.core.skeleton import get_skeleton
from egotap_tpu.models.heatmap_net import HeatmapUNet
from egotap_tpu.models.lifter import EgoTAPLifter


class Predictor:
    def __init__(self, cfg: Config, heatmap_vars: Dict,
                 rot_heatmap_vars: Dict, lifter_vars: Dict,
                 bf16: bool = True, int8: Optional[bool] = None):
        """int8: quantized inference convs/matmuls (ops/quant.py, same
        variables); None defers to cfg.int8_{heatmap,lifter}_inference."""
        cfg = cfg.derive() if not hasattr(cfg, "estimate_head") else cfg
        self.cfg = cfg
        self.bf16 = bf16
        int8_hm = cfg.int8_heatmap_inference if int8 is None else int8
        int8_lift = cfg.int8_lifter_inference if int8 is None else int8
        sk = get_skeleton(cfg.joint_preset)
        self.pos_net = HeatmapUNet(num_output_maps=cfg.num_heatmap,
                                   model_name=cfg.model_name,
                                   views=cfg.views, quant=int8_hm)
        self.rot_net = HeatmapUNet(
            num_output_maps=cfg.num_rot_heatmap * cfg.limb_dim,
            model_name=cfg.model_name, views=cfg.views, quant=int8_hm)
        self.lifter = EgoTAPLifter(
            num_heatmap=cfg.num_heatmap, num_joints=cfg.num_joints_out,
            num_rot_heatmap=cfg.num_rot_heatmap,
            views=cfg.views, limb_dim=cfg.limb_dim,
            hidden_size=cfg.ae_hidden_size, skel_layer=cfg.skel_layer,
            num_pu_layers=cfg.n_skel_layers,
            use_global_offset=(cfg.joint_preset == "UnrealEgo"
                               and cfg.estimate_head),
            pu_semantics=cfg.pu_semantics,
            parents=sk.parents, quant=int8_lift)
        if int8_hm:
            # pre-quantized weights (per-step rounding off the hot path)
            from egotap_tpu.ops.quant import quantize_conv_tree
            heatmap_vars = {**heatmap_vars, "qparams":
                            quantize_conv_tree(heatmap_vars["params"])}
            rot_heatmap_vars = {**rot_heatmap_vars, "qparams":
                                quantize_conv_tree(rot_heatmap_vars["params"])}
        if int8_lift:
            from egotap_tpu.ops.quant import quantize_dense_tree
            lifter_vars = {**lifter_vars, "qparams":
                           quantize_dense_tree(lifter_vars["params"])}
        self._int8_hm, self._int8_lift = int8_hm, int8_lift
        self._vars = (heatmap_vars, rot_heatmap_vars, lifter_vars)
        self._mesh = None
        self._batch_sh = None
        self._place_vars = None
        self._hm_fn = None
        self._warned_dynamic_pad = False
        # variables are passed as jit ARGUMENTS, never closed over: a
        # closure would inline ~100M params as HLO constants and compile
        # pathologically slowly (the __graft_entry__.py:39-41 lesson)
        self._fn = jax.jit(self._forward)

    def _forward(self, variables, rgb: jnp.ndarray) -> jnp.ndarray:
        hv, rv, lv = variables
        x = rgb.astype(jnp.bfloat16 if self.bf16 else jnp.float32)
        pos = self.pos_net.apply(hv, x, train=False)
        rot = self.rot_net.apply(rv, x, train=False)
        hm_cat = jnp.concatenate([pos, rot], axis=-1).astype(x.dtype)
        pose = self.lifter.apply(lv, hm_cat, train=False)
        return pose.astype(jnp.float32)

    def __call__(self, rgb, pad_ragged: bool = True) -> np.ndarray:
        """rgb: (B, views, H, W, 3) ImageNet-normalized float32.

        On a sharded predictor, a batch that does not divide the mesh's
        data axis is zero-padded up to the next multiple and the pad rows
        are dropped from the output (`pad_ragged=False` restores the
        hard error). Pad rows cannot couple into real rows: BN is
        eval-mode and int8 scales are static after `calibrate()`. With
        DYNAMIC int8 scales the pad batch shifts per-call activation
        scales slightly — calibrate() first for padding-invariant
        numerics. Each distinct padded size compiles once (sizes are
        multiples of the data-axis width, so the set is small)."""
        x = jnp.asarray(rgb)
        n_valid = x.shape[0]
        if self._mesh is not None:
            n = self._mesh.shape["data"]
            rem = n_valid % n
            if rem and not pad_ragged:
                raise ValueError(
                    f"batch size {n_valid} not divisible by the "
                    f"{n}-way data axis; pad the batch or re-shard")
            if rem:
                if ((self._int8_hm or self._int8_lift)
                        and not self._has_static_scales()
                        and not self._warned_dynamic_pad):
                    # with DYNAMIC per-call int8 scales the pad rows shift
                    # activation amax, so real-row outputs differ slightly
                    # from the unsharded predictor; calibrate() makes
                    # padding invariant (warn once per predictor)
                    import warnings
                    warnings.warn(
                        "padding a ragged batch with dynamic int8 "
                        "activation scales perturbs real-row outputs; "
                        "call calibrate() for padding-invariant numerics "
                        "or pass pad_ragged=False", stacklevel=2)
                    self._warned_dynamic_pad = True
                x = jnp.concatenate(
                    [x, jnp.zeros((n - rem,) + x.shape[1:], x.dtype)],
                    axis=0)
            x = jax.device_put(x, self._batch_sh)
        return np.asarray(self._fn(self._vars, x))[:n_valid]

    def _has_static_scales(self) -> bool:
        """True once calibrate() installed static 'a_scale' entries."""
        def visit(t) -> bool:
            if isinstance(t, dict):
                return "a_scale" in t or any(visit(v) for v in t.values())
            return False
        return any(visit(v.get("qparams", {})) for v in self._vars
                   if isinstance(v, dict))

    def shard(self, num_devices: int = 0,
              num_model: int = 1) -> "Predictor":
        """Multi-chip serving over a local ('data', 'model') device mesh:
        the batch dim splits across ``num_devices`` data shards (0 = all
        local devices / num_model) and, with ``num_model > 1``, the lifter
        ViT's projection weights shard column-/row-parallel over the
        'model' axis (Megatron-style, `parallel/tp.py`) so each chip holds
        1/num_model of the big matmuls — XLA partitions the one fused
        program and inserts the ICI collectives. Per-sample outputs are
        identical to the single-device predictor (eval-mode BN, no
        cross-batch coupling; int8 modes should `calibrate()` first so
        activation scales are static). Batch sizes must divide evenly
        across the data axis. TPU-native counterpart of the reference's
        dead --distributed flag (options/base_options.py:81). Returns
        self."""
        from egotap_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicate)
        from egotap_tpu.parallel.tp import shard_lifter_vars
        self._mesh = make_mesh(
            num_data=num_devices or len(jax.devices()) // num_model,
            num_model=num_model)
        self._batch_sh = batch_sharding(self._mesh)

        def place(varstup):
            hv, rv, lv = varstup
            hv = replicate(hv, self._mesh)
            rv = replicate(rv, self._mesh)
            lv = shard_lifter_vars(lv, self._mesh) if num_model > 1 \
                else replicate(lv, self._mesh)
            return hv, rv, lv

        self._place_vars = place
        self._vars = place(self._vars)
        return self

    def calibrate(self, rgb_batches) -> "Predictor":
        """Install STATIC activation scales calibrated on representative
        inputs (iterable of (B, views, H, W, 3) float32 arrays). With
        calibrated scales int8 outputs are batch-composition-independent,
        the dynamic max-reduction passes leave the hot path, and the
        64-channel layer1 convs also quantize (ops/quant.py). No-op
        unless an int8 mode is enabled. Returns self."""
        if not (self._int8_hm or self._int8_lift):
            return self
        from egotap_tpu.ops.quant import amax_to_qparams, merge_qparams
        hv, rv, lv = self._vars
        dt = jnp.bfloat16 if self.bf16 else jnp.float32
        applies = {
            "pos": jax.jit(functools.partial(self.pos_net.apply,
                                             train=False,
                                             mutable=["calib"])),
            "rot": jax.jit(functools.partial(self.rot_net.apply,
                                             train=False,
                                             mutable=["calib"])),
            "lift": jax.jit(functools.partial(self.lifter.apply,
                                              train=False,
                                              mutable=["calib"])),
        }
        amax = {"pos": None, "rot": None, "lift": None}

        def acc(key, mut):
            tree = mut["calib"]
            amax[key] = tree if amax[key] is None else jax.tree.map(
                jnp.maximum, amax[key], tree)

        for rgb in rgb_batches:
            x = jnp.asarray(rgb).astype(dt)
            if self._int8_hm:
                pos, mh = applies["pos"](hv, x)
                acc("pos", mh)
                rot, mr = applies["rot"](rv, x)
                acc("rot", mr)
            else:
                # jitted too: an op-by-op forward through the CI TPU
                # relay (~37 ms/dispatch) is pathologically slow even
                # when this leg needs no calib collection
                if "pos_plain" not in applies:
                    applies["pos_plain"] = jax.jit(functools.partial(
                        self.pos_net.apply, train=False))
                    applies["rot_plain"] = jax.jit(functools.partial(
                        self.rot_net.apply, train=False))
                pos = applies["pos_plain"](hv, x)
                rot = applies["rot_plain"](rv, x)
            if self._int8_lift:
                hm = jnp.concatenate([pos, rot], axis=-1).astype(dt)
                _, ml = applies["lift"](lv, hm)
                acc("lift", ml)

        if amax["pos"] is not None:
            hv = {**hv, "qparams": merge_qparams(
                hv.get("qparams"), amax_to_qparams(amax["pos"]))}
            rv = {**rv, "qparams": merge_qparams(
                rv.get("qparams"), amax_to_qparams(amax["rot"]))}
        if amax["lift"] is not None:
            lv = {**lv, "qparams": merge_qparams(
                lv.get("qparams"), amax_to_qparams(amax["lift"]))}
        self._vars = (hv, rv, lv)
        if self._mesh is not None:
            # re-place every leaf (incl. the fresh a_scales) on the mesh —
            # replicated or TP-sharded exactly as shard() laid them out —
            # so the partitioned program sees one consistent sharding
            self._vars = self._place_vars(self._vars)
        return self

    def heatmaps(self, rgb) -> np.ndarray:
        """Debug path: the concatenated stage-1 heatmap stack. Jitted —
        an op-by-op forward through the CI TPU relay costs ~37 ms per
        dispatch (the same trap calibrate() avoids)."""
        if self._hm_fn is None:
            def hm_forward(variables, x):
                hv, rv, _ = variables
                pos = self.pos_net.apply(hv, x, train=False)
                rot = self.rot_net.apply(rv, x, train=False)
                return jnp.concatenate([pos, rot], axis=-1)
            self._hm_fn = jax.jit(hm_forward)
        return np.asarray(self._hm_fn(self._vars, jnp.asarray(rgb)))

    # ------------------------------------------------------------------
    @classmethod
    def from_reference_checkpoints(cls, heatmap_pth: str,
                                   rot_heatmap_pth: str, lifter_pth: str,
                                   preset: str = "UnrealEgo",
                                   bf16: bool = True,
                                   **cfg_overrides) -> "Predictor":
        """Build from released EgoTAP ``.pth`` files
        (best_net_HeatMap / best_net_RotHeatMap / best_net_AutoEncoder)."""
        nh = 15 if preset == "UnrealEgo" else 17
        cfg = Config(joint_preset=preset, model="egotap_autoencoder",
                     num_heatmap=nh, num_rot_heatmap=nh, heatmap_type="sin",
                     skel_layer="PU", ae_hidden_size=128,
                     patched_heatmap_ae=True, **cfg_overrides).derive()
        as_vars = lambda v: jax.tree.map(jnp.asarray, v)  # noqa: E731
        hv = as_vars(convert_heatmap_net(
            load_torch_checkpoint(heatmap_pth), cfg.model_name))
        rv = as_vars(convert_heatmap_net(
            load_torch_checkpoint(rot_heatmap_pth), cfg.model_name))
        lv = as_vars(convert_lifter(load_torch_checkpoint(lifter_pth)))
        return cls(cfg, hv, rv, lv, bf16=bf16)

    @classmethod
    def from_orbax(cls, cfg: Config, experiment_dir: str,
                   tag: str = "best", bf16: bool = True) -> "Predictor":
        """Build from a native LifterTask checkpoint directory."""
        import orbax.checkpoint as ocp
        import os
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                os.path.abspath(os.path.join(experiment_dir, f"ckpt_{tag}")))
        as_vars = lambda v: jax.tree.map(jnp.asarray, v)  # noqa: E731
        lifter_vars = as_vars({"params": restored["params"],
                               "batch_stats": restored["batch_stats"]})
        frozen = restored["frozen"]
        return cls(cfg, as_vars(frozen["heatmap"]),
                   as_vars(frozen["rot_heatmap"]), lifter_vars, bf16=bf16)
