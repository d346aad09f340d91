"""EgoTAP lifter: heatmaps -> 3D pose (Grid-ViT + PU chain + MLP heads).

Reference: ``EgoTAPAutoEncoder`` (model/net_architecture.py:579-758),
shipped configuration (``--patched_heatmap_ae --skel_layer PU
--ae_hidden_size 128``, scripts/train/PoseEstimator/*.sh).

Dataflow for the stereo UnrealEgo config (B = batch, V = 2 views,
J = 15 heatmap joints, Ld = 2 sin-limb channels):
  input  (B, 64, 64, V*J + V*J*Ld) heatmap stack (channel order
         [pos view0.., pos view1.., rot view0 (cos.., sin..), rot view1])
  pos    -> GridViTEncoder over V*J tiles     -> (B, V*J*128)
  rot    -> LimbFCEncoder over V*J limb rows  -> (B, V*J*128)
  regroup to per-joint (view-concat) embeddings (B, J, 256)
  PU chain over joints                         -> (B, J, 512)
  per-joint head: Linear(concat(pos_j, skel_j)) -> 3     [pose_mlp]
  global head:    Linear(flat skel)            -> 3*(num_joints - J)
                  (+3 global offset added to all per-joint outputs for
                   UnrealEgo; net_architecture.py:741-747)

Joint-order quirk preserved exactly: predicted row i is trained against
``gt_local_pose`` row i, whose preset order starts at the root — the
network learns the permutation; do NOT "fix" it (SURVEY §2.3 note).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from egotap_tpu.models.cells import PUChain
from egotap_tpu.models.encoders import GridViTEncoder, LimbFCEncoder
from egotap_tpu.models.layers import MLPDecoder
from egotap_tpu.models.skel_variants import LSTMTreeWalk, skel_output_size


class EgoTAPLifter(nn.Module):
    """Heatmap stack -> (B, num_joints, 3) pose."""

    num_heatmap: int              # J: pos heatmaps per view
    num_joints: int               # output joints (J [+1 head if estimated])
    # Jr: limb (rot) heatmaps per view; None = num_heatmap. The reference
    # asserts equality (net_architecture.py:598); here unequal counts are
    # supported by tail-aligning the limb bridges to the walked joints
    # (both tails come from the same preset ordering,
    # dataloader/data_loader.py:149-164) — identical math when equal.
    num_rot_heatmap: Optional[int] = None
    views: int = 2                # input_channel_scale
    limb_dim: int = 2             # sin heatmap type
    hidden_size: int = 128        # ae_hidden_size
    skel_layer: str = "PU"        # PU | LSTM | LSTMSplit | LSTMNoRel | None | NoneNoRel
    num_pu_layers: int = 2
    vit_layers: int = 3
    use_global_offset: bool = True    # UnrealEgo + estimate_head
    pu_semantics: str = "chain"
    parents: Optional[Tuple[int, ...]] = None
    quant: bool = False               # int8 inference ViT matmuls

    @nn.compact
    def __call__(self, heatmaps: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """heatmaps: (B, H, W, C) NHWC stack (C ordered like the reference's
        NCHW channel dim)."""
        B = heatmaps.shape[0]
        J, V, Ld = self.num_heatmap, self.views, self.limb_dim
        Jr = self.num_rot_heatmap if self.num_rot_heatmap is not None else J
        hid = self.hidden_size
        body_hidden = hid * V          # per-joint view-concat width
        res = heatmaps.shape[1]

        # --- split pos / rot channel groups (net_architecture.py:688-694)
        # directly from the NHWC heatmap stack: each group needs exactly ONE
        # transpose into its encoder layout (the reference's NCHW slicing +
        # reshapes would cost several HBM round-trips of the full stack)
        ps = 16                                  # GridViT patch size
        P = res // ps
        pos = heatmaps[..., : J * V]             # (B, H, W, V*J)
        pos = pos.reshape(B, P, ps, P, ps, J * V)
        pos_patches = pos.transpose(0, 5, 1, 3, 2, 4)   # (B, N, P, P, ps, ps)
        pos_patches = pos_patches.reshape(B, J * V, P * P, ps * ps)

        rot = heatmaps[..., J * V:]              # (B, H, W, V*Ld*Jr)
        rot = rot.reshape(B, res * res, V, Ld, Jr)
        rot = rot.transpose(0, 2, 4, 3, 1)       # (B, V, Jr, Ld, H*W)
        rot_rows = rot.reshape(B, V * Jr, Ld * res * res)

        pos_embed = GridViTEncoder(
            num_tiles=J * V, hidden_size=hid, channels=1,
            vit_layers=self.vit_layers, heatmap_size=res,
            quant=self.quant,
            name="pos_encoder")(pos_patches, train=train)  # (B, V*J*hid)
        rot_embed = LimbFCEncoder(hidden_size=hid, quant=self.quant,
                                  name="rot_encoder")(
            rot_rows, train=train)               # (B, V*Jr*hid)

        # --- regroup view-major -> per-joint [view0, view1] blocks
        pos_pj = pos_embed.reshape(B, V, J, hid).swapaxes(1, 2)
        pos_pj = pos_pj.reshape(B, J, body_hidden)
        rot_pj = rot_embed.reshape(B, V, Jr, hid).swapaxes(1, 2)
        rot_pj = rot_pj.reshape(B, Jr, body_hidden)
        if Jr != J:
            # tail-align limb bridges to the walked joints: zero bridge for
            # the leading joints without a limb map, drop surplus limbs
            if Jr < J:
                rot_pj = jnp.concatenate(
                    [jnp.zeros((B, J - Jr, body_hidden), rot_pj.dtype),
                     rot_pj], axis=1)
            else:
                rot_pj = rot_pj[:, Jr - J:]

        # --- propagation over the joint sequence
        feature_size = skel_output_size(self.skel_layer, body_hidden)
        if self.skel_layer == "PU":
            skel = PUChain(input_size=body_hidden, bridge_size=body_hidden,
                           hidden_size=2 * body_hidden,
                           num_layers=self.num_pu_layers,
                           semantics=self.pu_semantics, parents=self.parents,
                           name="skelnet")(pos_pj, rot_pj)   # (B, J, 2*bh)
        elif self.skel_layer == "LSTM":
            both = jnp.concatenate([pos_pj, rot_pj], axis=-1)
            skel = LSTMTreeWalk(2 * body_hidden, 2 * body_hidden,
                                self.num_pu_layers, parents=self.parents,
                                name="skelnet")(both)
        elif self.skel_layer == "LSTMSplit":
            skel = LSTMTreeWalk(body_hidden, body_hidden,
                                self.num_pu_layers, parents=self.parents,
                                name="skelnet")(pos_pj, extra_inputs=rot_pj)
        elif self.skel_layer == "LSTMNoRel":
            skel = LSTMTreeWalk(body_hidden, body_hidden,
                                self.num_pu_layers, parents=self.parents,
                                name="skelnet")(pos_pj)
        elif self.skel_layer == "None":
            skel = jnp.concatenate([pos_pj, rot_pj], axis=-1)
        elif self.skel_layer == "NoneNoRel":
            skel = pos_pj
        else:
            raise ValueError(f"unknown skel_layer {self.skel_layer!r}")

        # --- per-joint head (indep_projection, net_architecture.py:732-739)
        per_joint = jnp.concatenate([pos_pj, skel], axis=-1)
        per_joint = per_joint.reshape(B * J, body_hidden + feature_size)
        pose = MLPDecoder(3, name="pose_mlp")(per_joint, train=train)
        pose = pose.reshape(B, J * 3)

        # --- global head (remaining joints + optional offset)
        global_dim = 3 * (self.num_joints - J)
        if self.use_global_offset:
            global_dim += 3
        if global_dim > 0:
            z_bar = skel.reshape(B, J * feature_size)
            others = MLPDecoder(global_dim, name="global_mlp")(
                z_bar, train=train)
            if self.use_global_offset:
                offset = others[:, :3]
                pose = (pose.reshape(B, J, 3) + offset[:, None, :]
                        ).reshape(B, J * 3)
                others = others[:, 3:]
            pose = jnp.concatenate([pose, others], axis=1)

        return pose.reshape(B, self.num_joints, 3)
