"""Fused softmax attention (Pallas, TPU) for the Grid-ViT.

At the lifter's scale (<= 576 tokens + dummies, head_dim 128) one
(batch, head) attention instance fits comfortably in VMEM
(4 x 576 x 128 x 2B = 0.6 MB), so no KV tiling is needed: a single-block
kernel computes scores -> softmax -> context without materializing
anything in HBM. Falls back to the jnp path on non-TPU backends.

Numerics: matches the HF reference attention (scores / sqrt(dh), plain
softmax; reference model/modeling_vit.py:223-256). Softmax is computed
with the usual max-subtraction in f32 for stability; the reference's
softmax is mathematically identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # keep q/k/v in their storage dtype. For the scores dot this is exact:
    # bf16 x bf16 with f32 accumulation == upcast-then-f32-dot (bf16 values
    # are exact in f32), at full bf16 MXU rate. The p@v dot additionally
    # rounds the softmax probabilities to the storage dtype first — a
    # deliberate, bounded numerics change on the bf16 path (f32 inputs are
    # unaffected), covered by the 1e-3 pallas-vs-jnp gate in check_tpu.
    q = q_ref[0]                              # (S, D)
    k = k_ref[0]
    v = v_ref[0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                      ) -> jnp.ndarray:
    bh, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
    )(q, k, v)


def _attention_jnp(q, k, v):
    d = q.shape[-1]
    scores = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(
        jnp.asarray(d, dtype=q.dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, v)


@jax.custom_vjp
def _fused_attention(q, k, v):
    # dispatch on the actual lowering platform (works under
    # jax.default_device(cpu) contexts and multi-backend processes)
    return jax.lax.platform_dependent(
        q, k, v, tpu=_attention_pallas, default=_attention_jnp)


def _fused_attention_fwd(q, k, v):
    return _fused_attention(q, k, v), (q, k, v)


def _fused_attention_bwd(res, g):
    # backward recomputes attention via the jnp formulation and
    # differentiates that — numerically the same function, and it keeps
    # the pallas forward usable under autodiff (training)
    q, k, v = res
    _, vjp = jax.vjp(_attention_jnp, q, k, v)
    return vjp(g)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def multihead_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        use_pallas: bool = True) -> jnp.ndarray:
    """(B, H, S, D) q/k/v -> (B, H, S, D) context."""
    b, h, s, d = q.shape
    flat = (b * h, s, d)
    qf, kf, vf = (x.reshape(flat) for x in (q, k, v))
    if use_pallas and s % 8 == 0 and d % 128 == 0:
        out = _fused_attention(qf, kf, vf)
    else:
        out = _attention_jnp(qf, kf, vf)
    return out.reshape(b, h, s, d)


# --------------------------------------------------------------------------
# Packed layout: q/k/v stay exactly as the projections produce them —
# (B, S, H*Dh) — and the kernel slices heads internally (static unroll).
# No (B,H,S,D) transposes on either side of the attention; for the
# Grid-ViT this removes four full-tensor HBM round-trips per layer.

def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                              # (S, Dh) — one head's block
    k = k_ref[0]
    v = v_ref[0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attention_pallas_packed(q, k, v, heads):
    b, s, d = q.shape
    hd = d // heads
    scale = 1.0 / (hd ** 0.5)
    kernel = functools.partial(_attn_kernel_packed, scale=scale)
    # grid strides (batch, head); each head is a contiguous Dh-column
    # block of the packed last dim, so the head split costs no transpose
    spec = pl.BlockSpec((1, s, hd), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(b, heads),
        in_specs=[spec] * 3, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
    )(q, k, v)


def _attention_jnp_packed(q, k, v, heads):
    b, s, d = q.shape
    hd = d // heads
    qh, kh, vh = (x.reshape(b, s, heads, hd) for x in (q, k, v))
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(hd, dtype=q.dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention_packed(q, k, v, heads):
    return jax.lax.platform_dependent(
        q, k, v,
        tpu=functools.partial(_attention_pallas_packed, heads=heads),
        default=functools.partial(_attention_jnp_packed, heads=heads))


def _fused_attention_packed_fwd(q, k, v, heads):
    return _fused_attention_packed(q, k, v, heads), (q, k, v)


def _fused_attention_packed_bwd(heads, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        functools.partial(_attention_jnp_packed, heads=heads), q, k, v)
    return vjp(g)


_fused_attention_packed.defvjp(_fused_attention_packed_fwd,
                               _fused_attention_packed_bwd)


def multihead_attention_packed(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, heads: int,
                               use_pallas: bool = True) -> jnp.ndarray:
    """(B, S, H*Dh) q/k/v (projection layout) -> (B, S, H*Dh) context,
    with zero layout transposes."""
    s, d = q.shape[1], q.shape[2]
    if use_pallas and s % 8 == 0 and (d // heads) % 128 == 0:
        return _fused_attention_packed(q, k, v, heads)
    return _attention_jnp_packed(q, k, v, heads)
