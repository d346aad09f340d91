"""On-device (JAX/XLA) heatmap target rendering.

TPU-native equivalents of `egotap_tpu.data.heatmaps`: the reference renders
every training target on the host CPU inside DataLoader workers
(reference dataloader/data_loader.py:76-215, the input-bound hot loop);
here rendering is a handful of vectorized outer-products / masked grids and
two small matmuls per map, fused into the jitted input pipeline so targets
are synthesized from (J, 2)/(J, 3) coordinates directly on the chip.

Numerics match the numpy twins to f32 round-off (unit-tested):
  * Gaussian peak render: closed-form blurred delta, including scipy's
    'reflect' boundary handling of the margin trick.
  * AA limb lines: dense Wu formulation (per-pixel closed form) instead of
    scatter, then a constant-mode separable Gaussian as two banded matmuls.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.data.heatmaps import COORD_SPACE, GAUSSIAN_PEAK, gaussian_kernel1d

_RADIUS = 4  # kernel radius for sigma=1 (scipy: int(4*sigma+0.5))


@functools.lru_cache(maxsize=None)
def _kernel9() -> np.ndarray:
    return gaussian_kernel1d(1.0, _RADIUS).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _blur_matrix(res: int) -> np.ndarray:
    """(res, res) banded matrix applying a constant-mode 9-tap Gaussian."""
    k = _kernel9()
    mat = np.zeros((res, res), dtype=np.float32)
    for i in range(res):
        for t in range(-_RADIUS, _RADIUS + 1):
            j = i + t
            if 0 <= j < res:
                mat[i, j] = k[t + _RADIUS]
    return mat


def _reflect_delta_profile(d: jnp.ndarray, n: int) -> jnp.ndarray:
    """1-D blurred delta at integer position ``d`` on a length-``n`` axis
    with scipy 'reflect' boundaries: value[p] = k(p-d) + k(p+1+d)
    + k(p+1+d-2n) (single reflection per edge; radius << n)."""
    k = jnp.asarray(_kernel9())
    p = jnp.arange(n)

    def tap(t):
        idx = jnp.clip(t + _RADIUS, 0, 2 * _RADIUS)
        return jnp.where(jnp.abs(t) <= _RADIUS, k[idx], 0.0)

    return tap(p - d) + tap(p + 1 + d) + tap(p + 1 + d - 2 * n)


@functools.partial(jax.jit, static_argnums=(1,))
def render_joint_heatmaps(coords2d: jnp.ndarray, res: int = 64) -> jnp.ndarray:
    """Gaussian-peak joint heatmaps, on device.

    coords2d: (..., J, 2) pixel coordinates in 1024-space.
    Returns (..., J, res, res) float32; in-view peaks == 1.0.

    Matches `heatmaps.coord2d_to_heatmap` (reference
    utils/projection.py:263-279) including truncation-toward-zero placement
    and the asymmetric in-view condition.
    """
    pos = coords2d.astype(jnp.float32) / COORD_SPACE * res
    x = pos[..., 0]
    y = pos[..., 1]
    valid = (y >= -4) & (y < res + 4) & (x >= -4) & (x < res)

    n = res + 2 * _RADIUS
    dx = jnp.trunc(x).astype(jnp.int32) + _RADIUS
    dy = jnp.trunc(y).astype(jnp.int32) + _RADIUS
    dx = jnp.clip(dx, -1000, n + 1000)
    dy = jnp.clip(dy, -1000, n + 1000)

    def one(dyi, dxi, vi):
        col = _reflect_delta_profile(dyi, n)
        row = _reflect_delta_profile(dxi, n)
        img = jnp.outer(col, row)[_RADIUS:-_RADIUS, _RADIUS:-_RADIUS]
        return jnp.where(vi, img, 0.0)

    flat_shape = pos.shape[:-1]
    out = jax.vmap(one)(dy.reshape(-1), dx.reshape(-1), valid.reshape(-1))
    out = out.reshape(flat_shape + (res, res))
    return out / GAUSSIAN_PEAK


def _dense_wu_line(x0, y0, x1, y1, res: int) -> jnp.ndarray:
    """Dense Wu anti-aliased line: per-pixel closed form over a (res, res)
    grid indexed image[y, x]. Endpoints are floats holding integers."""
    r0, c0, r1, c1 = x0, y0, x1, y1
    steep = jnp.abs(r1 - r0) > jnp.abs(c1 - c0)

    # canonical space: (R, C) with C the major axis
    R0 = jnp.where(steep, c0, r0)
    C0 = jnp.where(steep, r0, c0)
    R1 = jnp.where(steep, c1, r1)
    C1 = jnp.where(steep, r1, c1)
    swap = C0 > C1
    R0_, R1_ = jnp.where(swap, R1, R0), jnp.where(swap, R0, R1)
    C0_, C1_ = jnp.where(swap, C1, C0), jnp.where(swap, C0, C1)

    dc = C1_ - C0_
    grad = jnp.where(dc == 0, 0.0, (R1_ - R0_) / jnp.where(dc == 0, 1.0, dc))

    yy = jax.lax.broadcasted_iota(jnp.float32, (res, res), 0)  # image row = y
    xx = jax.lax.broadcasted_iota(jnp.float32, (res, res), 1)  # image col = x
    # pixel (y=yy, x=xx) has line-space coords (r=x, c=y)
    Cp = jnp.where(steep, xx, yy)
    Rp = jnp.where(steep, yy, xx)

    inrange = (Cp >= C0_) & (Cp <= C1_)
    yline = R0_ + grad * (Cp - C0_)
    fl = jnp.floor(yline)
    f = yline - fl
    val = jnp.where(Rp == fl, 1.0 - f, 0.0) + jnp.where(Rp == fl + 1, f, 0.0)
    return jnp.where(inrange, val, 0.0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def render_limb_heatmaps(pts2d: jnp.ndarray, parents: Tuple[int, ...],
                         res: int = 64, sigma: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bone AA limb heatmaps + pixel lengths, on device.

    pts2d: (..., J, 2) in 1024-space; parents: static kinematic parents.
    Returns (heatmaps (..., J-1, res, res), lengths (..., J-1)).

    Matches `heatmaps.limb_data` (reference utils/data.py:197-252): rint'ed
    integer endpoints, out-of-range pixels dropped, constant-mode Gaussian
    blur scaled by sigma, length = float-space norm + 1.0.
    """
    parents = np.asarray(parents)
    divider = COORD_SPACE / res
    p2 = pts2d.astype(jnp.float32) / divider
    parent_xy = p2[..., parents[1:], :]
    child_xy = p2[..., 1:, :]

    lengths = jnp.linalg.norm(parent_xy - child_xy, axis=-1) + 1.0

    a = jnp.rint(parent_xy)
    b = jnp.rint(child_xy)

    def one(av, bv):
        return _dense_wu_line(av[0], av[1], bv[0], bv[1], res)

    flat_a = a.reshape(-1, 2)
    flat_b = b.reshape(-1, 2)
    lines = jax.vmap(one)(flat_a, flat_b)
    lines = lines.reshape(a.shape[:-1] + (res, res))

    blur = jnp.asarray(_blur_matrix(res))
    # constant-mode separable blur: rows then cols as banded matmuls.
    # HIGHEST precision: these produce training targets and must match the
    # host twin to f32 round-off (TPU default would use bf16 passes).
    blurred = jnp.einsum("ij,...jk,lk->...il", blur, lines, blur,
                         precision=jax.lax.Precision.HIGHEST)
    return blurred * sigma, lengths


def limb_theta(pts3d: jnp.ndarray, parents: Tuple[int, ...]) -> jnp.ndarray:
    """Elevation angle per bone: arctan(dz / ||dxy||) of parent - child
    (reference utils/data.py:227-230). pts3d: (..., J, 3) -> (..., J-1)."""
    parents = np.asarray(parents)
    limb = pts3d[..., parents[1:], :] - pts3d[..., 1:, :]
    # Zero-length-limb guard matching the host twin (heatmaps.limb_data):
    # dxy == 0 takes the analytic limit sign(dz)*pi/2 (0 if dz == 0) instead
    # of the reference's unguarded NaN (utils/data.py:230).
    dz = limb[..., 2]
    dxy = jnp.linalg.norm(limb[..., :2], axis=-1)
    degenerate = dxy == 0
    theta = jnp.arctan(dz / jnp.where(degenerate, 1.0, dxy))
    return jnp.where(degenerate, jnp.sign(dz) * (jnp.pi / 2), theta)


def sin_limb_heatmaps(raw_limb: jnp.ndarray, theta: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin)-modulated limb channels (reference
    dataloader/data_loader.py:193-199). raw_limb (..., L, H, W), theta (..., L)."""
    cos_hm = raw_limb * jnp.cos(theta)[..., None, None]
    sin_hm = raw_limb * jnp.sin(theta)[..., None, None]
    return cos_hm, sin_hm
