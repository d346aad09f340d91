"""Scaramuzza OCam fisheye camera model (pure functions, JAX + numpy twins).

Parity target: reference utils/projection.py:13-144.

The calibration JSON (``fisheye.calibration_{left,right}.json``) carries:
  * ``polynomialC2W``: pixel-radius -> z polynomial coefficients (cam2world),
  * ``polynomialW2C``: theta -> pixel-radius polynomial (world2cam),
  * ``image_center``: [row, col] (note: xc = center[1], yc = center[0],
    reference utils/projection.py:34-35),
  * ``affine``: [c, d, e] stretch matrix,
  * ``size``: [height, width], ``imageCircleRadius``, ``name``.

Both functions assume 1024x1024-pixel image coordinates (the reference's
convention; heatmap coordinates are ``pix / 1024 * res``).

Numerical parity: the polynomial is evaluated with the same accumulation
order as the reference (running power ``r_i *= r``; NOT Horner) so results
are bit-comparable at matching dtype.

UnrealEgo quirk (utils/projection.py:96-97, 141-142, 256-261): when the
calibration is named ``unreal_ego_pose``, 3D points are converted UE->CV by
negating y and z before projection, and the projected y is mirrored about
the image center afterwards.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class OcamModel:
    """Calibration parameters. Arrays are jnp/np vectors; scalars are floats."""

    pol: Any          # (P,) cam2world polynomial (z from pixel radius)
    invpol: Any       # (Q,) world2cam polynomial (radius from theta)
    xc: float
    yc: float
    c: float
    d: float
    e: float
    width: int = 1024
    height: int = 1024
    radius: float = 512.0
    name: str = "fisheye"

    @property
    def is_unrealego(self) -> bool:
        return self.name == "unreal_ego_pose"

    def tree_flatten(self):
        children = (self.pol, self.invpol)
        aux = (self.xc, self.yc, self.c, self.d, self.e,
               self.width, self.height, self.radius, self.name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        pol, invpol = children
        xc, yc, c, d, e, width, height, radius, name = aux
        return cls(pol=pol, invpol=invpol, xc=xc, yc=yc, c=c, d=d, e=e,
                   width=width, height=height, radius=radius, name=name)


def load_calibration(path: str) -> OcamModel:
    """Load an OCam calibration JSON (reference utils/projection.py:13-50)."""
    with open(path, "r") as f:
        data = json.load(f)
    return calibration_from_dict(data)


def calibration_from_dict(data: Dict[str, Any]) -> OcamModel:
    return OcamModel(
        pol=np.asarray(data["polynomialC2W"], dtype=np.float64),
        invpol=np.asarray(data["polynomialW2C"], dtype=np.float64),
        xc=float(data["image_center"][1]),
        yc=float(data["image_center"][0]),
        c=float(data["affine"][0]),
        d=float(data["affine"][1]),
        e=float(data["affine"][2]),
        height=int(data["size"][0]),
        width=int(data["size"][1]),
        radius=float(data["imageCircleRadius"]),
        name=str(data["name"]),
    )


def calibration_to_dict(o: OcamModel) -> Dict[str, Any]:
    return {
        "name": o.name,
        "polynomialC2W": np.asarray(o.pol).tolist(),
        "polynomialW2C": np.asarray(o.invpol).tolist(),
        "image_center": [o.yc, o.xc],
        "affine": [o.c, o.d, o.e],
        "size": [o.height, o.width],
        "imageCircleRadius": o.radius,
    }


def _poly_running(xp, coeffs, x):
    """Evaluate sum_i coeffs[i] * x**i with the reference's accumulation order
    (running power; utils/projection.py:73-79, 115-121)."""
    acc = xp.full(x.shape, coeffs[0], dtype=x.dtype) if xp is np else \
        jnp.full(x.shape, coeffs[0], dtype=x.dtype)
    x_i = xp.ones_like(x)
    for i in range(1, len(coeffs)):
        x_i = x_i * x
        acc = acc + x_i * coeffs[i]
    return acc


def _cam2world(xp, point2d, o: OcamModel):
    invdet = 1.0 / (o.c - o.d * o.e)
    u = point2d[..., 0] - o.xc
    v = point2d[..., 1] - o.yc
    xp_ = invdet * (u - o.d * v)
    yp_ = invdet * (-o.e * u + o.c * v)

    r = xp.sqrt(xp_ * xp_ + yp_ * yp_)
    pol = np.asarray(o.pol, dtype=np.float64)
    if xp is jnp:
        # f32 device path: evaluate in the normalized variable r/scale to
        # avoid catastrophic precision loss from huge powers of the pixel
        # radius. Mathematically identical; the numpy twin keeps the
        # reference's raw-radius accumulation for bit-parity.
        scale = max(float(o.radius), 1.0)
        pol = pol * scale ** np.arange(len(pol))
        r = r / scale
    zp_ = _poly_running(xp, pol, r)

    invnorm = 1.0 / xp.sqrt(xp_ * xp_ + yp_ * yp_ + zp_ * zp_)
    return xp.stack([invnorm * xp_, invnorm * yp_, invnorm * zp_], axis=-1)


def _world2cam(xp, point3d, o: OcamModel):
    if o.is_unrealego:
        # UE -> CV coordinate preconditioning (utils/projection.py:256-261).
        point3d = xp.concatenate(
            [point3d[..., :1], -point3d[..., 1:]], axis=-1)

    x3, y3, z3 = point3d[..., 0], point3d[..., 1], point3d[..., 2]
    norm = xp.sqrt(x3 * x3 + y3 * y3)
    near_zero = xp.isclose(norm, xp.zeros_like(norm))

    safe_norm = xp.where(near_zero, xp.ones_like(norm), norm)
    theta = xp.arctan(z3 / safe_norm)
    rho = _poly_running(xp, np.asarray(o.invpol, dtype=np.float64), theta)
    invnorm = 1.0 / safe_norm
    xr = x3 * invnorm * rho
    yr = y3 * invnorm * rho

    px = xr * o.c + yr * o.d + o.xc
    py = xr * o.e + yr + o.yc

    px = xp.where(near_zero, xp.full_like(px, o.xc), px)
    py = xp.where(near_zero, xp.full_like(py, o.yc), py)

    if o.is_unrealego:
        # Mirror y about the image center (utils/projection.py:141-142).
        py = o.yc * 2 - py

    return xp.stack([px, py], axis=-1)


def cam2world(point2d: jnp.ndarray, o: OcamModel) -> jnp.ndarray:
    """Pixel (..., 2) -> unit ray (..., 3). JAX; jit/vmap friendly."""
    return _cam2world(jnp, point2d, o)


def world2cam(point3d: jnp.ndarray, o: OcamModel) -> jnp.ndarray:
    """3D point (..., 3) -> pixel (..., 2). JAX; jit/vmap friendly."""
    return _world2cam(jnp, point3d, o)


def cam2world_np(point2d: np.ndarray, o: OcamModel) -> np.ndarray:
    """Numpy twin of `cam2world` (bit-comparable host-side path)."""
    return _cam2world(np, np.asarray(point2d), o)


def world2cam_np(point3d: np.ndarray, o: OcamModel) -> np.ndarray:
    """Numpy twin of `world2cam` (bit-comparable host-side path)."""
    return _world2cam(np, np.asarray(point3d), o)


class CalibrationCache:
    """Per-(data_dir, side) calibration cache.

    The reference keeps a module-global cache keyed only by side
    (utils/projection.py:15, 52), which serves stale calibrations when two
    datasets are mixed in one process — here the key includes the directory.
    """

    def __init__(self) -> None:
        self._cache: Dict[Tuple[str, str], OcamModel] = {}

    def get(self, data_dir: str, side: str = "left") -> OcamModel:
        key = (os.path.abspath(data_dir), side)
        if key not in self._cache:
            path = os.path.join(data_dir, f"fisheye.calibration_{side}.json")
            self._cache[key] = load_calibration(path)
        return self._cache[key]

    def clear(self) -> None:
        self._cache.clear()


CALIBRATIONS = CalibrationCache()


def synthetic_calibration(name: str = "unreal_ego_pose",
                          f: float = 220.0,
                          size: int = 1024) -> OcamModel:
    """Build a self-consistent synthetic fisheye calibration.

    Used by tests and the synthetic-dataset generator (no real UnrealEgo /
    EgoCap calibration files are shipped). The model approximates an
    equidistant fisheye: pixel radius rho(theta) decreases as the ray rises
    toward the optical axis. ``polynomialW2C`` is an exact cubic in theta and
    ``polynomialC2W`` is a least-squares degree-4 fit of the inverse, giving
    a cam2world(world2cam(.)) ray round-trip error of ~1e-3.
    """
    # rho(theta): theta in (-pi/2, pi/2) measured from the xy-plane.
    b = np.array([f * np.pi / 2.0, -f, -8.0, 2.0], dtype=np.float64)

    def rho_of_theta(t):
        return b[0] + b[1] * t + b[2] * t ** 2 + b[3] * t ** 3

    # Fit z(r) so that arctan(z(r)/r) inverts rho_of_theta.
    thetas = np.linspace(-1.25, 1.25, 8001)
    rhos = rho_of_theta(thetas)
    zs = rhos * np.tan(thetas)
    deg = 9
    # Normalize the radius before fitting for a well-conditioned Vandermonde,
    # then rescale coefficients back to pixel units.
    scale = np.max(np.abs(rhos))
    V = np.vander(rhos / scale, deg + 1, increasing=True)
    pol_scaled = np.linalg.lstsq(V, zs, rcond=None)[0]
    pol = pol_scaled / scale ** np.arange(deg + 1)

    center = size / 2.0
    return OcamModel(
        pol=pol,
        invpol=b,
        xc=center, yc=center,
        c=1.0, d=0.0, e=0.0,
        width=size, height=size, radius=center,
        name=name,
    )
