"""Scene-adaptive bounding-sphere fitting.

The reference hardcodes its cull/budget sphere at r=1.2 around the origin
(volumeRender_kernel.cu:325-328) — generous for every shipped geometry
(plane_1's surface fits in roughly half that). The bound drives two costs:

  * the sky HALO (pixels inside the bound's silhouette that miss the
    surface) marches until the budget tfar runs out — a tighter sphere
    kills those rays in fewer steps;
  * grazing silhouette rays' DEEP refine tail is budget-limited — a
    tighter tfar cuts the straggler step count.

Correctness: every hit point lies inside the fitted sphere, and along a ray
the far intersection lies beyond any interior point, so the reference's
budget invariant (total march <= tfar, :463-467) still covers every hit —
only doomed rays die earlier. Convergence-step counts shift, so this is a
mixed-path optimization (march_precision="full" keeps the configured bound
for exact reference parity).

The fit probes the scene SDF on a coarse grid over the configured bound's
cube, keeps cells within a Lipschitz threshold of the surface, and returns
the smallest axis-aligned covering sphere plus margins for grid resolution
and network error. Two scalar fetches per model (cached by the renderer).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fit_bound_sphere(
    sdf_fn,
    base_center,
    base_radius: float,
    *,
    res: int = 48,
    err_margin: float = 0.05,
) -> Tuple[Tuple[float, float, float], float]:
    """Fit a tight bounding sphere around the zero level set of ``sdf_fn``.

    Probes a res³ grid spanning the base sphere's cube; a cell is
    surface-adjacent when |d| <= cell diagonal + err_margin (the margin
    absorbs approximate-SDF error — the neural field is not exactly
    1-Lipschitz). Returns (center, radius) as Python floats (config-static);
    falls back to the base bound when nothing qualifies or the "tight"
    sphere isn't actually smaller.
    """
    base_center = np.asarray(base_center, np.float32)
    axis = np.linspace(-base_radius, base_radius, res, dtype=np.float32)
    cell = float(axis[1] - axis[0])
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3) + base_center

    d = np.asarray(jax.jit(sdf_fn)(jnp.asarray(pts)))
    thresh = cell * np.sqrt(3.0) + err_margin
    near = np.abs(d) <= thresh
    if not near.any():
        return tuple(float(v) for v in base_center), float(base_radius)

    p = pts[near]
    lo, hi = p.min(axis=0), p.max(axis=0)
    center = (lo + hi) / 2.0
    radius = float(np.linalg.norm(p - center, axis=1).max() + cell + err_margin)
    if radius >= base_radius:
        return tuple(float(v) for v in base_center), float(base_radius)
    return tuple(float(v) for v in center), radius
