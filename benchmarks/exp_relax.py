"""Measure over-relaxed sphere tracing (relax_omega) on the staged 1080p
path, plus the host-sync floor and a shading-cost decomposition — the data
behind the relax_omega default and the next shading optimization.
"""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import compaction, shading
from cudaneuralrender_tpu.render import renderer


def timed(name, fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    s = float(jnp.sum(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args, **kw)))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s}: {np.median(ts)*1e3:9.2f} ms (min {np.min(ts)*1e3:8.2f}) sum={s:.2f}", flush=True)
    return out


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged")

    # --- host-sync floor: round-trip of a 1-scalar fetch
    tiny = jnp.zeros((8,), jnp.float32)
    f_id = jax.jit(lambda x: x + 1.0)
    timed("sync floor (tiny jit + scalar fetch)", f_id, tiny, reps=10)

    # --- relax_omega sweep through the full staged path
    img0 = timed("staged omega=off", cnr.render_staged, params, cam, base)
    hit0 = np.asarray(img0[..., 3]) > 0
    for om in (1.2, 1.4, 1.6, 1.9):
        img = timed(f"staged omega={om}", cnr.render_staged, params, cam,
                    base.replace(relax_omega=om))
        hit = np.asarray(img[..., 3]) > 0
        both = hit & hit0
        d = np.abs(np.asarray(img)[..., :3][both] - np.asarray(img0)[..., :3][both])
        print(f"   hit agree={np.mean(hit == hit0):.6f} (hits {hit.sum()} vs {hit0.sum()}), "
              f"color max|d|={d.max():.4f}", flush=True)

    # --- shading decomposition at the N/8 bucket (packed flow)
    c2w, w2c = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(c2w, h, w, base.focal)
    pr, steps, _, _, _ = renderer._scheduled_march(params, origin, dirs, base, jnp.float32(0.0))
    cap = n // 8
    f_shade = renderer.shade_fn(params, base, 0.0)

    timed("  compact_indices (2M mask, legacy)", jax.jit(lambda m: compaction.compact_indices(m, cap)[0]), pr.converged)
    timed("  sort_pack (2M, 8 leaves)", jax.jit(
        lambda m: compaction.sort_pack_leaves(m, tuple(pr))[0]), pr.converged)
    pts = jnp.stack([pr.dx[:cap], pr.dy[:cap], pr.dz[:cap]], axis=1) * pr.t[:cap, None] + origin

    timed("  autodiff normals (N/8)", jax.jit(lambda p: shading.autodiff_normals(f_shade, p)), pts)
    timed("  tetra normals (N/8)", jax.jit(lambda p: shading.tetrahedron_normals(f_shade, p)), pts)
    timed("  full packed shading + restore", jax.jit(
        lambda p, s: renderer._shade_packed(params, origin, p, s, w2c, base, None, jnp.float32(0.0))[0]
    ), pr, steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
