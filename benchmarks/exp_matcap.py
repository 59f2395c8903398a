"""Why does matcap shading cost 2.1x the facing frame? (round-3 VERDICT #4)

BENCH_r03: facing 44.8 Mrays/s (~46.3 ms) vs matcap 21.4 (~96.8 ms) at
1080p — ~50 ms/frame for what is a once-per-pixel texture lookup. This
experiment isolates the candidates:

  a) end-to-end frame, facing vs matcap (16-frame pipelined protocol);
  b) the shade stage alone on a realistic hit bucket: normals chain,
     facing dot vs matcap transform+gather;
  c) the gather microbenchmark: 2D advanced-index gather from [512,512,4]
     vs flattened 1D take from [H*W, 4] vs single-u32 take from a
     pre-packed [H*W] texture (4x less gathered payload, and the staged
     path wants packed u32 colors anyway).

Run on the real TPU: python benchmarks/exp_matcap.py
"""
from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import shading
from cudaneuralrender_tpu.utils import image_io


def timed(name, fn, n=5):
    fn()  # compile+warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"  {name:58s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    matcap = jnp.asarray(
        image_io.load_matcap("/root/reference/matcaps/Chrome.png"))
    w, h = 1920, 1080
    config = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                              max_steps=6000, march_impl="staged")
    cameras = [cnr.Camera(rotation_y=25.0 + 20 * i, rotation_x=10.0)
               for i in range(16)]

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    print("[a] end-to-end 16-frame pipelined, per-frame ms:", flush=True)
    ms_f = timed("facing", lambda: sync(
        cnr.render_sequence(params, cameras, config)), n=2) / 16
    cfg_m = config.replace(shading="matcap")
    ms_m = timed("matcap", lambda: sync(
        cnr.render_sequence(params, cameras, cfg_m, matcap)), n=2) / 16
    print(f"    per-frame: facing {ms_f:.1f} matcap {ms_m:.1f} "
          f"delta {ms_m - ms_f:.1f} ms", flush=True)

    # [b] the shade stage alone on the realistic in-place-prefix bucket:
    # n/4 lanes (the mixed path's conv_within), ~9% of them real hits.
    n = w * h
    cap = n // 4
    cam = cameras[0]
    cam_to_world, world_to_cam = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, config.focal)
    from cudaneuralrender_tpu.diff.solve import solve_surface

    t_star, hit = solve_surface(params, cam, config)
    # pack hits to the prefix like the staged path does
    order = jnp.argsort(~hit)
    pos = order[:cap]
    sub_dirs = dirs[pos]
    pts = origin + sub_dirs * t_star[pos][:, None]
    conv = hit[pos]
    from cudaneuralrender_tpu.render.renderer import shade_fn

    f = shade_fn(params, config, jnp.float32(0.0))

    @jax.jit
    def normals_only(pts):
        return shading.autodiff_normals(f, pts)

    nrm = normals_only(pts)
    nrm.block_until_ready()

    @jax.jit
    def shade_facing(pts, sub_dirs):
        nn = shading.autodiff_normals(f, pts)
        return shading.facing_color(nn, sub_dirs)

    @jax.jit
    def shade_matcap(pts, sub_dirs, matcap):
        nn = shading.autodiff_normals(f, pts)
        return shading.matcap_color(nn, world_to_cam, matcap)

    print(f"[b] shade stage alone on [{cap}] bucket:", flush=True)
    timed("normals (autodiff chain)", lambda: float(jnp.sum(normals_only(pts))))
    timed("normals + facing", lambda: float(jnp.sum(shade_facing(pts, sub_dirs))))
    timed("normals + matcap", lambda: float(jnp.sum(
        shade_matcap(pts, sub_dirs, matcap))))

    # [c] gather microbenchmark on [cap] indices
    hm, wm = matcap.shape[0], matcap.shape[1]
    tex4 = matcap if matcap.shape[-1] == 4 else jnp.concatenate(
        [matcap, jnp.ones(matcap.shape[:-1] + (1,), matcap.dtype)], -1)
    flat4 = tex4.reshape(-1, 4)
    flat_u32 = shading.pack_rgba_u32(flat4)
    key = jax.random.PRNGKey(0)
    iy = jax.random.randint(key, (cap,), 0, hm, jnp.int32)
    ix = jax.random.randint(key, (cap,), 0, wm, jnp.int32)
    tid = iy * wm + ix

    @jax.jit
    def g2d(iy, ix):
        return tex4[iy, ix]

    @jax.jit
    def g1d(tid):
        return jnp.take(flat4, tid, axis=0)

    @jax.jit
    def g1d_u32(tid):
        return jnp.take(flat_u32, tid, axis=0)

    @jax.jit
    def g_onehot_seg(tid):
        # matmul-gather: one-hot against a segment id — too big at full res,
        # here only to sanity-check the idea's scale on a 256-bin palette
        small = flat4[::1024][:256]
        oh = jax.nn.one_hot(tid % 256, 256, dtype=jnp.float32)
        return oh @ small

    print(f"[c] gather microbench, {cap} indices from {hm}x{wm} texture:",
          flush=True)
    timed("2D advanced-index gather [iy, ix] (current)",
          lambda: float(jnp.sum(g2d(iy, ix))))
    timed("flat 1D take [tid] of [N,4] f32",
          lambda: float(jnp.sum(g1d(tid))))
    timed("flat 1D take [tid] of [N] u32 (packed texel)",
          lambda: float(jnp.sum(g1d_u32(tid).astype(jnp.float32))))
    timed("one-hot matmul gather (256-bin sanity)",
          lambda: float(jnp.sum(g_onehot_seg(tid))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
