"""Grad-step phase breakdown (round-3 VERDICT #6): where do the ~49 ms of
the 1080p training step's grad half go, and what gets it under 75 ms total?

The fast step = staged solve (~46 ms) + grad program. The grad program's
chains run through the XLA (jnp) MLP chain — differentiable but HBM-bound —
and autodiff normals nest jax.grad inside the loss, so the loss VJP carries
second-order (Hessian-vector) chain terms. Candidates:

  a) phase timing: solve alone; packed-sort alone; implicit-t-only grad;
     full grad (autodiff normals); full grad (tetrahedron normals —
     4 forward taps whose VJP is first-order only, and the REFERENCE's own
     normal semantics, volumeRender_kernel.cu:362-377);
  b) cap sensitivity (is the grad program linear in the bucket?);
  c) shade-precision HIGH for the grad chains.

Run: python benchmarks/exp_grad.py
"""
from __future__ import annotations

import functools
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.diff import losses, train
from cudaneuralrender_tpu.diff.implicit import implicit_surface_t
from cudaneuralrender_tpu.diff.solve import solve_surface
from cudaneuralrender_tpu.ops import camera as camera_lib, compaction, shading
from cudaneuralrender_tpu.render.renderer import scene_fn


def timed(name, fn, n=5, rtt=0.0):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ms = (float(np.median(ts)) - rtt) * 1e3
    print(f"  {name:56s}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    w, h = 1920, 1080
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    cam = cnr.Camera(rotation_y=30.0, rotation_x=15.0)
    target = jnp.zeros((h, w, 4), jnp.float32)
    n = w * h

    noop = jax.jit(lambda x: x + 1.0)
    float(noop(jnp.float32(0)))
    ts = []
    for _ in range(5):
        s = time.perf_counter()
        float(jnp.sum(noop(jnp.float32(0))))
        ts.append(time.perf_counter() - s)
    rtt = float(np.median(ts))
    print(f"RTT ~ {rtt*1e3:.1f} ms", flush=True)

    st = {}
    t_star, hit = solve_surface(params, cam, cfg, stats_out=st)
    hits = int(st["hits"])
    cap = compaction.capacity_pow2_of(hits, n, minimum=cfg.compact_min)
    print(f"hits {hits}  grad bucket cap {cap}", flush=True)

    print("[a] phases:", flush=True)
    timed("staged solve (t*, hit)", lambda: np.asarray(
        solve_surface(params, cam, cfg)[0]).sum(), rtt=0.0)

    cam_to_world, world_to_cam = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
    tgt = target.reshape(-1, 4)

    @jax.jit
    def sort_only(t_star, hit):
        packed = compaction.sort_pack_leaves(
            hit, (dirs[:, 0], dirs[:, 1], dirs[:, 2], t_star,
                  tgt[:, 0], tgt[:, 1], tgt[:, 2], tgt[:, 3]))
        return sum(jnp.sum(p[:cap]) for p in packed)

    timed("packed sort alone (8 payloads, 2M lanes)",
          lambda: float(sort_only(t_star, hit)), rtt=rtt)

    def make_grad(loss_fn):
        g = jax.jit(jax.value_and_grad(loss_fn))

        def run():
            loss, grads = g(params)
            float(loss)
            jax.block_until_ready(grads)
        return run

    def t_only_loss(p):
        # implicit reattachment only: residual on t* itself (no shading)
        f = scene_fn(p, cfg, 0.0)
        packed = compaction.sort_pack_leaves(
            jax.lax.stop_gradient(hit),
            (dirs[:, 0], dirs[:, 1], dirs[:, 2],
             jax.lax.stop_gradient(t_star)))
        d_sub = jnp.stack([q[:cap] for q in packed[:3]], axis=-1)
        t_sub = packed[3][:cap]
        t = implicit_surface_t(f, origin, d_sub, t_sub)
        valid = jnp.arange(cap) < jnp.sum(hit.astype(jnp.int32))
        return jnp.sum(jnp.where(valid, (t - 2.0) ** 2, 0.0)) / n

    timed("grad: implicit-t only", make_grad(t_only_loss), rtt=rtt)

    def full_loss(p, c=cfg):
        return losses.pixel_loss(p, cam, c, target, t_star=t_star, hit=hit,
                                 compact_cap=cap)

    def split_loss(p, normal_mode="autodiff", shade_prec=None):
        # _pixel_loss_compact with a SEPARATE (possibly cheaper) chain for
        # the shading normals: implicit-t stays HIGHEST (t accuracy), the
        # normal chain drops to `shade_prec`.
        f = scene_fn(p, cfg, 0.0)
        f_shade = f if shade_prec is None else scene_fn(
            p, cfg, 0.0, for_grad=True, precision=shade_prec)
        packed = compaction.sort_pack_leaves(
            jax.lax.stop_gradient(hit),
            (dirs[:, 0], dirs[:, 1], dirs[:, 2],
             jax.lax.stop_gradient(t_star),
             tgt[:, 0], tgt[:, 1], tgt[:, 2], tgt[:, 3]))
        d_sub = jnp.stack([q[:cap] for q in packed[:3]], axis=-1)
        t_sub = packed[3][:cap]
        tgt_sub = jnp.stack([q[:cap] for q in packed[4:]], axis=-1)
        valid = jnp.arange(cap) < jnp.sum(hit.astype(jnp.int32))
        t = implicit_surface_t(f, origin, d_sub, t_sub)
        points = origin + d_sub * t[:, None]
        colors = shading.shade(
            f_shade, points, d_sub, mode=cfg.shading,
            normal_mode=normal_mode, normal_eps=cfg.normal_eps,
            world_to_cam=world_to_cam)
        res_fg = jnp.where(valid[:, None], colors - tgt_sub, 0.0)
        fg = jnp.sum(res_fg ** 2)
        bg = jnp.sum(jnp.where(hit[:, None], 0.0, tgt ** 2))
        return (fg + bg) / tgt.size

    HIGH = jax.lax.Precision.HIGH
    timed("grad: full, autodiff normals (production)",
          make_grad(full_loss), rtt=rtt)
    timed("grad: full, tetrahedron normals",
          make_grad(functools.partial(split_loss,
                                      normal_mode="tetrahedron")), rtt=rtt)
    timed("grad: full, autodiff normals, shade chain HIGH",
          make_grad(functools.partial(split_loss, shade_prec=HIGH)), rtt=rtt)
    timed("grad: full, tetra + shade chain HIGH",
          make_grad(functools.partial(split_loss, normal_mode="tetrahedron",
                                      shade_prec=HIGH)), rtt=rtt)

    print("[b] cap sensitivity (autodiff):", flush=True)
    for c2 in (cap // 2, cap, min(2 * cap, n)):
        def loss_c(p, c2=c2):
            return losses.pixel_loss(p, cam, cfg, target, t_star=t_star,
                                     hit=hit, compact_cap=c2)
        timed(f"grad cap={c2}", make_grad(loss_c), rtt=rtt)

    # grad parity: tetrahedron vs autodiff normal gradients
    g_auto = jax.jit(jax.value_and_grad(full_loss))(params)[1]
    g_tet = jax.jit(jax.value_and_grad(functools.partial(
        split_loss, normal_mode="tetrahedron")))(params)[1]
    la = jax.tree_util.tree_leaves(g_auto)
    lt = jax.tree_util.tree_leaves(g_tet)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(la, lt))
    den = sum(float(jnp.sum(a ** 2)) for a in la)
    print(f"[c] grad rel-L2 tetra vs autodiff: {np.sqrt(num / den):.3e}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
