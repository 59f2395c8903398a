"""Device-time breakdown of the staged 1080p frame, phase by phase.

Tunnel RTT (~30 ms) hides any phase cheaper than the round trip, so each
phase is CHAINED K times inside one jitted program (a tiny data-dependent
perturbation links iterations and defeats CSE); device time per run =
(wall - RTT) / K. Also sweeps the coarse megakernel tile size.

Usage: python benchmarks/exp_breakdown.py [--res 1920x1080] [--reps 5]
"""
from __future__ import annotations

import argparse
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.pallas.fused_mlp import should_interpret
from cudaneuralrender_tpu.render import renderer

K = 8  # in-program chain length


def chain(body):
    """jit(body applied K times, iterations linked by a tiny perturbation)."""

    @jax.jit
    def run(*args):
        out = body(*args)
        for _ in range(K - 1):
            # data-dependent nudge (~1e-30) so XLA cannot CSE the copies
            eps = jnp.sum(out) * 1e-30
            out = body(*(a + eps if a.dtype == jnp.float32 else a for a in args))
        return out

    return run


def bench(name, fn, *args, reps=5, rtt=0.0):
    float(jnp.sum(fn(*args)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    per = max(med - rtt, 0.0) / K
    print(f"{name:46s}: {med*1e3:8.2f} ms wall  ~{per*1e3:7.2f} ms device/run", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiles", default="4096,8192,16384,32768")
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                           march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, world_to_cam = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
    n = dirs.shape[0]
    fz = jnp.float32(0.0)

    noop = jax.jit(lambda x: x + 1.0)
    noop(fz)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(jnp.sum(noop(fz)))
        ts.append(time.perf_counter() - t0)
    rtt = float(np.median(ts))
    print(f"tunnel RTT ~ {rtt*1e3:.2f} ms   (chain K={K})", flush=True)

    # --- Phase A: coarse megakernel, tile sweep
    def coarse_body(tile):
        def body(o, d):
            st = march.init_state(o, d, cfg.bound_center, cfg.bound_radius)
            st, res = megakernel.march_pallas_state(
                params, o, d, st, cfg, fz, tile=tile,
                march_eps=cfg.coarse_eps, precision=jax.lax.Precision.DEFAULT,
                relax_omega=cfg.relax_omega, interpret=should_interpret(),
                return_resolve=True,
            )
            return st.t + st.active + st.converged + res * 1e-9
        return body

    for tile in (int(t) for t in args.tiles.split(",")):
        bench(f"coarse kernel tile={tile}", chain(coarse_body(tile)),
              origin, dirs, reps=args.reps, rtt=rtt)

    # Coarse state (computed once) feeds the standalone refine phases.
    @jax.jit
    def coarse_state(o, d):
        st = march.init_state(o, d, cfg.bound_center, cfg.bound_radius)
        st, res = megakernel.march_pallas_state(
            params, o, d, st, cfg, fz, tile=8192,
            march_eps=cfg.coarse_eps, precision=jax.lax.Precision.DEFAULT,
            relax_omega=cfg.relax_omega, interpret=should_interpret(),
            return_resolve=True,
        )
        return st.t, st.active.astype(jnp.float32), st.converged.astype(jnp.float32), res

    cs = coarse_state(origin, dirs)

    def entry_sort_body(t, act, conv, res):
        state = march.MarchState(t=t, budget=jnp.ones_like(t), active=act > 0.5,
                                 converged=conv > 0.5, steps=jnp.int32(30))
        pr = renderer._pack_init(state, dirs)
        near = pr.active | pr.converged
        pr = renderer._pr_sort(pr, near, order=res)
        return pr.t + pr.pos.astype(jnp.float32) * 1e-12

    bench("refine entry sort (difficulty-ordered)", chain(entry_sort_body), *cs,
          reps=args.reps, rtt=rtt)

    rung_kernel = renderer._rung_kernel_fn(params, cfg, fz, cfg.relax_omega)

    def rung_body(cap, steps_n):
        def body(t, act, conv, res):
            state = march.MarchState(t=t, budget=jnp.ones_like(t), active=act > 0.5,
                                     converged=conv > 0.5, steps=jnp.int32(30))
            pr = renderer._pack_init(state, dirs)
            near = pr.active | pr.converged
            pr = renderer._pr_sort(pr, near, order=res)
            pr = pr._replace(active=near, converged=jnp.zeros_like(near))
            sub, dirs_b = renderer._pr_bucket(pr, cap, jnp.int32(30), cam_to_world, origin, cfg)
            sub = rung_kernel(sub, dirs_b, origin, cfg.march_eps,
                              jax.lax.Precision.HIGHEST,
                              None if steps_n == 0 else steps_n,
                              relax_omega=cfg.relax_omega_refine)
            return sub.t
        return body

    for div, steps_n in cfg.refine_schedule:
        cap = max(n // div, cfg.compact_min)
        bench(f"sort + rung div={div} steps={steps_n} (cap={cap})",
              chain(rung_body(cap, steps_n)), *cs, reps=args.reps, rtt=rtt)

    def sched_body(o, d):
        return renderer._scheduled_march.__wrapped__(
            params, cam_to_world, o, d, cfg, fz)[0].t

    bench("full _scheduled_march", chain(sched_body), origin, dirs,
          reps=args.reps, rtt=rtt)

    pr, steps, _, _, _ = renderer._scheduled_march(params, cam_to_world, origin, dirs, cfg, fz)

    def shade_body(t):
        p2 = pr._replace(t=t)
        return renderer._shade_packed(params, origin, cam_to_world, p2, steps,
                                      world_to_cam, cfg, None, fz,
                                      within=renderer._conv_within(cfg))[0].ravel()[:n]

    bench("packed shading + restore", chain(shade_body), pr.t,
          reps=args.reps, rtt=rtt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
