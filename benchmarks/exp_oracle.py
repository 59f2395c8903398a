"""Oracle test for difficulty-ordered refine packing.

The bounded refine rungs' waste is converged lanes idling until the tile's
fixed step bound; per-tile early exit can only recover it if slow lanes
cluster into few tiles. The coarse-resolve-step key measured NEUTRAL
end-to-end (exp_breakdown2) — is the key weak, or can NO ordering help
(tiles rarely dry inside the bound, exp_rung0)? Upper-bound check: sort
rung 1's bucket by each lane's TRUE refine resolve step (recorded from a
prior identical run) and time the rung. If the oracle is also neutral,
ordering is a dead end for bounded rungs and the resolve-tracking cost can
be dropped from the coarse kernel.
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
from cudaneuralrender_tpu.ops import compaction, march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.pallas.fused_mlp import should_interpret
from cudaneuralrender_tpu.render import renderer

K = 8
REPS = 5


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                           march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, _ = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
    fz = jnp.float32(0.0)
    cap = max(n // cfg.refine_schedule[0][0], cfg.compact_min)
    steps0 = cfg.refine_schedule[0][1]

    # --- coarse once, with the current resolve key
    @jax.jit
    def coarse(o, d):
        st = march.init_state(o, d, cfg.bound_center, cfg.bound_radius)
        st, res = megakernel.march_pallas_state(
            params, o, d, st, cfg, fz, tile=8192,
            march_eps=cfg.coarse_eps, precision=jax.lax.Precision.DEFAULT,
            relax_omega=cfg.relax_omega, interpret=should_interpret(),
            return_resolve=True,
        )
        return st.t, st.budget, st.active, st.converged, res

    t0, budget0, act0, conv0, res0 = coarse(origin, dirs)
    near = act0 | conv0
    print("near set:", int(jnp.sum(near)), "bucket cap:", cap, flush=True)

    # Entry-sorted base bundle (difficulty = coarse resolve, the default)
    def entry(order):
        pos, t, budget = compaction.sort_pack_leaves(
            near, (jnp.arange(n, dtype=jnp.int32), t0, budget0), order=order)
        lane = jnp.arange(n, dtype=jnp.int32)
        count = jnp.sum(near.astype(jnp.int32))
        return pos, t, budget, lane < count

    def run_rung(pos, t, budget, active):
        sub = march.MarchState(
            t=t[:cap], budget=budget[:cap], active=active[:cap],
            converged=jnp.zeros((cap,), bool), steps=jnp.int32(30))
        dirs_b = camera_lib.ray_dirs_from_index(cam_to_world, pos[:cap], h, w, cfg.focal)
        return megakernel.march_pallas_state(
            params, origin, dirs_b, sub, cfg, fz, tile=8192,
            march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
            num_steps=steps0, interpret=should_interpret(),
            return_resolve=True,
        )

    # Oracle key: the TRUE resolve step of each bucket lane, recorded once
    # from the default-ordered run, mapped back to image-order lanes.
    pos_d, t_d, b_d, a_d = entry(res0)
    _, oracle_bucket = jax.jit(run_rung)(pos_d, t_d, b_d, a_d)
    oracle_img = jnp.zeros((n,), jnp.float32).at[pos_d[:cap]].set(oracle_bucket)

    noop = jax.jit(lambda x: x + 1.0)
    noop(fz)
    ts = []
    for _ in range(REPS):
        s = time.perf_counter()
        float(jnp.sum(noop(fz)))
        ts.append(time.perf_counter() - s)
    rtt = float(np.median(ts))
    print(f"RTT ~ {rtt*1e3:.2f} ms", flush=True)

    def timed(name, order):
        def body(t, budget):
            pos, tt, bb = compaction.sort_pack_leaves(
                near, (jnp.arange(n, dtype=jnp.int32), t, budget), order=order)
            lane = jnp.arange(n, dtype=jnp.int32)
            active = lane < jnp.sum(near.astype(jnp.int32))
            st = run_rung(pos, tt, bb, active)[0]
            return st.t

        @jax.jit
        def chain(t, budget):
            out = body(t, budget)
            for _ in range(K - 1):
                out = body(t + jnp.sum(out) * 1e-30, budget)
            return out

        float(jnp.sum(chain(t0, budget0)))
        ts = []
        for _ in range(REPS):
            s = time.perf_counter()
            float(jnp.sum(chain(t0, budget0)))
            ts.append(time.perf_counter() - s)
        med = float(np.median(ts))
        print(f"{name:40s}: ~{max(med-rtt,0)/K*1e3:7.2f} ms device/run", flush=True)

    timed("rung1, image order (no key)", None)
    timed("rung1, coarse-resolve key (default)", res0)
    timed("rung1, ORACLE key (true resolve step)", oracle_img)
    # Tile-size interplay: finer tiles + oracle ordering
    return 0


if __name__ == "__main__":
    sys.exit(main())
