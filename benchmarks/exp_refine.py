"""One-off TPU experiments: refine-phase strategy + tail megakernel.

Questions:
  1. Is Precision.HIGH (3-pass bf16) numerically safe for the fine march?
  2. Refine-phase cost vs bucket size and precision.
  3. Deep-straggler tail: XLA small-batch while_loop vs Pallas megakernel.
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
from cudaneuralrender_tpu.models import mlp
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import compaction, march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.render import renderer

P = jax.lax.Precision


def timed(name, fn, *args, reps=4, **kw):
    out = fn(*args, **kw)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s}: {np.median(ts)*1e3:9.2f} ms (min {np.min(ts)*1e3:8.2f}) sum={s:.2f}", flush=True)
    return out


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                           march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, _ = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)

    # ---- 1. precision accuracy --------------------------------------------
    key = jax.random.key(0)
    pts = jax.random.uniform(key, (200_000, 3), minval=-1.1, maxval=1.1)
    f = jax.jit(lambda p, prec: mlp.apply_scalar(params, p, precision=prec),
                static_argnames="prec")
    y_hst = np.asarray(f(pts, P.HIGHEST))
    for prec in (P.HIGH, P.DEFAULT):
        d = np.abs(np.asarray(f(pts, prec)) - y_hst)
        print(f"precision {prec}: max|d|={d.max():.3e} mean={d.mean():.3e}", flush=True)

    # ---- 2. coarse march to get a realistic refine-input state -------------
    @jax.jit
    def coarse(o, d):
        fdef = renderer.scene_fn(params, cfg, 0.0, precision=P.DEFAULT)
        st = march.init_state(o, d, cfg.bound_center, cfg.bound_radius)
        st = march.march_stage(fdef, o, d, st, num_steps=16, max_steps=6000,
                               march_eps=cfg.coarse_eps)
        idx, valid = compaction.compact_indices(st.active, n // 4)
        sub = march.MarchState(st.t[idx], st.budget[idx], st.active[idx] & valid,
                               st.converged[idx] & valid, st.steps)
        sub = march.march_stage(fdef, o, d[idx], sub, num_steps=496, max_steps=6000,
                                march_eps=cfg.coarse_eps)
        t, budget, active, convg = compaction.scatter_state(
            (st.t, st.budget, st.active, st.converged),
            (sub.t, sub.budget, sub.active, sub.converged), idx, valid)
        return march.MarchState(t, budget, active, convg, sub.steps)

    st = timed("coarse: 16 dense + n/4 x 496 @DEFAULT", coarse, origin, dirs)
    st = jax.block_until_ready(st)
    refine_mask = np.asarray(st.converged | st.active)
    print(f"coarse done: active={int(np.asarray(st.active).sum())} "
          f"conv={int(np.asarray(st.converged).sum())} refine={refine_mask.sum()} "
          f"steps={int(st.steps)}", flush=True)

    # ---- 3. refine variants ------------------------------------------------
    def make_refine(div, prec, ladder=None):
        cap = n // div

        @jax.jit
        def run(st):
            fin = renderer.scene_fn(params, cfg, 0.0, precision=prec)
            refine = st.converged | st.active
            idx, valid = compaction.compact_indices(refine, cap)
            sub = march.MarchState(st.t[idx], st.budget[idx], refine[idx] & valid,
                                   jnp.zeros((cap,), bool), st.steps)
            if ladder:
                sub = march.march_stage(fin, origin, dirs[idx], sub,
                                        num_steps=ladder, max_steps=6000,
                                        march_eps=cfg.march_eps)
                idx2, valid2 = compaction.compact_indices(sub.active, cap // 8)
                sub2 = march.MarchState(sub.t[idx2], sub.budget[idx2],
                                        sub.active[idx2] & valid2,
                                        sub.converged[idx2] & valid2, sub.steps)
                sub2 = march.march_stage(fin, origin, dirs[idx][idx2], sub2,
                                        num_steps=6000, max_steps=6000,
                                        march_eps=cfg.march_eps)
                t, b, a, c = compaction.scatter_state(
                    (sub.t, sub.budget, sub.active, sub.converged),
                    (sub2.t, sub2.budget, sub2.active, sub2.converged), idx2, valid2)
                sub = march.MarchState(t, b, a, c, sub2.steps)
            else:
                sub = march.march_stage(fin, origin, dirs[idx], sub,
                                        num_steps=6000, max_steps=6000,
                                        march_eps=cfg.march_eps)
            return sub.t, sub.steps, jnp.sum(sub.active.astype(jnp.int32)), jnp.sum(sub.converged.astype(jnp.int32))

        return run

    for name, div, prec, ladder in (
        ("refine n/4  HIGHEST (current)", 4, P.HIGHEST, None),
        ("refine n/16 HIGHEST", 16, P.HIGHEST, None),
        ("refine n/16 HIGH", 16, P.HIGH, None),
        ("refine n/16 HIGH ladder32->/128", 16, P.HIGH, 32),
    ):
        out = timed(name, make_refine(div, prec, ladder), st)
        print(f"    -> steps={int(out[1])} still_active={int(out[2])} conv={int(out[3])}", flush=True)

    # ---- 4. deep tail: XLA vs megakernel ----------------------------------
    # Fabricate a deep-tail state: the rays still active after coarse.
    tail_cap = 8192

    @jax.jit
    def tail_xla(st):
        fin = renderer.scene_fn(params, cfg, 0.0, precision=P.HIGH)
        idx, valid = compaction.compact_indices(st.active, tail_cap)
        sub = march.MarchState(st.t[idx], st.budget[idx], st.active[idx] & valid,
                               st.converged[idx] & valid, st.steps)
        sub = march.march_stage(fin, origin, dirs[idx], sub, num_steps=6000,
                                max_steps=6000, march_eps=cfg.march_eps)
        return sub.t, sub.steps, jnp.sum(sub.active.astype(jnp.int32))

    out = timed("tail XLA n=8192 while-loop @HIGH", tail_xla, st)
    print(f"    -> steps={int(out[1])} still_active={int(out[2])}", flush=True)

    @jax.jit
    def tail_mk(st):
        idx, valid = compaction.compact_indices(st.active, tail_cap)
        sub = march.MarchState(st.t[idx], st.budget[idx], st.active[idx] & valid,
                               st.converged[idx] & valid, st.steps)
        out = megakernel.march_pallas_state(
            params, origin, dirs[idx], sub, cfg, 0.0, tile=tail_cap,
            precision=P.HIGH)
        return out.t, out.steps, jnp.sum(out.active.astype(jnp.int32)), jnp.sum(out.converged.astype(jnp.int32))

    out = timed("tail megakernel n=8192 @HIGH", tail_mk, st)
    print(f"    -> still_active={int(out[2])} conv={int(out[3])}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
