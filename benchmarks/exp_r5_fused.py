"""Fused multi-frame dispatch: K DISTINCT-camera frames in ONE program.

exp_r5_verify's identical-frame chains gave inconsistent marginals
(K=2 -> 36.6 ms/frame, K=8 -> 4.7 — the compiler can do unknowable
things with value-identical links). Here every link is a REAL different
turntable pose (distinct cam_to_world enters ray gen), so the measured
marginal is the honest per-frame device cost of the fused program —
and the fused program IS the proposed production turntable mode.
"""
import os as _os, sys, time
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.render import renderer

params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
cfg = cnr.RenderConfig(width=1920, height=1080, scene="neural_raw",
                       max_steps=6000, march_impl="staged", adaptive_rungs=False)
H, W = 1080, 1920
fz = jnp.float32(0.0)

def mk(K, shade=False):
    cams = [cnr.Camera(rotation_y=25.0 + 20.0 * i, rotation_x=10.0) for i in range(K)]
    mats = [camera_lib.view_matrices(c) for c in cams]

    @jax.jit
    def run():
        hits = jnp.zeros((), jnp.int32)
        acc = jnp.zeros((), jnp.float32)
        for c2w, w2c in mats:
            origin, dirs = camera_lib.generate_rays(c2w, H, W, cfg.focal)
            pr, steps, _w, _ovf, _r = renderer._scheduled_march.__wrapped__(
                params, c2w, origin, dirs + acc * 1e-30, cfg, fz)
            if shade:
                rgba, pr, _hc = renderer._shade_packed(
                    params, origin, c2w, pr, steps, w2c, cfg, None, fz,
                    within=renderer._conv_within(cfg))
                acc = acc + jnp.sum(rgba[::997, 0])
            else:
                acc = acc + jnp.sum(pr.t[::997])
            hits = hits + jnp.sum(pr.converged.astype(jnp.int32))
        return acc, hits
    return run

for shade in (False, True):
    label = "march+shade" if shade else "march-only "
    prev = None
    for K in (1, 2, 4, 8):
        run = mk(K, shade)
        jax.block_until_ready(run())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            a, h = run(); float(a); hv = int(h)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        marg = (med - prev) / (K - Kprev) * 1e3 if prev is not None else float('nan')
        print(f"{label} K={K}: median {med*1e3:8.2f} ms  per-frame-marginal {marg:7.2f} ms  hits={hv}", flush=True)
        prev, Kprev = med, K
