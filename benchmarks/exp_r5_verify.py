"""Verify the chained-timing protocol: K=1 vs K=8 full-frame chains, with
output checks (hit counts must match a plain render)."""
import os as _os, sys, time
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.render import renderer

params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
cfg = cnr.RenderConfig(width=1920, height=1080, scene="neural_raw",
                       max_steps=6000, march_impl="staged", adaptive_rungs=False)
cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
c2w, w2c = camera_lib.view_matrices(cam)
origin, dirs = camera_lib.generate_rays(c2w, 1080, 1920, cfg.focal)
fz = jnp.float32(0.0)

def mk(K):
    @jax.jit
    def run(o, d):
        pr, steps, _w, _ovf, _r = renderer._scheduled_march.__wrapped__(params, c2w, o, d, cfg, fz)
        hits = jnp.sum(pr.converged.astype(jnp.int32))
        out = pr.t
        for _ in range(K - 1):
            acc = jnp.sum(out) * 1e-30
            pr, steps, _w, _ovf, _r = renderer._scheduled_march.__wrapped__(params, c2w, o, d + acc, cfg, fz)
            hits = hits + jnp.sum(pr.converged.astype(jnp.int32))
            out = pr.t
        return out, hits
    return run

for K in (1, 2, 8):
    run = mk(K)
    o = run(origin, dirs); jax.block_until_ready(o)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        t, h = run(origin, dirs)
        float(jnp.sum(t)); hv = int(h)
        ts.append(time.perf_counter() - t0)
    print(f"K={K}: median {np.median(ts)*1e3:8.2f} ms  hits_total={hv} (per-frame {hv//K})", flush=True)

# ground truth: plain staged render hit count
st = {}
renderer.render_staged(params, cam, cfg, stats_out=st)
print("plain render stats:", st, flush=True)
