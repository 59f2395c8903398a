"""Coarse-kernel lane-order sweep: 2D block-major vs image (row) order.

Row-segment tiles (~4 full rows at 1080p) almost all straddle the object;
2D blocks let pure-sky blocks early-exit. Measured: image order 42.0,
64x128 42.3, 32x256 41.1, 128x128..256x256 ~42.4-42.7 Mrays/s -> ~+1.5%,
bit-identical per-ray results. Default: (128,128).
"""
import os as _os
import sys, time
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax.numpy as jnp
import numpy as np
import cudaneuralrender_tpu as cnr

w, h = 1920, 1080
params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
cams = [cnr.Camera(rotation_y=25.0 + 20 * i, rotation_x=10.0) for i in range(8)]
base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000, march_impl="staged")
def sync(xs):
    return float(jnp.stack([x.sum() for x in xs]).sum())
for name, cfg in [("block 128x128", base.replace(coarse_block=(128, 128))),
                  ("block 256x128", base.replace(coarse_block=(256, 128))),
                  ("block 128x256", base.replace(coarse_block=(128, 256))),
                  ("block 256x256", base.replace(coarse_block=(256, 256)))]:
    sync(cnr.render_sequence(params, cams[:1], cfg))
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        sync(cnr.render_sequence(params, cams, cfg))
        times.append((time.perf_counter() - t0) / len(cams))
    ms = np.min(times) * 1e3
    print(f"{name:16s}: {ms:7.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f} Mrays/s", flush=True)
