"""Coarse megakernel tile/block sweep: straggler-drag granularity.

The coarse phase runs ~13 ms against a 5.1 ms useful-lane-step floor
(roofline table): per-TILE early exit means one silhouette straggler
drags its whole tile through the deep part of the coarse march.
exp_blockorder swept the block SHAPE (>=128x128) and exp_rung0 the
REFINE rung tile, but the coarse tile itself has been pinned at 8192
since the kernel landed. Smaller tiles confine straggler drag to fewer
lanes; larger ones amortize per-tile fixed costs (sequential grid ramp,
state DMA). This sweep measures the coarse phase ALONE (run-to-dry to
coarse_eps, DEFAULT precision, block-major lane order exactly as
_scheduled_march builds it) across (coarse_block, tile) at 1080p.

RESULT (TPU v5e, plane_1, ry=25/65 mean): FLAT from 64x64/4096 through
256x256/16384 — 30.6 ms each; the 64x64/2048 config measured +3 ms.
Each frame here pays one ~26 ms tunnel RTT (single-frame sync; only
deltas matter), so device time is ~4.6 ms/frame — which also means
per-config deltas below ~1 ms are inside the sync-noise floor of this
protocol; the "flat" claim is at that resolution, and `--chain N`
(added after review) folds N marches into one sync so deltas resolve
against device time instead. The coarse kernel runs at its ~5.1 ms
useful-lane-step floor and straggler drag is noise at coarse_eps=0.05.
The "13 ms coarse" in the end-to-end ablation breakdown is dispatch +
ray build + init shares, not kernel waste. No lever here;
128x128/8192 stays.
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
from cudaneuralrender_tpu.ops import camera as camera_lib, march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.render import renderer


@jax.jit
def _sync_val(out):
    return jnp.stack(
        [jnp.sum(l).astype(jnp.float32) for l in jax.tree_util.tree_leaves(out)]
    ).sum()


def main():
    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    cams = [cnr.Camera(rotation_y=ry, rotation_x=10.0) for ry in (25.0, 65.0)]
    mats = [camera_lib.view_matrices(c)[0] for c in cams]

    combos = [
        ((64, 64), 2048),
        ((64, 64), 4096),
        ((128, 128), 4096),
        ((128, 128), 8192),   # shipped
        ((128, 128), 16384),
        ((256, 256), 16384),
    ]
    for block, tile in combos:
        bh, bw = block
        pos0 = jnp.asarray(renderer._block_order_np(h, w, bh, bw))

        def coarse(c2w, pos0=pos0, tile=tile):
            dirs = camera_lib.ray_dirs_from_index(c2w, pos0, h, w, cfg.focal)
            origin = c2w[:3, 3]
            st = march.init_state(origin, dirs, cfg.bound_center, cfg.bound_radius)
            return megakernel.march_pallas_state(
                params, origin, dirs, st, cfg, 0.0, tile=tile,
                march_eps=cfg.coarse_eps,
                precision=jax.lax.Precision.DEFAULT,
                relax_omega=cfg.relax_omega, return_resolve=True,
                cyl_window=cfg.cyl_window_coarse)  # mirror the shipped
            # coarse invocation exactly (renderer._scheduled_march) — a
            # no-op for scene="neural_raw", but required if this sweep is
            # ever reused for the CSG scenes

        coarse = jax.jit(coarse)
        chain = int(sys.argv[sys.argv.index("--chain") + 1]) if "--chain" in sys.argv else 1
        for c2w in mats:  # warm both cameras
            float(_sync_val(coarse(c2w)))
        ts = []
        for _ in range(4):
            # `--chain N` dispatches N marches per camera and syncs ONCE, so
            # the ~26 ms tunnel RTT amortizes and sub-ms per-config deltas
            # resolve against device time (advisor round-4 note).
            t0 = time.perf_counter()
            vals = [coarse(c2w) for c2w in mats for _ in range(chain)]
            float(jnp.stack([_sync_val(v) for v in vals]).sum())
            ts.append((time.perf_counter() - t0) / (len(mats) * chain))
        st, resolve = coarse(mats[0])
        lanesteps = float(jnp.sum(resolve))
        print(f"block {bh:3d}x{bw:3d} tile {tile:5d}: "
              f"{np.min(ts)*1e3:7.2f} ms/frame (median {np.median(ts)*1e3:7.2f}) "
              f"resolve-sum {lanesteps/1e6:6.1f}M", flush=True)


if __name__ == "__main__":
    main()
