"""Wide-MLP performance on real TPU (round-4 VERDICT item 5).

Round 4 added `max_tile_for_width` so 64/128/256-wide hidden layers fit
the fused-chain VMEM budget, but only CPU parity tests ever ran. This
experiment, on the real chip, measures for each hidden width:

  * the in-kernel chain floor (ns/lane-step) at DEFAULT and HIGHEST,
    at the width's computed tile (`max_tile_for_width`), and
  * one 512² staged frame (random-init net: the frame exercises the
    whole scheduler at that width; absolute content is irrelevant),

and verifies the width-256 HIGHEST kernel actually compiles and runs at
its budgeted tile (the 3-buffer worst case the arithmetic promises).

Usage: python benchmarks/exp_width.py [--widths 32,64,128,256]
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
from cudaneuralrender_tpu.models import mlp
from cudaneuralrender_tpu.pallas.fused_mlp import max_tile_for_width

sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import roofline


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="32,64,128,256")
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    rtt = roofline._rtt()
    print(f"tunnel RTT ~ {rtt*1e3:.2f} ms", flush=True)
    print(f"{'width':>5} {'tile':>6} {'tile3p':>6} {'default':>9} "
          f"{'highest':>9} {'frame512':>10}", flush=True)

    for w in widths:
        sizes = (3,) + (w,) * 8 + (1,)
        params = mlp.init_mlp(jax.random.key(0), sizes)
        tile = max_tile_for_width(w)
        tile3 = max_tile_for_width(w, three_pass=True)
        r_def = roofline.measure_chain_rate(
            params, jax.lax.Precision.DEFAULT, tile=tile, rtt=rtt)
        r_hi = roofline.measure_chain_rate(
            params, jax.lax.Precision.HIGHEST, tile=tile, rtt=rtt)

        cfg = cnr.RenderConfig(width=args.res, height=args.res,
                               scene="neural_raw", max_steps=1500,
                               march_impl="staged", adaptive_rungs=False)
        cams = [cnr.Camera(rotation_y=25.0 + 30 * i, rotation_x=10.0)
                for i in range(8)]

        def sync(xs):
            return float(jnp.stack([x.sum() for x in xs]).sum())

        sync(cnr.render_sequence(params, cams, cfg, chunk=1))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            sync(cnr.render_sequence(params, cams, cfg, chunk=1))
            ts.append((time.perf_counter() - t0) / len(cams))
        frame_ms = min(ts) * 1e3
        print(f"{w:5d} {tile:6d} {tile3:6d} {r_def:9.3f} {r_hi:9.3f} "
              f"{frame_ms:10.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
