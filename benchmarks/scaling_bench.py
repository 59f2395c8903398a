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


def time_render(params, cam, cfg, mesh, reps: int, staged: bool = False) -> float:
    from cudaneuralrender_tpu.parallel.sharding import (
        render_image_sharded_staged,
    )

    def run():
        if staged:
            img = render_image_sharded_staged(params, cam, cfg, mesh)
        else:
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


def run_multihost(args) -> int:
    """Spawn N local processes with a localhost coordinator and time the
    cross-process global-SPMD render (parallel/multihost.py). Overhead
    scaling only on CPU (host cores timeshare), but it exercises the REAL
    multi-host code path: jax.distributed handshake, cross-process mesh,
    Gloo-coordinated collectives, per-host tile extraction."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, _os.path.abspath(__file__),
             "--_worker", f"localhost:{port}", str(args.multihost), str(pid),
             "--res", args.res, "--steps", str(args.steps),
             "--reps", str(args.reps), "--model", args.model],
            cwd=repo, env=env,
        )
        for pid in range(args.multihost)
    ]
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


def run_multihost_worker(coordinator: str, nprocs: int, pid: int) -> int:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cudaneuralrender_tpu.parallel import multihost

    multihost.initialize(coordinator, nprocs, pid)

    import numpy as np

    import cudaneuralrender_tpu as cnr

    ap = argparse.ArgumentParser()
    ap.add_argument("--_worker", nargs=3)
    ap.add_argument("--res", default="512x512")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--model")
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    params = cnr.load(args.model)
    n_dev = jax.device_count()
    cfg = cnr.RenderConfig(width=w, height=(h // n_dev) * n_dev,
                           scene="neural_raw", max_steps=args.steps)
    cam = cnr.Camera(rotation_y=30.0, rotation_x=10.0)
    mesh = multihost.global_mesh()

    def run():
        img = multihost.render_global(params, cam, cfg, mesh)
        # per-host drain: each process syncs only its own tiles (no gather)
        return multihost.local_tiles(img)

    run(); run()  # compile + warm
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    if pid == 0:
        rays_s = cfg.num_rays / dt
        print(
            f"multihost processes={nprocs} devices={n_dev}: "
            f"{dt*1e3:9.1f} ms/frame  {rays_s/1e6:8.2f} Mrays/s "
            f"(virtual-CPU overhead scaling; same code path as real hosts)",
            flush=True,
        )
    return 0


def main() -> int:
    if "--_worker" in sys.argv:
        i = sys.argv.index("--_worker")
        coord, nprocs, pid = sys.argv[i + 1:i + 4]
        return run_multihost_worker(coord, int(nprocs), int(pid))
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="512x512")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--model", default="/root/reference/neuralGeometries/plane_1.h5")
    ap.add_argument("--cpu", type=int, default=None,
                    help="force CPU platform with N virtual devices")
    ap.add_argument("--staged", action="store_true",
                    help="drive the STAGED sharded fast path "
                         "(render_image_sharded_staged) instead of the "
                         "dense march; on the CPU backend the Pallas "
                         "megakernel phases are disabled (interpret mode "
                         "would dominate) — XLA rungs exercise the same "
                         "scheduler")
    ap.add_argument("--multihost", type=int, default=None,
                    help="spawn N local processes (4 virtual CPU devices "
                         "each, localhost coordinator) and measure the "
                         "cross-process global-SPMD render")
    args = ap.parse_args()

    if args.multihost:
        return run_multihost(args)

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
        kw = {}
        if args.staged:
            kw = dict(march_impl="staged")
            if jax.default_backend() == "cpu":
                kw.update(coarse_pallas=False, refine_pallas=False,
                          tail_pallas=False)
        cfg = cnr.RenderConfig(
            width=w, height=(h // n) * n, scene="neural_raw",
            max_steps=args.steps, **kw,
        )
        mesh = mesh_lib.make_mesh((n, 1), ("data", "model"), devices[:n])
        dt = time_render(params, cam, cfg, mesh, args.reps, staged=args.staged)
        rays_s = cfg.num_rays / dt
        if base is None:
            base = rays_s
        eff = rays_s / (base * n)
        extra = ""
        if args.staged and n > 1:
            # Measured per-shard load balance (round-4 VERDICT item 2):
            # wall-time efficiency on TIMESHARED virtual CPUs is
            # meaningless, but the per-shard work distribution is exact —
            # a sharded frame finishes with its slowest shard, so
            # mean/max of per-shard scheduled refine work is the predicted
            # real-mesh scaling efficiency (parallel.shard_load_stats).
            st: dict = {}
            from cudaneuralrender_tpu.parallel.sharding import (
                render_image_sharded_staged,
            )

            render_image_sharded_staged(params, cam, cfg, mesh, stats_out=st)
            pred = st.get("predicted_scaling_efficiency")
            imb = st.get("shard_imbalance")
            if pred is not None:
                extra = (f"  shard-imbalance={imb*100:5.1f}%  "
                         f"predicted-efficiency={pred*100:5.1f}%")
        print(
            f"devices={n:3d}: {dt*1e3:9.1f} ms/frame  {rays_s/1e6:8.2f} Mrays/s  "
            f"wall-efficiency={eff*100:5.1f}%{extra}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
