"""Batched-inference benchmark + correctness harness.

TPU-native equivalent of the reference's `simpleInfer` binary
(src/simpleInfer.cpp:81-194):

  * ``single``  — N sequential single-point inferences, per-call latency
    (singleTest, simpleInfer.cpp:81-110; prints tanh(y) for the zero point
    like the reference's eyeball check at :109).
  * ``batch``   — one B-point batch (default 1,000,000 like main at :186-193)
    through the 9-layer chain, wall-clock ms, plus the reference's
    correctness check: identical inputs must produce bit-identical outputs
    (batchTest verification, simpleInfer.cpp:135-146).
  * ``sweep``   — batch-size sweep to expose the points/s roofline, including
    the Pallas fused-chain variant (the CUTLASS-batched-GEMM analogue).

Usage: python benchmarks/infer_bench.py [--batch 1000000] [--model ...]
"""
from __future__ import annotations

import argparse
import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.models import mlp
from cudaneuralrender_tpu.pallas import fused_mlp


def _sync(x) -> float:
    return float(jnp.sum(x))


def single_test(params, n: int = 100) -> None:
    f = jax.jit(lambda p: mlp.apply_scalar(params, p))
    x = jnp.zeros((1, 3), jnp.float32)
    y = f(x)  # compile
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(f(x))
    dt = (time.perf_counter() - t0) / n
    print(f"single inference: {dt*1e3:.3f} ms/call over {n} calls "
          f"(round-trip incl. host sync); tanh(y[0]) = {float(jnp.tanh(y[0])):.6f}",
          flush=True)


def batch_test(params, batch: int, verify: bool = True, pallas: bool = False) -> float:
    if pallas:
        w, b, _, _ = fused_mlp.pack_params(params)
        f = jax.jit(lambda x: fused_mlp.mlp_forward_pallas(w, b, x))
    else:
        f = jax.jit(lambda x: mlp.apply_scalar(params, x))
    x = jnp.zeros((batch, 3), jnp.float32)
    y = f(x)
    _sync(y)  # compile + warm
    t0 = time.perf_counter()
    y = f(x)
    _sync(y)
    dt = time.perf_counter() - t0
    tag = "pallas" if pallas else "xla"
    print(f"batch inference [{tag}]: {batch} points in {dt*1e3:.2f} ms "
          f"({batch/dt/1e6:.1f} Mpoints/s)", flush=True)
    if verify:
        vals = np.asarray(y)
        ok = bool(np.all(vals == vals[0]))
        print(f"verification ({'PASS' if ok else 'FAIL'}): all {batch} outputs "
              f"{'bit-identical' if ok else 'DIFFER'}; y = {vals[0]:.6f}", flush=True)
        if not ok:
            raise SystemExit(1)
    return dt


def sweep(params) -> None:
    for b in (1 << 14, 1 << 17, 1 << 20, 1 << 22):
        batch_test(params, b, verify=False)
        batch_test(params, b, verify=False, pallas=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/root/reference/neuralGeometries/plane_1.h5")
    ap.add_argument("--batch", type=int, default=1_000_000)
    ap.add_argument("--mode", choices=("single", "batch", "sweep", "all"), default="all")
    args = ap.parse_args()

    params = cnr.load(args.model)
    print(f"model: {args.model} ({mlp.num_params(params)} params)", flush=True)
    if args.mode in ("single", "all"):
        single_test(params)
    if args.mode in ("batch", "all"):
        batch_test(params, args.batch, verify=True)
    if args.mode == "sweep":
        sweep(params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
