"""True per-step kernel costs, amortized over an in-jit scan loop (every
single-shot measurement over the axon tunnel carries a ~26 ms host-sync
floor — see exp_relax.py — so kernel choices must be made from looped
timings). Compares the XLA MLP chain vs the fused Pallas kernel per
precision at the staged schedule's real bucket sizes, plus march-step and
compaction overheads.
"""
from __future__ import annotations

import functools
import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.models import mlp
from cudaneuralrender_tpu.ops import compaction
from cudaneuralrender_tpu.pallas import fused_mlp

K = 32  # loop reps inside one jit


def timed(name, fn, *args, reps=3, k=K):
    out = fn(*args)
    s = float(jnp.sum(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    t = np.min(ts)
    print(f"{name:52s}: {t/k*1e3:8.3f} ms/step  (loop {t*1e3:8.1f} ms) sum={s:.2f}", flush=True)


def loop_mlp(params, precision):
    @jax.jit
    def f(p):
        def body(x, _):
            d = mlp.apply_scalar(params, x, precision=precision)
            return x * 0.999 + 0.001 * d[:, None], None
        out, _ = jax.lax.scan(body, p, None, length=K)
        return out
    return f


def loop_pallas(params, precision, tile):
    weights, biases, _, _ = fused_mlp.pack_params(params)

    @jax.jit
    def f(p):
        def body(x, _):
            d = fused_mlp.mlp_forward_pallas(
                weights, biases, x, tile=tile, precision=precision)
            return x * 0.999 + 0.001 * d[:, None], None
        out, _ = jax.lax.scan(body, p, None, length=K)
        return out
    return f


def main():
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    key = jax.random.key(0)

    for n in (2073600, 518400, 64800, 8192):
        pts = jax.random.uniform(key, (n, 3), jnp.float32, -1.0, 1.0)
        pts = jax.device_put(pts)
        print(f"--- N={n}", flush=True)
        for prec, pname in ((jax.lax.Precision.DEFAULT, "DEFAULT"),
                            (jax.lax.Precision.HIGH, "HIGH"),
                            (jax.lax.Precision.HIGHEST, "HIGHEST")):
            timed(f"xla chain {pname}", loop_mlp(params, prec), pts)
            if prec != jax.lax.Precision.HIGH:
                for tile in (2048, 8192):
                    if tile * 4 > n:
                        continue
                    timed(f"pallas fused {pname} tile={tile}",
                          loop_pallas(params, prec, tile), pts)

    # compaction cost in a loop
    n = 2073600
    mask = jax.random.bernoulli(key, 0.16, (n,))
    for cap in (n // 4, n // 8):
        @jax.jit
        def f(m, cap=cap):
            def body(c, _):
                idx, valid = compaction.compact_indices(m != (c > 0), cap)
                return c + jnp.sum(idx[:8]), None
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=K)
            return out
        timed(f"compact_indices 2M -> {cap}", f, mask)
    return 0


if __name__ == "__main__":
    sys.exit(main())
