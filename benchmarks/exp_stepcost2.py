"""Close the bare-loop vs production-kernel chain gap (round-4, VERDICT #2).

exp_blockdiag's bare dot loop runs ~1.3 ns/lane-step at HIGHEST; the
production megakernel's chain floor is 2.35-2.37 (exp_stepcost,
roofline.py). DEFAULT shows almost no such gap (0.386 bare vs ~0.42-0.46).
This ablation walks from the bare loop to the production chain one feature
at a time to find where the HIGHEST nanosecond goes:

  v0  bare: x carried in registers, ONE [32,32] weight, fori(reps) dots
  v1  9 distinct weights read from the stacked [9,32,32] VMEM ref per layer
  v1h 9 distinct weights hoisted to kernel-locals before the loop
  v2  + bias & ReLU per layer (the real chain arithmetic)
  v3  + per-step x rebuild from t via concat([pts, zeros]) (production)
  v3d + per-step x rebuild via dynamic_update_slice into a carried buffer
  v4  + while_loop(step<steps) instead of fori              (production)
  v5  6-pass f32 emulation with PRE-SPLIT (hi,mid,lo) bf16 weights — can a
      hand scheme beat Mosaic's native HIGHEST in kernel context?

All variants run the same total lane-steps (2M lanes x 64 steps x 9
layers), K-chained programs per timing to amortize tunnel RTT.
"""
from __future__ import annotations

import functools
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.pallas.fused_mlp import pack_params

K = 4
STEPS = 64
DN = (((0,), (0,)), ((), ()))


def split3(w):
    """Three-term bf16 decomposition: w ~ hi + mid + lo (~24 mantissa bits)."""
    hi = w.astype(jnp.bfloat16)
    r = w - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def make_kernel(variant, n_layers, hidden, steps, precision):
    def dot(w, x):
        return jax.lax.dot_general(
            w, x, dimension_numbers=DN, precision=precision,
            preferred_element_type=jnp.float32)

    def kern(dirs_ref, t0_ref, origin_ref, *refs):
        # refs = (weights, biases, *extra_split_weights, t_out)
        w_ref, b_ref, t_out = refs[0], refs[1], refs[-1]
        split_refs = refs[2:-1]
        dirs = dirs_ref[:]
        origin = origin_ref[:]
        T = dirs.shape[1]
        pad = hidden - 3

        if variant == "v0":
            w = w_ref[0]

            def body(i, x):
                return dot(w, x)

            x0 = jnp.concatenate(
                [origin + dirs * t0_ref[:], jnp.zeros((pad, T), jnp.float32)], 0)
            y = jax.lax.fori_loop(0, steps * n_layers, body, x0)
            t_out[:] = y[0:1, :]
            return

        if variant in ("v1", "v1h", "v2"):
            if variant == "v1h":
                ws = [w_ref[l] for l in range(n_layers)]
            x0 = jnp.concatenate(
                [origin + dirs * t0_ref[:], jnp.zeros((pad, T), jnp.float32)], 0)

            def body(i, x):
                for l in range(n_layers):
                    w = ws[l] if variant == "v1h" else w_ref[l]
                    y = dot(w, x)
                    if variant == "v2":
                        y = y + b_ref[l][:, None]
                        if l + 1 < n_layers:
                            y = jnp.maximum(y, 0.0)
                    x = y
                # keep shape/liveness: fold row0 back so the chain cannot be
                # dead-code'd and x stays bounded
                return x * 1e-8

            y = jax.lax.fori_loop(0, steps, body, x0)
            t_out[:] = y[0:1, :]
            return

        # chain with bias/relu used by v3/v3d/v4/v5
        if variant == "v5":
            w3 = [tuple(r[l] for r in split_refs) for l in range(n_layers)]

        def chain(x):
            for l in range(n_layers):
                if variant == "v5":
                    whi, wmid, wlo = w3[l]
                    x_hi = x.astype(jnp.bfloat16)
                    r = x - x_hi.astype(jnp.float32)
                    x_mid = r.astype(jnp.bfloat16)
                    y = jax.lax.dot_general(
                        whi, x_hi, DN, preferred_element_type=jnp.float32)
                    y += jax.lax.dot_general(
                        whi, x_mid, DN, preferred_element_type=jnp.float32)
                    y += jax.lax.dot_general(
                        wmid, x_hi, DN, preferred_element_type=jnp.float32)
                    y += jax.lax.dot_general(
                        wmid, x_mid, DN, preferred_element_type=jnp.float32)
                    y += jax.lax.dot_general(
                        wlo, x_hi, DN, preferred_element_type=jnp.float32)
                    y += jax.lax.dot_general(
                        whi, (r - x_mid.astype(jnp.float32)).astype(jnp.bfloat16),
                        DN, preferred_element_type=jnp.float32)
                else:
                    y = dot(w_ref[l], x)
                y = y + b_ref[l][:, None]
                if l + 1 < n_layers:
                    y = jnp.maximum(y, 0.0)
                x = y
            return x[0:1, :]

        def sdf_concat(t):
            pts = origin + dirs * t
            x = jnp.concatenate([pts, jnp.zeros((pad, T), jnp.float32)], 0)
            return chain(x)

        zbuf = jnp.zeros((hidden, T), jnp.float32)

        def sdf_dus(t):
            pts = origin + dirs * t
            x = jax.lax.dynamic_update_slice(zbuf, pts, (0, 0))
            return chain(x)

        sdf = sdf_dus if variant == "v3d" else sdf_concat

        if variant == "v4":
            def body(c):
                step, t = c
                return step + 1, t + sdf(t) * 1e-8

            _, t = jax.lax.while_loop(lambda c: c[0] < steps, body,
                                      (0, t0_ref[:]))
        else:
            def body(i, t):
                return t + sdf(t) * 1e-8

            t = jax.lax.fori_loop(0, steps, body, t0_ref[:])
        t_out[:] = t

    return kern


def run_variant(name, variant, weights, biases, dirs_t, t0, origin, tile,
                precision, rtt, reps=5):
    n_layers, hidden = weights.shape[0], weights.shape[1]
    n = dirs_t.shape[1]
    n_tiles = n // tile
    extra = ()
    if variant == "v5":
        extra = split3(weights)
    kern = make_kernel(variant, n_layers, hidden, STEPS, precision)
    row = lambda: pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    def call(d, t):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                row(),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(extra)),
            out_specs=row(),
        )(d, t, origin, weights, biases, *extra)

    @jax.jit
    def chain_prog(d, t):
        out = call(d, t)
        for _ in range(K - 1):
            out = call(d, t + jnp.sum(out) * 1e-30)
        return out

    float(jnp.sum(chain_prog(dirs_t, t0)))
    ts = []
    for _ in range(reps):
        s = time.perf_counter()
        float(jnp.sum(chain_prog(dirs_t, t0)))
        ts.append(time.perf_counter() - s)
    med = max(float(np.median(ts)) - rtt, 0.0) / K
    per = med / (n * STEPS) * 1e9
    print(f"{name:52s}: {med*1e3:7.2f} ms -> {per:6.3f} ns/lane-step",
          flush=True)
    return per


def main():
    n = 2 ** 21
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    weights, biases, n_in, hidden = pack_params(params)
    key = jax.random.PRNGKey(0)
    dirs_t = jax.random.normal(key, (3, n), jnp.float32) * 0.1
    t0 = jnp.full((1, n), 0.8, jnp.float32)
    origin_c = jnp.asarray([[0.0], [0.0], [-2.0]], jnp.float32)

    noop = jax.jit(lambda x: x + 1.0)
    float(noop(jnp.float32(0)))
    ts = []
    for _ in range(5):
        s = time.perf_counter()
        float(jnp.sum(noop(jnp.float32(0))))
        ts.append(time.perf_counter() - s)
    rtt = float(np.median(ts))
    print(f"RTT ~ {rtt*1e3:.2f} ms; {n} lanes x {STEPS} steps x 9 layers, "
          f"K={K}", flush=True)

    HI, DEF = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT
    for prec, tag in ((HI, "HIGHEST"), (DEF, "DEFAULT")):
        print(f"[{tag}] tile=8192", flush=True)
        for v in ("v0", "v1", "v1h", "v2", "v3", "v3d", "v4"):
            run_variant(f"  {v}", v, weights, biases, dirs_t, t0, origin_c,
                        8192, prec, rtt)
    print("[6-pass emulation, pre-split weights] tile=8192", flush=True)
    run_variant("  v5 (fori+concat rebuild)", "v5", weights, biases, dirs_t,
                t0, origin_c, 8192, HI, rtt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
