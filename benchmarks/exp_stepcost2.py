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

        # chain with bias/relu used by v3/v4/v5/v5p
        if variant in ("v5", "v5p"):
            w3 = [tuple(r[l] for r in split_refs) for l in range(n_layers)]

        def bdot(w, x):
            return jax.lax.dot_general(
                w, x, DN, preferred_element_type=jnp.float32)

        def chain(x):
            for l in range(n_layers):
                if variant in ("v5", "v5p"):
                    # emulated f32: 3-term bf16 weight split (pre-computed)
                    # x split in-kernel; terms by magnitude:
                    #   hi*hi (1), hi*mid+mid*hi (2^-8),
                    #   hi*lo+lo*hi+mid*mid (2^-16)
                    # v5  = all six (Mosaic-native-HIGHEST-equivalent)
                    # v5p = five (drop mid*mid) - same 2^-16 tier bound
                    whi, wmid, wlo = w3[l]
                    x_hi = x.astype(jnp.bfloat16)
                    r = x - x_hi.astype(jnp.float32)
                    x_mid = r.astype(jnp.bfloat16)
                    x_lo = (r - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
                    y = bdot(whi, x_hi) + bdot(whi, x_mid) + bdot(wmid, x_hi)
                    y = y + bdot(whi, x_lo) + bdot(wlo, x_hi)
                    if variant == "v5":
                        y = y + bdot(wmid, x_mid)
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

        sdf = sdf_concat

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
    if variant in ("v5", "v5p"):
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
    print("[HIGHEST] tile=8192 (v0-v3 measured previous run: 2.737, 2.359, "
          "2.360, 2.366, 2.333 — kernel context adds ~nothing)", flush=True)
    for v in ("v3", "v4"):
        run_variant(f"  {v}", v, weights, biases, dirs_t, t0, origin_c,
                    8192, HI, rtt)
    print("[DEFAULT] tile=8192", flush=True)
    for v in ("v0", "v3", "v4"):
        run_variant(f"  {v}", v, weights, biases, dirs_t, t0, origin_c,
                    8192, DEF, rtt)
    print("[f32-emulation schemes, pre-split weights] tile=8192", flush=True)
    run_variant("  v5  6-pass", "v5", weights, biases, dirs_t,
                t0, origin_c, 8192, HI, rtt)
    run_variant("  v5p 5-pass", "v5p", weights, biases, dirs_t,
                t0, origin_c, 8192, HI, rtt)

    # Accuracy: max |emulated - native HIGHEST| SDF error over scene points
    # (decides the epsilon each scheme can march to; cf. the HIGH=2.2e-4
    # table in utils/config.py).
    from cudaneuralrender_tpu.models import mlp as mlp_lib

    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (65536, 3), jnp.float32, -1.2, 1.2)
    ref = mlp_lib.apply_scalar(params, pts, precision=HI)
    whi, wmid, wlo = split3(weights)

    @functools.partial(jax.jit, static_argnames=("passes",))
    def emu(pts, passes: int = 6):
        x = jnp.zeros((hidden, pts.shape[0]), jnp.float32).at[:3, :].set(pts.T)
        for l in range(weights.shape[0]):
            x_hi = x.astype(jnp.bfloat16)
            r = x - x_hi.astype(jnp.float32)
            x_mid = r.astype(jnp.bfloat16)
            x_lo = (r - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            def bd(w, xx):
                return jax.lax.dot_general(
                    w, xx, DN, preferred_element_type=jnp.float32)
            y = bd(whi[l], x_hi) + bd(whi[l], x_mid) + bd(wmid[l], x_hi)
            y = y + bd(whi[l], x_lo) + bd(wlo[l], x_hi)
            if passes == 6:
                y = y + bd(wmid[l], x_mid)
            y = y + biases[l][:, None]
            if l + 1 < weights.shape[0]:
                y = jnp.maximum(y, 0.0)
            x = y
        return x[0, :]

    for passes in (6, 5):
        err = float(jnp.max(jnp.abs(emu(pts, passes) - ref)))
        print(f"  emu {passes}-pass max|err| vs native HIGHEST: {err:.3e}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
