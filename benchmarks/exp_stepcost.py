"""Where does a megakernel march step's ~1.3-1.5 ns/lane go?

Minimal Pallas kernels march a full tile a FIXED number of steps (no early
exit, all lanes active) so cost-per-lane-step is exact. Variants isolate:
the MLP chain alone, + x rebuild (concat vs carried dynamic-update), + state
updates, relax bookkeeping, precision, bf16 activations, tile width.

Chained K programs per timing (tunnel-RTT-proof, see exp_breakdown.py).
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
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.pallas.fused_mlp import pack_params, _mlp_chain, _mlp_chain_3pass, split_hi_lo

K = 4
STEPS = 64


def make_kernel(variant, n_layers, hidden, steps, precision, act_dtype=jnp.float32,
                three_pass=False):
    def kern(dirs_ref, t0_ref, origin_ref, *refs):
        if three_pass:
            w_hi_ref, w_lo_ref, b_ref, t_out = refs
        else:
            w_ref, b_ref, t_out = refs
        dirs = dirs_ref[:]
        origin = origin_ref[:]
        T = dirs.shape[1]
        pad = hidden - 3

        def chain_from_x(x):
            if three_pass:
                return _mlp_chain_3pass(w_hi_ref, w_lo_ref, b_ref, x, n_layers)[0:1, :]
            return _mlp_chain(w_ref, b_ref, x, n_layers, precision)[0:1, :]

        def sdf(t):
            pts = origin + dirs * t
            x = jnp.concatenate(
                [pts, jnp.zeros((pad, T), jnp.float32)], axis=0
            ).astype(act_dtype)
            return chain_from_x(x).astype(jnp.float32)

        if variant == "march_relax":
            # full megakernel bookkeeping: relax backtrack state + budget +
            # masks + resolve tracking (the production coarse kernel body)
            def body(carry):
                step, t, budget, active, conv, res, prev_r, step_len = carry
                d = sdf(t)
                act = active > 0
                sor_fail = act & (step_len > prev_r) & (d + prev_r < step_len)
                near = act & ~sor_fail & (d < 1e-6)
                om = jnp.where(step_len < 0.0, 1.0, 1.6)
                stepv = jnp.where(sor_fail, prev_r - step_len,
                                  jnp.where(near, d, om * d))
                budget = budget - jnp.where(act, stepv, 0.0)
                miss = act & ~sor_fail & (budget <= 0.0)
                moved = act & ~miss
                t = jnp.where(moved, t + stepv, t)
                conv_now = moved & near
                active = (moved & ~conv_now).astype(jnp.float32)
                conv = jnp.where(conv_now, 1.0, conv)
                res = jnp.where(act & (active == 0.0),
                                (step + 1).astype(jnp.float32), res)
                prev_r = jnp.where(moved & ~sor_fail, d, prev_r)
                step_len = jnp.where(moved, stepv, step_len)
                return step + 1, t, budget, active, conv, res, prev_r, step_len

            def cond(carry):
                return carry[0] < steps

            z = jnp.zeros_like(t0_ref[:])
            fin = jax.lax.while_loop(
                cond, body,
                (0, t0_ref[:], z + 3.0, z + 1.0, z, z, z, z))
            t_out[:] = fin[1] + fin[4] * 1e-9
            return

        if variant == "chain_only":
            # MLP evals only; t update is one add (the floor).
            def body(carry):
                step, t = carry
                return step + 1, t + sdf(t)
        elif variant == "march_state":
            # full reference-style update set (mask/budget/conv) minus relax
            def body(carry):
                step, t = carry
                d = sdf(t)
                act = d > -1e30
                near = act & (d < 1e-6)
                moved = act & ~near
                t = jnp.where(moved, t + d, t)
                return step + 1, t
        else:
            raise ValueError(variant)

        def cond(carry):
            return carry[0] < steps

        _, t = jax.lax.while_loop(cond, body, (0, t0_ref[:]))
        t_out[:] = t

    return kern


def run_variant(name, variant, weights, biases, dirs_t, t0, origin, tile,
                precision, rtt, act_dtype=jnp.float32, reps=5, three_pass=False):
    if three_pass:
        weight_ops = (*split_hi_lo(weights), biases)
        n_layers, hidden = weights.shape[0], weights.shape[1]
    else:
        weight_ops = (weights, biases)
        n_layers, hidden = weights.shape[0], weights.shape[1]
    n = dirs_t.shape[1]
    n_tiles = n // tile
    kern = make_kernel(variant, n_layers, hidden, STEPS, precision, act_dtype,
                       three_pass=three_pass)
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
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_ops),
            out_specs=row(),
        )(d, t, origin, *weight_ops)

    @jax.jit
    def chain(d, t):
        out = call(d, t)
        for _ in range(K - 1):
            out = call(d, t + jnp.sum(out) * 1e-30)
        return out

    float(jnp.sum(chain(dirs_t, t0)))
    ts = []
    for _ in range(reps):
        s = time.perf_counter()
        float(jnp.sum(chain(dirs_t, t0)))
        ts.append(time.perf_counter() - s)
    med = max(float(np.median(ts)) - rtt, 0.0) / K
    per = med / (n * STEPS) * 1e9
    print(f"{name:48s}: {med*1e3:7.2f} ms -> {per:6.3f} ns/lane-step", flush=True)


def main():
    n = 2 ** 21  # ~2M lanes
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    weights, biases, n_in, hidden = pack_params(params)
    cfg = cnr.RenderConfig(width=2048, height=1024)
    cam_to_world, _ = camera_lib.view_matrices(cnr.Camera(rotation_y=25.0))
    origin, dirs = camera_lib.generate_rays(cam_to_world, 1024, 2048, cfg.focal)
    dirs_t = jnp.asarray(dirs.T)  # [3, n]
    t0 = jnp.full((1, n), 0.8, jnp.float32)
    origin_c = origin.reshape(3, 1).astype(jnp.float32)

    noop = jax.jit(lambda x: x + 1.0)
    noop(jnp.float32(0))
    ts = []
    for _ in range(5):
        s = time.perf_counter()
        float(jnp.sum(noop(jnp.float32(0))))
        ts.append(time.perf_counter() - s)
    rtt = float(np.median(ts))
    print(f"RTT ~ {rtt*1e3:.2f} ms; {n} lanes x {STEPS} steps, K={K}", flush=True)

    HI, DEF = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT
    for tile in (8192, 16384):
        run_variant(f"chain_only HIGHEST tile={tile}", "chain_only",
                    weights, biases, dirs_t, t0, origin_c, tile, HI, rtt)
    run_variant("chain_only DEFAULT tile=8192", "chain_only",
                weights, biases, dirs_t, t0, origin_c, 8192, DEF, rtt)
    run_variant("chain_only 3PASS(HIGH emu) tile=8192", "chain_only",
                weights, biases, dirs_t, t0, origin_c, 8192, HI, rtt,
                three_pass=True)
    run_variant("march_state DEFAULT tile=8192", "march_state",
                weights, biases, dirs_t, t0, origin_c, 8192, DEF, rtt)
    run_variant("march_relax DEFAULT tile=8192", "march_relax",
                weights, biases, dirs_t, t0, origin_c, 8192, DEF, rtt)
    run_variant("march_relax HIGHEST tile=8192", "march_relax",
                weights, biases, dirs_t, t0, origin_c, 8192, HI, rtt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
