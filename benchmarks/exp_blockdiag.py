"""MXU contraction-fill experiment for the 32-wide MLP chain.

The megakernel's per-step dot is [32,32] x [32,T]: the contraction axis
fills 32 of the MXU's 128 rows, so ~3/4 of the systolic array idles. If a
[128,128] x [128,T] dot costs about the same wall time, a BLOCK-DIAGONAL
schedule (4 ray subgroups at staggered layers sharing one block-diag
weight matrix) would quadruple useful march throughput.

Measures, per precision (DEFAULT / HIGHEST), in-kernel loop of `reps`
chained dots (avoids dispatch overhead / tunnel RTT):
  a) H=32  chain over [32, T]
  b) H=128 chain over [128, T]       (4x the rays if block-diag works)
  c) H=128 chain over [128, T/4]     (same ray count as (a))
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _loop_kernel(x_ref, w_ref, b_ref, out_ref, *, reps: int, precision):
    w = w_ref[:]
    b = b_ref[:]

    def body(_, x):
        y = jax.lax.dot_general(
            w, x, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y + b[:, None], 0.0)

    out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])


@functools.partial(jax.jit, static_argnames=("reps", "precision", "tile"))
def chain(x, w, b, *, reps: int, precision, tile: int):
    H, T = x.shape
    return pl.pallas_call(
        functools.partial(_loop_kernel, reps=reps, precision=precision),
        out_shape=jax.ShapeDtypeStruct((H, T), jnp.float32),
        grid=(T // tile,),
        in_specs=[
            pl.BlockSpec((H, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(x, w, b)


def timed(name, fn, *args, n=5, **kw):
    # scalar-fetch sync: block_until_ready over the axon tunnel does not
    # force execution (bench.py timing notes)
    float(jnp.sum(fn(*args, **kw)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args, **kw)))
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) * 1e3
    print(f"  {name:34s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    R = 2 * 1024 * 1024  # total rays (~1080p), SAME for every case
    reps = 288           # = 32 march steps x 9 layers
    for prec_name, prec in (("DEFAULT", jax.lax.Precision.DEFAULT),
                            ("HIGHEST", jax.lax.Precision.HIGHEST)):
        print(f"[{prec_name}] rays={R} reps={reps}", flush=True)
        # (H, lanes, tile): H=32 -> rays on lanes directly; H=128 -> 4 ray
        # subgroups stacked on sublanes (block-diag weights), lanes = R/4.
        for H, tile, tag in ((32, 8192, "H=32  [32, R]      tile 8k"),
                             (32, 16384, "H=32  [32, R]      tile 16k"),
                             (128, 4096, "H=128 [128, R/4]   tile 4k"),
                             (128, 2048, "H=128 [128, R/4]   tile 2k")):
            lanes = R if H == 32 else R // 4
            x = jax.random.normal(key, (H, lanes), jnp.float32)
            w = jax.random.normal(key, (H, H), jnp.float32) * 0.1
            b = jnp.zeros((H,), jnp.float32)
            ms = timed(f"{tag}", chain, x, w, b, reps=reps, precision=prec,
                       tile=tile)
            rays_steps = R * (reps // 9)
            print(f"      -> {ms * 1e6 / rays_steps:8.3f} ns per ray-step",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
