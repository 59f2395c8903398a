"""Sort cost vs payload count at 2M lanes (is dropping dx/dy/dz from
PackedRays worth the plumbing?) and int vs bool key."""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cudaneuralrender_tpu.ops import compaction


@functools.partial(jax.jit, static_argnames=("k", "use_order"))
def packed(mask, order, leaves, k: int, use_order: bool):
    out = compaction.sort_pack_leaves(
        mask, leaves[:k], order=order if use_order else None
    )
    return jnp.stack([jnp.sum(l.astype(jnp.float32)) for l in out]).sum()


def main():
    n = 1920 * 1080
    key = jax.random.PRNGKey(0)
    mask = jax.random.uniform(key, (n,)) < 0.16
    order = jax.random.randint(key, (n,), 0, 1000)
    leaves = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (n,), jnp.float32)
        for i in range(9)
    )
    for use_order in (False, True):
        for k in (2, 4, 6, 9):
            float(packed(mask, order, leaves, k, use_order))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(packed(mask, order, leaves, k, use_order))
                ts.append(time.perf_counter() - t0)
            print(f"order={use_order!s:5} leaves={k}: {np.min(ts)*1e3:7.2f} ms",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
