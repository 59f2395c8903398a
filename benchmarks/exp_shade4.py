"""Restore-stage alternatives (round 4): full-bundle key sort vs scatter.

The shade stage's image-order restore is a 2M-lane variadic sort keyed on
the carried pixel index with the packed u32 color as payload (~6.2 ms,
exp_shade3). But only the shaded REGION (the n/4 in-place prefix, ~518k
lanes) carries non-zero colors — misses are the zero background — so a
dynamic scatter of just the region into a zeros canvas does the same job
touching 4x fewer lanes. The repo's old rule "sorts beat gather/scatter"
was measured at 2M lanes; at 518k the scatter may win.

  a) current: concat zeros + sort_restore_leaves over 2M (u32 payload)
  b) scatter region u32 into zeros canvas (at[pos].set, mode=drop)
  c) scatter hits only (non-converged region lanes write to a dump slot)

Parity asserted against (a). Run: python benchmarks/exp_shade4.py
"""
from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import compaction


def timed(name, fn, n=6, rtt=0.0):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ms = (float(np.median(ts)) - rtt) * 1e3
    print(f"  {name:48s}: {ms:7.2f} ms", flush=True)
    return ms


def main():
    n = 2073600
    region = n // 4
    key = jax.random.PRNGKey(0)
    # realistic state: pos is a full permutation; region lanes are the
    # in-place-prefix shade bucket, ~33% of them real hits
    pos = jax.random.permutation(key, jnp.arange(n, dtype=jnp.int32))
    packed = jax.random.randint(key, (region,), 1, 2**31 - 1).astype(jnp.uint32)
    conv = jax.random.uniform(jax.random.PRNGKey(1), (region,)) < 0.33
    packed = jnp.where(conv, packed, 0)

    noop = jax.jit(lambda x: x + 1.0)
    float(noop(jnp.float32(0)))
    ts = []
    for _ in range(5):
        s = time.perf_counter()
        float(jnp.sum(noop(jnp.float32(0))))
        ts.append(time.perf_counter() - s)
    rtt = float(np.median(ts))
    print(f"RTT ~ {rtt*1e3:.1f} ms; n={n} region={region}", flush=True)

    @jax.jit
    def restore_sort(pos, packed):
        full = jnp.concatenate([packed, jnp.zeros((n - region,), jnp.uint32)])
        (restored,) = compaction.sort_restore_leaves(pos, (full,))
        return restored

    @jax.jit
    def restore_scatter(pos, packed):
        return jnp.zeros((n,), jnp.uint32).at[pos[:region]].set(
            packed, mode="drop")

    @jax.jit
    def restore_scatter_hits(pos, packed, conv):
        dump = jnp.int32(n)
        idx = jnp.where(conv, pos[:region], dump)
        return jnp.zeros((n,), jnp.uint32).at[idx].set(packed, mode="drop")

    a = restore_sort(pos, packed)
    b = restore_scatter(pos, packed)
    c = restore_scatter_hits(pos, packed, conv)
    print("parity b:", bool(jnp.all(a == b)), " c:", bool(jnp.all(a == c)),
          flush=True)

    timed("a) 2M restore sort (u32)", lambda: float(jnp.sum(
        restore_sort(pos, packed).astype(jnp.float32))), rtt=rtt)
    timed("b) 518k scatter into zeros", lambda: float(jnp.sum(
        restore_scatter(pos, packed).astype(jnp.float32))), rtt=rtt)
    timed("c) hits-only scatter (~172k writes)", lambda: float(jnp.sum(
        restore_scatter_hits(pos, packed, conv).astype(jnp.float32))), rtt=rtt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
