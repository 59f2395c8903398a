"""Differentiable-mode benchmark + gradient parity (BASELINE config 4).

Measures the pixel-loss -> weight-gradient step (implicit-function VJP,
diff/implicit.py) and validates the gradient against central finite
differences on a random weight direction.

Usage: python benchmarks/grad_bench.py [--res 128]
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
from cudaneuralrender_tpu.diff import losses


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/root/reference/neuralGeometries/plane_1.h5")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--fd-eps", type=float, default=3e-4)
    args = ap.parse_args()

    params = cnr.load(args.model)
    cfg = cnr.RenderConfig(width=args.res, height=args.res, scene="neural_raw",
                           max_steps=args.steps)
    cam = cnr.Camera(rotation_y=30.0, rotation_x=15.0)
    target = cnr.render_image(params, cnr.Camera(rotation_y=35.0, rotation_x=15.0), cfg)

    loss_fn = lambda p: losses.pixel_loss(p, cam, cfg, target)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    loss, grads = grad_fn(params)
    jax.block_until_ready(grads)
    t0 = time.perf_counter()
    loss, grads = grad_fn(params)
    float(loss)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0
    n_rays = args.res * args.res
    print(f"value+grad step: {dt*1e3:.1f} ms at {args.res}^2 "
          f"({n_rays/dt/1e6:.2f} Mrays/s through fwd+bwd), loss={float(loss):.6f}")

    # FD parity on a random unit direction in weight space.
    key = jax.random.key(0)
    direction = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.fold_in(key, x.size), x.shape, x.dtype),
        params,
    )
    norm = jnp.sqrt(sum(jnp.sum(d ** 2) for l in direction for d in (l.w, l.b)))
    direction = jax.tree_util.tree_map(lambda d: d / norm, direction)

    analytic = sum(
        jnp.sum(g * d)
        for gl, dl in zip(grads, direction)
        for g, d in ((gl.w, dl.w), (gl.b, dl.b))
    )
    eps = args.fd_eps

    def shift(sign):
        return jax.tree_util.tree_map(lambda x, d: x + sign * eps * d, params, direction)

    fd = (float(loss_fn(shift(+1.0))) - float(loss_fn(shift(-1.0)))) / (2 * eps)
    rel = abs(float(analytic) - fd) / max(abs(fd), 1e-12)
    print(f"directional derivative: analytic={float(analytic):.6e} fd={fd:.6e} "
          f"rel_err={rel:.3e} ({'PASS' if rel < 0.05 else 'FAIL'})")
    return 0 if rel < 0.05 else 1


if __name__ == "__main__":
    sys.exit(main())
