"""Pallas TPU kernel: the whole dense MLP chain fused into one kernel.

TPU-native replacement for the reference's per-layer CUTLASS GEMM launches
(src/layers/denseLayer.cu:126-176 — 9 kernel launches and 8 HBM activation
round-trips per inference step). Here the full chain runs inside a single
``pallas_call``: weights stay resident in VMEM (a 9-layer 32-wide MLP is
~36 KB — nothing), activations never leave VMEM, and the grid pipelines ray
tiles through the MXU.

Layout: activations are kept TRANSPOSED as [features, tile] — features on
sublanes, rays on lanes — so the 128-wide lane dimension is fully occupied by
rays at any hidden width, and each layer is one
``dot_general((in, out)^T contraction)`` on the MXU followed by a fused
bias+ReLU on the VPU.

Weights are pre-padded to a uniform [L, H, H] stack (H = max layer width,
zero-padded), which makes the layer loop a static ``fori``-style unroll with
identical shapes — no dynamic shapes, no per-layer recompilation.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.mlp import MLPParams


def pack_params(params: MLPParams, pad_width: int | None = None) -> Tuple[jax.Array, jax.Array, int, int]:
    """Pad an MLP pytree to a uniform [L, H, H] weight stack + [L, H] biases.

    Returns (weights, biases, n_in, hidden). Zero padding is exact: padded
    input features are zero, so W rows beyond n_in contribute nothing; padded
    output columns produce junk lanes that the next layer's zero W rows ignore
    (and the head reads only row 0). Pure-jnp so it can run under jit (traced
    params).
    """
    sizes = [int(params[0].w.shape[0])] + [int(l.w.shape[1]) for l in params]
    h = pad_width or max(sizes)
    L = len(params)
    w_layers = []
    b_layers = []
    for layer in params:
        n_in_l, n_out_l = layer.w.shape
        wi = jnp.zeros((h, h), jnp.float32).at[:n_in_l, :n_out_l].set(
            layer.w.astype(jnp.float32)
        )
        bi = jnp.zeros((h,), jnp.float32).at[:n_out_l].set(layer.b.astype(jnp.float32))
        w_layers.append(wi)
        b_layers.append(bi)
    return jnp.stack(w_layers), jnp.stack(b_layers), sizes[0], h


def split_hi_lo(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Two-term bfloat16 decomposition of an f32 array: w ≈ hi + lo with hi =
    bf16(w) and lo = bf16(w - hi). Feeding both halves to single-pass bf16
    MXU dots reproduces XLA's Precision.HIGH 3-pass scheme (hi·hi + hi·lo +
    lo·hi) — the path Pallas cannot lower natively (Mosaic supports
    DEFAULT/HIGHEST only). Done once outside the kernel so the march loop
    never re-splits loop-invariant weights."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mlp_chain_from_pts(
    w_ref, b_ref, pts, n_layers: int, n_in: int,
    precision=jax.lax.Precision.HIGHEST,
):
    """Chain entry for raw input rows pts [n_in, T] (no zero-padding).

    The first layer contracts over the TRUE input width via a static slice
    of the padded weight stack — the megakernel previously rebuilt a zero-
    padded [H, T] activation block every march step just to feed a [H, H]
    dot whose extra rows were zeros.
    """
    dn = (((0,), (0,)), ((), ()))
    y = jax.lax.dot_general(
        w_ref[0][:n_in, :], pts, dimension_numbers=dn,
        precision=precision, preferred_element_type=jnp.float32,
    )
    x = y + b_ref[0][:, None]
    if n_layers > 1:
        x = jnp.maximum(x, 0.0)
    for l in range(1, n_layers):
        y = jax.lax.dot_general(
            w_ref[l], x, dimension_numbers=dn,
            precision=precision, preferred_element_type=jnp.float32,
        )
        y = y + b_ref[l][:, None]
        if l + 1 < n_layers:
            y = jnp.maximum(y, 0.0)
        x = y
    return x


def _mlp_chain_3pass_from_pts(w_hi_ref, w_lo_ref, b_ref, pts, n_layers: int, n_in: int):
    """3-pass (emulated HIGH) chain entry for raw input rows [n_in, T]."""
    dn = (((0,), (0,)), ((), ()))

    def dot3(w_hi, w_lo, x):
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            w_hi, x_hi, dimension_numbers=dn, preferred_element_type=jnp.float32
        )
        y = y + jax.lax.dot_general(
            w_hi, x_lo, dimension_numbers=dn, preferred_element_type=jnp.float32
        )
        return y + jax.lax.dot_general(
            w_lo, x_hi, dimension_numbers=dn, preferred_element_type=jnp.float32
        )

    x = dot3(w_hi_ref[0][:n_in, :], w_lo_ref[0][:n_in, :], pts) + b_ref[0][:, None]
    if n_layers > 1:
        x = jnp.maximum(x, 0.0)
    for l in range(1, n_layers):
        y = dot3(w_hi_ref[l], w_lo_ref[l], x) + b_ref[l][:, None]
        if l + 1 < n_layers:
            y = jnp.maximum(y, 0.0)
        x = y
    return x


def _mlp_chain_3pass(w_hi_ref, w_lo_ref, b_ref, x, n_layers: int):
    """Emulated Precision.HIGH chain on transposed activations x [H, T].

    Per layer, three single-pass bf16 dots accumulate in f32:
    y ≈ w_hi·x_hi + w_hi·x_lo + w_lo·x_hi (the dropped lo·lo term is
    O(2^-16) relative — XLA HIGH drops it too). Measured max abs SDF error
    on plane_1: ~2e-4 (models/mlp.py precision table), good down to
    eps=1e-3 marching at ~60% of HIGHEST's 6-pass cost.
    """
    dn = (((0,), (0,)), ((), ()))
    for l in range(n_layers):
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            w_hi_ref[l], x_hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        y = y + jax.lax.dot_general(
            w_hi_ref[l], x_lo, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        y = y + jax.lax.dot_general(
            w_lo_ref[l], x_hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[l][:, None]
        if l + 1 < n_layers:
            y = jnp.maximum(y, 0.0)
        x = y
    return x


def _mlp_chain(w_ref, b_ref, x, n_layers: int, precision=jax.lax.Precision.HIGHEST):
    """Run the padded layer chain on transposed activations x [H, T].

    precision defaults to HIGHEST: bf16 MXU passes inject ~1e-2 absolute
    error into the SDF value, breaking eps=1e-6 sphere-trace convergence
    (see models/mlp.py docstring for measurements); the mixed-precision
    march passes DEFAULT here for the coarse far-field phase.
    """
    for l in range(n_layers):
        w = w_ref[l]  # [H_in, H_out]
        # y[out, t] = sum_in w[in, out] * x[in, t]
        y = jax.lax.dot_general(
            w,
            x,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[l][:, None]
        if l + 1 < n_layers:
            y = jnp.maximum(y, 0.0)
        x = y
    return x


def _fused_mlp_kernel(x_ref, w_ref, b_ref, out_ref, *, n_layers: int, precision):
    x = x_ref[:]  # [H, T] transposed activations
    y = _mlp_chain(w_ref, b_ref, x, n_layers, precision)
    out_ref[:] = y[0:1, :]  # head output lives in feature row 0


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "precision"))
def mlp_forward_pallas(
    weights: jax.Array,
    biases: jax.Array,
    x: jax.Array,
    *,
    tile: int = 2048,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Fused forward pass. weights [L,H,H], biases [L,H] from pack_params;
    x [B, n_in] points. Returns [B] raw logits (single-output head).

    B is padded up to a tile multiple; the pad lanes compute junk that is
    sliced off — branch-free, static shapes.
    """
    L, H, _ = weights.shape
    B, n_in = x.shape
    tile = min(tile, max_tile_for_width(H, L))
    n_tiles = pl.cdiv(B, tile)
    Bp = n_tiles * tile

    # Transpose to [n_in, B] and zero-pad features to H and batch to Bp.
    xt = jnp.zeros((H, Bp), jnp.float32)
    xt = xt.at[:n_in, :B].set(x.T)

    out = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, n_layers=L, precision=precision),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((H, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases, whole
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, weights, biases)

    return out[0, :B]


def should_interpret() -> bool:
    """Pallas TPU kernels need interpret mode on the CPU backend (tests)."""
    return jax.default_backend() == "cpu"


def max_tile_for_width(hidden: int, n_layers: int = 9,
                       budget_bytes: int = 8 * 2 ** 20,
                       three_pass: bool = False) -> int:
    """Largest lane-tile that keeps a chain kernel's working set within a
    conservative VMEM budget (half of a v5e core's ~16 MB, leaving room for
    Mosaic's double buffering and the march state rows).

    The shipped 32-wide nets fit any tile (8192 lanes = ~2 MB of
    activations); user MLPs at hidden width 128-256 must shrink the tile or
    the kernel refuses to fit: per lane the kernel holds two [hidden] f32
    activation registers plus the weight stack (three_pass doubles the
    weight bytes: hi+lo bf16 halves equal one f32 copy, plus the f32 stack
    is replaced). Returns a power of two >= 256.
    """
    weight_bytes = n_layers * hidden * hidden * 4 * (2 if three_pass else 1)
    per_lane = 2 * hidden * 4
    avail = max(budget_bytes - weight_bytes, per_lane * 256)
    tile = 256
    while tile * 2 * per_lane <= avail and tile < 8192:
        tile *= 2
    return tile


def neural_sdf_fn_pallas(
    params: MLPParams,
    frame=0.0,
    num_inputs: int = 3,
    *,
    tile: int = 2048,
    interpret: bool | None = None,
    precision=jax.lax.Precision.HIGHEST,
):
    """SdfFn backed by the fused kernel — drop-in for renderer.neural_sdf_fn.

    This is the march-rate path: one pallas_call per march step evaluates the
    whole 9-layer chain with weights and activations VMEM-resident, so the
    step's HBM traffic is just points in / distances out (the XLA chain
    materializes every [N, 32] activation to HBM — measured >10x
    bandwidth-bound at 1080p). num_inputs=4 appends the frame column
    (animation mode).
    """
    if interpret is None:
        interpret = should_interpret()
    weights, biases, n_in, _ = pack_params(params)

    def fn(p: jax.Array) -> jax.Array:
        flat = p.reshape(-1, p.shape[-1])
        if num_inputs == 4:
            f = jnp.broadcast_to(
                jnp.asarray(frame, flat.dtype), (flat.shape[0], 1)
            )
            flat = jnp.concatenate([flat, f], axis=-1)
        d = mlp_forward_pallas(
            weights, biases, flat, tile=tile, interpret=interpret, precision=precision
        )
        return d.reshape(p.shape[:-1])

    return fn
