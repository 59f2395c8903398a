"""Pallas kernel tests in interpreter mode (the kernel 'sanitizer' —
SURVEY.md §5 race-detection row): fused-MLP and megakernel outputs must match
the XLA reference path exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.models import mlp
from cudaneuralrender_tpu.pallas import fused_mlp, megakernel
from cudaneuralrender_tpu.ops import camera as cam_lib
from cudaneuralrender_tpu.ops import march


def test_pack_params_roundtrip(plane1_params):
    w, b, n_in, h = fused_mlp.pack_params(plane1_params)
    assert w.shape == (9, 32, 32) and b.shape == (9, 32)
    assert n_in == 3 and h == 32
    np.testing.assert_array_equal(np.asarray(w[0, :3, :]), np.asarray(plane1_params[0].w))
    np.testing.assert_array_equal(np.asarray(w[0, 3:, :]), 0.0)
    np.testing.assert_array_equal(np.asarray(w[8, :, 0]), np.asarray(plane1_params[8].w[:, 0]))


def test_fused_mlp_matches_xla(plane1_params, rng):
    w, b, n_in, _ = fused_mlp.pack_params(plane1_params)
    x = jnp.asarray(rng.uniform(-1, 1, size=(300, 3)).astype(np.float32))
    got = np.asarray(fused_mlp.mlp_forward_pallas(w, b, x, tile=128, interpret=True))
    want = np.asarray(mlp.apply_scalar(plane1_params, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_mlp_nonmultiple_batch(plane1_params, rng):
    """Batch not a multiple of the tile: pad lanes must be sliced off."""
    w, b, _, _ = fused_mlp.pack_params(plane1_params)
    x = jnp.asarray(rng.uniform(-1, 1, size=(130, 3)).astype(np.float32))
    got = fused_mlp.mlp_forward_pallas(w, b, x, tile=128, interpret=True)
    assert got.shape == (130,)
    want = np.asarray(mlp.apply_scalar(plane1_params, x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_neural_sdf_fn_pallas_shape(plane1_params):
    fn = fused_mlp.neural_sdf_fn_pallas(plane1_params, tile=128, interpret=True)
    d = fn(jnp.zeros((4, 5, 3)))
    assert d.shape == (4, 5)


def test_megakernel_matches_xla_march(plane1_params):
    cfg = cnr.RenderConfig(width=16, height=16, scene="neural_raw", max_steps=128)
    c2w, _ = cam_lib.view_matrices(cnr.Camera())
    origin, dirs = cam_lib.generate_rays(c2w, cfg.height, cfg.width, cfg.focal)

    t_pl, hit_pl = megakernel.march_pallas(
        plane1_params, origin, dirs, cfg, tile=128, interpret=True
    )

    from cudaneuralrender_tpu.render.renderer import scene_fn

    f = scene_fn(plane1_params, cfg, 0.0)
    ref = march.sphere_trace(
        f, origin, dirs, max_steps=cfg.max_steps, march_eps=cfg.march_eps,
        bound_center=cfg.bound_center, bound_radius=cfg.bound_radius,
    )
    # fp contraction order differs between the transposed-kernel chain and
    # XLA's layout; near-threshold rays can wobble at the 1e-5 level.
    hit_agree = (np.asarray(hit_pl) == np.asarray(ref.hit)).mean()
    assert hit_agree > 0.99, f"hit agreement {hit_agree}"
    both = np.asarray(hit_pl) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(t_pl)[both], np.asarray(ref.t)[both], atol=1e-4
    )


def test_render_image_pallas_matches_xla(plane1_params):
    cfg = cnr.RenderConfig(width=16, height=16, scene="neural_raw", max_steps=128)
    a = np.asarray(
        megakernel.render_image_pallas(
            plane1_params, cnr.Camera(), cfg, tile=128, interpret=True
        )
    )
    b = np.asarray(cnr.render_image(plane1_params, cnr.Camera(), cfg))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_megakernel_tanh_scene(plane1_params):
    cfg = cnr.RenderConfig(width=8, height=8, scene="neural_tanh", max_steps=64)
    c2w, _ = cam_lib.view_matrices(cnr.Camera())
    origin, dirs = cam_lib.generate_rays(c2w, 8, 8, cfg.focal)
    t_pl, hit_pl = megakernel.march_pallas(
        plane1_params, origin, dirs, cfg, tile=128, interpret=True
    )
    from cudaneuralrender_tpu.render.renderer import scene_fn

    f = scene_fn(plane1_params, cfg, 0.0)
    ref = march.sphere_trace(
        f, origin, dirs, max_steps=cfg.max_steps, march_eps=cfg.march_eps,
    )
    np.testing.assert_array_equal(np.asarray(hit_pl), np.asarray(ref.hit))


def test_megakernel_csg_scene_matches_dense(plane1_params):
    """CSG scenes march in-kernel too (pallas/scenes.py composes the
    reference's sceneSDF after the MLP chain): hit/t must match the dense
    XLA path."""
    cfg = cnr.RenderConfig(width=16, height=16, scene="many_sphere", max_steps=200)
    img_k = np.asarray(megakernel.render_image_pallas(
        plane1_params, cnr.Camera(), cfg, frame=1.0, tile=128, interpret=True
    ))
    img_d = np.asarray(cnr.render_image(plane1_params, cnr.Camera(), cfg, frame=1.0))
    np.testing.assert_allclose(img_k, img_d, atol=1e-5)


def test_megakernel_rejects_analytic_only_scene(plane1_params):
    cfg = cnr.RenderConfig(width=8, height=8, scene="sphere")
    with pytest.raises(ValueError, match="does not support scene"):
        megakernel.render_image_pallas(
            plane1_params, cnr.Camera(), cfg, tile=128, interpret=True
        )


def test_megakernel_state_continuation(plane1_params):
    """march_pallas_state continuing a half-done XLA march must agree with
    the XLA march run to completion (the staged renderer's tail path)."""
    cfg = cnr.RenderConfig(width=16, height=16, scene="neural_raw", max_steps=128)
    c2w, _ = cam_lib.view_matrices(cnr.Camera())
    origin, dirs = cam_lib.generate_rays(c2w, cfg.height, cfg.width, cfg.focal)

    from cudaneuralrender_tpu.render.renderer import scene_fn

    f = scene_fn(plane1_params, cfg, 0.0)
    st = march.init_state(origin, dirs, cfg.bound_center, cfg.bound_radius)
    st = march.march_stage(f, origin, dirs, st, num_steps=8,
                           max_steps=cfg.max_steps, march_eps=cfg.march_eps)

    cont = megakernel.march_pallas_state(
        plane1_params, origin, dirs, st, cfg, tile=128, interpret=True
    )
    ref = march.march_stage(f, origin, dirs, st, num_steps=cfg.max_steps,
                            max_steps=cfg.max_steps, march_eps=cfg.march_eps)
    hit_agree = (np.asarray(cont.converged) == np.asarray(ref.converged)).mean()
    assert hit_agree > 0.99, f"hit agreement {hit_agree}"
    both = np.asarray(cont.converged) & np.asarray(ref.converged)
    np.testing.assert_allclose(
        np.asarray(cont.t)[both], np.asarray(ref.t)[both], atol=1e-4
    )
    # rays already converged before the continuation stay converged
    pre = np.asarray(st.converged)
    assert np.all(np.asarray(cont.converged)[pre])


def test_split_hi_lo_reconstructs(plane1_params):
    w, _, _, _ = fused_mlp.pack_params(plane1_params)
    hi, lo = fused_mlp.split_hi_lo(w)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    recon = hi.astype(np.float32) + lo.astype(np.float32)
    err = np.abs(np.asarray(w) - np.asarray(recon))
    # two bf16 terms carry ~16 mantissa bits -> |err| <= 2^-17 |w| + tiny
    assert err.max() <= 2.0 ** -16 * np.abs(np.asarray(w)).max() + 1e-12


def test_megakernel_high_precision_march(plane1_params):
    """precision=HIGH (emulated 3-pass chain) marches to eps=1e-3 close to
    the exact f32 chain (CPU XLA evaluates every precision in f32, so the
    XLA reference is exact; the emulation's documented SDF error is ~2e-4)."""
    cfg = cnr.RenderConfig(width=16, height=16, scene="neural_raw",
                           max_steps=128, march_eps=1e-3)
    c2w, _ = cam_lib.view_matrices(cnr.Camera())
    origin, dirs = cam_lib.generate_rays(c2w, cfg.height, cfg.width, cfg.focal)
    st = march.init_state(origin, dirs, cfg.bound_center, cfg.bound_radius)

    got = megakernel.march_pallas_state(
        plane1_params, origin, dirs, st, cfg, tile=128, interpret=True,
        march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGH,
    )
    from cudaneuralrender_tpu.render.renderer import scene_fn

    f = scene_fn(plane1_params, cfg, 0.0)
    ref = march.march_stage(f, origin, dirs, st, num_steps=cfg.max_steps,
                            max_steps=cfg.max_steps, march_eps=cfg.march_eps)
    agree = (np.asarray(got.converged) == np.asarray(ref.converged)).mean()
    assert agree > 0.97, f"hit agreement {agree}"
    both = np.asarray(got.converged) & np.asarray(ref.converged)
    np.testing.assert_allclose(
        np.asarray(got.t)[both], np.asarray(ref.t)[both], atol=5e-3
    )


# ---------------------------------------------------------------------------
# Every in-kernel CSG compose pinned against the dense scene math
# (round-2 VERDICT item 3: a wrong window constant in pallas/scenes.py must
# fail CI). Guards the reference scene library, volumeRender_kernel.cu:156-196.
# ---------------------------------------------------------------------------

from cudaneuralrender_tpu.pallas import scenes as kscenes  # noqa: E402
from cudaneuralrender_tpu.ops import sdf as sdf_ops  # noqa: E402


def _compose_parity_points(plane1_params, scene, frame, key=0, n=4096,
                           cyl_window=5):
    """Evaluate the kernel-layout compose and the dense scene fn on the same
    random points in the bounding volume; return (dense, kernel) [n]."""
    pts = jax.random.uniform(
        jax.random.key(key), (n, 3), minval=-1.2, maxval=1.2
    ).astype(jnp.float32)
    d_raw = mlp.apply_scalar(plane1_params, pts)
    compose = kscenes.compose_fn(scene, cyl_window)
    d_kernel = np.asarray(compose(pts.T, d_raw[None, :], frame)[0])

    neural = lambda p: mlp.apply_scalar(plane1_params, p)
    dense_fn = sdf_ops.make_scene(scene, neural, frame)
    d_dense = np.asarray(dense_fn(pts))
    return d_dense, d_kernel


@pytest.mark.parametrize("scene,frame", [
    ("neural_tanh", 0.0),
    ("many_sphere", 17.0),
    ("many_sphere_cut", 17.0),
    ("displacement", 0.0),
])
def test_compose_fn_exact_parity(plane1_params, scene, frame):
    """Exact-everywhere composes: kernel layout must reproduce the dense
    scene math bit-for-bit-ish at every sample point."""
    d_dense, d_kernel = _compose_parity_points(plane1_params, scene, frame)
    np.testing.assert_allclose(d_kernel, d_dense, atol=1e-6)


def test_compose_fn_cylinder_window_band(plane1_params):
    """many_cylinder_cut's 5x5 window is exact wherever the scene distance
    is > -0.2 (the only region the march ever evaluates — it stops at the
    surface); deeper interior may deviate, and we assert the near-surface
    band is populated so the guarantee is actually exercised."""
    d_dense, d_kernel = _compose_parity_points(
        plane1_params, "many_cylinder_cut", 0.0, n=8192
    )
    band = d_dense > -0.2
    assert band.sum() > 1000, "sampling failed to populate the near band"
    np.testing.assert_allclose(d_kernel[band], d_dense[band], atol=1e-6)


def test_compose_fn_cylinder_window3_band(plane1_params):
    """cyl_window=3 (9 smooth-subtracts): exact wherever the scene distance
    is > -0.1 — the derivation in pallas/scenes.py (omitted cylinders sit
    >= ~0.11 from any sample, so smooth_subtract k=0.01 is an identity).
    Same interior-only error class as the 5x5 window, narrower band."""
    d_dense, d_kernel = _compose_parity_points(
        plane1_params, "many_cylinder_cut", 0.0, n=16384, cyl_window=3
    )
    band = d_dense > -0.1
    assert band.sum() > 1000, "sampling failed to populate the near band"
    np.testing.assert_allclose(d_kernel[band], d_dense[band], atol=1e-6)


@pytest.mark.parametrize("scene,frame", [
    ("many_sphere_cut", 1.0),
    ("many_cylinder_cut", 0.0),
    ("displacement", 0.0),
])
def test_megakernel_csg_scenes_render_match_dense(plane1_params, scene, frame):
    """Full in-kernel march of each CSG scene vs the dense XLA render
    (mirrors test_megakernel_csg_scene_matches_dense for many_sphere)."""
    cfg = cnr.RenderConfig(width=16, height=16, scene=scene, max_steps=200)
    img_k = np.asarray(megakernel.render_image_pallas(
        plane1_params, cnr.Camera(), cfg, frame=frame, tile=128, interpret=True
    ))
    img_d = np.asarray(cnr.render_image(plane1_params, cnr.Camera(), cfg, frame=frame))
    np.testing.assert_allclose(img_k, img_d, atol=1e-5)


# ---------------------------------------------------------------------------
# Wide-MLP support (round-3 VERDICT item 9): the kernels' generality beyond
# the shipped 32-wide nets is tested, not assumed — pack_params padding and
# the VMEM tile budget must hold for user MLPs at hidden width 64-256.
# ---------------------------------------------------------------------------


def test_max_tile_for_width_budget():
    from cudaneuralrender_tpu.pallas.fused_mlp import max_tile_for_width

    assert max_tile_for_width(32) == 8192          # shipped nets: full tile
    t128 = max_tile_for_width(128)
    t256 = max_tile_for_width(256)
    assert 256 <= t256 <= t128 <= 8192
    for h, t in ((128, t128), (256, t256)):
        # working set (two activations per lane + weights) fits the budget
        assert 2 * t * 2 * h * 4 + 9 * h * h * 4 <= 2 * 8 * 2 ** 20


@pytest.mark.parametrize("sizes", [
    (3, 64, 64, 64, 1),
    (3, 128, 128, 1),
    (3, 256, 256, 1),
])
def test_fused_forward_wide_mlp(sizes):
    """Fused-chain forward parity for wide synthetic MLPs (zero padding and
    the clamped tile must not change values)."""
    from cudaneuralrender_tpu.pallas.fused_mlp import (
        mlp_forward_pallas, pack_params,
    )

    params = mlp.init_mlp(jax.random.key(0), sizes=sizes)
    weights, biases, n_in, hidden = pack_params(params)
    assert hidden == max(sizes)
    pts = jax.random.uniform(jax.random.key(1), (4096, 3), minval=-1, maxval=1)
    got = np.asarray(mlp_forward_pallas(weights, biases, pts, interpret=True))
    want = np.asarray(mlp.apply_scalar(params, pts))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_megakernel_wide_mlp_render():
    """Whole-march megakernel on a 128-wide synthetic SDF: kernel render ==
    dense XLA render (the wide path through pack_params + clamped tiles +
    the transposed chain)."""
    params = mlp.init_mlp(jax.random.key(2), sizes=(3, 128, 128, 1))
    cfg = cnr.RenderConfig(width=16, height=16, scene="neural_raw",
                           max_steps=64)
    img_k = np.asarray(megakernel.render_image_pallas(
        params, cnr.Camera(), cfg, tile=4096, interpret=True))
    img_d = np.asarray(cnr.render_image(params, cnr.Camera(), cfg))
    np.testing.assert_allclose(img_k, img_d, atol=1e-5)


def test_march_pallas_raygen_matches_xla_init(plane1_params):
    """march_pallas_raygen (in-kernel ray generation from pixel indices)
    must agree with the XLA ray-build + init + kernel path: same
    convergence set, t within coarse-epsilon-level tolerance (the two
    builds differ by f32 ulps that the coarse march may amplify near the
    silhouette — the refine ladder re-polishes either way). Kept as an
    API for memory-bound callers; the shipped renderer uses the XLA build
    (measured faster in product — see renderer._scheduled_march NOTE)."""
    import jax

    from cudaneuralrender_tpu.ops import camera as camera_lib, march
    from cudaneuralrender_tpu.pallas import megakernel
    from cudaneuralrender_tpu.render import renderer

    cfg = cnr.RenderConfig(width=32, height=32, scene="neural_raw",
                           max_steps=200)
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    c2w, _ = camera_lib.view_matrices(cam)
    pos = jnp.asarray(renderer._block_order_np(32, 32, 16, 16))
    st_new, res_new = megakernel.march_pallas_raygen(
        plane1_params, c2w, pos, cfg, 0.0, tile=256,
        march_eps=0.05, precision=jax.lax.Precision.HIGHEST,
        interpret=True, return_resolve=True)

    origin = c2w[:, 3]
    dirs = camera_lib.ray_dirs_from_index(c2w, pos, 32, 32, cfg.focal)
    st0 = march.init_state(origin, dirs, cfg.bound_center, cfg.bound_radius)
    st_old, res_old = megakernel.march_pallas_state(
        plane1_params, origin, dirs, st0, cfg, 0.0, tile=256,
        march_eps=0.05, precision=jax.lax.Precision.HIGHEST,
        interpret=True, return_resolve=True)

    conv_agree = (np.asarray(st_new.converged) ==
                  np.asarray(st_old.converged)).mean()
    assert conv_agree > 0.995, conv_agree
    both = np.asarray(st_new.converged) & np.asarray(st_old.converged)
    np.testing.assert_allclose(
        np.asarray(st_new.t)[both], np.asarray(st_old.t)[both], atol=1e-3)
