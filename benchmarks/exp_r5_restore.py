"""Restore-stage alternatives + coarse-kernel isolation (pipelined protocol).

The restore sort (image-order placement of packed u32 colors) costs
~5.1 ms of the 1080p frame. Hits live only in the first refine bucket
(within = cap0), and everything beyond is black — so the restore can be:
  A) full-bundle sort (shipped),
  B) prefix-sort by pos + scatter with indices_are_sorted/unique flags,
  C) prefix-sort by pos + scatter WITHOUT the flags (exp_shade4's loser),
measured with the same pipelined many-dispatch protocol as exp_r5_pieces.
Also isolates the bare coarse megakernel (no refine stub, no entry sort).
"""
import os as _os, sys, time
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib, compaction, march, shading
from cudaneuralrender_tpu.render import renderer
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.pallas.fused_mlp import should_interpret

W, H = 1920, 1080
N = W * H
params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
cfg = cnr.RenderConfig(width=W, height=H, scene="neural_raw", max_steps=6000,
                       march_impl="staged", adaptive_rungs=False)
cams = [cnr.Camera(rotation_y=25.0 + 20.0 * i, rotation_x=10.0) for i in range(12)]
views = [camera_lib.view_matrices(c) for c in cams]
fz = jnp.float32(0.0)

def timed(name, fns, reps=3):
    outs = [f() for f in fns]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [f() for f in fns]
        float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        ts.append((time.perf_counter() - t0) / len(fns))
    print(f"{name:52s}: {min(ts)*1e3:8.2f} ms/frame", flush=True)

# real packed bundles (one per camera)
bundles = []
for c, (c2w, w2c) in zip(cams, views):
    origin, dirs = camera_lib.generate_rays(c2w, H, W, cfg.focal)
    pr, steps, *_ = renderer._scheduled_march(params, c2w, origin, dirs, cfg, fz)
    bundles.append(pr)
jax.block_until_ready(bundles)
cap0 = renderer._conv_within(cfg)
print(f"cap0 (within) = {cap0}", flush=True)
payload = shading.pack_rgba_u32(jnp.zeros((N, 4)))

@jax.jit
def restore_full(pos):
    (r,) = compaction.sort_restore_leaves(pos, (payload,))
    return shading.unpack_rgba_u32(r)

@jax.jit
def restore_prefix_scatter(pos):
    pos_p, pay_p = jax.lax.sort((pos[:cap0], payload[:cap0]), dimension=0, num_keys=1)
    canvas = jnp.zeros((N,), jnp.uint32)
    canvas = canvas.at[pos_p].set(pay_p, indices_are_sorted=True, unique_indices=True)
    return shading.unpack_rgba_u32(canvas)

@jax.jit
def restore_prefix_scatter_noflags(pos):
    pos_p, pay_p = jax.lax.sort((pos[:cap0], payload[:cap0]), dimension=0, num_keys=1)
    canvas = jnp.zeros((N,), jnp.uint32)
    canvas = canvas.at[pos_p].set(pay_p)
    return shading.unpack_rgba_u32(canvas)

timed("A full-bundle restore sort", [(lambda b=b: restore_full(b.pos)) for b in bundles])
timed("B prefix sort + flagged scatter", [(lambda b=b: restore_prefix_scatter(b.pos)) for b in bundles])
timed("C prefix sort + plain scatter", [(lambda b=b: restore_prefix_scatter_noflags(b.pos)) for b in bundles])

# correctness: B == A given zero payload is trivial; use real colors
pay_real = shading.pack_rgba_u32(jax.random.uniform(jax.random.key(0), (N, 4)))
a = np.asarray(jax.jit(lambda pos: compaction.sort_restore_leaves(pos, (jnp.where(jnp.arange(N) < cap0, pay_real, 0),))[0])(bundles[0].pos))
b_ = np.asarray(jax.jit(lambda pos: jnp.zeros((N,), jnp.uint32).at[jax.lax.sort((pos[:cap0], pay_real[:cap0]), dimension=0, num_keys=1)[0]].set(jax.lax.sort((pos[:cap0], pay_real[:cap0]), dimension=0, num_keys=1)[1], indices_are_sorted=True, unique_indices=True))(bundles[0].pos))
print("B == A:", np.array_equal(a, b_), flush=True)

# bare coarse kernel (block-major lane order, run to coarse_eps)
bh, bw = cfg.coarse_block
pos0 = jnp.asarray(renderer._block_order_np(H, W, bh, bw))

@jax.jit
def coarse_bare(c2w):
    origin = c2w[:, 3]
    dirs = camera_lib.ray_dirs_from_index(c2w, pos0, H, W, cfg.focal)
    st = march.init_state(origin, dirs, cfg.bound_center, cfg.bound_radius)
    st2, resolve = megakernel.march_pallas_state(
        params, origin, dirs, st, cfg, fz, tile=8192,
        march_eps=cfg.coarse_eps, precision=jax.lax.Precision.DEFAULT,
        relax_omega=cfg.relax_omega, interpret=should_interpret(),
        return_resolve=True, cyl_window=cfg.cyl_window_coarse)
    return st2.t

timed("bare coarse kernel (block order, incl ray build)", [
    (lambda v=v: coarse_bare(v[0])) for v in views
])

# refine entry sort alone (slim: pos,t keyed by near+difficulty proxy)
@jax.jit
def entry_sort(pr):
    near = pr.converged | pr.active
    pos, t = compaction.sort_pack_leaves(near, (pr.pos, pr.t))
    return t
timed("refine entry sort alone (slim)", [(lambda b=b: entry_sort(b)) for b in bundles])
