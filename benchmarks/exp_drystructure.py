"""Run-to-dry refine (single rung, small tiles) vs the bounded ladder.

Hypothesis: with per-tile early exit, ONE run-to-dry rung over the sorted
near set at tile 1024 gives continuous ladder granularity, and execution
approaches the useful-lane-step integral (~15 ms) if the sort key is good.

RESULT: dead end at any key quality. End-to-end (ab section): single (4,0)
121.9 ms/frame vs ladder 55.8; hybrids in between or worse. Isolated pass
with a PERFECT key (oracle = true resolve steps recorded from a prior
identical run): 64.5 ms vs the ladder's ~29 ms marginal — and tile 2048 is
worse (78.8). The sequential grid pays a large fixed cost per tile (~500
tiles at 1080p) and wide-tile straggler amplification; bounded rungs with
re-sorts between them remain the right structure: the sorts re-concentrate
stragglers so only O(log) passes see them. Keep refine_schedule ladders.
"""
import sys

MODE = sys.argv[1] if len(sys.argv) > 1 else "ab"   # "ab" | "oracle"

if MODE == "ab":
    import sys, time
    import os as _os
    sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    import jax.numpy as jnp
    import numpy as np
    import cudaneuralrender_tpu as cnr

    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cams = [cnr.Camera(rotation_y=25.0 + 45 * i, rotation_x=10.0) for i in range(4)]
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000, march_impl="staged")
    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())
    ref_hits = None
    for name, sched in [("D ladder (base)", base.refine_schedule),
                        ("single run-to-dry (4,0)", ((4, 0),)),
                        ("hybrid (4,12)+(8,0)", ((4, 12), (8, 0))),
                        ("hybrid (4,16)+(16,0)", ((4, 16), (16, 0)))]:
        cfg = base.replace(refine_schedule=sched)
        stats = []
        imgs = cnr.render_sequence(params, cams, cfg, stats_out=stats)
        sync(imgs)
        slow = sum(0 if s["fast_path"] else 1 for s in stats)
        hits = np.asarray(jnp.stack([jnp.sum(im[..., 3] > 0) for im in imgs]))
        if ref_hits is None:
            ref_hits = hits
        agree = 1.0 - np.abs(hits - ref_hits).sum() / max(ref_hits.sum(), 1)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            sync(cnr.render_sequence(params, cams, cfg))
            times.append((time.perf_counter() - t0) / len(cams))
        ms = np.min(times) * 1e3
        print(f"{name:26s}: {ms:7.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f} Mrays/s"
              f"  agree={agree:.6f} slow={slow}", flush=True)
else:
    import sys, time
    import os as _os
    sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    import jax, jax.numpy as jnp
    import numpy as np
    import cudaneuralrender_tpu as cnr
    from cudaneuralrender_tpu.ops import camera as camera_lib, compaction, march
    from cudaneuralrender_tpu.pallas import megakernel
    from cudaneuralrender_tpu.pallas.fused_mlp import should_interpret
    from cudaneuralrender_tpu.render import renderer

    K = 6
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000, march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, _ = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
    fz = jnp.float32(0.0)
    cap = max(n // 4, cfg.compact_min)

    @jax.jit
    def coarse(o, d):
        st = march.init_state(o, d, cfg.bound_center, cfg.bound_radius)
        st, res = megakernel.march_pallas_state(
            params, o, d, st, cfg, fz, tile=8192, march_eps=cfg.coarse_eps,
            precision=jax.lax.Precision.DEFAULT, relax_omega=cfg.relax_omega,
            interpret=should_interpret(), return_resolve=True)
        return st.t, st.active, st.converged, res

    t0a, act0, conv0, res0 = coarse(origin, dirs)
    near = act0 | conv0

    def entry(order):
        pos, t = compaction.sort_pack_leaves(near, (jnp.arange(n, dtype=jnp.int32), t0a), order=order)
        return pos, t, jnp.arange(n, dtype=jnp.int32) < jnp.sum(near)

    def dry_pass(pos, t, active, tile):
        pr = renderer.PackedRays(pos=pos, t=t, active=active, converged=jnp.zeros_like(active))
        sub, dirs_b = renderer._pr_bucket(pr, cap, jnp.int32(30), cam_to_world, origin, cfg)
        return megakernel.march_pallas_state(
            params, origin, dirs_b, sub, cfg, fz, tile=tile, march_eps=cfg.march_eps,
            precision=jax.lax.Precision.HIGHEST, num_steps=None,
            relax_omega=cfg.relax_omega_refine, interpret=should_interpret(),
            return_resolve=True)

    # oracle from a default-keyed run
    p_, t_, a_ = entry(res0)
    _, oracle_b = jax.jit(lambda p, t, a: dry_pass(p, t, a, 1024))(p_, t_, a_)
    oracle_img = jnp.zeros((n,), jnp.float32).at[p_[:cap]].set(oracle_b)

    noop = jax.jit(lambda x: x + 1.0); noop(fz)
    ts = [0.0]*5
    for i in range(5):
        s = time.perf_counter(); float(jnp.sum(noop(fz))); ts[i] = time.perf_counter()-s
    rtt = float(np.median(ts))
    print(f"near={int(jnp.sum(near))} RTT~{rtt*1e3:.1f}ms", flush=True)

    def timed(name, order, tile):
        def body(tt):
            pos, t2, active = entry(order)
            st, _ = dry_pass(pos, t2 + tt * 1e-30, active, tile)
            return st.t
        @jax.jit
        def chain(tt):
            out = body(tt)
            for _ in range(K - 1):
                out = body(jnp.sum(out))
            return out
        float(jnp.sum(chain(fz)))
        ts = []
        for _ in range(4):
            s = time.perf_counter(); float(jnp.sum(chain(fz))); ts.append(time.perf_counter()-s)
        med = max(float(np.median(ts))-rtt, 0)/K
        print(f"{name:44s}: ~{med*1e3:7.2f} ms device/run", flush=True)

    timed("dry (4,0) coarse-resolve key, tile 1024", res0, 1024)
    timed("dry (4,0) ORACLE key, tile 1024", oracle_img, 1024)
    timed("dry (4,0) ORACLE key, tile 2048", oracle_img, 2048)
