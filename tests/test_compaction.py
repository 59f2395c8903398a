"""Compaction tests vs a numpy reference (replaces the reference's thrust
scan pipeline, volumeRender_kernel.cu:549-576 — including the exact-count fix
for SURVEY.md §3.6.3)."""
import numpy as np
import jax.numpy as jnp

from cudaneuralrender_tpu.ops import compaction


def test_capacity_bucket():
    assert compaction.capacity_bucket(0) == 256
    assert compaction.capacity_bucket(255) == 256
    assert compaction.capacity_bucket(257) == 512
    assert compaction.capacity_bucket(1, minimum=4) == 4


def test_compact_indices_basic():
    mask = jnp.array([False, True, False, True, True, False, False, True])
    idx, valid = compaction.compact_indices(mask, 8)
    np.testing.assert_array_equal(np.asarray(idx[:4]), [1, 3, 4, 7])
    np.testing.assert_array_equal(np.asarray(valid), [True] * 4 + [False] * 4)


def test_last_lane_active_counted():
    """The reference's exclusive-scan undercount bug: last pixel active must
    still be counted (SURVEY.md §3.6.3)."""
    mask = jnp.array([False] * 7 + [True])
    idx, valid = compaction.compact_indices(mask, 4)
    assert int(valid.sum()) == 1
    assert int(idx[0]) == 7


def test_compact_random_vs_numpy(rng):
    mask_np = rng.random(500) < 0.3
    mask = jnp.asarray(mask_np)
    cap = compaction.capacity_bucket(int(mask_np.sum()))
    idx, valid = compaction.compact_indices(mask, cap)
    want = np.nonzero(mask_np)[0]
    np.testing.assert_array_equal(np.asarray(idx)[: len(want)], want)
    assert int(valid.sum()) == len(want)


def test_gather_scatter_roundtrip(rng):
    n = 64
    mask_np = rng.random(n) < 0.4
    mask = jnp.asarray(mask_np)
    t = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cap = compaction.capacity_bucket(int(mask_np.sum()), minimum=4)
    idx, valid = compaction.compact_indices(mask, cap)

    sub_t = t[idx] + 100.0  # "march" the compacted lanes
    (new_t,) = compaction.scatter_state((t,), (sub_t,), idx, valid)
    new_t = np.asarray(new_t)
    t_np = np.asarray(t)
    np.testing.assert_allclose(new_t[mask_np], t_np[mask_np] + 100.0, atol=1e-6)
    np.testing.assert_allclose(new_t[~mask_np], t_np[~mask_np], atol=1e-6)


def test_overflow_capacity_drops_excess():
    """count > capacity must not corrupt slots (overflow goes to dump slot)."""
    mask = jnp.ones((16,), bool)
    idx, valid = compaction.compact_indices(mask, 4)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(valid), [True] * 4)
