"""Port of reference tests/test_interp_system.py — the invariant suite:
mask counts, nestedness, K-schedule exactness, anchor preservation, Stage-2
batch construction equivalence, per-dim known masks, checkpoint meta
round-trip, clamp policies, and the GT-isolation guard."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from interpolated_diffusion_tpu.ops.clamp import apply_clamp
from interpolated_diffusion_tpu.ops.keyframes import (
    build_nested_masks_batch,
    build_nested_masks_from_base,
    build_nested_masks_from_level_logits,
    build_nested_masks_from_logits,
    compute_k_schedule,
    interpolate_from_indices,
    interpolate_from_mask,
    sample_fixed_k_indices_batch,
    sample_fixed_k_indices_uniform_batch,
)
from interpolated_diffusion_tpu.train.batches import (
    build_interp_adjacent_batch,
    build_interp_level_batch,
    build_known_mask_values,
)
from interpolated_diffusion_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _ref_k_list(T, K_min, levels):
    """Independent reimplementation of the doubling schedule (as the reference
    test does) to cross-check compute_k_schedule."""
    K_min = min(K_min, T)
    K_list = [0] * (levels + 1)
    K_list[levels] = K_min
    for s in range(levels, 0, -1):
        K_list[s - 1] = min(T, max(K_list[s] + 1, 2 * K_list[s]))
    return K_list


def test_fixed_k_mask_exact_count():
    T, K = 10, 4
    idx, mask = sample_fixed_k_indices_batch(jax.random.PRNGKey(0), 1, T, K)
    assert int(mask.sum()) == K
    assert bool(mask[0, 0]) and bool(mask[0, T - 1])
    assert np.all(np.diff(np.asarray(idx[0])) > 0)


def test_uniform_indices_strictly_increasing():
    idx, mask = sample_fixed_k_indices_uniform_batch(
        jax.random.PRNGKey(0), 4, 32, 6, jitter=0.9
    )
    idx = np.asarray(idx)
    assert np.all(np.diff(idx, axis=1) > 0)
    assert np.all(idx[:, 0] == 0) and np.all(idx[:, -1] == 31)
    assert np.all(np.asarray(mask).sum(axis=1) == 6)


def test_nested_masks_batch_is_nested_and_counts_match():
    B, T, K_min, levels = 4, 16, 3, 3
    masks_levels, idx_levels = build_nested_masks_batch(
        jax.random.PRNGKey(0), B, T, K_min, levels
    )
    assert masks_levels.shape == (B, levels + 1, T)
    assert len(idx_levels) == levels + 1
    K_list = _ref_k_list(T, K_min, levels)
    assert compute_k_schedule(T, K_min, levels) == K_list
    m = np.asarray(masks_levels)
    for s in range(1, levels + 1):
        assert np.all(m[:, s] <= m[:, s - 1])
    for s in range(levels + 1):
        assert np.all(m[:, s].sum(axis=1) == K_list[s])
        assert np.all(m[:, s, 0]) and np.all(m[:, s, -1])


def test_nested_masks_from_base_keeps_base_level():
    B, T, levels = 3, 20, 2
    idx_base, _ = sample_fixed_k_indices_batch(jax.random.PRNGKey(1), B, T, 4)
    masks_levels, idx_levels = build_nested_masks_from_base(
        jax.random.PRNGKey(2), idx_base, T, levels
    )
    np.testing.assert_array_equal(
        np.asarray(idx_levels[levels]), np.sort(np.asarray(idx_base), axis=1)
    )
    m = np.asarray(masks_levels)
    for s in range(1, levels + 1):
        assert np.all(m[:, s] <= m[:, s - 1])
    K_list = _ref_k_list(T, 4, levels)
    for s in range(levels + 1):
        assert np.all(m[:, s].sum(axis=1) == K_list[s])


def test_nested_masks_from_logits():
    B, T, K_min, levels = 2, 12, 3, 2
    logits = jax.random.normal(jax.random.PRNGKey(0), (B, T))
    masks_levels, idx_levels = build_nested_masks_from_logits(logits, K_min, levels)
    m = np.asarray(masks_levels)
    K_list = _ref_k_list(T, K_min, levels)
    for s in range(1, levels + 1):
        assert np.all(m[:, s] <= m[:, s - 1])
    for s in range(levels + 1):
        assert np.all(m[:, s].sum(axis=1) == K_list[s])
    # Coarsest interior picks are the top-(K_min−2) interior logits.
    interior = np.asarray(logits)[:, 1:-1]
    want = np.sort(np.argsort(-interior, axis=1)[:, : K_min - 2] + 1, axis=1)
    got = np.asarray(idx_levels[levels])[:, 1:-1]
    np.testing.assert_array_equal(got, want)


def test_nested_masks_from_level_logits():
    B, T, K_min, levels = 2, 12, 3, 2
    logits = jax.random.normal(jax.random.PRNGKey(3), (B, levels + 1, T))
    masks_levels, idx_levels = build_nested_masks_from_level_logits(logits, K_min, levels)
    m = np.asarray(masks_levels)
    K_list = _ref_k_list(T, K_min, levels)
    for s in range(1, levels + 1):
        assert np.all(m[:, s] <= m[:, s - 1])
    for s in range(levels + 1):
        assert np.all(m[:, s].sum(axis=1) == K_list[s])
        idx_s = np.asarray(idx_levels[s])
        assert np.all(np.diff(idx_s, axis=1) > 0)
        assert np.all(m[np.arange(B)[:, None], s, idx_s])


def test_interpolate_preserves_anchors_exactly():
    T, D = 12, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (T, D))
    _, mask = sample_fixed_k_indices_batch(jax.random.PRNGKey(1), 1, T, 4)
    mask = mask[0]
    y = interpolate_from_mask(x, mask)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(y)[m], np.asarray(x)[m])


def test_stage2_training_constructs_x_s_from_x0_and_M_s():
    B, T, D = 2, 8, 2
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    x_s, mask_s, s_idx, _, _ = build_interp_level_batch(
        jax.random.PRNGKey(123), x0, K_min=3, levels=2
    )
    for b in range(B):
        y = interpolate_from_mask(x0[b], mask_s[b])
        np.testing.assert_allclose(np.asarray(x_s[b]), np.asarray(y), atol=1e-5)


def test_stage2_adjacent_batch_masks_nested():
    B, T, D = 3, 16, 2
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    x_s, x_prev, mask_s, mask_prev, s_idx, _, _ = build_interp_adjacent_batch(
        jax.random.PRNGKey(7), x0, K_min=3, levels=3
    )
    assert np.all(np.asarray(mask_s) <= np.asarray(mask_prev))
    # x_prev has strictly more anchors -> closer to x0 (weakly, in MSE).
    for b in range(B):
        y_prev = interpolate_from_mask(x0[b], mask_prev[b])
        np.testing.assert_allclose(np.asarray(x_prev[b]), np.asarray(y_prev), atol=1e-5)


def test_vectorized_interpolation_preserves_anchors_exact():
    B, T, K, D = 3, 10, 4, 2
    idx, mask = sample_fixed_k_indices_batch(jax.random.PRNGKey(0), B, T, K)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    vals = jnp.take_along_axis(x0, idx[..., None], axis=1)
    y = interpolate_from_indices(idx, vals, T)
    gathered = jnp.take_along_axis(y, idx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(vals))


def test_known_mask_per_dim_endpoints():
    B, T, D = 1, 8, 4
    idx = jnp.array([[0, 3, 6, 7]], dtype=jnp.int32)
    cond = {"start_goal": jnp.array([[1.0, 2.0, 3.0, 4.0]])}
    known_mask, known_values = build_known_mask_values(idx, cond, D, T)
    km = np.asarray(known_mask)
    kv = np.asarray(known_values)
    assert np.all(km[0, 0, :2]) and not np.any(km[0, 0, 2:])
    assert np.all(km[0, -1, :2]) and not np.any(km[0, -1, 2:])
    assert not np.any(km[0, 1:-1, :])
    np.testing.assert_allclose(kv[0, 0, :2], [1.0, 2.0])
    np.testing.assert_allclose(kv[0, -1, :2], [3.0, 4.0])
    assert np.all(kv[0, :, 2:] == 0)


def test_checkpoint_meta_roundtrip():
    params = {"w": jnp.ones((2, 2)), "b": jnp.zeros((2,))}
    meta = {"stage": "keypoints", "N_train": 100, "schedule": "linear"}
    with tempfile.TemporaryDirectory() as tmpdir:
        path = os.path.join(tmpdir, "ckpt_5")
        save_checkpoint(path, params, step=5, meta=meta)
        step, payload = load_checkpoint(path, params)
    assert step == 5
    assert payload["meta"] == meta
    np.testing.assert_allclose(np.asarray(payload["params"]["w"]), 1.0)


def test_checkpoint_save_is_atomic_and_overwrites():
    """Saves stage in a temp dir and rename into place: overwriting the same
    path works, no stage dirs are left behind, and latest_checkpoint never
    sees a half-written directory (the round-4 smoke caught a reader racing
    a mid-save params.msgpack)."""
    from interpolated_diffusion_tpu.utils.checkpoint import latest_checkpoint

    params = {"w": jnp.ones((2, 2))}
    with tempfile.TemporaryDirectory() as tmpdir:
        path = os.path.join(tmpdir, "ckpt_5")
        save_checkpoint(path, params, step=5, meta={"a": 1})
        # overwrite the same step (resume + re-save path)
        save_checkpoint(path, {"w": 2 * jnp.ones((2, 2))}, step=5, meta={"a": 2})
        step, payload = load_checkpoint(path, params)
        assert step == 5 and payload["meta"] == {"a": 2}
        np.testing.assert_allclose(np.asarray(payload["params"]["w"]), 2.0)
        # no stage/backup residue, and the scanner sees exactly this ckpt
        assert [d for d in os.listdir(tmpdir) if d != "ckpt_5"] == []
        assert latest_checkpoint(tmpdir) == path


def test_checkpoint_crash_window_recovery():
    """A kill between save_checkpoint's two overwrite renames leaves the
    target absent with the old copy at .prev-<name>; latest_checkpoint and
    the next save must restore it (ADVICE r4 medium). Stale .tmp- staging
    dirs from crashed saves (incl. PID reuse) must be swept, not fatal."""
    import shutil

    from interpolated_diffusion_tpu.utils.checkpoint import latest_checkpoint

    params = {"w": jnp.ones((2, 2))}
    with tempfile.TemporaryDirectory() as tmpdir:
        path = os.path.join(tmpdir, "ckpt_5")
        save_checkpoint(path, params, step=5, meta={"a": 1})
        # simulate the crash window: path renamed away, new stage never landed
        os.replace(path, os.path.join(tmpdir, ".prev-ckpt_5"))
        os.makedirs(os.path.join(tmpdir, ".tmp-ckpt_5-99999"))
        assert latest_checkpoint(tmpdir) == path  # recovered
        step, payload = load_checkpoint(path, params)
        assert step == 5 and payload["meta"] == {"a": 1}
        # a later save over the recovered ckpt sweeps stale dirs and succeeds
        shutil.rmtree(os.path.join(tmpdir, ".tmp-ckpt_5-99999"), ignore_errors=True)
        os.makedirs(os.path.join(tmpdir, f".tmp-ckpt_5-{os.getpid()}"))
        save_checkpoint(path, {"w": 3 * jnp.ones((2, 2))}, step=5, meta={"a": 3})
        step, payload = load_checkpoint(path, params)
        assert step == 5 and payload["meta"] == {"a": 3}
        assert [d for d in os.listdir(tmpdir) if d != "ckpt_5"] == []


def test_clamp_policy_endpoints_only():
    B, T, D = 1, 5, 4
    x_ref = jnp.zeros((B, T, D))
    x_hat = jnp.ones((B, T, D))
    clamp_mask = jnp.zeros((B, T), dtype=bool).at[:, 0].set(True).at[:, -1].set(True)
    out = np.asarray(apply_clamp(x_hat, x_ref, clamp_mask, "pos"))
    assert np.all(out[:, 0, :2] == 0) and np.all(out[:, -1, :2] == 0)
    assert np.all(out[:, 1:-1, :2] == 1)
    assert np.all(out[:, :, 2:] == 1)


def test_end_to_end_generation_does_not_use_ground_truth_x():
    class SampleDict(dict):
        def __getitem__(self, key):
            if key == "x":
                raise RuntimeError("x should not be accessed")
            return super().__getitem__(key)

    sample = SampleDict(
        cond={"occ": jnp.zeros((1, 2, 2)), "start_goal": jnp.zeros(4)}
    )
    cond = sample["cond"]
    assert "occ" in cond and "start_goal" in cond
