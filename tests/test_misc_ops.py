"""Rectified flow, Muon optimizer, sharded checkpoints."""
import jax
import jax.numpy as jnp
import numpy as np


def test_rectified_flow_recovers_constant_target():
    """With the exact velocity field, rf_sample must land on x0 exactly."""
    from interpolated_diffusion_tpu.ops.rectified_flow import (
        rf_interpolate, rf_loss, rf_sample,
    )

    x0 = jnp.full((4, 8, 2), 0.7)

    def exact_velocity(x, t):
        # On straight paths the velocity is constant: v = ε − x0, and from
        # (x, t) it is recoverable as (x − x0)/t.
        tt = jnp.clip(t, 1e-3, 1.0)[:, None, None]
        return (x - x0) / tt

    out = rf_sample(exact_velocity, jax.random.PRNGKey(0), (4, 8, 2), steps=50)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=2e-2)

    # loss is zero for the true velocity
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jax.random.uniform(jax.random.PRNGKey(2), (4,))
    x_t, v = rf_interpolate(x0, t, noise)
    assert float(rf_loss(v, x0, noise)) < 1e-10


def test_muon_optimizer_step():
    from interpolated_diffusion_tpu.train.state import (
        init_train_state, make_optimizer, make_train_step,
    )

    def loss_fn(params, batch, rng):
        return ((batch["x"] @ params["w"] - batch["y"]) ** 2).mean(), {}

    tx = make_optimizer(1e-2, optimizer="muon")
    state = init_train_state({"w": jnp.ones((4, 2))}, tx, use_ema=False)
    step = make_train_step(loss_fn, tx, donate=False)
    batch = {"x": jax.random.normal(jax.random.PRNGKey(0), (8, 4)),
             "y": jax.random.normal(jax.random.PRNGKey(1), (8, 2))}
    s1, m1 = step(state, batch, jax.random.PRNGKey(2))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(3))
    assert float(m2["loss"]) < float(m1["loss"])


def test_sharded_checkpoint_roundtrip(tmp_path):
    from interpolated_diffusion_tpu.utils.checkpoint_sharded import (
        load_checkpoint_sharded, save_checkpoint_sharded,
    )
    from interpolated_diffusion_tpu.utils.checkpoint import read_meta

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    meta = {"stage": "keypoints", "T": 64}
    path = str(tmp_path / "ckpt_5")
    save_checkpoint_sharded(path, params, step=5, meta=meta)
    step, payload = load_checkpoint_sharded(path, params)
    assert step == 5 and payload["meta"] == meta
    np.testing.assert_allclose(np.asarray(payload["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    # the single-host reader's meta helpers work on the orbax format too
    step2, meta2 = read_meta(path)
    assert step2 == 5 and meta2 == meta


def test_sharded_checkpoint_async_save(tmp_path):
    """async_save returns immediately; after wait_for_async_saves the arrays
    AND meta.json are durable and load back exactly. Back-to-back async
    saves serialize (second save joins the first)."""
    import os

    from interpolated_diffusion_tpu.utils.checkpoint_sharded import (
        load_checkpoint_sharded, save_checkpoint_sharded,
        wait_for_async_saves,
    )

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    p1, p2 = str(tmp_path / "ckpt_1"), str(tmp_path / "ckpt_2")
    save_checkpoint_sharded(p1, params, step=1, meta={"k": 1},
                            async_save=True)
    save_checkpoint_sharded(
        p2, jax.tree_util.tree_map(lambda x: x * 2, params), step=2,
        meta={"k": 2}, async_save=True)
    wait_for_async_saves()
    assert os.path.exists(os.path.join(p1, "meta.json"))
    assert os.path.exists(os.path.join(p2, "meta.json"))
    s1, pay1 = load_checkpoint_sharded(p1, params)
    s2, pay2 = load_checkpoint_sharded(p2, params)
    assert (s1, s2) == (1, 2)
    np.testing.assert_allclose(np.asarray(pay1["params"]["w"]) * 2,
                               np.asarray(pay2["params"]["w"]))


def test_rf_loss_mask_shapes_and_scale():
    """[B,T] and [B,T,1] masks broadcast; an all-ones mask equals mean()."""
    import jax.numpy as jnp
    from interpolated_diffusion_tpu.ops.rectified_flow import rf_loss

    B, T, D = 2, 6, 4
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    v_pred = jax.random.normal(k[0], (B, T, D))
    x0 = jax.random.normal(k[1], (B, T, D))
    noise = jax.random.normal(k[2], (B, T, D))
    base = float(rf_loss(v_pred, x0, noise))
    for mask in (jnp.ones((B, T)), jnp.ones((B, T, 1)), jnp.ones((B, T, D))):
        np.testing.assert_allclose(float(rf_loss(v_pred, x0, noise, mask)),
                                   base, rtol=1e-5)
    # half-masked loss uses only the selected positions, same scale
    m = jnp.zeros((B, T)).at[:, :3].set(1.0)
    half = float(rf_loss(v_pred, x0, noise, m))
    ref = float((((noise - x0) - v_pred) ** 2)[:, :3].mean())
    np.testing.assert_allclose(half, ref, rtol=1e-5)


def test_uniform_jitter_indices_strictly_increasing():
    """Large jitter must not create duplicate anchors near T-1."""
    from interpolated_diffusion_tpu.ops.keyframes import (
        sample_fixed_k_indices_uniform_batch,
    )

    idx, _ = sample_fixed_k_indices_uniform_batch(
        jax.random.PRNGKey(3), 64, 17, 16, ensure_endpoints=False, jitter=2.0
    )
    d = np.diff(np.asarray(idx), axis=1)
    assert (d >= 1).all(), f"duplicate/decreasing anchors: min diff {d.min()}"
    assert int(np.asarray(idx).max()) <= 16


def test_multi_step_applies_grad_accum():
    """steps_per_call>1 with grad_accum>1 must match grad_accum semantics
    (identical params to the single-step grad-accum path on the same data)."""
    import optax
    from interpolated_diffusion_tpu.train.state import (
        init_train_state, make_train_step, make_train_multi_step,
    )

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        return ((pred - batch["y"]) ** 2).mean(), {"aux_mse": ((pred - batch["y"]) ** 2).mean()}

    k = jax.random.split(jax.random.PRNGKey(0), 4)
    params = {"w": jax.random.normal(k[0], (5, 3))}
    batch = {"x": jax.random.normal(k[1], (8, 5)),
             "y": jax.random.normal(k[2], (8, 3))}
    tx = optax.sgd(0.1)
    s1 = init_train_state(params, tx, use_ema=False)
    s2 = init_train_state(params, tx, use_ema=False)
    step = make_train_step(loss_fn, tx, grad_accum=4, donate=False)
    multi = make_train_multi_step(loss_fn, tx, grad_accum=4, steps_per_call=2,
                                  donate=False)
    r = jax.random.PRNGKey(7)
    s1, m1 = step(s1, batch, jax.random.fold_in(r, 0))
    s1, m1 = step(s1, batch, jax.random.fold_in(r, 1))
    super_batch = {kk: jnp.stack([v, v]) for kk, v in batch.items()}
    rngs_key = r

    # multi-step internally splits its rng; to compare, run it and check the
    # grad-accum effect structurally: with a deterministic loss (no rng use),
    # params must match the sequential grad-accum steps exactly
    s2, m2 = multi(s2, super_batch, rngs_key)
    np.testing.assert_allclose(np.asarray(s1.params["w"]),
                               np.asarray(s2.params["w"]), atol=1e-6)
    # aux metrics are averaged and never clobber loss/grad_norm
    assert "aux_mse" in m2 and "loss" in m2 and "grad_norm" in m2


def test_tuning_registry_guards(tmp_path, monkeypatch):
    """Tuned SLA blocks must not apply to short-L callers (block-map
    granularity changes outputs), and a training-time best_grad lookup must
    not fall back to a forward-only winner (its backward may not compile)."""
    import json

    from interpolated_diffusion_tpu.kernels import tuning

    reg = {
        "flash": {"best_fwd": "256x512", "best_grad": None},
        "sla": {"best_fwd": "512x512", "best_grad": "512x512"},
    }
    p = tmp_path / "tune.json"
    p.write_text(json.dumps(reg))
    monkeypatch.setenv("ID_TPU_ATTN_TUNE", str(p))
    tuning._load.cache_clear()

    # long-L: tuned SLA block applies; short-L: configured default survives
    assert tuning.sla_blocks(default=128, L=32760) == 512
    assert tuning.sla_blocks(default=128, L=1344) == 128
    # best_grad is null for flash -> defaults, NOT the best_fwd winner
    assert tuning.flash_blocks(default_m=512, default_n=1024) == (512, 1024)
    assert tuning.flash_blocks(prefer="best_fwd") == (256, 512)
    tuning._load.cache_clear()
