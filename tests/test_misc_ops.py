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
