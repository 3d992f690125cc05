"""Pipeline parallelism (parallel/pp.py): GPipe schedule over a `pipe` mesh
axis must reproduce the sequential scan-over-layers application exactly —
forward and gradients — including composition with a data axis."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import Mesh

from interpolated_diffusion_tpu.parallel.pp import (
    pipeline_blocks, pp_layer_sharding, scan_blocks,
)

N_LAYERS, DIM = 8, 16


def _block(layer_params, x, ctx):
    h = jnp.tanh(x @ layer_params["w"] + layer_params["b"])
    if ctx is not None:
        h = h + ctx["shift"]
    return h


def _sequential(params, x, ctx=None):
    def body(h, layer_params):
        return _block(layer_params, h, ctx), None

    out, _ = lax.scan(body, x, params)
    return out


def _params(key):
    kw, kb = jax.random.split(key)
    return {
        "w": 0.3 * jax.random.normal(kw, (N_LAYERS, DIM, DIM)),
        "b": 0.1 * jax.random.normal(kb, (N_LAYERS, DIM)),
    }


def _mesh(n_data, n_pipe):
    dev = np.asarray(jax.devices()[: n_data * n_pipe]).reshape(n_data, n_pipe)
    return Mesh(dev, axis_names=("data", "pipe"))


@pytest.mark.parametrize("n_data,n_pipe,n_micro", [(1, 4, 4), (2, 4, 2), (1, 8, 2)])
def test_pp_forward_matches_sequential(n_data, n_pipe, n_micro):
    mesh = _mesh(n_data, n_pipe)
    params = _params(jax.random.PRNGKey(0))
    B = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 6, DIM))

    stage_fn = scan_blocks(_block)
    out = jax.jit(lambda p, x: pipeline_blocks(
        stage_fn, p, x, mesh=mesh, n_microbatches=n_micro))(params, x)
    ref = _sequential(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_with_batched_context():
    mesh = _mesh(2, 4)
    params = _params(jax.random.PRNGKey(2))
    B = 8
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 6, DIM))
    ctx = {"shift": 0.05 * jax.random.normal(jax.random.PRNGKey(4), (B, 6, DIM))}

    stage_fn = scan_blocks(_block)
    out = jax.jit(lambda p, x, c: pipeline_blocks(
        stage_fn, p, x, c, mesh=mesh, n_microbatches=2))(params, x, ctx)
    ref = _sequential(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_gradients_match_sequential():
    """The same pipelined function must TRAIN: grads wrt params and input
    reproduce the sequential stack's (shard_map transpose inserts the
    reverse pipeline + the data-axis psum on replicated params)."""
    mesh = _mesh(2, 4)
    params = _params(jax.random.PRNGKey(5))
    B = 8
    x = jax.random.normal(jax.random.PRNGKey(6), (B, 6, DIM))
    tgt = jax.random.normal(jax.random.PRNGKey(7), (B, 6, DIM))
    stage_fn = scan_blocks(_block)

    def loss_pp(p, x):
        out = pipeline_blocks(stage_fn, p, x, mesh=mesh, n_microbatches=4)
        return jnp.mean((out - tgt) ** 2)

    def loss_seq(p, x):
        return jnp.mean((_sequential(p, x) - tgt) ** 2)

    lp, gp = jax.jit(jax.value_and_grad(loss_pp, argnums=(0, 1)))(params, x)
    ls, gs = jax.jit(jax.value_and_grad(loss_seq, argnums=(0, 1)))(params, x)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_pp_layer_sharding_places_stages():
    mesh = _mesh(1, 8)
    params = _params(jax.random.PRNGKey(8))
    sharded = jax.device_put(params, pp_layer_sharding(params, mesh))
    # each of the 8 devices holds exactly one layer of the [8, ...] stack
    w = sharded["w"]
    assert len(w.addressable_shards) == 8
    assert all(s.data.shape == (1, DIM, DIM) for s in w.addressable_shards)
    out = jax.jit(lambda p, x: pipeline_blocks(
        scan_blocks(_block), p, x, mesh=mesh, n_microbatches=4))(
        sharded, jax.random.normal(jax.random.PRNGKey(9), (8, 6, DIM)))
    ref = _sequential(params, jax.random.normal(jax.random.PRNGKey(9), (8, 6, DIM)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_partial_mode_matches_sequential():
    """mode="partial": only `pipe` is manual — the data axis stays under
    GSPMD, so batch sharding propagates from the argument placement."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh(2, 4)
    params = _params(jax.random.PRNGKey(10))
    x = jax.random.normal(jax.random.PRNGKey(11), (8, 6, DIM))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ps = jax.device_put(
        params, jax.tree_util.tree_map(
            lambda l: NamedSharding(mesh, P("pipe")), params))

    out = jax.jit(lambda p, x: pipeline_blocks(
        scan_blocks(_block), p, x, mesh=mesh, n_microbatches=2,
        mode="partial"))(ps, xs)
    ref = _sequential(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_3d_dp_pp_tp():
    """Full 3D composition on a (data=2, pipe=2, model=2) mesh: pipeline
    stages manual over `pipe`, Megatron TP column/row splits riding GSPMD
    inside each stage (pp_tp_param_sharding), batch over `data` — forward
    and grads must still match the sequential single-device stack."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from interpolated_diffusion_tpu.parallel.pp import pp_tp_param_sharding

    dev = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(dev, axis_names=("data", "pipe", "model"))

    # a TP-splittable block: names from parallel/tp.py rules
    def tp_block(layer_params, x, ctx):
        h = jnp.tanh(x @ layer_params["ffn_in"]["kernel"]
                     + layer_params["ffn_in"]["bias"])
        return x + h @ layer_params["ffn_out"]["kernel"]

    kw, kb, kv = jax.random.split(jax.random.PRNGKey(12), 3)
    params = {
        "ffn_in": {"kernel": 0.3 * jax.random.normal(kw, (4, DIM, 2 * DIM)),
                   "bias": 0.1 * jax.random.normal(kb, (4, 2 * DIM))},
        "ffn_out": {"kernel": 0.3 * jax.random.normal(kv, (4, 2 * DIM, DIM))},
    }
    x = jax.random.normal(jax.random.PRNGKey(13), (8, 6, DIM))
    tgt = jax.random.normal(jax.random.PRNGKey(14), (8, 6, DIM))

    shardings = pp_tp_param_sharding(params, mesh)
    assert shardings["ffn_in"]["kernel"].spec == P("pipe", None, "model")
    assert shardings["ffn_out"]["kernel"].spec == P("pipe", "model", None)
    ps = jax.device_put(params, shardings)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def seq(p, x):
        def body(h, lp):
            return tp_block(lp, h, None), None
        return lax.scan(body, x, p)[0]

    def loss_pp(p, x):
        out = pipeline_blocks(scan_blocks(tp_block), p, x, mesh=mesh,
                              n_microbatches=2, mode="partial")
        return jnp.mean((out - tgt) ** 2)

    def loss_seq(p, x):
        return jnp.mean((seq(p, x) - tgt) ** 2)

    lp, gp = jax.jit(jax.value_and_grad(loss_pp))(ps, xs)
    ls, gs = jax.jit(jax.value_and_grad(loss_seq))(params, x)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_pp_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax sharded save → restore DIRECTLY into the PP layer sharding
    (no full-tree host copy), then run the pipeline on the restored tree."""
    from interpolated_diffusion_tpu.utils.checkpoint_sharded import (
        load_checkpoint_sharded, save_checkpoint_sharded,
    )

    mesh = _mesh(1, 8)
    params = _params(jax.random.PRNGKey(20))
    sh = pp_layer_sharding(params, mesh)
    sharded = jax.device_put(params, sh)
    path = str(tmp_path / "ckpt_3")
    save_checkpoint_sharded(path, sharded, step=3, meta={"stage": "pp"})

    step, payload = load_checkpoint_sharded(path, params, param_shardings=sh)
    assert step == 3
    restored = payload["params"]
    assert restored["w"].sharding.spec == sh["w"].spec
    assert len(restored["w"].addressable_shards) == 8
    x = jax.random.normal(jax.random.PRNGKey(21), (8, 6, DIM))
    out = jax.jit(lambda p, x: pipeline_blocks(
        scan_blocks(_block), p, x, mesh=mesh, n_microbatches=4))(restored, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_sequential(params, x)),
                               rtol=1e-5, atol=1e-5)
