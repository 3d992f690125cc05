"""Training state + generic jitted train-step factory.

Replaces the reference's imperative AMP/accum/clip/EMA loop
(train_keypoints.py:540-556) with one compiled program: loss+grad (bf16
compute, f32 params), lax.scan microbatch gradient accumulation, global-norm
clipping, AdamW, and a fused pytree EMA update — all inside a single jit.
Under a (data, model) mesh the same step runs SPMD: batch sharded on `data`,
params replicated, gradient all-reduce inserted by XLA.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..utils.ema import ema_update


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any
    opt_state: Any
    ema_params: Optional[Any]


def make_optimizer(
    lr: float,
    weight_decay: float = 1e-2,
    grad_clip: float = 1.0,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    schedule: str = "constant",
    optimizer: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW (default) or Muon + global-norm clip.

    Parity with reference create_optimizer (utils/optim.py:23-55: fused AdamW
    + optional torch Muon); Muon comes from optax.contrib (Newton-Schulz
    orthogonalized momentum on 2D params, AdamW elsewhere).
    """
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("schedule='cosine' requires total_steps > 0")
        lr_sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps
        )
    elif warmup_steps > 0:
        lr_sched = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        lr_sched = lr
    if optimizer == "muon":
        opt = optax.contrib.muon(
            lr_sched, adam_weight_decay=weight_decay
        )
    else:
        opt = optax.adamw(lr_sched, weight_decay=weight_decay)
    return optax.chain(optax.clip_by_global_norm(grad_clip), opt)


def with_frozen_partition(
    tx: optax.GradientTransformation, label_fn
) -> optax.GradientTransformation:
    """Wrap tx so params labeled "freeze" get zero updates and no optimizer
    state — frozen-base (e.g. LoRA) training without capturing the base as a
    jit constant."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label_fn
    )


def make_train_step_frozen(
    loss_fn,                       # loss_fn(params, frozen, batch, rng)
    tx: optax.GradientTransformation,
    ema_decay: float = 0.999,
    donate: bool = True,
):
    """Train step with a large frozen pytree passed as a plain argument.

    Differentiates ONLY w.r.t. `params` — the frozen tree (e.g. a 1.3B LoRA
    base) is neither captured as a multi-GB jit constant nor materialized as
    a zero-gradient tree (which OOMs HBM at Wan scale)."""

    def step_fn(state: TrainState, frozen, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            ema_update(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None else None
        )
        metrics = dict(aux) if isinstance(aux, dict) else {}
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt_state, new_ema), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def init_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    use_ema: bool = True,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
    )


LossFn = Callable[[Any, Dict[str, Any], jax.Array], Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]


def _loss_and_grads(loss_fn, params, batch, rng, grad_accum: int):
    """(loss, aux, grads), with microbatch accumulation when grad_accum > 1.

    Loss, grads, AND aux metrics are averaged over the microbatches (aux from
    only the last microbatch would be a biased 1/grad_accum sample)."""

    def grads_of(p, b, r):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b, r)
        return loss, aux, grads

    if grad_accum <= 1:
        return grads_of(params, batch, rng)

    def split_micro(x):
        x = jnp.asarray(x)
        if x.ndim == 0:  # scalar batch entries are broadcast
            return jnp.broadcast_to(x, (grad_accum,))
        return x.reshape(grad_accum, x.shape[0] // grad_accum, *x.shape[1:])

    micro = jax.tree_util.tree_map(split_micro, batch)
    rngs = jax.random.split(rng, grad_accum)

    def body(carry, inp):
        mb, r = inp
        loss, aux, grads = grads_of(params, mb, r)
        acc_loss, acc_grads = carry
        acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
        return (acc_loss + loss, acc_grads), aux

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    (loss_sum, grads), auxes = jax.lax.scan(
        body, (jnp.zeros(()), zero_grads), (micro, rngs)
    )
    loss = loss_sum / grad_accum
    grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
    aux = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), auxes)
    return loss, aux, grads


def _step_metrics(loss, grads, aux):
    """aux first so the averaged loss/grad_norm can never be clobbered."""
    metrics = dict(aux) if isinstance(aux, dict) else {}
    metrics["loss"] = loss
    metrics["grad_norm"] = optax.global_norm(grads)
    return metrics


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.999,
    grad_accum: int = 1,
    donate: bool = True,
):
    """Compile loss_fn(params, batch, rng) -> (loss, aux) into a full step.

    With grad_accum > 1 the batch's leading axis must be divisible by
    grad_accum; microbatches are scanned and gradients averaged (the
    reference's --grad_accum semantics inside one jit).
    """

    def step_fn(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        loss, aux, grads = _loss_and_grads(
            loss_fn, state.params, batch, rng, grad_accum
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            ema_update(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, _step_metrics(loss, grads, aux)

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_train_multi_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.999,
    grad_accum: int = 1,
    steps_per_call: int = 1,
    donate: bool = True,
):
    """S train steps per dispatch via lax.scan over a superbatch [S, B, ...].

    Amortizes host→device transfer latency and dispatch round trips — on the
    tunneled single-chip setup each device_put costs ~90 ms + ~30 MB/s, so a
    10-step superbatch cuts per-step input overhead ~10×. Returns
    (state, metrics-of-last-step).
    """
    if steps_per_call <= 1:
        return make_train_step(loss_fn, tx, ema_decay, grad_accum, donate)

    def one_step(state: TrainState, batch, rng):
        loss, aux, grads = _loss_and_grads(
            loss_fn, state.params, batch, rng, grad_accum
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            ema_update(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None else None
        )
        return (TrainState(state.step + 1, new_params, new_opt_state, new_ema),
                _step_metrics(loss, grads, aux))

    def multi_step(state: TrainState, superbatch, rng: jax.Array):
        rngs = jax.random.split(rng, steps_per_call)

        def body(st, inp):
            batch, r = inp
            return one_step(st, batch, r)

        state, metrics = jax.lax.scan(body, state, (superbatch, rngs))
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def stack_batches(batches):
    """List of S batch dicts → one superbatch dict with leading S axis."""
    import numpy as np

    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}
