"""Ring attention: exact attention over a sequence-sharded mesh axis.

NEW capability relative to the reference (SURVEY.md §5.7: the reference
scales sequence length only *algorithmically* — SLA block-sparsity and
chunked causal sampling; it has no sequence parallelism). Ring attention
shards the sequence over a mesh axis and rotates K/V shards around the ring
with `lax.ppermute` (one ICI hop per step), combining partial attention
results with a streaming, numerically-stable online softmax — the same
log-sum-exp merge the flash kernels use, applied across devices. Memory per
device is O((L/n)²) for the score block and O(L/n) for the K/V shard in
flight; no device ever materializes the full [L, L] score matrix or the
full-length K/V.

The per-step block math is plain einsum (MXU-friendly bf16 matmuls; XLA
fuses the softmax pieces), so the whole loop — including `ppermute` — is
reverse-differentiable and jit-compiles into one program. Use it through
`ring_attention` (host-level, wraps shard_map) or call `ring_self_attention`
directly inside an existing shard_map region.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ring_self_attention(
    q: jnp.ndarray,              # [B, H, Lq_local, D]
    k: jnp.ndarray,              # [B, H, Lk_local, D]
    v: jnp.ndarray,              # [B, H, Lk_local, D]
    axis_name: str,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence axis sharded over `axis_name`.

    Must run inside shard_map/pmap with `axis_name` bound. Each device holds
    one contiguous chunk of the sequence (chunk c on mesh position c). K/V
    travel the ring; after n_dev steps every query chunk has attended to
    every key chunk.
    """
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = Dh ** -0.5

    qf = q.astype(jnp.float32) * scale
    neg_inf = -jnp.inf   # true -inf: exp() of a fully-masked row is exactly 0

    q_pos = my_idx * Lq + jnp.arange(Lq)          # global query positions

    def accumulate(acc, k_blk, v_blk, s):
        """Online-softmax merge of the key shard that ORIGINATED on device
        (my_idx + s) % n_dev into the accumulators."""
        o, m, l = acc
        src = (my_idx + s) % n_dev
        srcs = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if causal:
            k_pos = src * Lk + jnp.arange(Lk)
            mask = q_pos[:, None] >= k_pos[None, :]
            srcs = jnp.where(mask[None, None], srcs, neg_inf)
        m_blk = jnp.max(srcs, axis=-1)                       # [B,H,Lq]
        m_new = jnp.maximum(m, m_blk)
        # guard fully-masked blocks (m_new == -inf): exp(nan) paths
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(srcs - m_safe[..., None])
        p = jnp.where(jnp.isfinite(srcs), p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
        l = l * corr + jnp.sum(p, axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return o, m_new, l

    def step(carry, s):
        k_blk, v_blk, o, m, l = carry
        # rotate K/V one hop (shard i -> device i-1) THEN accumulate: the
        # local shard was consumed before the scan, so exactly n_dev - 1
        # rotations are issued (a rotate-after-use loop would run one extra,
        # pure-waste ppermute on the critical path)
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        o, m, l = accumulate((o, m, l), k_blk, v_blk, s)
        return (k_blk, v_blk, o, m, l), None

    # accumulators start replicated but become device-varying in the loop;
    # pcast(to='varying') marks them so scan's carry typing agrees across
    # iterations
    o0 = jax.lax.pcast(jnp.zeros((B, H, Lq, Dh), jnp.float32), axis_name, to='varying')
    m0 = jax.lax.pcast(jnp.full((B, H, Lq), neg_inf, jnp.float32), axis_name, to='varying')
    l0 = jax.lax.pcast(jnp.zeros((B, H, Lq), jnp.float32), axis_name, to='varying')
    o0, m0, l0 = accumulate((o0, m0, l0), k, v, 0)   # local shard, no comm
    (_, _, o, m, l), _ = jax.lax.scan(
        step, (k, v, o0, m0, l0), jnp.arange(1, n_dev)
    )
    o = o / jnp.maximum(l, 1e-30)[..., None]
    return o.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,              # [B, H, L, D] (global view)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "seq",
    causal: bool = False,
) -> jnp.ndarray:
    """Host-level entry: shards L over `seq_axis` and runs the ring loop.

    L must divide evenly by the mesh's seq_axis size (pad upstream — the
    framework's token grids are already multiples of the patch counts).
    """
    n = mesh.shape[seq_axis]
    if q.shape[2] % n:
        raise ValueError(f"L={q.shape[2]} not divisible by {seq_axis}={n}")
    spec = P(None, None, seq_axis, None)
    fn = jax.shard_map(
        partial(ring_self_attention, axis_name=seq_axis, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    return fn(put(q), put(k), put(v))


def make_seq_mesh(n_seq: Optional[int] = None) -> Mesh:
    """1-axis ("seq") mesh over the first n_seq devices."""
    import numpy as np

    devices = jax.devices()
    n = n_seq or len(devices)
    return Mesh(np.asarray(devices[:n]), axis_names=("seq",))
