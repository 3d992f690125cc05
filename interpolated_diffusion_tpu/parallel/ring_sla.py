"""Ring-SLA: the block-sparse SLA kernel composed with sequence parallelism.

SURVEY.md §5.7's phase-2 plan: the reference scales sequence length only
*algorithmically* (SLA block-sparsity, SLA/kernel.py) — this module makes the
flagship Pallas kernel the long-context story *end-to-end* by running it under
a sequence-sharded mesh, so no device ever holds the full K/V:

  1. **Global block map without gathering K.** Each device mean-pools its
     local K shard into block descriptors ([L_loc/block_k, D] rows — tiny)
     and `all_gather`s only those; pooled-QKᵀ top-k then yields a GLOBAL
     block LUT exactly like kernels/sla.get_block_map (same smooth-k trick,
     with the K mean taken globally via psum).
  2. **Sentinel-masked hops.** K/V shards rotate the ring (`ppermute`, one
     ICI hop per step, same schedule as parallel/ring.py). At each hop the
     global LUT entries that live on the resident shard are rebased to local
     block ids; all others are pointed at an appended all-zero, fully-masked
     SENTINEL block (kernels/block_sparse_attention.block_sparse_attention_lse
     kv_pad_blocks=1), keeping every hop's kernel launch static-shaped.
  3. **Log-space merge.** Each hop returns (o, lse) with lse in base-2
     (matching the kernel's exp2 trick); hops combine with the same
     numerically-stable log-sum-exp algebra the flash kernels use online.
  4. **Linear branch = psum.** SLA's global low-rank branch decomposes
     exactly under sequence sharding: its K-side reductions φ(k)ᵀv and Σφ(k)
     are `psum`s over the seq axis; the Q side stays local.

Cost note: every hop launches the kernel with the full top-k LUT width (off
-shard entries are sentinels), so per-device compute is m_loc·topk·n_dev
block-matmuls — the same total FLOPs a single device doing the whole global
LUT would do, NOT FLOPs/n_dev. Ring-SLA buys *memory* (each device holds
L/n of K/V + one in-flight shard) and bandwidth locality, which is what
sequence parallelism is for; the FLOP win over dense ring attention is the
usual SLA sparsity (topk/n_blocks).

Forward-only by design: the training path uses per-device SLA or dense ring
attention (parallel/ring.py, reverse-differentiable); ring-SLA targets
long-context *sampling* where the reference uses SLA for exactly the same
reason (notes/PROJECT_LOG.md:609-629 — its 2.6× win is an inference/train
throughput number on the frozen-topology forward).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.block_sparse_attention import block_sparse_attention_lse
from ..kernels.sla import mean_pool_blocks

_NEG_INF = -1e30


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "reference"


def ring_sla_block_map(
    q: jnp.ndarray,          # [BH, L_loc, D] (inside shard_map)
    k: jnp.ndarray,          # [BH, L_loc, D]
    axis_name: str,
    topk_ratio: float,
    block_q: int,
    block_k: int,
) -> jnp.ndarray:
    """Global block LUT [BH, m_loc, topk] with GLOBAL key-block ids.

    Mirrors kernels/sla.get_block_map (smooth-k, pooled QKᵀ, per-row top-k)
    with the two K-side reductions made ring-aware: the smooth-k mean is a
    pmean over the seq axis and the pooled-K descriptor table is an
    all_gather of the per-shard pooled blocks (n_loc × D rows per device —
    the only gathered tensor, ~1000× smaller than K itself).
    """
    L_loc = k.shape[-2]
    if L_loc % block_k:
        raise ValueError(f"local L={L_loc} must divide block_k={block_k} "
                         "(global block grid must align with shards)")
    # smooth-k with the GLOBAL mean (SageAttention trick, SLA/utils.py:56)
    k_mean = jax.lax.pmean(k.mean(axis=-2, keepdims=True), axis_name)
    pk_loc = mean_pool_blocks(k - k_mean, block_k)        # [BH, n_loc, D]
    # all_gather concatenates in ring-axis order → global block g sits at
    # row g = dev * n_loc + local, matching position arithmetic below
    pk = jax.lax.all_gather(pk_loc, axis_name, axis=1, tiled=True)
    pq = mean_pool_blocks(q, block_q)                     # [BH, m_loc, D]
    score = jnp.einsum("bmd,bnd->bmn", pq.astype(jnp.float32),
                       pk.astype(jnp.float32))
    n_blocks = score.shape[-1]
    topk = max(1, min(n_blocks, int(topk_ratio * n_blocks)))
    _, lut = jax.lax.top_k(score, topk)
    return lut.astype(jnp.int32)


def ring_block_sparse_attention(
    q: jnp.ndarray,          # [BH, L_loc, D]
    k: jnp.ndarray,          # [BH, L_loc, D]
    v: jnp.ndarray,          # [BH, L_loc, D]
    lut_global: jnp.ndarray, # [BH, ceil(L_loc/block_m), topk] GLOBAL ids
    axis_name: str,
    block_m: int = 128,
    block_n: int = 128,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Block-sparse attention over the ring: softmax restricted to the
    global LUT's key blocks, K/V sharded over `axis_name`.

    Per hop, LUT entries resident on the in-flight shard are rebased to
    local ids; the rest become the sentinel block id (= L_loc/block_n),
    which block_sparse_attention_lse masks to zero probability. Hop
    (o, lse) pairs merge in base-2 log space.
    """
    impl = _resolve_impl(impl)
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    BH, L_loc, D = q.shape
    if L_loc % block_n:
        raise ValueError(f"local L={L_loc} must divide block_n={block_n}")
    n_loc = L_loc // block_n
    sentinel = n_loc
    if scale is None:
        scale = D ** -0.5

    def use_shard(acc, k_blk, v_blk, s):
        o, m, l = acc
        src = (my_idx + s) % n_dev
        lo = src * n_loc
        in_shard = (lut_global >= lo) & (lut_global < lo + n_loc)
        lut_s = jnp.where(in_shard, lut_global - lo, sentinel).astype(jnp.int32)
        o_s, lse_s = block_sparse_attention_lse(
            q, k_blk, v_blk, lut_s, block_m, block_n, scale, impl
        )
        # log-space merge; all-sentinel hops come back (o=0, lse≈-inf-ish)
        # and self-cancel: their junk denominator weight is scaled by
        # exp2(old_m - real_m) ≈ 0 as soon as a real hop lands.
        m_new = jnp.maximum(m, lse_s)
        alpha = jnp.exp2(m - m_new)
        w = jnp.exp2(lse_s - m_new)
        o = o * alpha[..., None] + o_s.astype(jnp.float32) * w[..., None]
        l = l * alpha + w
        return o, m_new, l

    def step(carry, s):
        k_blk, v_blk, o, m, l = carry
        # rotate THEN use: the local shard is consumed before the scan, so
        # exactly n_dev - 1 ppermutes are issued (see parallel/ring.py:84)
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        o, m, l = use_shard((o, m, l), k_blk, v_blk, s)
        return (k_blk, v_blk, o, m, l), None

    o0 = jax.lax.pcast(jnp.zeros((BH, L_loc, D), jnp.float32), axis_name, to='varying')
    m0 = jax.lax.pcast(jnp.full((BH, L_loc), _NEG_INF, jnp.float32), axis_name, to='varying')
    l0 = jax.lax.pcast(jnp.zeros((BH, L_loc), jnp.float32), axis_name, to='varying')
    o0, m0, l0 = use_shard((o0, m0, l0), k, v, 0)   # local shard, no comm
    (_, _, o, m, l), _ = jax.lax.scan(
        step, (k, v, o0, m0, l0), jnp.arange(1, n_dev)
    )
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_linear_attention(
    q: jnp.ndarray,          # [BH, L_loc, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    feature_map: str = "softmax",
) -> jnp.ndarray:
    """SLA's global low-rank branch under sequence sharding — exact, one
    psum: φ(k)ᵀv [D, D] and Σφ(k) [D] are sums over L, so sharded L just
    means psum of the local partial reductions (kernels/sla._linear_attention
    numerics otherwise unchanged)."""
    if feature_map == "softmax":
        fq, fk = jax.nn.softmax(q, axis=-1), jax.nn.softmax(k, axis=-1)
    elif feature_map == "elu":
        fq, fk = jax.nn.elu(q) + 1, jax.nn.elu(k) + 1
    elif feature_map == "relu":
        fq, fk = jax.nn.relu(q), jax.nn.relu(k)
    else:
        raise NotImplementedError(f"feature map {feature_map}")
    kv = jnp.einsum("bld,ble->bde", fk, v,
                    preferred_element_type=jnp.float32)
    ksum = fk.astype(jnp.float32).sum(axis=-2)              # [BH, D]
    kv = jax.lax.psum(kv, axis_name).astype(q.dtype)
    ksum = jax.lax.psum(ksum, axis_name).astype(q.dtype)
    num = jnp.einsum("bld,bde->ble", fq, kv,
                     preferred_element_type=jnp.float32)
    den = jnp.einsum("bld,bd->bl", fq, ksum,
                     preferred_element_type=jnp.float32)[..., None] + 1e-5
    return (num / den).astype(q.dtype)


def ring_sla_self_attention(
    q: jnp.ndarray,          # [BH, L_loc, D] (inside shard_map)
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    topk_ratio: float = 0.1,
    block_m: int = 128,
    block_n: int = 128,
    scale: Optional[float] = None,
    impl: str = "auto",
    feature_map: str = "softmax",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full ring-SLA: (block-sparse output, linear-branch output).

    Returned separately because the caller (e.g. a WanDiT attention layer)
    owns the zero-init projection applied to the linear branch
    (kernels/sla.SparseLinearAttention proj_l); at init the projection is
    zero, so `o_sparse` alone is the module's output.
    """
    lut = ring_sla_block_map(q, k, axis_name, topk_ratio,
                             block_q=block_m, block_k=block_n)
    o_s = ring_block_sparse_attention(
        q, k, v, lut, axis_name, block_m, block_n, scale, impl
    )
    o_l = ring_linear_attention(q, k, v, axis_name, feature_map)
    return o_s, o_l


def ring_sla_attention(
    q: jnp.ndarray,          # [BH, L, D] (global view)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "seq",
    topk_ratio: float = 0.1,
    block_m: int = 128,
    block_n: int = 128,
    impl: str = "auto",
) -> jnp.ndarray:
    """Host-level entry: shards L over `seq_axis`, runs ring-SLA, returns
    the sparse-branch output (the module-level linear proj is zero-init, so
    this is the SLA module's init-time output; see ring_sla_self_attention).
    """
    n = mesh.shape[seq_axis]
    L = q.shape[1]
    if L % n:
        raise ValueError(f"L={L} not divisible by {seq_axis}={n}")
    if (L // n) % block_n or (L // n) % block_m:
        raise ValueError(f"local L={L // n} must divide block sizes "
                         f"({block_m}, {block_n})")
    spec = P(None, seq_axis, None)

    def inner(q, k, v):
        o_s, _ = ring_sla_self_attention(
            q, k, v, seq_axis, topk_ratio, block_m, block_n, impl=impl
        )
        return o_s

    fn = jax.shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    return fn(put(q), put(k), put(v))
