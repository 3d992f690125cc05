"""Real-TPU kernel oracle checks (non-interpret Pallas vs jnp dense).

tests/test_kernels.py runs the same oracles in Pallas interpret mode on the
CPU test backend; this script is the TPU-mode leg (VERDICT round-1 weak #4):
it compiles the Pallas kernels for the actual hardware (Mosaic) and checks
forward AND backward numerics against dense XLA references on the axon chip.
Part of /verify; also callable standalone:

    python scripts/verify_kernel_tpu.py [--json /tmp/kernels_tpu.json]

Exit code 0 iff every check passes its tolerance. TPU MXU matmuls carry
bf16-grade mantissas unless told otherwise, so tolerances are looser than
the CPU interpret-mode suite (which checks 2e-5 in f64-free f32).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from interpolated_diffusion_tpu.kernels.block_sparse_attention import (
    block_sparse_attention,
    flash_attention,
)
from interpolated_diffusion_tpu.kernels.block_sparse_reference import (
    block_sparse_attention_reference,
)
from interpolated_diffusion_tpu.kernels.int8_attention import (
    int8_block_sparse_attention,
)
from interpolated_diffusion_tpu.kernels.sla import SparseLinearAttention, get_block_map


def _dense(q, k, v, scale=None):
    scale = scale or q.shape[-1] ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-8))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--tol", type=float, default=3e-2,
                   help="max relative error vs the f32 dense oracle")
    p.add_argument("--tol_int8", type=float, default=8e-2)
    args = p.parse_args()

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print(f"backend: {dev.platform} ({dev.device_kind}); "
          f"{'REAL-TPU compiled kernels' if on_tpu else 'CPU (interpret fallback)'}")

    BH, L, D, BM, BN, TOPK = 4, 1024, 64, 128, 128, 4
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kw = jax.random.split(key, 4)
    q = jax.random.normal(kq, (BH, L, D), jnp.float32)
    k = jax.random.normal(kk, (BH, L, D), jnp.float32)
    v = jax.random.normal(kv, (BH, L, D), jnp.float32)
    _, lut, _ = get_block_map(q, k, TOPK / (L // BM), BM, BN)

    report, ok = {}, True

    def check(name, got, want, tol):
        nonlocal ok
        err = _rel_err(got, want)
        passed = bool(err < tol)
        ok &= passed
        report[name] = {"rel_err": round(err, 6), "tol": tol, "ok": passed}
        print(f"  {name:28s} rel_err {err:.2e}  ({'OK' if passed else 'FAIL'})")

    # 1) block-sparse forward: Pallas vs jnp LUT reference
    t0 = time.time()
    o_pallas = jax.jit(
        lambda q, k, v, lut: block_sparse_attention(q, k, v, lut, BM, BN)
    )(q, k, v, lut)
    o_ref, _ = block_sparse_attention_reference(q, k, v, lut, BM, BN)
    check("bsa_fwd_pallas_vs_ref", o_pallas, o_ref, args.tol)

    # 2) block-sparse backward: Pallas dq/dk/dv vs XLA-impl grads
    w = jax.random.normal(kw, (BH, L, D), jnp.float32)

    def loss(impl, bwd_impl):
        def f(q, k, v):
            o = block_sparse_attention(q, k, v, lut, BM, BN,
                                       impl=impl, bwd_impl=bwd_impl)
            return jnp.sum(o.astype(jnp.float32) * w)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    g_pallas = loss("pallas", "pallas")(q, k, v)
    g_xla = loss("xla", "xla")(q, k, v)
    for name, gp, gx in zip(("dq", "dk", "dv"), g_pallas, g_xla):
        check(f"bsa_bwd_{name}", gp, gx, args.tol)

    # 3) dense flash attention vs jnp dense (the long-L exact path)
    o_flash = jax.jit(lambda q, k, v: flash_attention(q, k, v, 256, 256))(q, k, v)
    check("flash_fwd", o_flash, _dense(q, k, v), args.tol)

    # 4) int8 quantized forward vs the bf16 LUT reference (quantization noise
    #    bounded, not bit-exact)
    o_int8 = jax.jit(
        lambda q, k, v, lut: int8_block_sparse_attention(q, k, v, lut, BM, BN)
    )(q, k, v, lut)
    check("int8_fwd_vs_ref", o_int8, o_ref, args.tol_int8)

    # 5) SLA module (sparse + linear branch) pallas vs xla impl, fwd + dq.
    # The module casts the sparse branch to bf16 internally, so both impls
    # see identical bf16 inputs; remaining error is kernel-order effects.
    Bq = q.reshape(2, 2, L, D)

    def sla_loss(impl):
        mod = SparseLinearAttention(head_dim=D, topk=0.25, block_q=BM,
                                    block_k=BN, impl=impl, bwd_impl=impl)
        variables = mod.init(jax.random.PRNGKey(1), Bq, Bq, Bq)

        def f(params, q):
            o = mod.apply({"params": params}, q, q, q)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(f, argnums=1)), variables["params"]

    f_p, params_p = sla_loss("pallas")
    f_x, params_x = sla_loss("xla")
    lp, gp = f_p(params_p, Bq)
    lx, gx = f_x(params_x, Bq)
    check("sla_fwd_loss", lp, lx, args.tol)
    check("sla_dq", gp, gx, args.tol)

    # 6) ring-SLA hop primitive: the sentinel/cross-length (o, lse) forward
    #    (block_sparse_attention_lse, kv_pad_blocks=1) — Pallas vs reference.
    #    Rows mix real and sentinel entries exactly like a ring hop's rebased
    #    LUT (parallel/ring_sla.py); lse must agree too, it drives the
    #    cross-hop log-space merge.
    from interpolated_diffusion_tpu.kernels.block_sparse_attention import (
        block_sparse_attention_lse,
    )

    n_kv_blocks = L // BN
    sent = n_kv_blocks
    khop = jax.random.PRNGKey(7)
    hop_mask = jax.random.bernoulli(khop, 0.5, lut.shape)
    lut_hop = jnp.where(hop_mask, lut, sent).astype(jnp.int32)
    # guarantee at least one real entry per row (col 0 stays real) so the
    # dense comparison below is well-defined for every query row
    lut_hop = lut_hop.at[..., 0].set(lut[..., 0])
    o_hop, lse_hop = jax.jit(
        lambda q, k, v, lu: block_sparse_attention_lse(q, k, v, lu, BM, BN)
    )(q, k, v, lut_hop)
    o_hop_ref, lse_hop_ref = block_sparse_attention_reference(
        q, k, v, lut_hop, BM, BN, kv_len=L, kv_pad_blocks=1
    )
    check("ring_hop_fwd", o_hop, o_hop_ref, args.tol)
    check("ring_hop_lse", lse_hop, lse_hop_ref, args.tol)

    report["elapsed_s"] = round(time.time() - t0, 2)
    report["backend"] = dev.platform
    report["ok"] = bool(ok)
    print(json.dumps({"ok": ok, "elapsed_s": report["elapsed_s"]}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
