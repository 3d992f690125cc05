"""Component profile of the flagship e2e pipeline (bench.py config).

Answers, with clean in-jit numbers, the round-3 question "is small-L
attention still the dominant term at T=64?": measures the kp denoiser
(K=8) and il denoiser (T=64) forwards per-iteration under each small-L
attention policy, plus a projections-only skeleton (ID_TPU_PROFILE_SKIP_ATTN)
that isolates the attention math itself.

Per-iter timing runs a lax.scan of N_SCAN forwards inside ONE jit (a chained
dependency prevents DCE) — per-dispatch axon-tunnel overhead (~20 ms) makes
naive loop timing useless. A scalar pull is the completion barrier.

Writes docs/profile_smallL.json and prints a table. Run it on an otherwise
idle chip: each policy variant is a separate process invocation because the
policy env is read at trace time (same pattern as scripts/bench_sweep.py).

Reference analogue: the reference has no profiler; its perf notes are
notes/PROJECT_LOG.md timings. This is the TPU-native replacement.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("PROF_PLATFORM"):
    # smoke-test escape hatch: sitecustomize pins JAX_PLATFORMS=axon and
    # imports jax at interpreter start, so only jax.config can reroute
    # (same pattern as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", os.environ["PROF_PLATFORM"])

B = int(os.environ.get("PROF_B", 256))
T, K = 64, 8
D_MODEL, N_LAYERS, N_HEADS, D_FF, D_COND = 384, 12, 12, 1536, 128
N_LAYERS = int(os.environ.get("PROF_LAYERS", N_LAYERS))
MAZE_CH = (32, 64, 128, 128)
GRID = 21
DATA_DIM = 2
N_SCAN = int(os.environ.get("PROF_SCAN", 50))
# pipeline core composition at bench.py's config: 20 DDIM steps on the kp
# model + one stage-2 forward per level plus the final full-T pass
DDIM_STEPS, LEVELS = 20, 3


def _measure(which: str) -> float:
    """Per-iter ms of one forward, in-jit scan x N_SCAN. which: kp | il."""
    import jax
    import jax.numpy as jnp

    from interpolated_diffusion_tpu.models.denoisers import (
        InterpLevelDenoiser, KeypointDenoiser,
    )

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    cond = {
        "occ": jax.random.bernoulli(k1, 0.2, (B, 1, GRID, GRID)).astype(
            jnp.float32),
        "start_goal": jax.random.uniform(k2, (B, 4)),
    }
    if which == "kp":
        model = KeypointDenoiser(
            d_model=D_MODEL, n_layers=N_LAYERS, n_heads=N_HEADS, d_ff=D_FF,
            d_cond=D_COND, data_dim=DATA_DIM, maze_channels=MAZE_CH,
            dtype=jnp.bfloat16)
        idx = jnp.tile(jnp.linspace(0, T - 1, K).astype(jnp.int32)[None], (B, 1))
        x = jnp.zeros((B, K, DATA_DIM))
        args = (x, jnp.zeros((B,), jnp.int32), idx,
                jnp.zeros((B, K, DATA_DIM), bool), cond, T)
    else:
        model = InterpLevelDenoiser(
            d_model=D_MODEL, n_layers=N_LAYERS, n_heads=N_HEADS, d_ff=D_FF,
            d_cond=D_COND, data_dim=DATA_DIM, maze_channels=MAZE_CH,
            mask_channels=2, dtype=jnp.bfloat16)
        x = jnp.zeros((B, T, DATA_DIM))
        args = (x, jnp.zeros((B,), jnp.int32), jnp.zeros((B, T, 2)), cond)
    params = model.init(jax.random.PRNGKey(1),
                        *[a[:1] if hasattr(a, "shape") and a.ndim and
                          a.shape[0] == B else
                          ({k: v[:1] for k, v in a.items()}
                           if isinstance(a, dict) else a)
                          for a in args])["params"]

    @jax.jit
    def run(p, x0):
        def body(carry, _):
            a = (carry,) + args[1:]
            out = model.apply({"params": p}, *a)
            # chain iterations so the scan cannot be collapsed
            return carry + 1e-6 * out.astype(carry.dtype), ()
        final, _ = jax.lax.scan(body, x0, None, length=N_SCAN)
        return final

    out = run(params, x)
    float(out.sum())  # compile + completion barrier (tunnel-safe)
    t0 = time.time()
    out = run(params, x)
    float(out.sum())
    return (time.time() - t0) / N_SCAN * 1e3


def main():
    if len(sys.argv) > 1:  # child mode: one (component, policy) measurement
        which, policy = sys.argv[1], sys.argv[2]
        if policy == "skipattn":
            os.environ["ID_TPU_PROFILE_SKIP_ATTN"] = "1"
        elif policy != "default":
            os.environ["ID_TPU_SMALL_ATTN"] = policy
        print(json.dumps({"which": which, "policy": policy,
                          "ms_per_iter": _measure(which)}))
        return

    cells = [("kp", "default"), ("il", "default"), ("il", "full"),
             ("il", "none"), ("kp", "skipattn"), ("il", "skipattn")]
    res = {}
    for which, policy in cells:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), which, policy],
            capture_output=True, text=True, timeout=900)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            print(f"FAILED {which}/{policy}: {proc.stderr[-500:]}",
                  file=sys.stderr, flush=True)
            continue
        res[f"{which}.{policy}"] = rec["ms_per_iter"]
        print(f"{which:3s} {policy:9s} {rec['ms_per_iter']:7.3f} ms/iter", flush=True)

    kp, il = res.get("kp.default"), res.get("il.default")
    out = {"config": {"B": B, "T": T, "K": K, "d_model": D_MODEL,
                      "n_layers": N_LAYERS, "n_heads": N_HEADS},
           "ms_per_iter": res}
    if kp and il:
        core_ms = DDIM_STEPS * kp + (LEVELS + 1) * il
        out["pipeline_core_ms"] = core_ms
        out["pipeline_core_samples_per_sec"] = B / core_ms * 1e3
    if il and res.get("il.skipattn"):
        out["attn_share_il_T64"] = 1.0 - res["il.skipattn"] / il
    if kp and res.get("kp.skipattn"):
        out["attn_share_kp_K8"] = 1.0 - res["kp.skipattn"] / kp
    dst = os.path.join(REPO, "docs", "profile_smallL.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "ms_per_iter"}))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
