"""GenerationService: checkpoint-backed, bucket-batched e2e generation.

Production-serving counterpart of sample/generate.py's offline loop (the
reference has no serving story — its samplers are batch scripts,
sample_generate.py). TPU-native constraints drive the design:

  * XLA compiles one program per input shape — the service pins a small set
    of BATCH BUCKETS, pads every request batch up to the nearest bucket, and
    warms all buckets at startup, so no request ever pays a compile.
  * The whole Stage-1 diffusion scan + Stage-2 refinement is ONE jitted
    callable (sample/generate.make_pipeline), so a request costs exactly one
    dispatch.
  * Conditioning is host-prepared (idx policy sampling, sdf derivation) —
    nothing dynamic reaches the compiled program.
"""
from __future__ import annotations

import threading
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class GenerationService:
    """Load once, generate many: thread-safe batched maze/trajectory serving.

    Defaults mirror sample/generate.py's CLI defaults; quality knobs
    (best-of-N anchors, PFDiff solver, FORA caching) compose the same way.
    """

    def __init__(
        self,
        kp_ckpt: str,
        interp_ckpt: str,
        *,
        dphi_ckpt: str = "",
        ddim_steps: int = 20,
        stage1_solver: str = "ddim",
        stage1_best_of: int = 1,
        stage1_cache_interval: int = 1,
        s2_noise_mode: str = "none",
        s2_noise_sigma: float = 0.0,
        idx_policy: str = "uniform:1.0",
        buckets: Sequence[int] = (1, 4, 16, 64),
        bf16: bool = True,
        warm: bool = False,   # call warmup() AFTER set_default_grid so the
                              # compiled shapes match the served grid
    ) -> None:
        from ..models.loading import load_interp_model, load_keypoint_model
        from ..ops.schedules import make_schedule
        from ..sample.generate import PipelineConfig, make_pipeline

        kp_model, kp_params, kp_meta = load_keypoint_model(kp_ckpt, bf16)
        it_model, it_params, il_meta = load_interp_model(interp_ckpt, bf16)
        self.T, self.K = int(kp_meta["T"]), int(kp_meta["K"])
        self.data_dim = int(kp_meta["data_dim"])
        self.use_sdf = bool(kp_meta.get("use_sdf") or il_meta.get("use_sdf"))
        self._idx_policy = idx_policy

        dphi_fn = None
        if dphi_ckpt:
            from ..models.loading import make_dphi_seg_cost_fn

            dphi_fn, _ = make_dphi_seg_cost_fn(
                dphi_ckpt, self.T, kp_meta.get("use_sdf"), bf16)
        elif kp_meta.get("kp_feat_dphi"):
            raise ValueError(
                "Stage-1 ckpt needs D_phi kp_feat channels — pass dphi_ckpt")

        cfg = PipelineConfig(
            T=self.T, K=self.K,
            levels=int(il_meta["levels"]), K_min=int(il_meta["K_min"]),
            ddim_steps=ddim_steps,
            k_schedule=il_meta.get("k_schedule", "doubling"),
            stage2_mode=il_meta.get("mode", "adj"),
            anchor_conf=bool(il_meta.get("anchor_conf", 0)),
            anchor_conf_anneal_mode=(
                il_meta.get("anchor_conf_anneal_mode", "none")
                if il_meta.get("anchor_conf_anneal") else "none"),
            clamp_endpoints=bool(kp_meta.get("clamp_endpoints", 1)),
            s2_noise_mode=s2_noise_mode, s2_noise_sigma=s2_noise_sigma,
            logit_space=bool(kp_meta.get("logit_space", 0)),
            logit_eps=float(kp_meta.get("logit_eps", 1e-5)),
            recompute_vel=bool(il_meta.get("recompute_vel", 0))
            and self.data_dim == 4,
            stage1_solver=stage1_solver,
            stage1_best_of=stage1_best_of,
            stage1_cache_interval=stage1_cache_interval,
            kp_feat_dim=(int(kp_meta.get("kp_feat_dim", 0))
                         if kp_meta.get("use_kp_feat") else 0),
        )
        kp_schedule = make_schedule(kp_meta["schedule"], int(kp_meta["N_train"]))
        self._pipeline = jax.jit(make_pipeline(
            kp_model, it_model, kp_schedule, cfg, self.data_dim, dphi_fn))
        self._kp_params, self._it_params = kp_params, it_params
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        self._lock = threading.Lock()   # one dispatch at a time per service
        self._default_grid: Optional[Dict[str, np.ndarray]] = None
        if warm:
            self.warmup()

    # -- conditioning helpers ------------------------------------------------

    def set_default_grid(self, occ: np.ndarray,
                         sdf: Optional[np.ndarray] = None) -> None:
        """Install a server-side occupancy grid ([H, W] or [1, H, W]) used
        when requests carry only start/goal."""
        occ = np.asarray(occ, np.float32)
        if occ.ndim == 2:
            occ = occ[None]
        grid = {"occ": occ}
        if self.use_sdf:
            if sdf is None:
                from ..data.maze import sdf_from_occupancy

                sdf = sdf_from_occupancy(occ[0])[None]
            grid["sdf"] = np.asarray(sdf, np.float32)
        self._default_grid = grid

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"batch {n} exceeds the largest bucket "
                         f"{self.buckets[-1]}; split the request")

    # -- the serving entry ---------------------------------------------------

    def generate(
        self,
        start_goal: np.ndarray,                 # [B, 4] (x0, y0, xg, yg)
        occ: Optional[np.ndarray] = None,       # [B, 1, H, W] / [B, H, W]
        sdf: Optional[np.ndarray] = None,
        seed: int = 0,
        timing: Optional[Dict[str, float]] = None,
    ) -> Dict[str, np.ndarray]:
        """Generate refined trajectories for B (start, goal) pairs.

        Pads to the nearest bucket, runs one jitted pipeline dispatch, and
        returns host arrays sliced back to B:
          interp [B, T, D], refined [B, T, D], keypoints [B, K, D],
          idx [B, K], served_batch (the bucket size actually dispatched).

        Determinism: one PRNGKey(seed) drives the whole dispatch, so a
        row's noise depends on its position in the served batch — the same
        (inputs, seed) submitted alone vs. coalesced with other requests
        yields different (equally valid) samples. Fix the full batch
        composition (or serve with linger 0 and bucket 1) when bitwise
        reproducibility across runs matters.
        """
        import time as _time

        t0 = _time.perf_counter()
        start_goal = np.atleast_2d(np.asarray(start_goal, np.float32))
        B = start_goal.shape[0]
        if occ is None:
            if self._default_grid is None:
                raise ValueError("request has no occ and no default grid is "
                                 "installed (set_default_grid)")
            occ = np.broadcast_to(self._default_grid["occ"][None],
                                  (B, *self._default_grid["occ"].shape))
            if self.use_sdf and sdf is None:
                sdf = np.broadcast_to(self._default_grid["sdf"][None],
                                      (B, *self._default_grid["sdf"].shape))
        occ = np.asarray(occ, np.float32)
        if occ.ndim == 3:
            occ = occ[:, None]
        if occ.shape[0] == 1 and B > 1:
            # one shared grid for the whole request batch
            occ = np.broadcast_to(occ, (B, *occ.shape[1:])).copy()
            if sdf is not None:
                sdf = np.asarray(sdf, np.float32)
                sdf = sdf[None] if sdf.ndim == 2 else sdf
                sdf = sdf[:, None] if sdf.ndim == 3 else sdf
                sdf = np.broadcast_to(sdf, (B, *sdf.shape[1:])).copy()
        if occ.shape[0] != B:
            raise ValueError(
                f"occ batch {occ.shape[0]} does not match start_goal "
                f"batch {B} (send one grid per sample, or a single shared "
                "grid)")
        if self.use_sdf and sdf is None:
            from ..data.maze import sdf_from_occupancy

            sdf = np.stack([sdf_from_occupancy(o[0]) for o in occ])[:, None]
        if sdf is not None:
            sdf = np.asarray(sdf, np.float32)
            if sdf.ndim == 3:
                sdf = sdf[:, None]

        nb = self._bucket(B)
        pad = nb - B

        def padded(x):
            return np.concatenate([x, np.repeat(x[-1:], pad, 0)]) if pad else x

        t_prep = _time.perf_counter()
        cond = {"occ": jnp.asarray(padded(occ)),
                "start_goal": jnp.asarray(padded(start_goal))}
        if self.use_sdf:
            cond["sdf"] = jnp.asarray(padded(sdf))

        from ..train.common import sample_idx_policy

        rng = np.random.RandomState(seed)
        idx = jnp.asarray(sample_idx_policy(
            rng, self._idx_policy, nb, self.T, self.K, None, 0.0))
        key = jax.random.PRNGKey(seed)
        t_put = _time.perf_counter()
        # The lock covers only the (async) dispatch: JAX enqueues the compiled
        # program and returns immediately, so concurrent requests pipeline —
        # request B's dispatch and host prep overlap request A's device
        # compute and device→host pull. The pull (np.asarray below) is the
        # real completion barrier (block_until_ready does not block through
        # a tunneled backend) and is thread-safe outside the lock.
        with self._lock:
            x_interp, x_refined, z_pred = self._pipeline(
                self._kp_params, self._it_params, key, idx, cond)[:3]
        t_dispatch = _time.perf_counter()
        out = {
            "interp": np.asarray(x_interp, np.float32)[:B],
            "refined": np.asarray(x_refined, np.float32)[:B],
            "keypoints": np.asarray(z_pred, np.float32)[:B],
            "idx": np.asarray(idx)[:B],
            "served_batch": nb,
        }
        if timing is not None:
            # pull = device compute + device->host transfer (np.asarray is
            # the real completion barrier through the tunnel)
            timing.update(prep_s=t_prep - t0, put_s=t_put - t_prep,
                          dispatch_s=t_dispatch - t_put,
                          pull_s=_time.perf_counter() - t_dispatch,
                          served_batch=nb)
        return out

    def warmup(self) -> None:
        """Compile every bucket once so no live request pays a compile."""
        H = W = 8
        if self._default_grid is not None:
            H, W = self._default_grid["occ"].shape[-2:]
        for b in self.buckets:
            sg = np.tile(np.asarray([[0.1, 0.1, 0.9, 0.9]], np.float32),
                         (b, 1))
            occ = np.zeros((b, 1, H, W), np.float32)
            self.generate(sg, occ, seed=0)
