"""Wan-stack tests: DiT forward (rope/abs-time/frame-cond), LoRA, data
pipeline (tar shards, key-joins), all wansynth trainers e2e tiny, and the
anchor precompute→Phase-2 join round trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)

TINY_WAN = ["--num_samples", "12", "--T", "9", "--latent_c", "4",
            "--latent_h", "8", "--latent_w", "8", "--text_len", "8",
            "--text_dim", "64", "--wan_dim", "64", "--wan_layers", "2",
            "--wan_heads", "2", "--wan_ffn", "128", "--attn_mode", "dense",
            "--use_remat", "0", "--batch", "2", "--steps", "2",
            "--save_every", "2", "--log_every", "1", "--bf16", "0"]


def test_wan_dit_forward_and_abs_time_rope():
    from interpolated_diffusion_tpu.models.wan_dit import WanDiT

    model = WanDiT(dim=64, n_layers=2, n_heads=2, ffn_dim=128, in_channels=4,
                   out_channels=4, text_dim=32, attn_mode="dense", use_remat=False)
    B, C, T, H, W = 2, 4, 5, 8, 8
    lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, T, H, W))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 6, 32))
    params = model.init(jax.random.PRNGKey(2), lat, t, ctx)["params"]
    out = model.apply({"params": params}, lat, t, ctx)
    assert out.shape == (B, C, T, H, W)
    # absolute-time rope changes the output for the same content
    fi = jnp.broadcast_to(jnp.array([0, 5, 10, 15, 20], jnp.int32), (B, T))
    out_abs = model.apply({"params": params}, lat, t, ctx, fi)
    assert float(jnp.abs(out_abs - out).max()) > 1e-4
    # identity frame indices reproduce the default rope exactly
    fi0 = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    out_id = model.apply({"params": params}, lat, t, ctx, fi0)
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(out), atol=1e-5)


def test_wan_rope_tables_split():
    from interpolated_diffusion_tpu.models.wan_dit import wan_rope_tables

    tables, dims = wan_rope_tables(64, 128)
    t_dim, h_dim, w_dim = dims
    assert t_dim + h_dim + w_dim == 128
    assert h_dim == w_dim == 2 * (128 // 6)


def test_lora_zero_init_and_merge():
    from interpolated_diffusion_tpu.models.lora import apply_lora, init_lora

    params = {"block_0": {"q_proj": {"kernel": jnp.ones((8, 8)),
                                     "bias": jnp.zeros((8,))},
                          "norm": {"scale": jnp.ones((8,))}}}
    lora = init_lora(jax.random.PRNGKey(0), params, rank=2)
    assert "block_0/q_proj" in lora
    merged = apply_lora(params, lora, rank=2)
    # B is zero-init -> merged == base
    np.testing.assert_allclose(np.asarray(merged["block_0"]["q_proj"]["kernel"]), 1.0)
    lora["block_0/q_proj"]["B"] = jnp.ones((2, 8))
    merged = apply_lora(params, lora, rank=2, alpha=2.0)
    assert float(jnp.abs(merged["block_0"]["q_proj"]["kernel"] - 1.0).max()) > 0


def test_tar_shard_roundtrip_and_key_join(tmp_path):
    from interpolated_diffusion_tpu.data.wan_synth import (
        KeyJoinError, WanSynthTarDataset, iter_tar_samples, key_join,
        write_tar_shard,
    )

    samples = [{"__key__": f"{i:04d}",
                "latents": np.random.randn(5, 2, 4, 4).astype(np.float32),
                "text_embed": np.random.randn(3, 8).astype(np.float32)}
               for i in range(6)]
    shard = str(tmp_path / "data" / "shard_0.tar")
    write_tar_shard(shard, samples)
    loaded = list(iter_tar_samples(shard))
    assert len(loaded) == 6
    np.testing.assert_allclose(loaded[0]["latents"], samples[0]["latents"])

    anchors = [{"__key__": s["__key__"],
                "anchors": np.zeros((2, 2, 4, 4), np.float32),
                "anchor_idx": np.array([0, 4], np.int32)} for s in samples]
    a_shard = str(tmp_path / "anchors" / "shard_0.tar")
    write_tar_shard(a_shard, anchors)
    joined = list(key_join(iter_tar_samples(shard), iter_tar_samples(a_shard),
                           fields=("anchors", "anchor_idx")))
    assert all("anchors" in j for j in joined)

    ds = WanSynthTarDataset(str(tmp_path / "data"), T=5, process_split=False,
                            anchors_root=str(tmp_path / "anchors"),
                            shuffle_buffer=1)
    batch = next(ds.batches(2))
    assert batch["latents"].shape == (2, 5, 2, 4, 4)
    assert batch["anchor_idx"].shape == (2, 2)

    # ordering guard: disjoint key sets must raise
    bad = [{"__key__": "zzzz", "anchors": np.zeros((1,), np.float32)}]
    b_shard = str(tmp_path / "bad.tar")
    write_tar_shard(b_shard, bad)
    with pytest.raises(KeyJoinError):
        list(key_join(iter_tar_samples(shard), iter_tar_samples(b_shard),
                      fields=("anchors",), max_buffer=2))


def test_latents_transpose_fix():
    from interpolated_diffusion_tpu.data.wan_synth import _maybe_transpose_latents

    lat_ct = np.zeros((16, 21, 6, 8), np.float32)  # [C,T,H,W]
    assert _maybe_transpose_latents(lat_ct, 21).shape == (21, 16, 6, 8)
    lat_tc = np.zeros((21, 16, 6, 8), np.float32)
    assert _maybe_transpose_latents(lat_tc, 21).shape == (21, 16, 6, 8)


def test_phase2_trainer_with_precomputed_anchors(tmp_path):
    """Phase-1 train → anchor precompute → Phase-2 join path, all tiny."""
    from interpolated_diffusion_tpu.train.train_keypoints_wansynth import main as p1_main
    from interpolated_diffusion_tpu.data.precompute_phase1_anchors import main as pre_main
    from interpolated_diffusion_tpu.data.wan_synth import (
        SyntheticWanDataset, write_tar_shard,
    )
    from interpolated_diffusion_tpu.train.train_interp_levels_wansynth import main as p2_main

    p1_dir = str(tmp_path / "p1")
    p1_main(TINY_WAN + ["--K", "3", "--N_train", "20",
                        "--phase1_input_mode", "short_anchors",
                        "--lora_rank", "2", "--out_dir", p1_dir])
    # write a tiny tar dataset matching the synthetic contract
    ds = SyntheticWanDataset(n_samples=8, T=9, C=4, H=8, W=8, text_len=8,
                             text_dim=64, seed=0)
    data_root = str(tmp_path / "tars")
    write_tar_shard(os.path.join(data_root, "shard_00000.tar"),
                    [{"__key__": f"{i:08d}", **ds.get(i)} for i in range(8)])
    anchors_root = str(tmp_path / "anchors")
    pre_main(["--ckpt", os.path.join(p1_dir, "ckpt_2"),
              "--out_root", anchors_root, "--data", "tar",
              "--data_root", data_root, "--batch", "4", "--ddim_steps", "2",
              "--shard_size", "8", "--bf16", "0"])
    # anchor shards mirror the data shard basenames (the key-join contract)
    shards = [f for f in os.listdir(anchors_root) if f.endswith(".tar")]
    assert shards == ["shard_00000.tar"]
    p2_dir = str(tmp_path / "p2")
    p2_main(TINY_WAN + ["--K_min", "3", "--levels", "2", "--mode", "adj",
                        "--lora_rank", "2", "--data", "tar",
                        "--data_root", data_root,
                        "--anchors_root", anchors_root,
                        "--out_dir", p2_dir])
    assert os.path.exists(os.path.join(p2_dir, "ckpt_2"))


def test_interpolator_trainers_smoke(tmp_path):
    from interpolated_diffusion_tpu.train.train_video_interpolator import main as vi_main
    from interpolated_diffusion_tpu.train.train_flow_interpolator_wansynth import main as fl_main
    from interpolated_diffusion_tpu.train.train_latent_straightener_wansynth import main as st_main
    from interpolated_diffusion_tpu.train.train_sinkhorn_interp_wansynth import main as sk_main

    tiny = ["--num_samples", "12", "--T", "9", "--latent_c", "4",
            "--latent_h", "8", "--latent_w", "8", "--text_len", "4",
            "--text_dim", "16", "--batch", "2", "--steps", "2",
            "--save_every", "2", "--log_every", "1", "--bf16", "0"]
    vi_main(tiny + ["--workload", "wansynth", "--K", "3",
                    "--out_dir", str(tmp_path / "vi")])
    fl_main(tiny + ["--base_channels", "8", "--residual_blocks", "1",
                    "--cost_volume", "1", "--cv_radius", "1",
                    "--out_dir", str(tmp_path / "fl")])
    st_main(tiny + ["--arch", "conv", "--hidden_channels", "8", "--blocks", "1",
                    "--out_dir", str(tmp_path / "st")])
    sk_main(tiny + ["--K", "3", "--sinkhorn_patch", "4", "--win_size", "2",
                    "--sinkhorn_iters", "5", "--val_every", "2",
                    "--val_batches", "1", "--out_dir", str(tmp_path / "sk")])


def test_selection_wansynth_trainers_smoke(tmp_path):
    from interpolated_diffusion_tpu.train.train_segment_cost_wansynth import main as sc_main
    from interpolated_diffusion_tpu.train.train_video_selector_wansynth import main as vs_main

    tiny = ["--num_samples", "12", "--T", "9", "--latent_c", "4",
            "--latent_h", "8", "--latent_w", "8", "--text_len", "4",
            "--text_dim", "16", "--batch", "2", "--steps", "2",
            "--save_every", "2", "--log_every", "1", "--bf16", "0"]
    sc_main(tiny + ["--d_cond", "16", "--hidden_dim", "16",
                    "--out_dir", str(tmp_path / "sc")])
    vs_main(tiny + ["--K", "3", "--d_model", "16", "--d_cond", "16",
                    "--n_sel_layers", "1", "--n_heads", "2", "--d_ff", "32",
                    "--eval_every", "2", "--out_dir", str(tmp_path / "vs")])


def test_oracle_segment_cost_closed_form():
    """Closed-form oracle cost equals the naive per-segment computation."""
    from interpolated_diffusion_tpu.ops.oracle_segment_cost import (
        build_oracle_seg_precompute, compute_oracle_cost_seg_mse,
    )

    B, T, D = 2, 7, 5
    z = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    pre = build_oracle_seg_precompute(T)
    cost = np.asarray(compute_oracle_cost_seg_mse(z, pre, normalize=False))
    z_np = np.asarray(z)
    s = 0
    for i in range(T - 1):
        for j in range(i + 1, T):
            want = 0.0
            for t in range(i + 1, j):
                a = (t - i) / (j - i)
                want += (((z_np[:, t] - (1 - a) * z_np[:, i] - a * z_np[:, j]) ** 2)
                         .mean(-1))
            np.testing.assert_allclose(cost[:, s], want, atol=1e-3)
            s += 1


def test_wan_dit_blocks_delta_cache_identity():
    """FORA-style cache plumbing: with blocks_delta taken from a full call at
    the same (z, t), the cached forward reproduces the full forward exactly
    (the cached path adds back exactly the residual the blocks produced)."""
    from interpolated_diffusion_tpu.models.wan_dit import WanDiT

    model = WanDiT(dim=32, n_layers=2, n_heads=2, ffn_dim=64, in_channels=4,
                   out_channels=4, text_dim=16, max_seq_len=64)
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 8, 8))
    t = jnp.array([5, 9], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    params = model.init(jax.random.PRNGKey(2), lat, t, ctx)["params"]
    out_full, delta = model.apply({"params": params}, lat, t, ctx,
                                  return_delta=True)
    assert delta.shape == (2, 3 * 4 * 4, 32)
    out_cached = model.apply({"params": params}, lat, t, ctx,
                             blocks_delta=delta)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_full),
                               atol=1e-5)
    # at a DIFFERENT t, the cached output differs from the full forward
    t2 = jnp.array([1, 2], jnp.int32)
    out_full2 = model.apply({"params": params}, lat, t2, ctx)
    out_cached2 = model.apply({"params": params}, lat, t2, ctx,
                              blocks_delta=delta)
    assert not np.allclose(np.asarray(out_cached2), np.asarray(out_full2),
                           atol=1e-5)


def test_anchor_precompute_cache_interval(tmp_path):
    """--cache_interval 2 runs the FORA-cached sampler end-to-end and writes
    finite anchors of the same shape as the exact path."""
    from interpolated_diffusion_tpu.data.precompute_phase1_anchors import main as pre_main
    from interpolated_diffusion_tpu.data.wan_synth import (
        SyntheticWanDataset, iter_tar_samples, write_tar_shard,
    )
    from interpolated_diffusion_tpu.train.train_keypoints_wansynth import main as p1_main

    p1_dir = str(tmp_path / "p1w")
    p1_main(TINY_WAN + ["--use_wan", "1", "--K", "3", "--N_train", "20",
                        "--phase1_input_mode", "short_anchors",
                        "--lora_rank", "2", "--out_dir", p1_dir])
    ds = SyntheticWanDataset(n_samples=4, T=9, C=4, H=8, W=8, text_len=8,
                             text_dim=64, seed=0)
    data_root = str(tmp_path / "tars")
    write_tar_shard(os.path.join(data_root, "shard_00000.tar"),
                    [{"__key__": f"{i:08d}", **ds.get(i)} for i in range(4)])
    outs = {}
    for iv in (1, 2):
        root = str(tmp_path / f"anchors_iv{iv}")
        pre_main(["--ckpt", os.path.join(p1_dir, "ckpt_2"),
                  "--out_root", root, "--data", "tar",
                  "--data_root", data_root, "--batch", "2", "--ddim_steps", "4",
                  "--cache_interval", str(iv),
                  "--shard_size", "4", "--bf16", "0"])
        (s,) = [x for x in iter_tar_samples(
            os.path.join(root, "shard_00000.tar"))][:1]
        outs[iv] = np.asarray(s["anchors"])
    assert outs[1].shape == outs[2].shape
    assert np.isfinite(outs[2]).all()
    # caching changes the trajectory (it is an approximation, not a no-op)
    assert not np.allclose(outs[1], outs[2], atol=1e-6)


def test_phase1_trainer_async_sharded_ckpt(tmp_path):
    """--ckpt_async 1 writes orbax checkpoints in the background; the
    generic load_checkpoint reads them back transparently (format dispatch),
    so samplers work on either format."""
    import os

    from interpolated_diffusion_tpu.train.train_keypoints_wansynth import (
        main as p1_main,
    )
    from interpolated_diffusion_tpu.utils.checkpoint import (
        load_checkpoint, read_meta,
    )

    out = str(tmp_path / "p1async")
    p1_main(["--num_samples", "12", "--T", "9", "--latent_c", "4",
             "--latent_h", "8", "--latent_w", "8", "--text_len", "8",
             "--text_dim", "64", "--wan_dim", "64", "--wan_layers", "2",
             "--wan_heads", "2", "--wan_ffn", "128", "--attn_mode", "dense",
             "--use_remat", "0", "--batch", "2", "--steps", "2",
             "--save_every", "2", "--log_every", "1", "--bf16", "0",
             "--K", "3", "--N_train", "20", "--lora_rank", "0",
             "--ckpt_async", "1", "--out_dir", out])
    ckpt = os.path.join(out, "ckpt_2")
    step, meta = read_meta(ckpt)
    assert step == 2
    step2, payload = load_checkpoint(ckpt, None)
    assert step2 == 2 and payload["meta"] == meta
    import jax

    leaves = jax.tree_util.tree_leaves(payload["params"])
    assert leaves and all(l.size > 0 for l in leaves)


def test_tar_batches_resume_state(tmp_path):
    """iterator.state checkpoints the stream position: a fresh iterator
    restored from it replays the exact same remaining batches, and epochs
    reshuffle deterministically (seed + epoch)."""
    import os

    import numpy as np

    from interpolated_diffusion_tpu.data.wan_synth import (
        WanSynthTarDataset, write_tar_shard,
    )

    root = str(tmp_path / "shards")
    for s in range(2):
        write_tar_shard(
            os.path.join(root, f"shard_{s:05d}.tar"),
            [{"__key__": f"{s}_{i:04d}",
              "latents": np.full((3, 2, 4, 4), 10 * s + i, np.float32)}
             for i in range(6)])

    def mk(state=None):
        ds = WanSynthTarDataset(root, T=3, shuffle_buffer=4, seed=7,
                                process_split=False)
        return ds.batches(3, state=state)

    it = mk()
    ref = [next(it) for _ in range(5)]          # 12 samples/epoch → 4/epoch
    mid_state = None
    it2 = mk()
    for i in range(2):
        next(it2)
    mid_state = it2.state
    it3 = mk(state=mid_state)
    for i in range(2, 5):
        got = next(it3)
        np.testing.assert_array_equal(got["latents"], ref[i]["latents"])
        assert got["__keys__"] == ref[i]["__keys__"]

    # epochs must NOT repeat the same order (per-epoch reshuffle)
    ds = WanSynthTarDataset(root, T=3, shuffle_buffer=4, seed=7,
                            process_split=False)
    order0 = [s["__key__"] for s in ds.epoch_iter(0)]
    order1 = [s["__key__"] for s in ds.epoch_iter(1)]
    assert sorted(order0) == sorted(order1)
    assert order0 != order1


def test_synthetic_loader_resume_state():
    import numpy as np

    from interpolated_diffusion_tpu.data.dataset import BatchLoader
    from interpolated_diffusion_tpu.data.wan_synth import SyntheticWanDataset

    ds = SyntheticWanDataset(n_samples=16, T=3, C=2, H=4, W=4,
                             text_len=2, text_dim=8, seed=0)
    a = BatchLoader(ds, 4, seed=5, prefetch=0)
    ita = iter(a)
    ref = [next(ita) for _ in range(4)]
    assert a.state == {"batches": 4}

    b = BatchLoader(ds, 4, seed=5, prefetch=0, start_batch=2)
    itb = iter(b)
    for i in range(2, 4):
        np.testing.assert_array_equal(next(itb)["latents"],
                                      ref[i]["latents"])


def test_anchor_precompute_topk_schedule(tmp_path):
    """Timestep-adaptive SLA sparsity: the anchor precompute runs sparser
    early (high-noise) segments and denser late ones — one statically-shaped
    scan per segment, same weights across variants."""
    import numpy as np
    import pytest

    from interpolated_diffusion_tpu.data.precompute_phase1_anchors import (
        main as pre_main, parse_topk_schedule,
    )
    from interpolated_diffusion_tpu.train.train_keypoints_wansynth import (
        main as p1_main,
    )

    assert parse_topk_schedule("") is None
    assert parse_topk_schedule("0.5:0.25,1.0:0.5") == [(0.5, 0.25), (1.0, 0.5)]
    with pytest.raises(ValueError):
        parse_topk_schedule("0.5:0.1,0.4:0.2")       # non-increasing
    with pytest.raises(ValueError):
        parse_topk_schedule("0.5:0.1")               # doesn't end at 1.0

    out = str(tmp_path / "p1sla")
    p1_main(["--num_samples", "8", "--T", "9", "--latent_c", "4",
             "--latent_h", "8", "--latent_w", "8", "--text_len", "8",
             "--text_dim", "64", "--wan_dim", "64", "--wan_layers", "2",
             "--wan_heads", "2", "--wan_ffn", "128", "--attn_mode", "sla",
             "--sla_topk", "0.5", "--use_remat", "0", "--batch", "2",
             "--steps", "2", "--save_every", "2", "--log_every", "1",
             "--bf16", "0", "--K", "3", "--N_train", "20",
             "--lora_rank", "0", "--out_dir", out])
    anch = str(tmp_path / "anch")
    pre_main(["--ckpt", out + "/ckpt_2", "--out_root", anch,
              "--num_samples", "2", "--batch", "2", "--ddim_steps", "6",
              "--sla_topk_schedule", "0.5:0.25,1.0:0.5", "--bf16", "0"])
    import io
    import tarfile

    with tarfile.open(anch + "/anchors_00000.tar") as tf:
        m = [x for x in tf.getmembers() if x.name.endswith("anchors.npy")][0]
        a = np.load(io.BytesIO(tf.extractfile(m).read()))
    assert a.shape == (3, 4, 8, 8) and np.isfinite(a).all()


def test_tar_batches_raises_on_batch_larger_than_epoch(tmp_path):
    import os

    import numpy as np
    import pytest

    from interpolated_diffusion_tpu.data.wan_synth import (
        WanSynthTarDataset, write_tar_shard,
    )

    root = str(tmp_path / "tiny")
    write_tar_shard(os.path.join(root, "shard_00000.tar"),
                    [{"__key__": "a",
                      "latents": np.zeros((3, 2, 4, 4), np.float32)}])
    ds = WanSynthTarDataset(root, T=3, process_split=False)
    with pytest.raises(ValueError, match="smaller than one batch"):
        next(ds.batches(4))
