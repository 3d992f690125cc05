"""Dataset acquisition/precompute tooling: fetch planners (zero-egress) and
the teacher-shard precompute CLI (reference scripts/datasets parity)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts",
                                "datasets"))

from interpolated_diffusion_tpu.data.precompute_teacher import main as teacher_main
from interpolated_diffusion_tpu.data.wan_synth import (
    WanSynthTarDataset,
    write_tar_shard,
)


def test_didemo_fetch_plan(capsys):
    import fetch_didemo

    fetch_didemo.main(["metadata", "--data_dir", "/tmp/nonexistent_didemo",
                       "--plan", "1"])
    out = capsys.readouterr().out
    assert "train_data.json" in out and "GET https://" in out
    # yfcc hash -> bucket path convention
    url = fetch_didemo.aws_url("abcdef0123456789")
    assert url.endswith("/abc/def/abcdef0123456789.mp4")


def test_wan_synth_download_plan(capsys):
    import download_wan_synth

    download_wan_synth.main(["--plan", "1"])
    out = capsys.readouterr().out
    assert "snapshot_download" in out and "shard-*.tar" in out


def test_teacher_precompute_cli_roundtrip(tmp_path):
    T, C, H, W = 5, 2, 4, 4
    data_root = tmp_path / "data"
    out_root = tmp_path / "teacher"
    rng = np.random.RandomState(0)
    samples = [
        {"__key__": f"clip{i:04d}",
         "latents": rng.randn(T, C, H, W).astype(np.float32),
         "text_embed": rng.randn(3, 8).astype(np.float32)}
        for i in range(4)
    ]
    write_tar_shard(str(data_root / "shard_00000.tar"), samples)

    teacher_main(["--data_root", str(data_root), "--out_root", str(out_root),
                  "--T", str(T), "--teacher", "lerp"])
    # teacher shards mirror the source shard basenames (the key-join contract)
    assert sorted(os.listdir(out_root)) == ["shard_00000.tar"]

    # key-join the teacher stream back to the data and check the lerp values
    ds = WanSynthTarDataset(str(data_root), T=T, shuffle_shards=False,
                            shuffle_buffer=1, teacher_root=str(out_root),
                            process_split=False)
    n = 0
    for s in ds:
        lat = np.asarray(s["latents"])
        tl = np.asarray(s["teacher_latents"])
        want = 0.5 * (lat[0] + lat[2])
        np.testing.assert_allclose(tl[0], want, atol=1e-6)
        n += 1
    assert n == 4


def test_teacher_precompute_channel_first_shards(tmp_path):
    """Raw [C,T,H,W] shards must be time-normalized before interpolating —
    the teacher must produce ceil((T-1)/2) frame mids, not channel mids."""
    T, C, H, W = 9, 2, 4, 4
    data_root = tmp_path / "data"
    rng = np.random.RandomState(1)
    lat_ctHW = rng.randn(C, T, H, W).astype(np.float32)   # channel-first!
    write_tar_shard(str(data_root / "shard_00000.tar"),
                    [{"__key__": "c0", "latents": lat_ctHW,
                      "text_embed": rng.randn(3, 8).astype(np.float32)}])
    out_root = tmp_path / "teacher"
    teacher_main(["--data_root", str(data_root), "--out_root", str(out_root),
                  "--T", str(T), "--teacher", "lerp"])
    from interpolated_diffusion_tpu.data.wan_synth import iter_tar_samples

    (s,) = list(iter_tar_samples(str(out_root / "shard_00000.tar")))
    tl = np.asarray(s["teacher_latents"])
    assert tl.shape == (4, C, H, W)                       # (T-1)//2 frame mids
    lat_tchw = lat_ctHW.transpose(1, 0, 2, 3)
    np.testing.assert_allclose(tl[0], 0.5 * (lat_tchw[0] + lat_tchw[2]),
                               atol=1e-6)


def test_make_synth_tars_matches_dataset(tmp_path):
    from interpolated_diffusion_tpu.data.make_synth_tars import main as mk_main
    from interpolated_diffusion_tpu.data.wan_synth import SyntheticWanDataset

    out = tmp_path / "tars"
    mk_main(["--out_root", str(out), "--num_samples", "5", "--T", "5",
             "--latent_c", "2", "--latent_h", "4", "--latent_w", "4",
             "--text_len", "3", "--text_dim", "8", "--shard_size", "3"])
    assert sorted(os.listdir(out)) == ["shard_00000.tar", "shard_00001.tar"]
    ds = WanSynthTarDataset(str(out), T=5, shuffle_shards=False,
                            shuffle_buffer=1, process_split=False)
    ref = SyntheticWanDataset(n_samples=5, T=5, C=2, H=4, W=4, text_len=3,
                              text_dim=8, seed=0)
    for i, s in enumerate(ds):
        np.testing.assert_allclose(s["latents"], ref.get(i)["latents"],
                                   atol=1e-6)


def test_read_video_clip_cv2_decode(tmp_path):
    """Native (OpenCV C++) video decode path — the decord analogue: write a
    real MJPG container, read a time window back, check shape/order/colors."""
    cv2 = pytest.importorskip("cv2")

    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (64, 48))
    if not w.isOpened():
        pytest.skip("cv2 build lacks an encoder")
    for i in range(30):
        frame = np.full((48, 64, 3), i * 8, np.uint8)
        frame[:, :, 2] = 255 - i * 8            # BGR red channel ramps DOWN
        w.write(frame)
    w.release()

    from interpolated_diffusion_tpu.data.didemo import read_video_clip

    clip = read_video_clip(path, 0.5, 2.5, T=4, frame_size=16)
    assert clip.shape == (4, 3, 16, 16) and clip.dtype == np.float32
    means = clip.mean(axis=(1, 2, 3))
    assert np.all(np.diff(means) > 0)           # temporal ramp preserved
    red = clip[:, 0].mean(axis=(1, 2))
    assert red[0] > red[-1]                     # BGR→RGB swap happened
