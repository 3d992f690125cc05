"""Fetch the DiDeMo corpus: annotation JSONs + videos.

Capability parity with the reference's didemo dataset tooling
(scripts/datasets/didemo/{fetch_didemo_metadata,download_videos_hf,
download_videos_aws}.py), folded into one CLI with three subcommands:

    metadata   annotation JSONs from the LocalizingMoments GitHub repo
    videos-hf  video tars from a HF dataset mirror (huggingface_hub snapshot)
    videos-aws per-clip mp4s from the YFCC100M multimedia-commons S3 bucket

This build environment has zero egress, so the network paths cannot execute
here; `--plan 1` prints exactly what would be fetched (used by tests). After
fetching, `interpolated_diffusion_tpu.data.precompute_clip_cache` turns the
raw clips into the latent/text shard caches the trainers consume.
"""
from __future__ import annotations

import argparse
import os
import sys

METADATA_BASE = "https://raw.githubusercontent.com/LisaAnne/LocalizingMoments/master/data"
METADATA_FILES = ["train_data.json", "val_data.json", "test_data.json",
                  "yfcc100m_hash.txt"]
HF_DEFAULT_REPO = "friedrichor/DiDeMo"
AWS_TEMPLATE = ("https://multimedia-commons.s3-us-west-2.amazonaws.com"
                "/data/videos/mp4/{d1}/{d2}/{h}.mp4")


def aws_url(yfcc_hash: str) -> str:
    return AWS_TEMPLATE.format(d1=yfcc_hash[:3], d2=yfcc_hash[3:6], h=yfcc_hash)


def fetch_metadata(data_dir: str, plan: bool) -> None:
    os.makedirs(data_dir, exist_ok=True)
    for name in METADATA_FILES:
        url = f"{METADATA_BASE}/{name}"
        dst = os.path.join(data_dir, name)
        if plan:
            print(f"GET {url} -> {dst}")
            continue
        import urllib.request

        print(f"fetching {url}")
        urllib.request.urlretrieve(url, dst)


def fetch_videos_hf(repo_id: str, out_dir: str, patterns, plan: bool) -> None:
    if plan:
        print(f"huggingface snapshot_download(repo_id={repo_id}, "
              f"allow_patterns={patterns}) -> {out_dir}; then untar *.tar "
              "(concatenate *.tar.part-* first)")
        return
    from huggingface_hub import snapshot_download

    path = snapshot_download(repo_id=repo_id, repo_type="dataset",
                             local_dir=out_dir, allow_patterns=patterns)
    print(f"snapshot at {path}; extract the tars into your --video_dir")


def fetch_videos_aws(data_dir: str, video_dir: str, plan: bool,
                     limit: int = 0) -> None:
    """Per-clip mp4s straight from the YFCC100M S3 bucket, using the video-id
    -> hash map shipped with the annotations."""
    import json

    hashes = {}
    with open(os.path.join(data_dir, "yfcc100m_hash.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                hashes[parts[0]] = parts[1]
    ids = set()
    for name in ("train_data.json", "val_data.json", "test_data.json"):
        p = os.path.join(data_dir, name)
        if os.path.exists(p):
            with open(p) as f:
                for item in json.load(f):
                    ids.add(item["video"].split(".")[0])
    os.makedirs(video_dir, exist_ok=True)
    n = 0
    for vid in sorted(ids):
        h = hashes.get(vid)
        if h is None:
            continue
        url = aws_url(h)
        dst = os.path.join(video_dir, f"{vid}.mp4")
        if plan:
            print(f"GET {url} -> {dst}")
        else:
            import urllib.request

            try:
                urllib.request.urlretrieve(url, dst)
            except Exception as e:  # missing clips are expected in YFCC
                print(f"skip {vid}: {e}", file=sys.stderr)
        n += 1
        if limit and n >= limit:
            break
    print(f"{'planned' if plan else 'fetched'} {n} clips")


def main(argv=None):
    p = argparse.ArgumentParser("fetch_didemo")
    p.add_argument("cmd", choices=["metadata", "videos-hf", "videos-aws"])
    p.add_argument("--data_dir", type=str, default="data/didemo")
    p.add_argument("--video_dir", type=str, default="data/didemo/videos")
    p.add_argument("--repo_id", type=str, default=HF_DEFAULT_REPO)
    p.add_argument("--patterns", type=str, default="*.tar*")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--plan", type=int, default=0,
                   help="print the fetch plan without network access")
    args = p.parse_args(argv)
    if args.cmd == "metadata":
        fetch_metadata(args.data_dir, bool(args.plan))
    elif args.cmd == "videos-hf":
        fetch_videos_hf(args.repo_id, args.video_dir,
                        args.patterns.split(","), bool(args.plan))
    else:
        fetch_videos_aws(args.data_dir, args.video_dir, bool(args.plan),
                         args.limit)


if __name__ == "__main__":
    main()
