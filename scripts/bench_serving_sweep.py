"""Serving saturation sweep + per-request budget breakdown.

Answers VERDICT-r3 weak #3: where does serving throughput go relative to the
raw offline pipeline, and is there an operating point >= 500 samples/s?

Three measurements, one service instance (all buckets compiled once):
  1. offline ceiling — direct pipeline dispatches at the top bucket,
     scalar-pull barrier, no HTTP/batching (the bench.py-style upper bound
     with the tunnel transfer included);
  2. direct-call budget — a single service.generate with the timing hook:
     host prep / device put / dispatch / pull split at several buckets;
  3. the sweep — rows_per_request x linger x concurrency through the full
     HTTP + linger-batcher path, reporting samples/s, p50/p99, coalescing.

Writes one JSON (``--out_json``) consumed by docs/SERVING.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(svc, rows: int, linger_ms: float, concurrency: int,
              requests: int) -> dict:
    from interpolated_diffusion_tpu.serve.client import GenerationClient
    from interpolated_diffusion_tpu.serve.server import serve

    server, batcher = serve(svc, "127.0.0.1", 0, linger_s=linger_ms / 1e3)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    lat, coal, errors = [], [], []
    lock = threading.Lock()
    n_per_worker = max(1, requests // concurrency)

    def worker(wid: int):
        c = GenerationClient("127.0.0.1", port, timeout_s=600)
        rng = np.random.RandomState(wid)
        for _ in range(n_per_worker):
            sg = np.clip(rng.rand(rows, 4).astype(np.float32), 0.05, 0.95)
            t0 = time.time()
            try:
                out = c.generate(sg, seed=0)
                with lock:
                    lat.append(time.time() - t0)
                    coal.append(int(out.get("coalesced_requests", 1)))
            except Exception as e:  # noqa: BLE001 — record and continue
                with lock:
                    errors.append(str(e))

    t_start = time.time()
    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start
    server.shutdown()
    batcher.running = False
    n_ok = len(lat)
    lat_s = np.sort(np.asarray(lat)) if n_ok else np.zeros(1)
    point = {
        "rows": rows, "linger_ms": linger_ms, "concurrency": concurrency,
        "requests_ok": n_ok, "errors": len(errors),
        "samples_per_sec": round(n_ok * rows / wall, 2),
        "latency_p50_s": round(float(lat_s[n_ok // 2]), 4) if n_ok else None,
        "latency_p99_s": round(float(lat_s[min(n_ok - 1, int(n_ok * 0.99))]), 4)
        if n_ok else None,
        "mean_coalesced": round(float(np.mean(coal)), 2) if coal else None,
    }
    if errors:
        point["first_error"] = errors[0][:200]
    return point


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kp_ckpt", type=str, required=True)
    p.add_argument("--interp_ckpt", type=str, required=True)
    p.add_argument("--prepared_path", type=str, required=True)
    p.add_argument("--ddim_steps", type=int, default=20)
    p.add_argument("--buckets", type=str, default="4,16,64,256")
    p.add_argument("--rows", type=str, default="4,16,64")
    p.add_argument("--lingers_ms", type=str, default="5,20,50")
    p.add_argument("--concurrencies", type=str, default="16,64")
    p.add_argument("--requests", type=int, default=192)
    p.add_argument("--offline_iters", type=int, default=12)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--out_json", type=str, default=None)
    args = p.parse_args()

    import jax
    from interpolated_diffusion_tpu.serve import GenerationService

    buckets = [int(b) for b in args.buckets.split(",")]
    svc = GenerationService(
        args.kp_ckpt, args.interp_ckpt, ddim_steps=args.ddim_steps,
        buckets=buckets, bf16=bool(args.bf16))
    with np.load(args.prepared_path) as f:
        occ = f["occ"][0]
        occ = occ[0] if occ.ndim == 3 else occ
        sdf = None
        if "sdf" in f.files:
            sdf = f["sdf"][0]
            sdf = sdf[0] if sdf.ndim == 3 else sdf
    svc.set_default_grid(occ, sdf)
    t0 = time.time()
    svc.warmup()
    report = {"warmup_s": round(time.time() - t0, 1), "buckets": buckets,
              "ddim_steps": args.ddim_steps}
    print(f"warmup: {report['warmup_s']}s", flush=True)

    # 1) offline ceiling at the top bucket: N dispatches queued back-to-back,
    # one scalar pull per dispatch result at the end (device executes in
    # order; the final pulls include the tunnel transfer of the outputs)
    top = buckets[-1]
    rng = np.random.RandomState(0)
    sg = np.clip(rng.rand(top, 4).astype(np.float32), 0.05, 0.95)
    svc.generate(sg, seed=0)  # warm
    t0 = time.time()
    outs = [svc.generate(sg, seed=i) for i in range(args.offline_iters)]
    wall = time.time() - t0
    report["offline_ceiling"] = {
        "bucket": top, "iters": args.offline_iters,
        "samples_per_sec": round(top * args.offline_iters / wall, 1),
    }
    print("offline ceiling:", report["offline_ceiling"], flush=True)
    del outs

    # 2) per-request budget split by bucket (single caller, no batcher)
    budget = []
    for b in buckets:
        sg_b = sg[:b]
        tdict: dict = {}
        svc.generate(sg_b, seed=0, timing=tdict)      # warm bucket path
        acc = {k: 0.0 for k in ("prep_s", "put_s", "dispatch_s", "pull_s")}
        iters = 6
        for i in range(iters):
            tdict = {}
            svc.generate(sg_b, seed=i, timing=tdict)
            for k in acc:
                acc[k] += tdict[k]
        row = {k: round(v / iters, 4) for k, v in acc.items()}
        row["bucket"] = b
        total = sum(acc.values()) / iters
        row["samples_per_sec"] = round(b / total, 1)
        budget.append(row)
        print("budget:", row, flush=True)
    report["budget"] = budget

    # 3) the sweep through the full HTTP + linger-batcher path
    points = []
    for rows in (int(r) for r in args.rows.split(",")):
        for linger in (float(x) for x in args.lingers_ms.split(",")):
            for conc in (int(c) for c in args.concurrencies.split(",")):
                if rows * conc > 4096:
                    continue
                pt = run_point(svc, rows, linger, conc, args.requests)
                points.append(pt)
                print("point:", json.dumps(pt), flush=True)
    report["sweep"] = points
    best = max(points, key=lambda x: x["samples_per_sec"] or 0)
    report["best"] = best
    print("BEST:", json.dumps(best))
    if args.out_json:
        os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)
        # evidence copy (runs/ is wiped between rounds)
        try:
            from interpolated_diffusion_tpu.utils.run_config import (
                archive_evidence,
            )
            d = os.path.dirname(args.out_json)
            archive_evidence(d, files=(os.path.basename(args.out_json),))
        except Exception:
            pass


if __name__ == "__main__":
    main()
