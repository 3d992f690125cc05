"""Serving throughput/latency benchmark.

Starts a GenerationService on the ambient backend, fires concurrent client
threads through the full HTTP path (server + linger batcher + JSON wire),
and reports per-request latency percentiles, achieved coalescing, and
end-to-end samples/s — the serving-layer counterpart of bench.py's offline
number. Run on the real chip via the TPU rundown; CPU-smokable at tiny
settings (--requests 8 --concurrency 2).

Usage:
    python scripts/bench_serving.py \
        --kp_ckpt runs/maze_q10k/kp --interp_ckpt runs/maze_q10k/il_20k_s002 \
        --prepared_path runs/maze_q10k/prep/dp.npz \
        --requests 128 --concurrency 16 --rows_per_request 4
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kp_ckpt", type=str, required=True)
    p.add_argument("--interp_ckpt", type=str, required=True)
    p.add_argument("--prepared_path", type=str, required=True)
    p.add_argument("--ddim_steps", type=int, default=20)
    p.add_argument("--stage1_solver", type=str, default="ddim")
    p.add_argument("--buckets", type=str, default="4,16,64")
    p.add_argument("--linger_ms", type=float, default=20.0)
    p.add_argument("--requests", type=int, default=128)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--rows_per_request", type=int, default=4)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--out_json", type=str, default=None)
    args = p.parse_args()

    from interpolated_diffusion_tpu.serve import GenerationService
    from interpolated_diffusion_tpu.serve.client import GenerationClient
    from interpolated_diffusion_tpu.serve.server import serve

    svc = GenerationService(
        args.kp_ckpt, args.interp_ckpt, ddim_steps=args.ddim_steps,
        stage1_solver=args.stage1_solver,
        buckets=[int(b) for b in args.buckets.split(",")],
        bf16=bool(args.bf16))
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
    print(f"warmup (all buckets compiled): {time.time() - t0:.1f}s",
          flush=True)

    server, batcher = serve(svc, "127.0.0.1", 0,
                            linger_s=args.linger_ms / 1e3)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    lat, coal, errors = [], [], []
    lock = threading.Lock()
    rows = args.rows_per_request
    n_per_worker = args.requests // args.concurrency

    def worker(wid: int):
        c = GenerationClient("127.0.0.1", port, timeout_s=600)
        rng = np.random.RandomState(wid)
        for i in range(n_per_worker):
            sg = np.clip(rng.rand(rows, 4).astype(np.float32), 0.05, 0.95)
            t0 = time.time()
            try:
                out = c.generate(sg, seed=0)
                dt = time.time() - t0
                with lock:
                    lat.append(dt)
                    coal.append(int(out.get("coalesced_requests", 1)))
            except Exception as e:
                with lock:
                    errors.append(str(e))

    t_start = time.time()
    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start

    server.shutdown()
    batcher.running = False
    n_ok = len(lat)
    lat_s = np.sort(np.asarray(lat))
    report = {
        "requests_ok": n_ok, "errors": len(errors),
        "rows_per_request": rows,
        "samples_per_sec": round(n_ok * rows / wall, 2),
        "requests_per_sec": round(n_ok / wall, 2),
        "latency_p50_s": round(float(lat_s[n_ok // 2]), 3) if n_ok else None,
        "latency_p99_s": round(float(lat_s[min(n_ok - 1, int(n_ok * 0.99))]),
                               3) if n_ok else None,
        "mean_coalesced": round(float(np.mean(coal)), 2) if coal else None,
        "concurrency": args.concurrency,
        "linger_ms": args.linger_ms,
        "solver": args.stage1_solver,
    }
    print(json.dumps(report))
    if errors:
        print("first error:", errors[0], file=sys.stderr)
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
