"""Serving layer: bucketed GenerationService + batching HTTP server.

Uses the repo's trained maze checkpoints (runs/maze_q10k) end-to-end on the
CPU test backend — loading, bucket padding, linger coalescing, and the JSON
wire format are all exercised for real.
"""
import json
import os
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

KP = "runs/maze_q10k/kp"
IL = next((p for p in ("runs/maze_q10k/il_20k_s002", "runs/maze_q10k/il")
           if os.path.isdir(p)), "runs/maze_q10k/il")
PREP = "runs/maze_q10k/prep/dp.npz"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(KP) and os.path.exists(PREP)),
    reason="trained maze checkpoints not present")


@pytest.fixture(scope="module")
def service():
    from interpolated_diffusion_tpu.serve import GenerationService

    svc = GenerationService(KP, IL, ddim_steps=4, buckets=(2, 4),
                            bf16=False)
    with np.load(PREP) as f:
        svc.set_default_grid(f["occ"][0, 0],
                             f["sdf"][0, 0] if "sdf" in f.files else None)
    svc.warmup()
    return svc


@pytest.mark.slow
def test_service_bucketing_and_shapes(service):
    sg = np.asarray([[0.1, 0.1, 0.9, 0.9]], np.float32)
    out = service.generate(sg, seed=3)          # B=1 → bucket 2
    assert out["served_batch"] == 2
    assert out["refined"].shape == (1, service.T, service.data_dim)
    assert out["keypoints"].shape == (1, service.K, service.data_dim)
    assert np.isfinite(out["refined"]).all()
    # endpoints respect the conditioning (clamped start/goal)
    np.testing.assert_allclose(out["refined"][0, 0, :2], sg[0, :2], atol=0.05)
    np.testing.assert_allclose(out["refined"][0, -1, :2], sg[0, 2:], atol=0.05)

    with pytest.raises(ValueError):
        service.generate(np.tile(sg, (5, 1)))   # exceeds largest bucket


@pytest.mark.slow
def test_http_server_coalesces_concurrent_requests(service):
    from interpolated_diffusion_tpu.serve.server import serve

    server, batcher = serve(service, "127.0.0.1", 0, linger_s=0.25)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        results = []

        def post():
            conn = HTTPConnection("127.0.0.1", port, timeout=120)
            body = json.dumps({"start_goal": [[0.2, 0.2, 0.8, 0.8]],
                               "seed": 11})
            conn.request("POST", "/generate", body,
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            results.append((r.status, json.loads(r.read())))

        threads = [threading.Thread(target=post) for _ in range(3)]
        # stagger-free start so all three land inside one linger window
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)
        assert len(results) == 3
        assert all(s == 200 for s, _ in results), results
        for _, payload in results:
            arr = np.asarray(payload["refined"])
            assert arr.shape == (1, service.T, service.data_dim)
        # at least one dispatch served several requests at once
        assert max(p["coalesced_requests"] for _, p in results) >= 2

        conn = HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        h = json.loads(conn.getresponse().read())
        assert h["ok"] and h["T"] == service.T
    finally:
        server.shutdown()
        batcher.running = False


@pytest.mark.slow
def test_client_roundtrip(service):
    from interpolated_diffusion_tpu.serve.client import GenerationClient
    from interpolated_diffusion_tpu.serve.server import serve

    server, batcher = serve(service, "127.0.0.1", 0, linger_s=0.01)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        c = GenerationClient("127.0.0.1", port)
        assert c.health()["ok"]
        out = c.generate([[0.15, 0.15, 0.85, 0.85]], seed=5)
        assert out["refined"].shape == (1, service.T, service.data_dim)
        assert out["idx"].shape == (1, service.K)
    finally:
        server.shutdown()
        batcher.running = False


def test_loaders_return_device_committed_params():
    """Loaded params must be committed jax.Arrays, not host numpy — numpy
    leaves re-upload every weight on EVERY jitted dispatch, which through
    the ~30 MB/s TPU tunnel cost ~6 s/request (the round-2 serving gap:
    bench_serving p50 8.4 s vs ~14 ms of compute)."""
    import jax

    from interpolated_diffusion_tpu.models.loading import (
        load_interp_model, load_keypoint_model,
    )

    for loader, path in ((load_keypoint_model, KP), (load_interp_model, IL)):
        _, params, _ = loader(path, bf16=False)
        leaves = jax.tree_util.tree_leaves(params)
        assert leaves, "checkpoint produced no params"
        assert all(isinstance(l, jax.Array) for l in leaves), (
            "loader returned host (numpy) leaves — device_put regression")
