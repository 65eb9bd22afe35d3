"""Policy-serving benchmark on the real TPU: latency + micro-batch throughput.

Starts the TPU-hosted CNN policy behind the wire protocol, fires concurrent
client requests (base64-JPEG frames, exactly the benchmark client's format),
and reports p50/p95 latency and requests/s for single-stream vs 16
concurrent streams against the micro-batching server.

Run:  timeout 3600 python benchmarks/serve_bench.py > /tmp/serve_bench.log 2>&1
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from sage3d_tpu.serve.batch_server import from_jax_policy
    from sage3d_tpu.serve.client import create_vlm_client

    H = W = 96
    frames = 4
    with from_jax_policy(height=H, width=W, frames=frames, max_batch=16,
                         max_wait_s=0.005) as srv:
        img = (np.random.default_rng(0).uniform(0, 255, (H, W, 3))
               .astype(np.uint8))

        def one_request():
            client = create_vlm_client(input_type="rgb", output_type="text",
                                       protocol="socket", host="127.0.0.1",
                                       port=srv.port)
            t0 = time.time()
            r = client.query([img] * frames, "go", current_yaw=0.0)
            return time.time() - t0, r

        # warm-up (compile)
        t0 = time.time()
        one_request()
        log(f"first request (compile): {time.time()-t0:.1f}s")

        # single stream
        lats = [one_request()[0] for _ in range(30)]
        lats.sort()
        single = {"p50_ms": round(lats[len(lats)//2]*1e3, 1),
                  "p95_ms": round(lats[int(len(lats)*0.95)]*1e3, 1),
                  "req_per_s": round(1.0/np.mean(lats), 1)}
        log(f"single-stream: {single}")

        # 16 concurrent streams x 8 requests
        results = []
        lock = threading.Lock()

        def stream():
            for _ in range(8):
                dt, r = one_request()
                with lock:
                    results.append((dt, "error" not in r))

        t0 = time.time()
        threads = [threading.Thread(target=stream) for _ in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        wall = time.time() - t0
        lat = sorted(d for d, ok in results) or [float("inf")]
        conc = {"n_requests": len(results),
                "all_ok": all(ok for _, ok in results),
                "p50_ms": round(lat[len(lat)//2]*1e3, 1),
                "p95_ms": round(lat[int(len(lat)*0.95)]*1e3, 1),
                "req_per_s": round(len(results)/wall, 1),
                "batches": srv.stats["batches"],
                "max_batch_seen": srv.stats["max_batch_seen"]}
        log(f"16-concurrent: {conc}")

    print(json.dumps({"single_stream": single, "concurrent_16": conc,
                      "model": f"CNN policy {frames}x{H}x{W}",
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
