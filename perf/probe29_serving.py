"""probe29: serving throughput/latency on the real chip.

Question: how much of the OFFLINE DDIM-50 sampler throughput
(bench.py `ddim50_images_per_sec_per_chip`, ~446 img/s amortized) does the
dynamic-batching SERVICE retain under concurrent client load, where every
batch is a separate dispatch over the axon tunnel (~15-25 ms each) and the
host must derive per-slot x_T, assemble batches, and fulfil futures on its
single core?

Setup: flagship pixel config (CIFAR-10 32x32, T=400 schedule, DDIM-50,
CFG fused 2B), random-init EMA checkpoint (throughput is weight-independent,
same convention as bench.py), service batch 64. Load: C client threads each
submitting R requests of n images, closed-loop (a client waits for its
future before submitting the next request) — the realistic serving regime.

Output: perf/probe29.json
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from ldm_tpu.config import load_config
    from ldm_tpu.factory import build_model
    from ldm_tpu.serving.builder import build_generation_service
    from ldm_tpu.training import checkpoint as ckpt

    cfg = load_config("configs/pixel_diffusion_model_cifar10.yaml")
    d = cfg.data
    shape = (d.image_size, d.image_size, d.image_channels)

    # Random-init EMA checkpoint: serving throughput does not depend on the
    # weights' values, only their shapes (bench.py uses the same convention).
    path = os.path.join(cfg.checkpoints, "diffusion_model_ema.msgpack")
    if not os.path.exists(path):
        model = build_model(cfg)
        params = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1,) + shape),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        )
        os.makedirs(cfg.checkpoints, exist_ok=True)
        ckpt.save_params(path, params)

    batch = 64
    service = build_generation_service(
        cfg, batch_size=batch, ddim_steps=50, max_delay_s=0.01,
    )
    t0 = time.monotonic()
    service.start(warmup=True)  # pays the DDIM-50 compile up front
    compile_s = time.monotonic() - t0
    print(f"warmup/compile: {compile_s:.1f} s", flush=True)

    def load(n_clients: int, reqs_per_client: int, n_per_req: int):
        """Closed-loop client threads; returns (img_per_s, p50_s, p95_s)."""
        stats0 = service.stats()
        lat = []
        lock = threading.Lock()

        def client(cid):
            for r in range(reqs_per_client):
                t = time.monotonic()
                fut = service.submit(
                    (cid * reqs_per_client + r) % 10, n=n_per_req,
                    seed=cid * 10007 + r,
                )
                fut.result(timeout=600)
                dt = time.monotonic() - t
                with lock:
                    lat.append(dt)

        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(n_clients)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        imgs = n_clients * reqs_per_client * n_per_req
        stats1 = service.stats()
        lat.sort()
        return {
            "clients": n_clients,
            "reqs_per_client": reqs_per_client,
            "n_per_req": n_per_req,
            "images": imgs,
            "wall_s": round(wall, 3),
            "images_per_s": round(imgs / wall, 1),
            "latency_p50_s": round(lat[len(lat) // 2], 3),
            "latency_p95_s": round(lat[min(len(lat) - 1,
                                           int(len(lat) * 0.95))], 3),
            "batches": stats1.batches - stats0.batches,
            "padded_slots": stats1.padded_slots - stats0.padded_slots,
        }

    results = {"device": jax.devices()[0].device_kind,
               "batch_size": batch, "ddim_steps": 50,
               "compile_s": round(compile_s, 1), "runs": []}

    # Warm the load path once (thread spin-up, first real batches).
    load(4, 2, 16)

    # Saturating load: plenty of queued slots per dispatch.
    for spec in [
        (16, 8, 16),   # 2048 imgs, 16 concurrent clients, 16 imgs/req
        (8, 8, 32),    # fewer clients, bigger requests
        (32, 16, 4),   # many small requests (batcher does the packing)
        (1, 8, 8),     # single client: latency floor, no batching benefit
    ]:
        r = load(*spec)
        results["runs"].append(r)
        print(json.dumps(r), flush=True)

    service.stop()
    sat = max(r["images_per_s"] for r in results["runs"][:3])
    results["saturated_images_per_s"] = sat
    with open(os.path.join(os.path.dirname(__file__), "probe29.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"saturated_images_per_s": sat}), flush=True)


if __name__ == "__main__":
    main()
