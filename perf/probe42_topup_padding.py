"""probe42: backpressure top-up vs probe40's slow-cadence padding.

probe40's Euler-25 native row shipped 384 padded slots over 38 batches
(19% of dispatched capacity wasted): the batcher assembled a partial batch
within max_delay (10 ms), then blocked on the FULL dispatch->fulfil
handoff queue while new slots piled up behind it.  The fix (service.py
_run/_run_native): while the handoff queue is full the put() blocks
anyway, so the batcher keeps topping the partial batch up
(SlotQueue.collect_more) — dispatch starts no later, pad slots carry real
work instead.

This probe reruns probe40's native loads bit-for-bit (same checkpoint,
same closed-loop grid) with the policy in place:
  * Euler-25 (slow cadence, the padding pathology) — expect padded_slots
    to collapse and img/s to rise toward the unpadded device rate.
  * Euler-2 (fast cadence, handoff rarely full) — expect parity with
    probe40 (the loop must not hurt the regime that was already clean).

probe40 comparison rows are embedded from perf/probe40.json at commit
a4b2380 so the JSON is self-contained.

Output: perf/probe42.json
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ldm_tpu import native
    from ldm_tpu.config import load_config
    from ldm_tpu.serving.builder import build_generation_service

    assert native.available(), "native module must build for this probe"

    batch = 64
    results = {
        "device": jax.devices()[0].device_kind, "batch_size": batch,
        "probe40_before": {  # perf/probe40.json, the pre-top-up policy
            "flow_euler25_native": {
                "saturated_images_per_s": 948.7,
                "runs_batches": [38, 32, 38, 8],
                "runs_padded_slots": [384, 0, 384, 448],
            },
            "flow_euler2_native": {
                "saturated_images_per_s": 1332.3,
                "runs_padded_slots": [0, 0, 0, 448],
            },
        },
        "configs": {},
    }

    def load(service, n_clients, reqs_per_client, n_per_req):
        stats0 = service.stats()
        lat, lock = [], threading.Lock()

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
            "clients": n_clients, "reqs_per_client": reqs_per_client,
            "n_per_req": n_per_req, "images": imgs,
            "wall_s": round(wall, 3),
            "images_per_s": round(imgs / wall, 1),
            "latency_p50_s": round(lat[len(lat) // 2], 3),
            "latency_p95_s": round(lat[min(len(lat) - 1,
                                           int(len(lat) * 0.95))], 3),
            "batches": stats1.batches - stats0.batches,
            "padded_slots": stats1.padded_slots - stats0.padded_slots,
        }

    for name, steps in [("flow_euler25_native", 25),
                        ("flow_euler2_native", 2)]:
        cfg = load_config("configs/protocol_flow_hard.yaml")
        service = build_generation_service(
            cfg, sampler="ddim", ddim_steps=steps,
            batch_size=batch, max_delay_s=0.01, use_native=True,
        )
        t0 = time.monotonic()
        service.start(warmup=True)
        compile_s = time.monotonic() - t0
        print(f"{name} warmup/compile: {compile_s:.1f} s", flush=True)

        load(service, 4, 2, 16)  # warm the load path
        runs = []
        for spec in [(16, 8, 16), (8, 8, 32), (32, 16, 4), (1, 8, 8)]:
            r = load(service, *spec)
            runs.append(r)
            print(name, json.dumps(r), flush=True)
        service.stop()
        results["configs"][name] = {
            "compile_s": round(compile_s, 1), "runs": runs,
            "saturated_images_per_s": max(r["images_per_s"]
                                          for r in runs[:3]),
            "padded_slots_total": sum(r["padded_slots"] for r in runs),
        }

    with open(os.path.join(os.path.dirname(__file__), "probe42.json"),
              "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: (v["saturated_images_per_s"],
                          v["padded_slots_total"])
                      for k, v in results["configs"].items()}), flush=True)


if __name__ == "__main__":
    main()
