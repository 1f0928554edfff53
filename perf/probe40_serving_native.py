"""probe40: serving with the C++ slot queue + the flow family served.

VERDICT r3 item 4: probe34 measured the serving stack host-bound at ~1.58k
img/s (consistency-2, batch 64) on the 1-core box, with slot assembly and
fulfil fan-out still pure Python.  Round 4 moved the whole slot-granular
path into the native module (ldm_tpu/native batcher.cpp `ldm_slotq_*`:
submit enqueues a request's slots in one GIL-released call, collect
blocks + assembles the batch arrays in C++, scatter memcpys finished rows
into request buffers) — serving/service.py uses it automatically.

This probe measures the probe34 loads on both paths (native vs
pure-Python fallback) for the A/B, plus the rectified-flow checkpoint
served through the builder's Euler path (the flow family's serving
evidence, VERDICT r3 item 1 tail).

NOTE on the checkpoint: probe34's consistency-2 student
(runs/pixel/protocol_hard/checkpoints/consistency_model.msgpack) was lost
with the session-recycled working tree (msgpack blobs are not committed —
only their logs/metrics are).  The flow checkpoint survives, so the A/B
runs the SAME 2-model-eval device load through the flow family's Euler-2
path: identical host-side slot/assembly/fulfil work per image, identical
batch cadence class — the host-ceiling comparison probe34 defined.

Output: perf/probe40.json
Usage: python perf/probe40_serving_native.py
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
    results = {"device": jax.devices()[0].device_kind, "batch_size": batch,
               "configs": {}}

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

    specs = [
        # name, config, sampler, steps, use_native
        # 2-eval load (the probe34 host-ceiling regime; see module note)
        ("flow_euler2_native", "configs/protocol_flow_hard.yaml", "ddim",
         2, True),
        ("flow_euler2_python", "configs/protocol_flow_hard.yaml", "ddim",
         2, False),
        # the flow family's serving-quality row (Heun-equivalent eval budget
        # is a quality choice; throughput here is model-bound either way)
        ("flow_euler25_native", "configs/protocol_flow_hard.yaml", "ddim",
         25, True),
    ]
    for name, cfg_path, sampler, steps, use_native in specs:
        cfg = load_config(cfg_path)
        service = build_generation_service(
            cfg, sampler=sampler, ddim_steps=steps,
            batch_size=batch, max_delay_s=0.01, use_native=use_native,
        )
        assert (service._slotq is not None) == use_native
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
        }

    results["probe34_python_baseline_images_per_s"] = 1583.1
    with open(os.path.join(os.path.dirname(__file__), "probe40.json"),
              "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v["saturated_images_per_s"]
                      for k, v in results["configs"].items()}), flush=True)


if __name__ == "__main__":
    main()
