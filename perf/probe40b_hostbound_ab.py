"""probe40b: the native-vs-python serving A/B at a HOST-BOUND load.

probe40's flow Euler-2 A/B turned out to be device-bound: with CFG the 2B
fused batch costs 4 model evals/img (probe35 device-side Euler-2 ~1408
img/s), so the python path simply sat at the device ceiling (~1580 img/s)
while the native path lost ~15% to eager partial-batch dispatch (38
batches / 384 padded slots vs python's 32 / 0 at the same loads).  probe34
isolated the host ceiling on a ~1-eval/img load (consistency-2,
guidance-free); its student checkpoint was lost, so this probe rebuilds
that regime from the surviving flow checkpoint: Euler-1 + cfg_scale=0
(reference semantics — guidance off skips the uncond pass) = 1 model
eval/img, where the device could do several thousand img/s and host
per-slot work is the limiter.

Output: perf/probe40b.json
Usage: python perf/probe40b_hostbound_ab.py
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
               "load": "flow Euler-1 cfg=0 (1 model eval/img, host-bound)",
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

    # python first this time (reverse of probe40) so an order effect, if
    # any, works AGAINST the same conclusion
    for name, use_native in [("euler1_cfg0_python", False),
                             ("euler1_cfg0_native", True)]:
        cfg = load_config("configs/protocol_flow_hard.yaml")
        service = build_generation_service(
            cfg, sampler="ddim", ddim_steps=1, cfg_scale=0.0,
            batch_size=batch, max_delay_s=0.01, use_native=use_native,
        )
        assert (service._slotq is not None) == use_native
        t0 = time.monotonic()
        service.start(warmup=True)
        compile_s = time.monotonic() - t0
        print(f"{name} warmup/compile: {compile_s:.1f} s", flush=True)

        load(service, 4, 2, 16)  # warm the load path
        runs = []
        for spec in [(16, 8, 16), (8, 8, 32), (32, 16, 4), (16, 8, 16)]:
            r = load(service, *spec)
            runs.append(r)
            print(name, json.dumps(r), flush=True)
        service.stop()
        results["configs"][name] = {
            "compile_s": round(compile_s, 1), "runs": runs,
            "saturated_images_per_s": max(r["images_per_s"] for r in runs),
        }

    results["probe34_consistency2_python_images_per_s"] = 1583.1
    with open(os.path.join(os.path.dirname(__file__), "probe40b.json"),
              "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v["saturated_images_per_s"]
                      for k, v in results["configs"].items()}), flush=True)


if __name__ == "__main__":
    main()
