"""probe34b: consistency-2 serving rerun from the probe36 sweep's student.

VERDICT r3 item 4 asked for a probe34 rerun (>=2.2k img/s consistency-2
serving, or a measured host roofline).  probe40/40b pinned the roofline:
~1.5k img/s on this box regardless of host path, set by the ~29 ms/batch
axon-tunnel dispatch round trip (the arm order, not C++-vs-Python, decides
short A/Bs).  This closes the loop with the REAL distilled student — the
probe36 best24b checkpoint (consistency-2 classifier-FID at
better-than-teacher quality) — served through the now-default native C++
slot queue, same closed-loop load grid as probe34 for direct comparison.

Output: perf/probe34b.json
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from ldm_tpu.config import load_config
    from ldm_tpu.serving.builder import build_generation_service

    cfg = load_config("configs/protocol_hard.yaml")
    path = os.path.join(cfg.checkpoints, "consistency_best24b.msgpack")
    if not os.path.exists(path):
        raise SystemExit(f"run perf/probe36_cd_sweep.py best24b first ({path})")

    batch = 64
    results = {"device": jax.devices()[0].device_kind, "batch_size": batch,
               "checkpoint": path, "native_slot_queue": True, "configs": {}}

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

    for steps in (2, 1):
        service = build_generation_service(
            cfg, path, sampler="consistency", ddim_steps=steps,
            batch_size=batch, max_delay_s=0.01,
        )
        t0 = time.monotonic()
        service.start(warmup=True)
        compile_s = time.monotonic() - t0
        name = f"consistency{steps}"
        print(f"{name} warmup/compile: {compile_s:.1f} s", flush=True)

        load(service, 4, 2, 16)  # warm the load path
        runs = []
        for spec in [(16, 8, 16), (8, 8, 32), (32, 16, 4), (1, 8, 8)]:
            r = load(service, *spec)
            runs.append(r)
            print(json.dumps(r), flush=True)
        service.stop()
        results["configs"][name] = {
            "compile_s": round(compile_s, 1), "runs": runs,
            "saturated_images_per_s": max(r["images_per_s"]
                                          for r in runs[:3]),
        }

    with open(os.path.join(os.path.dirname(__file__), "probe34b.json"),
              "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v["saturated_images_per_s"]
                      for k, v in results["configs"].items()}), flush=True)


if __name__ == "__main__":
    main()
