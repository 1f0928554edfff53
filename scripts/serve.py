#!/usr/bin/env python
"""Generation server: dynamic-batching HTTP serving of a trained model.

Capability-plus over the reference (whose only inference surface is the
one-shot generate_images.py CLI): an always-on service that coalesces
concurrent requests into one fixed-shape compiled sampler
(ldm_tpu/serving/).  Works for pixel AND latent (``type: latent``) configs.

Usage:
  python scripts/serve.py configs/demo_tpu.yaml --port 8080
  curl -X POST localhost:8080/generate -d '{"class_id": 3, "n": 4, "seed": 1}'
  curl localhost:8080/stats
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default=None,
                    help="eps-model params (default: run dir's best/EMA)")
    ap.add_argument("--ema", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--sampler",
                    choices=("ddim", "ddpm", "dpmpp", "consistency"),
                    default="ddim")
    ap.add_argument("--ddim-steps", type=int, default=50,
                    help="sampler steps (for consistency: 1-4 model evals)")
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--cfg-scale", type=float, default=None)
    ap.add_argument("--batch-size", type=int, default=64,
                    help="the ONE compiled batch size (slots per dispatch)")
    ap.add_argument("--max-delay-ms", type=float, default=20.0,
                    help="batcher fill deadline before dispatching padded")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", action="store_true",
                    help="serve data-parallel over ALL local devices: batch "
                         "slots sharded on the mesh's data axis, params "
                         "replicated (per-request determinism preserved)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ldm_tpu.config import load_config
    from ldm_tpu.serving import GenerationHTTPServer
    from ldm_tpu.serving.builder import build_generation_service

    mesh = None
    if args.mesh:
        from ldm_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        print(f"serving mesh: {dict(mesh.shape)}", flush=True)

    config = load_config(args.config)
    service = build_generation_service(
        config, args.checkpoint, use_ema=args.ema, sampler=args.sampler,
        ddim_steps=args.ddim_steps, eta=args.eta, cfg_scale=args.cfg_scale,
        batch_size=args.batch_size, max_delay_s=args.max_delay_ms / 1e3,
        mesh=mesh,
    )
    print(f"compiling the {args.sampler} sampler at batch {args.batch_size} "
          "(first compile is the slow part)...", flush=True)
    service.start(warmup=True)
    server = GenerationHTTPServer(service, host=args.host, port=args.port)
    print(f"serving on {server.address} "
          f"(POST /generate, GET /stats, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    finally:
        service.stop()


if __name__ == "__main__":
    main()
