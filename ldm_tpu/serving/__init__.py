"""Production serving: dynamic-batching generation service + HTTP front end.

The reference has no serving story — its only inference surface is the one-shot
``generate_images.py`` CLI (reference generate_images.py:18-60).  This package is
the deployment-facing capability the TPU build adds on top of the same compiled
samplers: a request-coalescing service that keeps ONE fixed-shape compiled
sampler fed (ldm_tpu/serving/service.py) and a dependency-free HTTP server in
front of it (ldm_tpu/serving/server.py).
"""

from ldm_tpu.serving.service import GenerationService, ServiceStats
from ldm_tpu.serving.server import GenerationHTTPServer

__all__ = ["GenerationService", "ServiceStats", "GenerationHTTPServer"]
