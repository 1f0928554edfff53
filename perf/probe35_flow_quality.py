"""probe35: rectified-flow quality/speed curve + negative-control candidates.

Brings the flow family to evidence parity with its siblings (VERDICT r3
next-round item 1): the same 2048-image protocol as probe21 (DDIM) /
probe30 (DPM++) / probe33 (consistency) — pixel-FID + exp1-classifier-FID
against real HARD data, generation timed on the chip — from the round-3
protocol_flow_hard EMA checkpoint and ITS OWN exp1 classifier's feature
space (runs/pixel/protocol_flow_hard_classifier).

Three questions answered in one sweep:

1. steps-vs-FID for Euler-N and Heun-N (the family's two ODE solvers) —
   where is the knee, and how does Heun's 2-evals/step budget compare with
   the pixel family's DPM++-15 (probe30: classifier-FID 1.26 at 15 fused
   evals) at MATCHED eval budgets?  `evals` in each row = fused-CFG model
   evaluations per image for direct cross-family comparison.
2. which negative-control candidate FIRES (>=3x classifier-FID)?  Round 3
   shipped flow with the pixel break (cfg0 + 5-step), measured inert —
   broken 0.256 vs real 0.932 (runs/protocol_r3_flow.log).  Candidates:
   wrong-way ODE integration (flow.py ode_direction=-1, the sign-convention
   bug class) and Euler-1/2 (few-step-without-reflow, the failure mode the
   rectified-flow paper's reflow procedure exists to fix).
3. anchors for the protocol rerun: euler50 (the Phase C sampler) and
   euler400 (full-budget reference row).

Usage: python perf/probe35_flow_quality.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ldm_tpu.config import load_config  # noqa: E402
from ldm_tpu.data.datasets import synthetic_dataset_hard  # noqa: E402
from ldm_tpu.data.transforms import scale_to_minus_one_one  # noqa: E402
from ldm_tpu.factory import build_classifier, build_diffusion, build_model  # noqa: E402
from ldm_tpu.ops.fid import fid_from_features, pixel_fid  # noqa: E402
from ldm_tpu.training import checkpoint as ckpt  # noqa: E402

N_FID = 2048
B = 128

config = load_config("/root/repo/configs/protocol_flow_hard.yaml")
model = build_model(config)
flow = build_diffusion(config)  # RectifiedFlow(n_steps=400)

tmpl = jax.eval_shape(
    model.init, jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
)
tmpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), tmpl)
params = jax.device_put(ckpt.load_params(
    "/root/repo/runs/pixel/protocol_flow_hard/checkpoints/diffusion_model_ema.msgpack",
    tmpl,
))

clf = build_classifier(config, 3, 10)
cv = jax.jit(lambda k, x: clf.init(k, x, train=False))(
    jax.random.key(1), jnp.zeros((1, 32, 32, 3))
)
ctmpl = {"params": jax.tree.map(np.asarray, cv["params"]),
         "batch_stats": jax.tree.map(np.asarray, cv.get("batch_stats", {}))}
cvars = jax.device_put(ckpt.load_params(
    "/root/repo/runs/pixel/protocol_flow_hard_classifier/checkpoints/resnet_exp1.msgpack",
    ctmpl,
))
feat_fn = jax.jit(lambda v, x: clf.apply(v, x, train=False, features=True))


def features(images_u8):
    x = scale_to_minus_one_one(images_u8)
    outs = []
    for i in range(0, len(x), 256):
        chunk = x[i : i + 256]
        if len(chunk) < 256:
            chunk = np.concatenate([chunk, x[: 256 - len(chunk)]])
        outs.append(np.asarray(feat_fn(cvars, jnp.asarray(chunk))))
    return np.concatenate(outs)[: len(x)]


classes = jnp.arange(B, dtype=jnp.int32) % 10


def gen(solver, steps, cfg_scale, direction=1.0):
    if solver == "heun":
        fn = jax.jit(lambda p, k: flow.sample_heun(
            model.apply, p, k, classes, (32, 32, 3), n_sample_steps=steps,
            cfg_scale=cfg_scale, null_label=10, ode_direction=direction))
        evals = 2 * steps
    else:
        fn = jax.jit(lambda p, k: flow.sample_euler(
            model.apply, p, k, classes, (32, 32, 3), n_sample_steps=steps,
            cfg_scale=cfg_scale, null_label=10, ode_direction=direction))
        evals = steps
    imgs = []
    np.asarray(fn(params, jax.random.key(0)))  # compile
    t0 = time.perf_counter()
    for i in range(N_FID // B):
        x0 = np.asarray(fn(params, jax.random.key(100 + i)))
        imgs.append(((np.clip(x0, -1, 1) + 1) * 127.5).astype(np.uint8))
    dt = time.perf_counter() - t0
    return np.concatenate(imgs), N_FID / dt, evals


real = synthetic_dataset_hard(N_FID, 32, 3, seed=777).images
f_real = features(real)

out = {"device": str(jax.devices()[0]), "n": N_FID}
for name, solver, steps, cfg, direction in [
    ("euler400", "euler", 400, 3.0, 1.0),   # full-budget anchor
    ("euler100", "euler", 100, 3.0, 1.0),
    ("euler50", "euler", 50, 3.0, 1.0),     # protocol Phase C sampler
    ("euler25", "euler", 25, 3.0, 1.0),
    ("euler10", "euler", 10, 3.0, 1.0),
    ("euler5", "euler", 5, 3.0, 1.0),
    ("euler2", "euler", 2, 3.0, 1.0),       # NC candidate: no-reflow few-step
    ("euler1", "euler", 1, 3.0, 1.0),       # NC candidate: no-reflow one-step
    ("heun25", "heun", 25, 3.0, 1.0),
    ("heun15", "heun", 15, 3.0, 1.0),       # 30 evals ~ DPM++-15 x2 budget
    ("heun10", "heun", 10, 3.0, 1.0),
    ("heun5", "heun", 5, 3.0, 1.0),
    ("euler50_reverse", "euler", 50, 3.0, -1.0),  # NC candidate: wrong-way ODE
] :
    imgs, rate, evals = gen(solver, steps, cfg, direction)
    row = {
        "img_per_sec": round(rate, 1),
        "evals_per_img": evals,
        "fid_pixel": round(float(pixel_fid(real, imgs)), 4),
        "fid_classifier": round(
            float(fid_from_features(f_real, features(imgs))), 4),
    }
    out[name] = row
    print(name, row, flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe35.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
