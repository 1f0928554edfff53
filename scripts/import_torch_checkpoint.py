#!/usr/bin/env python
"""Migrate a reference torch checkpoint (.pt) into this framework.

The reference's only checkpoint format is ``torch.save(model.state_dict())``
(reference src/EarlyStopping.py:56-63).  This CLI loads such a file, maps the
weights onto our flax parameter tree (ldm_tpu/utils/torch_import.py — the
correspondence tests/test_torch_parity.py proves output-identical), validates
shapes against the model the config builds, and writes our msgpack weight
files where the rest of the framework expects them:

* UNet       -> <checkpoints>/diffusion_model.msgpack (+ _ema copy: the
                reference has no EMA, so the imported weights seed it)
* Autoencoder-> <checkpoints>/autoencoder.msgpack
* ResNetBase -> <checkpoints>/classifier.msgpack

so e.g. ``scripts/generate_images.py <config>`` samples from a
reference-trained model with zero further steps.

Usage:
    python scripts/import_torch_checkpoint.py ckpt.pt config.yaml
        [--kind auto|unet|autoencoder|classifier] [--out PATH]
        [--bottleneck-time-emb]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main(argv=None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="reference .pt state_dict file")
    ap.add_argument("config", help="config YAML describing the model")
    ap.add_argument("--kind", default="auto",
                    choices=("auto", "unet", "autoencoder", "classifier"))
    ap.add_argument("--out", default=None,
                    help="output path (default: the trainer-standard name "
                         "under the config's checkpoints dir)")
    ap.add_argument("--bottleneck-time-emb", action="store_true",
                    help="UNet only: import the reference's (untrained) "
                         "bottleneck time-MLP weights into our fixed "
                         "bottleneck instead of dropping them")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import torch

    try:
        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(args.checkpoint, map_location="cpu")
    if not isinstance(sd, dict):
        raise SystemExit("checkpoint is not a state_dict (torch.save'd dict)")

    import jax.numpy as jnp

    from ldm_tpu.config import load_config
    from ldm_tpu.factory import build_classifier, build_model
    from ldm_tpu.training import checkpoint as ckpt
    from ldm_tpu.utils import torch_import as ti

    config = load_config(args.config)
    kind = ti.detect_kind(sd) if args.kind == "auto" else args.kind
    d = config.data
    img = jnp.zeros((1, d.image_size, d.image_size, d.image_channels),
                    jnp.float32)

    if kind == "unet":
        model = build_model(config)
        mapped = ti.unet_params_from_state_dict(
            sd, bottleneck_time_emb=args.bottleneck_time_emb
        )
        if getattr(model, "bottleneck_time_emb", True) != args.bottleneck_time_emb:
            print(
                "note: config model has bottleneck_time_emb="
                f"{getattr(model, 'bottleneck_time_emb', True)}; importing "
                f"with {args.bottleneck_time_emb} — set model.params."
                "bottleneck_time_emb accordingly for exact reference behavior"
            )
        template = jax.eval_shape(
            model.init, jax.random.key(0), img, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
        default = "diffusion_model.msgpack"
    elif kind == "autoencoder":
        model = build_model(config)
        mapped = ti.autoencoder_params_from_state_dict(sd)
        template = jax.eval_shape(
            model.init, jax.random.key(0), img, jax.random.key(1)
        )
        default = "autoencoder.msgpack"
    else:
        model = build_classifier(config, d.image_channels, d.num_classes)
        mapped = ti.resnet_params_from_state_dict(sd)
        template = jax.eval_shape(
            lambda k, x: model.init(k, x, train=False), jax.random.key(0), img
        )
        default = "classifier.msgpack"

    ti.check_against_template(mapped, template)

    out = args.out or os.path.join(config.checkpoints, default)
    ckpt.save_params(out, mapped)
    n = sum(v.size for v in jax.tree.leaves(mapped))
    print(f"imported {kind} ({n:,} params) -> {out}")
    if kind == "unet" and args.out is None:
        ema = os.path.join(config.checkpoints, "diffusion_model_ema.msgpack")
        ckpt.save_params(ema, mapped)
        print(f"seeded EMA weights (reference has none) -> {ema}")
    return out


if __name__ == "__main__":
    main()
