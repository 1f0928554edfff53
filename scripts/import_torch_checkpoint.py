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
    ap.add_argument("--bottleneck-time-emb",
                    action=argparse.BooleanOptionalAction, default=None,
                    help="UNet only: import the reference's (untrained) "
                         "bottleneck time-MLP weights into our fixed "
                         "bottleneck instead of dropping them. Default: "
                         "follow the config model's bottleneck_time_emb, so "
                         "the import always matches the model you build")
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
    # channels from the model block, not the data block: a latent-space UNet's
    # in_channels is the VAE's z_channels, not the dataset's image_channels
    in_ch = int(config.model.params.get("in_channels", d.image_channels))
    img = jnp.zeros((1, d.image_size, d.image_size, in_ch), jnp.float32)

    if kind == "unet":
        model = build_model(config)
        bte = args.bottleneck_time_emb
        if bte is None:
            bte = bool(getattr(model, "bottleneck_time_emb", True))
        mapped = ti.unet_params_from_state_dict(sd, bottleneck_time_emb=bte)
        if bte != getattr(model, "bottleneck_time_emb", True):
            print(
                "note: config model has bottleneck_time_emb="
                f"{getattr(model, 'bottleneck_time_emb', True)}; importing "
                f"with {bte} — set model.params.bottleneck_time_emb "
                "accordingly for exact reference behavior"
            )
        elif bte:
            print(
                "note: the reference never trains its bottleneck time-MLPs "
                "(src/UNet.py:287-290); importing them at their random init. "
                "Set model.params.bottleneck_time_emb: false for exact "
                "reference behavior"
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
        # the classifier always sees dataset-space images, not model-space
        cimg = jnp.zeros((1, d.image_size, d.image_size, d.image_channels),
                         jnp.float32)
        template = jax.eval_shape(
            lambda k, x: model.init(k, x, train=False), jax.random.key(0), cimg
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
