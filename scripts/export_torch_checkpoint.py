#!/usr/bin/env python
"""Export weights trained here as a reference-compatible torch checkpoint.

The inverse of scripts/import_torch_checkpoint.py: loads one of our msgpack
weight files (weights-only, as written by the trainers / the importer), maps it
to the reference's ``state_dict()`` key layout
(ldm_tpu/utils/torch_export.py), and ``torch.save``s it — loadable with
``module.load_state_dict(sd, strict=True)`` by the reference classes
(reference src/utils.py:36-45 ``load_model``), or by any torch tooling built
around them.

Usage:
    python scripts/export_torch_checkpoint.py weights.msgpack config.yaml \
        --kind auto|unet|autoencoder|classifier [--out model.pt] [--ema]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main(argv=None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", nargs="?", default=None,
                    help="msgpack weight file (default: the trainer-standard "
                         "file under the config's checkpoints dir)")
    ap.add_argument("config", help="config YAML describing the model")
    ap.add_argument("--kind", default="auto",
                    choices=("auto", "unet", "autoencoder", "classifier"))
    ap.add_argument("--out", default=None, help="output .pt path")
    ap.add_argument("--ema", action="store_true",
                    help="UNet default-file mode: export the EMA weights")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    import torch
    from flax import serialization

    from ldm_tpu.config import load_config
    from ldm_tpu.utils import torch_export as te

    config = load_config(args.config)

    # default-file resolution needs a kind hint; an explicit weights path does
    # not — the msgpack's own tree decides (no template needed: the mappers
    # validate structure and raise loudly on a mismatch)
    if args.weights is None:
        kind_hint = args.kind
        if kind_hint == "auto":
            target = config.model.target.lower()
            kind_hint = ("autoencoder" if "autoencoder" in target
                         else "unet" if "unet" in target else "classifier")
        default = {
            "unet": ("diffusion_model_ema.msgpack" if args.ema
                     else "diffusion_model.msgpack"),
            "autoencoder": "autoencoder.msgpack",
            "classifier": "classifier.msgpack",
        }[kind_hint]
        weights = os.path.join(config.checkpoints, default)
    else:
        weights = args.weights

    with open(weights, "rb") as f:
        variables = serialization.msgpack_restore(f.read())

    if args.kind != "auto":
        kind = args.kind
    elif "batch_stats" in variables:
        kind = "classifier"
    elif "encoder" in variables.get("params", {}):
        kind = "autoencoder"
    else:
        kind = "unet"

    variables = jax.tree.map(lambda x: np.asarray(x, np.float32)
                             if np.issubdtype(np.asarray(x).dtype, np.floating)
                             else np.asarray(x), variables)

    if kind == "unet":
        sd = te.unet_state_dict_from_params(variables)
    elif kind == "autoencoder":
        nrb = int(config.model.params.get("n_resnet_blocks", 2))
        sd = te.autoencoder_state_dict_from_params(variables, nrb)
    else:
        sd = te.resnet_state_dict_from_params(variables)

    out = args.out or os.path.splitext(weights)[0] + ".pt"
    # np.array copies: jax-derived arrays are non-writable, which torch warns on
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, out)
    print(f"exported {kind} ({len(sd)} tensors) -> {out}")
    return out


if __name__ == "__main__":
    main()
