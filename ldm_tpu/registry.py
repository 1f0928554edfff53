"""Registry-based component factory.

The reference instantiates models by importlib reflection on a ``target:`` string in
YAML (``src/utils.py:48-104``: ``get_obj_from_str`` / ``instantiate_from_config`` /
``get_model_from_config``). Reflection is fragile and untyped; here components register
themselves under their dotted name, and reference-era target strings (``src.UNet.UNet``
etc.) are aliased so the shipped reference configs keep working verbatim.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[..., Any]] = {}

# Reference `target:` strings (see config_files/*.yaml and src/utils.py:48-104)
# mapped onto this framework's components.
TARGET_ALIASES: Dict[str, str] = {
    "src.DDPM.Diffusion": "ldm_tpu.diffusion.ddpm.GaussianDiffusion",
    "src.UNet.UNet": "ldm_tpu.models.unet.UNet",
    "src.Autoencoder.Autoencoder": "ldm_tpu.models.autoencoder.Autoencoder",
    "src.ResNetClassifier.ResNetBase": "ldm_tpu.models.resnet.ResNetBase",
    "src.LatentDiffusionModel.LatentDiffusionModel": (
        "ldm_tpu.models.latent.LatentDiffusionModel"
    ),
}

# Constructor kwargs from reference configs that have no meaning here
# (e.g. `device: cuda` inside diffusion params, config_files/*.yaml:13).
_IGNORED_PARAMS = ("device",)


def register(name: str) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """Class/function decorator: register a component under a dotted name."""

    def deco(obj: Callable[..., Any]) -> Callable[..., Any]:
        _REGISTRY[name] = obj
        return obj

    return deco


def resolve(target: str) -> Callable[..., Any]:
    """Resolve a target string (ours, or a reference alias) to a constructor."""
    target = TARGET_ALIASES.get(target, target)
    if target not in _REGISTRY:
        # Import the defining module so its @register decorator runs.
        module_name = target.rsplit(".", 1)[0]
        import importlib

        importlib.import_module(module_name)
    if target not in _REGISTRY:
        raise KeyError(
            f"Unknown component target {target!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[target]


def instantiate_from_config(cfg: Dict[str, Any], **extra: Any) -> Any:
    """Build a component from a ``{"target": ..., "params": {...}}`` mapping.

    Mirrors the reference's ``instantiate_from_config`` (src/utils.py:70-88) but via
    the registry; unknown torch-era params (``device``) are dropped.
    """
    if "target" not in cfg:
        raise KeyError(f"config has no 'target': {cfg}")
    ctor = resolve(cfg["target"])
    params = dict(cfg.get("params") or {})
    for bad in _IGNORED_PARAMS:
        params.pop(bad, None)
    params.update(extra)
    return ctor(**params)
