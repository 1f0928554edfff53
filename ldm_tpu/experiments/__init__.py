from ldm_tpu.experiments.augmentation import run_augmentation_experiment  # noqa: F401
