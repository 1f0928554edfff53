from ldm_tpu.ops.metrics import confusion_matrix, f1_from_confusion  # noqa: F401
