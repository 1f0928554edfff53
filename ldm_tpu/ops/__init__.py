from ldm_tpu.ops.metrics import confusion_matrix, f1_from_confusion  # noqa: F401
from ldm_tpu.ops.linear_attention import (  # noqa: F401
    linear_attention_block,
    linear_attention_block_fused_grads,
    linear_attention_block_pallas,
    linear_attention_block_pallas_bwd,
    linear_attention_block_xla,
)
from ldm_tpu.ops.resnet_block import (  # noqa: F401 — perf negative result,
    resnet_block,                       # not wired into UNet (perf doc §8)
    resnet_block_pallas,
    resnet_block_xla,
)
