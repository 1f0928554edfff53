from ldm_tpu.utils.logging import MetricsLogger  # noqa: F401
from ldm_tpu.utils.timing import timeit  # noqa: F401
from ldm_tpu.utils.images import save_images, image_grid  # noqa: F401
from ldm_tpu.utils.seed import set_seed  # noqa: F401
