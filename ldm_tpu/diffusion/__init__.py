from ldm_tpu.diffusion.schedule import DiffusionSchedule  # noqa: F401
from ldm_tpu.diffusion.ddpm import GaussianDiffusion  # noqa: F401
from ldm_tpu.diffusion.flow import RectifiedFlow  # noqa: F401
