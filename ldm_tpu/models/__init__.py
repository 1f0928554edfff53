from ldm_tpu.models.unet import UNet  # noqa: F401
from ldm_tpu.models.autoencoder import Autoencoder  # noqa: F401
from ldm_tpu.models.resnet import ResNetBase  # noqa: F401
from ldm_tpu.models.latent import LatentDiffusionModel  # noqa: F401
