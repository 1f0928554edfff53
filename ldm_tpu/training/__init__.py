from ldm_tpu.training.state import TrainState  # noqa: F401
from ldm_tpu.training.early_stopping import EarlyStopping  # noqa: F401
