from ldm_tpu.data.datasets import Dataset, get_dataset  # noqa: F401
from ldm_tpu.data.loader import DataLoader, create_dataloaders, split_train_val  # noqa: F401
