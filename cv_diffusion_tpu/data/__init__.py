from .dataset import (LowLightDataset, SyntheticLowLightDataset, DataLoader,
                      create_dataloaders)
from . import augment
