from .dataset import (LowLightDataset, SyntheticLowLightDataset, DataLoader,
                      create_dataloaders)
from . import augment
from .native import (native_available, NativeDataLoader, load_pair_batch,
                     load_synth_batch)
from . import device_augment
