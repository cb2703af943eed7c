from .dataset import (LowLightDataset, SyntheticLowLightDataset, DataLoader,
                      create_dataloaders)
from . import augment
from .native import (native_available, NativeDataLoader,
                     NativeSyntheticDataLoader, load_pair_batch,
                     load_synth_batch)
from .prefetch import PrefetchLoader
from . import device_augment
