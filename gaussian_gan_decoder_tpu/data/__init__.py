from .dataset import ImageFolderDataset, MaskLabeledDataset, InfiniteSampler
