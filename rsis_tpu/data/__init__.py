"""Data layer: dataset catalogs, packed-target builder, host pipeline."""

from .base import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    InstanceDataset,
    normalize_image,
    sequence_from_masks,
    unpack_target,
)
from .catalogs import (  # noqa: F401
    CITYSCAPES_CLASSES,
    CITYSCAPES_LABEL_IDS,
    DATASETS,
    LEAVES_CLASSES,
    PASCAL_CLASSES,
    CityScapes,
    LeavesDataset,
    PascalVOC,
    SyntheticBlobs,
    get_dataset,
)
from .pipeline import DataLoader  # noqa: F401
