"""Module-path alias so reference YAML dotted paths resolve
(ref shapeformer/data/imnet_datasets/hprscan_dataset.py)."""
from .realscan_datasets import (AMScan_dataset, HPRScan_dataset,  # noqa: F401
                                HPRScanHD_dataset, OrthoHPRScan_dataset)
