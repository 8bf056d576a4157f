"""Module-path alias (ref .../realtest.py)."""
from .realscan_datasets import (RealTest_dataset, RealTest2_dataset,  # noqa: F401
                                HPRScanHD_dataset)
