"""Module-path alias (ref .../rd.py)."""
from .realscan_datasets import Richcar_dataset, HPRScanHD_dataset  # noqa: F401
