"""Module-path alias (ref .../redwood.py)."""
from .realscan_datasets import Redwood, Redwood2, HPRScanHD_dataset  # noqa: F401
