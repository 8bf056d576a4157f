"""Module-path alias (ref .../real_richcar.py; defaults differ only in
shape_ind/scan dir, passed via YAML kwargs)."""
from .realscan_datasets import Richcar_dataset, HPRScanHD_dataset  # noqa: F401
