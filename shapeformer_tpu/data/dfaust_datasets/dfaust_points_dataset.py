"""Module-path shim for the points-only variant (dfaust_points_dataset.py:14)."""
from .dfaust_dataset import DFAUSTPointsDataset as DFAUSTDataset  # noqa: F401
from .dfaust_dataset import VisDFAUSTDataset_points  # noqa: F401
