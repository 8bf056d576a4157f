"""Module-path shim: the reference names this class DFAUSTDataset inside
dfaustv1_dataset.py (dfaustv1_dataset.py:14); configs referencing that dotted
path resolve here."""
from .dfaust_dataset import DFAUSTV1Dataset as DFAUSTDataset  # noqa: F401
from .dfaust_dataset import VisDFAUSTDataset_points  # noqa: F401
