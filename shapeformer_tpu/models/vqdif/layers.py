"""Module-path shim: the reference duplicates ResnetBlockFC under
shapeformer/models/vqdif/layers.py; resolve to the canonical block."""
from ..layers import ResnetBlockFC  # noqa: F401
