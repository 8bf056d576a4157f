from . import gridcoords, sparse, scatter, grid_sample, sampling  # noqa: F401
