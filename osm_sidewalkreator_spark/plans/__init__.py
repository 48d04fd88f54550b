"""Logical pipeline stages (DataFrame -> DataFrame transforms) and the
pure-NumPy per-tile kernels they call inside ``applyInPandas``."""
