"""Pure-NumPy geometry kernels (no GEOS / shapely).

All kernels operate on coordinate ``float64`` arrays; geometries cross the
Spark boundary as WKB ``binary`` columns (see ``wkb.py``). The planar
arrangement machinery (``noding.py`` + ``faces.py``) is the single core
primitive: polygonize, union/dissolve, morphological close and boundary
extraction are all expressed on top of it (SURVEY.md §2.7).
"""
