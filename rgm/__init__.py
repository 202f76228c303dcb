"""rgm — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the semantics of the RoaringGeoMaps reference (a C++ S2-cell
inverted index: cell coverings -> roaring posting lists -> arbitrary keys;
see /root/reference/README.md) as Spark DataFrame jobs:

- ``rgm.cellmath``   vectorized S2 cell-id kernels (pure numpy)
- ``rgm.geo``        spherical / planar geometry predicates (numpy)
- ``rgm.covering``   region -> cell-covering generator (numpy)
- ``rgm.bitmap``     roaring-style posting-list codec (numpy)
- ``rgm.index``      distributed index build (explode -> groupBy -> bitmap agg)
- ``rgm.query``      contains / intersects / knn / tile-assignment joins
- ``rgm.images``     deterministic image codec + fidelity invariants
- ``rgm.checkpoint`` snapshot manifests, per-partition lineage, resume
- ``rgm.session``    tuned SparkSession factory
"""

__version__ = "0.1.0"
