"""gfp_gdal_spark — a from-scratch, PySpark-native spatial IO + join engine.

Re-expresses the capabilities of the reference plugin (geoflow3d/gfp-gdal,
a GDAL/OGR/GEOS node library for the geoflow dataflow system) as an
idiomatic Spark DataFrame library:

- ``sources``   — readers/writers (Parquet/CSV vector layers, image tables),
                  the analog of OGRLoader/OGRWriter/CSVLoader/CSVWriter/
                  GDALReader/GDALWriter (reference: ogr_reader_node.cpp,
                  ogr_writer_node.cpp, gdal_nodes.cpp).
- ``kernels``   — pure-numpy vectorized kernels (geometry, cell indexes,
                  image codecs); no Spark imports, unit-testable standalone.
- ``functions`` — pandas-UDF / column-expression wrappers over the kernels
                  plus text/similarity functions for training-data pipelines.
- ``operators`` — DataFrame→DataFrame operators: point-in-polygon join,
                  kNN join, tile assignment, dedup, simplify/buffer
                  transforms (the analog of the reference's GEOS nodes).
- ``plans``     — partitioning/skew/AQE presets and checkpoint lineage.
- ``streaming`` — structured-streaming variants of the ingest path.

Everything is derived from the reference's observable *semantics*
(cited file:line in each docstring), never its code: the reference is
C++ row-at-a-time; this engine is declarative DataFrame + Arrow.
"""

__version__ = "0.1.0"
