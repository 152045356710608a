"""Sources & sinks — the IO node analogs.

Reference parity map (SURVEY.md §2.1/§2.2):
- read_vector_layer / write_vector_layer  <-> OGRLoader / OGRWriter
  (ogr_reader_node.cpp:124-309, ogr_writer_node.cpp:87-540)
- read_points_csv / read_segments_csv / write_csv <-> CSVPointLoader /
  CSVSegmentLoader / CSVWriter (gdal_nodes.cpp:32-143,145-263)
- read_images <-> the Iceberg image+caption scan of BASELINE.json
  (format-agnostic: parquet today, `format("iceberg")` on a cluster).

Catalyst gives S3 (attribute-filter pushdown) and S4 (schema
inference) for free; K4's rename/projection map and K5's cardinality
validation are explicit here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_images",
    "read_vector_layer",
    "write_vector_layer",
    "read_points_csv",
    "read_segments_csv",
    "write_csv",
    "write_bucketed",
    "apply_rename_map",
    "ogr_time_struct",
]


def ogr_time_struct(ts):
    """K6 `Time` type bridging (ogr_reader_node.cpp:65-70): Spark has no
    TIME logical type, so OGR Time fields bridge to a
    struct<hour,minute,second> column (the same shape the reference's
    Time struct carries); Date and DateTime bridge natively."""
    return F.struct(
        F.hour(ts).alias("hour"),
        F.minute(ts).alias("minute"),
        F.second(ts).alias("second"),
    )


def read_images(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Scan of the image+caption table (input_hint schema). ``fmt`` may
    be 'parquet' or 'iceberg' (jar required on a real cluster; the
    engine code is identical either way)."""
    return spark.read.format(fmt).load(path)


def read_vector_layer(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    attribute_filter: str | None = None,
    columns: list[str] | None = None,
    with_fid: bool = False,
    fmt: str = "parquet",
    source_crs: str | None = None,
    target_crs: str = "EPSG:4326",
    ring: str = "ring",
    base_elevation: float | None = None,
) -> DataFrame:
    """Vector-layer scan (OGRLoader analog, ogr_reader_node.cpp:124-309).

    - ``layer`` selects a subdirectory/table (layer-by-name,
      :132-146); None reads the path itself.
    - ``attribute_filter`` is a SQL predicate string pushed into the
      scan by Catalyst (the SetAttributeFilter analog, :226-232).
    - ``columns`` prunes the projection.
    - ``with_fid`` adds a stable OGR_FID from a row id if the table has
      none (:209-210) — `monotonically_increasing_id` is
      partition-stable, matching OGR's scan-order FIDs only per file;
      prefer a real key column at scale.
    - ``source_crs`` (when the stored layer is projected) applies the
      pipeline-level SRS transform to ``ring`` on read (the reference's
      per-feature transform, :220-224 applied :93-97,:257-261).
    - ``base_elevation`` overrides every ring vertex's z (:93-97).
    """
    p = os.path.join(path, layer) if layer else path
    df = spark.read.format(fmt).load(p)
    if attribute_filter:
        df = df.where(F.expr(attribute_filter))
    if columns:
        df = df.select(*columns)
    if with_fid and "OGR_FID" not in df.columns:
        df = df.withColumn("OGR_FID", F.monotonically_increasing_id())
    if source_crs and source_crs != target_crs and ring in df.columns:
        from gfp_gdal_spark.functions.crs import transform_ring_col

        df = df.withColumn(ring, transform_ring_col(F.col(ring), source_crs, target_crs))
    if base_elevation is not None and ring in df.columns:
        from gfp_gdal_spark.functions.geometry import ring_set_z

        df = df.withColumn(ring, ring_set_z(F.col(ring), F.lit(float(base_elevation))))
    return df


def apply_rename_map(
    df: DataFrame, rename: dict[str, str] | None, only_mapped: bool = False
) -> DataFrame:
    """Attribute projection/rename (K4: output_attribute_names +
    only_output_mapped_attrs, ogr_writer_node.cpp:188-195,320-324)."""
    if not rename:
        return df
    if only_mapped:
        return df.select(*(F.col(a).alias(b) for a, b in rename.items() if a in df.columns))
    return df.select(
        *(F.col(c).alias(rename.get(c, c)) for c in df.columns)
    )


def write_vector_layer(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    rename: dict[str, str] | None = None,
    only_mapped: bool = False,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    target_crs: str | None = None,
    source_crs: str = "EPSG:4326",
    ring: str = "ring",
) -> None:
    """Vector sink (OGRWriter analog). mode='overwrite' is
    overwrite_file (:102-117); 'append' appends with schema merge
    (:265-302 field-name reconciliation -> Parquet mergeSchema).
    ``target_crs`` applies the REVERSE SRS transform on write
    (ogr_writer_node.cpp:179, applied :42-57)."""
    if target_crs and target_crs != source_crs and ring in df.columns:
        from gfp_gdal_spark.functions.crs import transform_ring_col

        df = df.withColumn(ring, transform_ring_col(F.col(ring), source_crs, target_crs))
    out = apply_rename_map(df, rename, only_mapped)
    w = out.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if mode == "append":
        w = w.option("mergeSchema", "true")
    w.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table sink: pre-hash-partition (and optionally sort) on
    the join key at WRITE time so later equi-joins between two tables
    bucketed on the same key plan with NO shuffle exchange — the
    co-located-join half of the north_rule's partitioning story. Two
    10^11-row tables bucketed on `cell` join shuffle-free; the plan
    assertion lives in tests/test_plans.py."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_points_csv(
    spark: SparkSession, path: str, thin_nth: int = 1, sep: str = " "
) -> DataFrame:
    """CSVPointLoader analog (gdal_nodes.cpp:32-51): whitespace CSV with
    header x y z; keep every nth row (thinning, :43-47).

    Thinning index = the row's order WITHIN ITS FILE, via a window
    partitioned by ``input_file_name()`` and ordered by
    ``monotonically_increasing_id()`` (Spark assigns partition indices
    in file-split offset order, so the mono id is monotone within a
    file). The window is per-file, so a directory of N files thins with
    N-way parallelism — never the single-task global window."""
    df = spark.read.csv(path, sep=sep, header=True, inferSchema=True)
    df = df.toDF(*[c.strip() for c in df.columns])
    if thin_nth > 1:
        from pyspark.sql import Window

        w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
        df = (
            df.withColumn("_idx", F.row_number().over(w) - 1)
            .where(F.pmod(F.col("_idx"), F.lit(thin_nth)) == 0)
            .drop("_idx")
        )
    return df


def read_segments_csv(
    spark: SparkSession,
    paths: list[str] | str,
    separator: str = " ",
    aggregate_name: str = "BuildingID",
) -> DataFrame:
    """CSVSegmentLoader analog (gdal_nodes.cpp:53-143): multi-file CSV,
    dynamic header, grouped by the ``aggregate_name`` column (:92-101).
    Returns one row per group with segments collected; the float32
    global-offset trick (:120-129) is unnecessary in float64."""
    df = spark.read.csv(paths, sep=separator, header=True, inferSchema=True)
    df = df.toDF(*[c.strip() for c in df.columns])
    seg_cols = [c for c in df.columns if c != aggregate_name]
    return (
        df.groupBy(aggregate_name)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.collect_list(F.struct(*seg_cols)).alias("segments"),
        )
    )


def write_csv(
    df: DataFrame,
    path: str,
    precision: int = 5,
    rename: dict[str, str] | None = None,
    only_mapped: bool = False,
    mode: str = "overwrite",
    sep: str = " ",
) -> None:
    """CSVWriter analog (gdal_nodes.cpp:145-263): fixed decimal
    ``precision`` on float columns (:154), header row, rename map
    (:184-191,232-248)."""
    out = apply_rename_map(df, rename, only_mapped)
    for c, t in out.dtypes:
        if t in ("double", "float"):
            # fixed decimals, no thousands grouping (std::setprecision
            # analog of gdal_nodes.cpp:154)
            out = out.withColumn(c, F.format_string(f"%.{precision}f", F.col(c)))
    out.write.mode(mode).option("header", "true").option("sep", sep).csv(path)
