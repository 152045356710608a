"""Physical-plan assertions: the engine's scale claims, checked
against `.explain` output rather than taken on faith.

- parquet filter pushdown reaches the scan (S3 analog);
- column pruning reaches the scan (ReadSchema);
- tile_assign stays entirely JVM-side (no Python eval node);
- pip_join(broadcast=True) plans a BroadcastHashJoin;
- pip_join(broadcast=False) plans a shuffle join (no broadcast).
"""

import pytest
from pyspark.sql import functions as F

from gfp_gdal_spark.functions.spatial import with_footprint
from gfp_gdal_spark.operators import joins as J
from gfp_gdal_spark.sources import datagen

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def simple_plan_of(df) -> str:
    return df._jdf.queryExecution().simpleString()


@pytest.fixture(scope="module")
def images_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "imgs")
    datagen.images_table(spark, 2000, with_bytes=False).write.parquet(p)
    return p


def test_filter_pushdown_reaches_parquet(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").where(
        F.col("o_totalprice") > 100000.0
    ).select("o_orderkey")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)" in plan


def test_column_pruning_reaches_parquet(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_tile_assign_is_pure_jvm(spark, images_path):
    df = J.tile_assign(with_footprint(spark.read.parquet(images_path)), z=12)
    plan = plan_of(df)
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "PythonMapInArrow", "MapInArrow"):
        assert marker not in plan, f"tile_assign plan leaked into Python: {marker}"
    assert "*(1)" in plan  # whole-stage-codegen marker in executedPlan.toString()


def test_pip_join_broadcast_plan(spark, images_path):
    pts = with_footprint(spark.read.parquet(images_path)).select("image_id", "lon_c", "lat_c")
    polys = datagen.vector_layer_zones(spark, 200)
    plan = plan_of(J.pip_join(pts, polys, z=6, broadcast=True))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pip_join_shuffle_plan(spark, images_path):
    pts = with_footprint(spark.read.parquet(images_path)).select("image_id", "lon_c", "lat_c")
    polys = datagen.vector_layer_zones(spark, 200)
    plan = plan_of(J.pip_join(pts, polys, z=6, broadcast=False))
    assert "BroadcastHashJoin" not in plan
    assert ("ShuffledHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_pip_join_bbox_prefilter_in_plan(spark, images_path):
    """The bbox prefilter must appear as a JVM Filter BEFORE the Python
    refine stage (ahead of the Arrow boundary)."""
    pts = with_footprint(spark.read.parquet(images_path)).select("image_id", "lon_c", "lat_c")
    polys = datagen.vector_layer_zones(spark, 200)
    plan = plan_of(J.pip_join(pts, polys, z=6, broadcast=True))
    assert "_bx0" in plan and "_bx1" in plan  # prefilter condition present
