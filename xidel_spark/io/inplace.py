"""In-place sink — overwrite the input with the transformed output.

The reference's --in-place replaces the source file with the result
(xidelbase.pas:1684, 2512-2517). On Spark, overwriting a path you are
lazily reading from truncates it mid-scan — so the result is materialized
(localCheckpoint) BEFORE the overwrite commits. On a cluster this seam is
where an Iceberg REPLACE snapshot goes (atomic, time-travelable); on plain
parquet the checkpoint is the correctness requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_inplace(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    materialized = df.localCheckpoint(eager=True)  # cut lineage to the source files
    materialized.write.mode("overwrite").format(fmt).save(path)
