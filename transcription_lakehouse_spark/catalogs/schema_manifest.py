"""Schema manifest catalog — one row per (artifact, column) describing the
lake's live schemas (reference `/root/reference/src/lakehouse/catalogs/
schema_manifest.py:36-144`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["schema_manifest"]


def schema_manifest(
    spark: SparkSession, tables: dict[str, DataFrame]
) -> DataFrame:
    rows = []
    for artifact, df in sorted(tables.items()):
        for i, f in enumerate(df.schema.fields):
            rows.append(
                (
                    artifact,
                    i,
                    f.name,
                    f.dataType.simpleString(),
                    bool(f.nullable),
                )
            )
    return spark.createDataFrame(
        rows,
        "artifact string, position int, column_name string, data_type string, "
        "nullable boolean",
    )
