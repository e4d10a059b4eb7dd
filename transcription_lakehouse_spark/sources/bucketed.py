"""Bucketed-table writes for shuffle-free co-located joins.

The reference never has to think about data layout (single-process pandas),
but at 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
spans ⋈ beats-by-span explode) is shuffling both sides on the join key.
Bucketing pre-hashes rows into a fixed number of files per table AT WRITE
TIME; two tables bucketed by the same key into the same bucket count join
with ZERO Exchange — the shuffle is paid once at ingest, then amortized
over every downstream join and aggregation on that key.

This is the Spark-native analog of the reference's "parquet file per
episode" layout (`/root/reference/src/lakehouse/ingestion/writer.py:249-310`),
which co-locates by episode implicitly; bucketing generalizes it to any key
and any bucket count, with the catalog carrying the layout so Catalyst can
elide the Exchange automatically.

Bucketed tables must go through ``saveAsTable`` (the catalog stores the
bucket spec; a plain path write loses it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (and optionally sort-within-bucket) managed
    parquet table. Joins/groupBys on `bucket_cols` between tables sharing
    the same spec need no shuffle; sortBy additionally enables shuffle-AND-
    sort-free sort-merge joins."""
    writer = (
        df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket spec applies automatically)."""
    return spark.table(table)
