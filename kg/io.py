"""Pluggable table IO: parquet today, Iceberg behind a config switch.

The north rule targets Iceberg tables (BASELINE.json:14-15), but no
Iceberg runtime jar exists in this sandbox (SURVEY.md §0), so the
default format is parquet directories with the *same* partition
layout. Switching to Iceberg is config-only:

    KG_TABLE_FORMAT=iceberg  (plus the usual spark.sql.catalog.* conf
    and --packages org.apache.iceberg:iceberg-spark-runtime-...)

Every stage boundary in the pipeline goes through read_table /
write_table so the swap touches no operator code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_format() -> str:
    return os.environ.get("KG_TABLE_FORMAT", "parquet")


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a stage/fixture table. ``path`` is a parquet dir (or an
    Iceberg table identifier when KG_TABLE_FORMAT=iceberg)."""
    fmt = table_format()
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a stage table, optionally partitioned (K8 triples are
    partitioned by predicate so downstream reads partition-prune)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    fmt = table_format()
    if fmt == "iceberg":
        writer.format("iceberg").save(path)
    else:
        writer.parquet(path)


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check through the Hadoop FS API —
    works for file://, hdfs://, s3a:// alike (os.path would silently
    fail on cluster storage)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def fs_delete(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def load_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated fixture table (TESTDATA.md)."""
    return read_table(spark, f"{sf_dir}/{name}.parquet")


def load_all_fixtures(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_fixture(spark, sf_dir, t) for t in FIXTURE_TABLES}
