"""Table-storage seam (SURVEY §7 risk item): Iceberg-shaped API over parquet.

The north rule targets Iceberg tables of transcripts at 10^12-turn scale:
sources become snapshot-ranged incremental scans, sinks become transactional
appends / overwrite-by-filter, and the checkpoint runner's ``batch_bucket``
becomes the table's partition spec. This sandbox has no Iceberg runtime jar,
so callers go through this seam instead of hard-coding
``spark.read.parquet``: swapping the format to ``iceberg`` (once the runtime
+ catalog are on the classpath) changes no call sites.

Reference parity note: the reference hard-codes one file path from config
(``application.conf:18`` -> ``GcService.scala``); this seam is the
table-scale generalization of that single choice point.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

PARQUET = "parquet"
ICEBERG = "iceberg"
JSONL = "jsonl"
CSV = "csv"


@dataclass(frozen=True)
class TableRef:
    """A logical table: location (path or catalog.db.table) + format."""

    location: str
    format: str = PARQUET
    #: partition columns the table is (to be) laid out by
    partition_by: tuple[str, ...] = field(default=())
    #: DDL schema string for schemaless text formats (jsonl/csv) — REQUIRED
    #: for those: schema inference is a full extra pass over the data and is
    #: non-deterministic under sampling at 100 TB
    schema: str | None = None


def _as_ref(table: TableRef | str) -> TableRef:
    return table if isinstance(table, TableRef) else TableRef(table)


def read_table(spark: SparkSession, table: TableRef | str) -> DataFrame:
    ref = _as_ref(table)
    if ref.format == ICEBERG:
        # catalog-resolved name; snapshot options (as-of, incremental) would
        # be threaded here
        return spark.read.format(ICEBERG).load(ref.location)
    if ref.format in (JSONL, CSV):
        if ref.schema is None:
            raise ValueError(
                f"{ref.format} table {ref.location!r} needs an explicit "
                "schema (inference costs an extra full pass at scale)"
            )
        reader = spark.read.schema(ref.schema)
        if ref.format == JSONL:
            # ISO-8601 with micros, matching write_table's output
            return reader.option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).json(ref.location)
        return reader.option("header", True).option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        ).csv(ref.location)
    import os

    reader = spark.read
    if os.path.isdir(ref.location):
        # pin partition discovery to the table root so partition-dir reads
        # keep their partition columns
        reader = reader.option("basePath", ref.location)
    return reader.parquet(ref.location)


def write_table(
    df: DataFrame,
    table: TableRef | str,
    mode: str = "overwrite",
) -> None:
    ref = _as_ref(table)
    writer = df.write.mode(mode)
    if ref.partition_by:
        writer = writer.partitionBy(*ref.partition_by)
    if ref.format == ICEBERG:
        writer.format(ICEBERG).saveAsTable(ref.location)
        return
    if ref.format == JSONL:
        writer.option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        ).json(ref.location)
        return
    if ref.format == CSV:
        writer.option("header", True).option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        ).csv(ref.location)
        return
    writer.parquet(ref.location)


def table_exists(spark: SparkSession, table: TableRef | str) -> bool:
    ref = _as_ref(table)
    if ref.format == ICEBERG:
        return spark.catalog.tableExists(ref.location)
    import os

    return os.path.exists(ref.location)
