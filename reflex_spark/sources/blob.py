"""Blob-bucket event source: ordered JSON blobs in a bucket/directory tree.

Reference parity (rblob/blob.go, rblob/doc.go): a bucket of lexicographically
ordered, immutable, append-only blobs (e.g. date-partitioned
`yyyy/mm/dd/Name-...` keys) streamed as individual JSON events. The
reference hand-rolls blob listing, a composite `key|len|offset` cursor and
per-record JSON decode; Spark's file streaming source already implements all
three (ordered file discovery, per-file ledger in the checkpoint, schema'd
JSON decode), so this module is a thin, typed wrapper.

S3/GCS note: the same code serves `s3a://bucket/prefix` paths when the
Hadoop S3 connector is on the classpath; tests use local directories which
share the exact file-source semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class BlobBucket:
    """A (possibly date-partitioned) directory of JSON blobs."""

    def __init__(self, spark: SparkSession, path: str, schema: StructType):
        self.spark = spark
        self.path = path
        self.schema = schema

    def read(self) -> DataFrame:
        """Batch scan of every record in the bucket (recursive)."""
        return (
            self.spark.read.schema(self.schema)
            .option("recursiveFileLookup", "true")
            .json(self.path)
        )

    def read_stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        """Streaming scan: the checkpoint's file ledger replaces the
        reference's `key|len|offset` cursor (rblob/blob.go:367-416);
        `latestFirst=false` (default) preserves lexicographic blob order.
        Empty blobs (present in the reference's fixtures) yield no rows and
        are committed like any other file."""
        reader = (
            self.spark.readStream.schema(self.schema)
            .option("recursiveFileLookup", "true")
            .option("latestFirst", "false")
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.json(self.path)
