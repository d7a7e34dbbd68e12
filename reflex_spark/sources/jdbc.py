"""JDBC events-table source: the reference's primary storage path (rsql).

The reference streams from a MySQL events table via polled
`WHERE id > cursor ORDER BY id LIMIT n` scans (rsql/db.go:122-182). On
Spark the same table is reachable through the JDBC source; this module
shapes those reads so the cursor predicate and the column remapping
(reference functional options WithEventIDField...,
rsql/eventstable.go:67-118) push down into the database.

No database is available in this environment, so there is no integration
test; the option-shaping logic is unit-tested, and the incremental-read
contract matches EventLog.read_after (same loader semantics, different
storage). Requires the JDBC driver jar on the classpath at deployment.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Default physical column names, as in the reference (rsql/db.go:21-38).
DEFAULT_COLUMNS = {
    "event_id": "id",
    "event_type": "type",
    "foreign_id": "foreign_id",
    "timestamp": "timestamp",
}


@dataclass
class JdbcEventsTable:
    """A remote events table behind JDBC.

    column_map: logical name → physical name (the reference's
    WithEventIDField/WithEventTypeField/... options).
    """

    url: str  # e.g. jdbc:mysql://host/db
    table: str
    column_map: dict[str, str] = field(default_factory=lambda: dict(DEFAULT_COLUMNS))
    num_partitions: int = 8
    fetch_size: int = 1000  # reference WithEventLookupLimit default

    def _select_expr(self) -> str:
        cols = ", ".join(f"{phys} AS {logical}" for logical, phys in self.column_map.items())
        return cols

    def reader(self, spark: SparkSession, after: int = 0, limit: int | None = None):
        """Configured DataFrameReader for an incremental scan: the dbtable
        pushes cursor predicate + ordering + limit into the database, like
        the reference's base loader SQL (rsql/db.go:135-161)."""
        inner = (
            f"SELECT {self._select_expr()} FROM {self.table} "
            f"WHERE {self.column_map['event_id']} > {int(after)} "
            f"ORDER BY {self.column_map['event_id']} ASC"
        )
        if limit:
            inner += f" LIMIT {int(limit)}"
        return (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", f"({inner}) AS events_page")
            .option("fetchsize", str(self.fetch_size))
            .option("numPartitions", str(self.num_partitions))
        )

    def read_after(self, spark: SparkSession, after: int, limit: int | None = None) -> DataFrame:
        df = self.reader(spark, after, limit).load()
        return df.withColumn("event_id", F.col("event_id").cast("long"))
