"""Event sources: parquet event log, JSON blob buckets, in-memory mocks."""
