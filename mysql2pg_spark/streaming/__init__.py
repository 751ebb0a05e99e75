"""Structured Streaming ingest — net-new vs the strictly-batch reference
(SURVEY §2: "streaming operators entirely absent from the reference")."""
