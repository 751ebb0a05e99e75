"""Source plane: JDBC catalog scans + partitioned data extract
(reference: internal/mysql — re-expressed as spark.read.jdbc planning)."""
