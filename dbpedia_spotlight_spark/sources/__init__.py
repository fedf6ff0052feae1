"""Sources & sinks (SURVEY §2.1): catalog abstraction (Iceberg-or-Parquet)
and the checkpoint/resume manifest."""
