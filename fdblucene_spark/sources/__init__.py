"""Index storage: Parquet segments under a snapshot-manifest catalog."""
