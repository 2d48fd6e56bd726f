"""Sources & sinks: batch CSV ETL (db_loader parity), event-stream
fixtures, partitioned parquet table writes."""
