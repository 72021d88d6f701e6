"""Sources and sinks: gazetteer dimension tables, transcripts, parquet-table catalog."""
