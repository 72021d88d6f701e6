"""Pure text algorithms (run inside Arrow UDF batches) + Spark column builders."""
