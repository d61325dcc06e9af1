"""Structured Streaming ingestion: new page arrivals → incremental
chunk-store maintenance via foreachBatch merge."""
