"""Index build pipeline, persisted artifact layout, incremental resume."""
