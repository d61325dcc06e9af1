"""Relational/dataflow operators of the engine (DataFrame programs)."""
