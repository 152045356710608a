"""Structured Streaming variants of the ingest path.

The reference is pure batch dataflow (geoflow); the engine stays
batch-first (resumability comes from plans.lineage, not streaming),
but the ingest operators are streaming-safe: the same withColumns /
tile-assign / windowed-count pipeline runs under readStream.
"""
