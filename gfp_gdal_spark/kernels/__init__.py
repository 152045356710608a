"""Pure-numpy vectorized kernels. No Spark imports here.

These are the Arrow-fed inner loops of the engine's pandas UDFs:
ragged ring geometry (geom), spatial cell indexes (cells), image
codecs (codec). Each kernel is unit-tested standalone and designed to
process a whole Arrow batch per call — never one row at a time (the
reference's per-feature loops, e.g. ogr_reader_node.cpp:236, are
deliberately NOT reproduced).
"""
