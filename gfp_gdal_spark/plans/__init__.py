"""Physical-plan helpers: skew salting, AQE presets, checkpoint lineage.

The reference's only "plan" feature is transactional batching
(ogr_writer_node.cpp:524-531); everything here is north_rule scale
machinery: explicit hot-key salting, shuffle-partition presets, and a
per-bucket checkpoint manifest so a killed job resumes without
recomputing finished cells.
"""
