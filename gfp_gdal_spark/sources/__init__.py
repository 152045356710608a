"""Sources & sinks: the engine's analog of the reference's IO nodes
(OGRLoader/OGRWriter/GDALReader/GDALWriter/CSV nodes)."""
