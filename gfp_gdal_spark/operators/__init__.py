"""DataFrame -> DataFrame operators (the engine's "nodes").

Each operator is a plain composable Python function over DataFrames —
the Spark-native analog of a geoflow node (gdal_nodes.hpp:40-63): the
node's typed ports become DataFrame columns, its params become keyword
arguments, and the host DAG becomes ordinary function composition over
a lazy logical plan that Catalyst optimizes end-to-end.
"""
