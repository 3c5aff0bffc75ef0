"""onionnet_spark — a PySpark-native multi-layer graph + analytics engine.

Re-expresses the capabilities of the reference multi-layer network
toolkit (saezlab/onionnet, a graph-tool wrapper) as declarative
DataFrame programs: a graph is a pair of DataFrames (nodes, edges)
keyed by (layer, node_id); traversals and views are joins the
Catalyst optimizer can plan, iterative algorithms are bounded loops
of joins with persisted frontiers.
"""

from onionnet_spark.core import OnionGraph
from onionnet_spark.builder import grow_onion

__all__ = ["OnionGraph", "grow_onion"]
__version__ = "0.1.0"
