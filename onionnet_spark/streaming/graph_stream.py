"""Streaming graph maintenance: continuous grow_onion.

The reference grows its in-RAM graph by repeated grow_onion calls;
the streaming analogue is a Structured Streaming sink that MERGEs
each micro-batch of edge events into the maintained graph with the
same semantics (new nodes appended, known nodes kept, duplicate
edges dropped, endpoints validated against the merged node set).

Pattern: ``foreachBatch`` + ``merge_onion``. State between batches
is the maintained OnionGraph itself (persisted DataFrames); each
batch's merge output is re-persisted and the previous generation is
released. At scale the persisted generations become Delta/Iceberg
table versions and the merge becomes a MERGE INTO — the dataflow
below is identical, only the storage layer changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from onionnet_spark.builder import grow_onion, merge_onion
from onionnet_spark.core import OnionGraph

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingGraphMaintainer(ReplayGuardMixin):
    """Holds the maintained graph and merges micro-batches into it.

    Edge events carry endpoint node attributes inline (the common
    shape for event streams): ``src_layer, src_id, dst_layer,
    dst_id`` plus optional edge props; nodes are derived from the
    endpoints so a previously-unseen endpoint becomes a node row.
    """

    def __init__(self, base: OnionGraph):
        self.graph = base.persist()
        self.n_batches = 0

    def merge_edge_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        import pyspark.sql.functions as F

        if self._is_replay(batch_id):
            # foreachBatch at-least-once redelivery of an already-
            # applied epoch: the merge below is not (or need not be)
            # idempotent — skip it (ReplayGuardMixin contract)
            return
        if not batch_df.take(1):
            self._mark_applied(batch_id)
            return
        src_nodes = batch_df.select(
            F.col("src_layer").alias("layer"), F.col("src_id").alias("node_id")
        )
        dst_nodes = batch_df.select(
            F.col("dst_layer").alias("layer"), F.col("dst_id").alias("node_id")
        )
        delta = grow_onion(
            src_nodes.unionByName(dst_nodes),
            batch_df,
            edge_prop_cols=[
                c
                for c in batch_df.columns
                if c not in ("src_layer", "src_id", "dst_layer", "dst_id")
            ],
            validate_endpoints=False,  # merge validates vs merged set
        )
        old = self.graph
        # localCheckpoint: the maintained graph must not keep lineage
        # back through every previous batch (plans would grow without
        # bound across a long-running stream)
        merged = merge_onion(old, delta)
        self.graph = OnionGraph(
            merged.nodes.localCheckpoint(), merged.edges.localCheckpoint(),
            merged.directed,
        )
        old.unpersist()
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def attach(self, edge_stream: DataFrame, checkpoint_dir: str):
        """Start the stream: every micro-batch merges into the graph."""
        return (
            edge_stream.writeStream.foreachBatch(self.merge_edge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
