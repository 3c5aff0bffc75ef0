"""Motif finding: GraphFrames-style structural pattern matching
compiled to DataFrame joins.

Pattern syntax (a small subset of GraphFrames ``find``):

    "(a)-[]->(b); (c)-[]->(b); !(a)-[]->(c)"

Semicolon-separated edge terms; each positive term joins the edge
list once, binding its endpoint variables; a ``!``-prefixed term is
a negation — bindings with such an edge are dropped via a left-anti
join. Every variable ``x`` surfaces as ``x_layer``/``x_id`` columns;
further predicates (inequalities between variables, property
filters) are ordinary DataFrame filters on the result.

Compilation is deliberately declarative: each positive term is one
equi-join on the shared variables bound so far (Catalyst picks
broadcast vs shuffle and reorders under AQE/CBO), and each negative
term is one left-anti join — the same plan shape a hand-written SQL
``NOT EXISTS`` produces. Terms with no shared variable fall back to
a cross join (the pattern is disconnected); keep patterns connected
at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onionnet_spark.core import OnionGraph

_TERM = re.compile(r"^(!?)\((\w+)\)-\[\]->\((\w+)\)$")


def _parse(pattern: str) -> list[tuple[bool, str, str]]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(
                f"bad motif term {raw!r}: expected '(a)-[]->(b)' or "
                "'!(a)-[]->(b)'"
            )
        terms.append((m.group(1) == "!", m.group(2), m.group(3)))
    if not terms:
        raise ValueError("empty motif pattern")
    if all(neg for neg, _, _ in terms):
        raise ValueError("motif pattern needs at least one positive term")
    return terms


def find_motifs(graph: OnionGraph, pattern: str) -> DataFrame:
    """Match ``pattern`` against the graph's edges; one output row
    per distinct variable binding, columns ``<var>_layer, <var>_id``.
    """
    edges = graph.edge_endpoints().select(
        "src_layer", "src_id", "dst_layer", "dst_id"
    ).distinct()

    def edge_as(src: str, dst: str) -> DataFrame:
        return edges.select(
            F.col("src_layer").alias(f"{src}_layer"),
            F.col("src_id").alias(f"{src}_id"),
            F.col("dst_layer").alias(f"{dst}_layer"),
            F.col("dst_id").alias(f"{dst}_id"),
        )

    terms = _parse(pattern)
    out: DataFrame | None = None
    bound: set[str] = set()
    # positive terms first (negation is a filter over bindings, and
    # anti-join keys must already be bound)
    for neg, src, dst in terms:
        if neg:
            continue
        step = edge_as(src, dst)
        if out is None:
            out = step
        else:
            shared = [
                c
                for v in (src, dst)
                if v in bound
                for c in (f"{v}_layer", f"{v}_id")
            ]
            out = out.join(step, on=shared) if shared else out.crossJoin(step)
        bound.update((src, dst))
    for neg, src, dst in terms:
        if not neg:
            continue
        missing = {src, dst} - bound
        if missing:
            raise ValueError(
                f"negated term !({src})-[]->({dst}) uses unbound "
                f"variable(s) {sorted(missing)}"
            )
        out = out.join(
            edge_as(src, dst),
            on=[f"{src}_layer", f"{src}_id", f"{dst}_layer", f"{dst}_id"],
            how="left_anti",
        )
    cols = [c for v in sorted(bound) for c in (f"{v}_layer", f"{v}_id")]
    return out.select(*cols).distinct()
