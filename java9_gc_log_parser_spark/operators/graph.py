"""Fixed-point PageRank over a document citation graph.

Beyond-reference operator (SURVEY §2 extension set): the duplicate-cluster
resolution family (operators/dedupe.py q29/q70) already does iterative graph
propagation for connected components; PageRank adds the WEIGHTED-importance
flavor a training-data pipeline uses to prioritize documents by link/citation
authority (e.g. Common-Crawl-style harmonic/PageRank centrality as a quality
prior) — same Pregel-on-DataFrame execution shape, different fixed point.

Determinism contract (cross-engine oracle parity): float PageRank sums are
order-dependent, so ranks live in FIXED-POINT integer space — SCALE = 10^12
micro-units, every step pure BIGINT arithmetic:

    r0      = SCALE div n
    contrib = r div outdeg          (per edge, integer floor)
    r'      = (15 * (SCALE div n) + 85 * SUM(contrib)) div 100

Integer sums are order-independent and exact in both engines, so a DuckDB
oracle can unroll the same ``n_iter`` iterations and match bit-for-bit.
Truncation leaks a few micro-units per step (total rank mass decays by
< n * n_iter micro-units) — a documented property of the contract, not a
bug; relative ordering, which is what a quality prior consumes, is stable.

Scale notes (100 TB):
  * Per iteration: ONE shuffle — the contribution agg on dst (map-side
    combinable BIGINT sum); the rank-update join against the node set is
    keyed the same way and AQE-broadcasts the rank vector when it fits.
  * Edges are scanned once per iteration from a persisted DataFrame —
    persist() the edge set (done by the caller / query); iterating over an
    unpersisted lineage would re-derive it n_iter times.
  * n_iter is fixed (power iteration converges geometrically; 5-10 rounds
    order documents stably) — no driver-side convergence loop is required,
    unlike q29's connected components where exact convergence matters.
  * A hot dst (everyone cites one doc) pre-combines map-side like any
    hash agg; no per-key buffering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_fixed", "synth_citation_edges"]

SCALE = 1_000_000_000_000


def synth_citation_edges(docs: DataFrame, n_nodes: int, k: int = 2) -> DataFrame:
    """Deterministic synthetic citation multigraph (test/bench scaffolding,
    like cdc.synth_mutated_snapshot — NOT a pipeline operator): every doc
    emits ``k`` out-edges to ``md5(doc_id:edge:j) % n_nodes``. Self-loops
    and parallel edges are kept (constant outdeg ``k`` — no dangling
    nodes), and the construction is md5-derived so the DuckDB oracle
    rebuilds the identical edge set from the raw documents view.
    """
    edges = None
    for j in range(k):
        dst = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"), F.lit(f":edge:{j}")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_nodes
        )
        e = docs.select(F.col("doc_id").alias("src"), dst.alias("dst"))
        edges = e if edges is None else edges.unionByName(e)
    return edges


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    outdeg: int,
    n_iter: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """``n_iter`` fixed-point PageRank iterations (damping 0.85) over a
    constant-outdegree graph. See the module docstring for the integer
    contract. Returns ``(doc_id, rank_fp, rank)`` — ``rank_fp`` in SCALE
    micro-units (BIGINT, the oracle-compared value), ``rank`` the 9-dp
    human-readable double.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    base = SCALE // n_nodes
    ranks = nodes.select(
        F.col(id_col).alias("_id"), F.lit(base).cast("long").alias("_r")
    )
    node_ids = nodes.select(F.col(id_col).alias("_id"))
    for _ in range(n_iter):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["_id"])
            .select(
                F.col("dst").alias("_id"),
                F.expr(f"_r div {int(outdeg)}").alias("_c"),
            )
            .groupBy("_id")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = node_ids.join(contribs, "_id", "left").select(
            "_id",
            (
                F.lit(15 * base).cast("long")
                + F.lit(85).cast("long")
                * F.coalesce(F.col("_s"), F.lit(0).cast("long"))
            ).alias("_num"),
        ).select("_id", F.expr("_num div 100").cast("long").alias("_r"))
    return ranks.select(
        F.col("_id").alias(id_col),
        F.col("_r").alias("rank_fp"),
        F.round(F.col("_r").cast("double") / F.lit(float(SCALE)), 9).alias("rank"),
    )
