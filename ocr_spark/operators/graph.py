"""Iterative graph computation: PageRank-style domain ranking — the
crawl-prioritization pass of a web corpus pipeline (rank domains by the
link graph to decide fetch budgets). Complements d06's connected
components with WEIGHTED iterative propagation.

Cross-engine exactness by construction (the q23/e05 integer technique
applied to a fixpoint iteration): ranks are integer micro-units,
per-edge contribution is integer division rank div out_degree, damping
is (85 * in_sum) div 100, and the per-target reduction is an INTEGER
sum — commutative and associative, so partition order cannot perturb it
(a double-based PageRank cannot be oracle-exact: the in-sum order
differs per engine). Remainder mass from the integer divisions is
dropped, exactly alike on both engines; dangling-node mass is dropped
too (documented, identical both sides).

Scale shape per iteration: one join of the (node, rank) table against
the static (src, dst, out_deg) edge table — both hash-partitioned on
the join key — plus one map-side-combined sum. The edge table is
computed once; the driver loop composes 3 bounded-shuffle rounds
(localCheckpoint lineage truncation, the d06 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.text import hex60, hex60_sql
from ocr_spark.plans import register
from ocr_spark.sources.io import load_table

N_DOMAINS = 64
PR_ITERS = 3
PR_INIT = 1_000_000  # micro-units
PR_BASE = 150_000  # (1 - 0.85) * PR_INIT


def domain_edges(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic domain link graph from the documents
    table: src = doc_id mod N, dst = hex60(doc_id) mod N, self-loops
    dropped, distinct. Stands in for the (host -> host) edge list a real
    crawl extracts from anchors; both engines synthesize it identically."""
    e = docs.select(
        F.pmod(F.col("doc_id"), F.lit(N_DOMAINS)).alias("src"),
        F.pmod(hex60(F.col("doc_id").cast("string")), F.lit(N_DOMAINS)).alias("dst"),
    )
    return e.filter(F.col("src") != F.col("dst")).distinct()


def pagerank_int(
    edges: DataFrame, iters: int = PR_ITERS, checkpoint_every: int = 4
) -> DataFrame:
    """(node, rank) after ``iters`` rounds of integer PageRank.

    Lineage is truncated every ``checkpoint_every`` rounds rather than
    every round: each round nests two joins into the plan, so short runs
    (the 3-iteration catalog entry) stay checkpoint-free — a
    localCheckpoint is an eager materialization job whose fixed cost
    dominated the catalog entry (4.2s -> ~2s at sf0.1) — while long runs
    keep the d06 plan-growth guarantee."""
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ed = edges.join(deg, "src").persist()
    ranks = nodes.select("node", F.lit(PR_INIT).cast("long").alias("rank"))
    for it in range(iters):
        contribs = (
            ed.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .select("dst", F.expr("rank div out_deg").alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(PR_BASE).cast("long")
                + F.expr("85 * coalesce(in_sum, 0) div 100")
            ).alias("rank"),
        )
        if (it + 1) % checkpoint_every == 0 and (it + 1) < iters:
            ranks = ranks.localCheckpoint()
    ed.unpersist()
    edges.unpersist()
    return ranks


def _pagerank_oracle_sql(iters: int = PR_ITERS) -> str:
    parts = [
        f"""
    WITH edges AS (
      SELECT DISTINCT doc_id % {N_DOMAINS} AS src,
             {hex60_sql("CAST(doc_id AS VARCHAR)")} % {N_DOMAINS} AS dst
      FROM documents
      WHERE doc_id % {N_DOMAINS} <> {hex60_sql("CAST(doc_id AS VARCHAR)")} % {N_DOMAINS}
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ), deg AS (
      SELECT src, count(*) AS out_deg FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, CAST({PR_INIT} AS BIGINT) AS rank FROM nodes
    )"""
    ]
    for it in range(1, iters + 1):
        parts.append(f""", c{it} AS (
      SELECT e.dst AS node, CAST(sum(r.rank // d.out_deg) AS BIGINT) AS in_sum
      FROM edges e JOIN deg d ON d.src = e.src
                   JOIN r{it - 1} r ON r.node = e.src
      GROUP BY e.dst
    ), r{it} AS (
      SELECT n.node,
             CAST({PR_BASE} + (85 * coalesce(c.in_sum, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN c{it} c ON c.node = n.node
    )""")
    parts.append(f"""
    SELECT node, rank FROM r{iters}
    """)
    return "".join(parts)


@register("g01_pagerank", oracle=_pagerank_oracle_sql())
def g01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pagerank_int(domain_edges(docs))
