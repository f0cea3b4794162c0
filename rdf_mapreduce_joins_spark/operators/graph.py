"""Graph operators: transitive closure over an edge relation.

The reference (SURVEY.md §2.3 [K]) executes fixed multi-hop join chains
as one MapReduce job per hop; it has no *unbounded*-reachability
operator. SPARQL property paths (``<p>+``) require one, so the engine
adds it here: the classic iterative-doubling closure, expressed as
DataFrame self-joins.

Scale posture: **path doubling** (R₂ₖ = Rₖ ∪ Rₖ∘Rₖ) converges in
⌈log₂ diameter⌉ rounds instead of the frontier method's ``diameter``
rounds — at web scale the round count, not per-round work, dominates
(each round is a full shuffle stage + a distinct). Every round runs one
equi-join on the hop key and one hash-distinct, both AQE-planned;
``localCheckpoint`` truncates lineage so the plan stays O(1) per round
rather than growing exponentially. The driver-side loop carries only
row COUNTS (convergence test), never row data.

Memory bound: closure size is Σ|reach(v)| — for hierarchy-like graphs
(depth d trees) that is O(N·d), not O(N²); for dense components the
caller should collapse them with connected-components first
(operators/dedup.py) and run closure on the condensation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """All (src, dst) pairs with a directed path src→…→dst of length ≥ 1.

    ``max_iter`` bounds the doubling rounds: paths up to length
    2^max_iter are found, which at 20 covers any graph a join could
    materialize. Returns columns ``(src, dst)``; input edge rows with
    NULL endpoints are dropped (NULL never joins anyway — dropping
    keeps the distinct small)."""
    closure = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    n = closure.count()
    for _ in range(max_iter):
        hop = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        grown = closure.unionByName(hop).distinct().localCheckpoint()
        m = grown.count()
        closure = grown
        if m == n:
            break
        n = m
    return closure
