"""Semi-supervised label propagation over the document-similarity
graph — fixed-K synchronous rounds with clamped seeds.

LLM-curation use: a small trusted slice carries labels (language,
topic, quality tier) and the similarity graph spreads them to the
rest of the corpus — near-duplicates and same-template documents
inherit their neighbors' labels without running a classifier over
everything.  This is Zhu & Ghahramani-style label propagation in its
clamped form: seed labels never change; unlabeled nodes take the
MAJORITY label of their labeled neighbors each round, with a
deterministic (count desc, label asc) tie-break so every engine and
every partitioning agrees.

Graph and plan, Spark-first:

- The graph is the symmetrized MinHash-LSH star edge list shared with
  the CC fixpoint and PageRank (dedup/graph.py::star_edges) —
  O(n·BANDS) edges, linear in corpus size; the three graph operators
  run different algorithms over the IDENTICAL graph, so their oracles
  share one CTE prefix.
- K = 2 synchronous rounds unrolled into one declarative plan.  Each
  round is: join the current label table onto the edge list by the
  labeled endpoint (node-keyed shuffle), a map-side-combined
  (node, label) vote count, one argmax window per node over its
  ≤ |labels| vote rows, then a coalesce against the previous state
  (seeds clamp, reached nodes keep, unreached stay null).  Per-round
  cost is two node-keyed shuffles over O(E) rows — the PageRank
  discipline; K is a constant.
- Votes are integer counts; labels are strings — nothing floats, so
  the DuckDB oracle replays every round bit-for-bit.

Output: (doc_id, label, origin) for every document — origin in
'seed' / 'round1' / 'round2' / 'none' records WHEN each node was
reached (the propagation frontier, a free convergence diagnostic).

Reference parity: no graph surface in the reference; north-star
dedup/graph-family coverage (SURVEY §2 extension), third algorithm on
the dedup/graph.py star graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup.graph import edges_cte_prefix, star_edges
from ..registry import register

SEED_MOD = 7  # doc_id % 7 == 0 -> seed node carrying its lang label
LP_ROUNDS = 2


def _vote_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous round: (doc_id, label) votes from labeled
    neighbors, majority per node with (count desc, label asc)."""
    votes = (
        edges.join(labels.withColumnRenamed("doc_id", "v"), "v")
        .groupBy(F.col("u").alias("doc_id"), "label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .select("doc_id", "label")
    )


def label_propagation(documents: DataFrame) -> DataFrame:
    """The composable operator behind `graph_label_propagation`."""
    edges = star_edges(documents).select(
        F.col("u"), F.col("v")
    )
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()

    nodes = documents.select("doc_id", "lang")
    seeds = (
        nodes.filter(F.col("doc_id") % SEED_MOD == 0)
        .select("doc_id", F.col("lang").alias("label"))
    )

    state = seeds.withColumn("origin", F.lit("seed"))
    for r in range(1, LP_ROUNDS + 1):
        maj = _vote_round(sym, state.select("doc_id", "label"))
        newly = (
            maj.join(state.select("doc_id", F.lit(True).alias("known")), "doc_id", "left")
            .filter(F.col("known").isNull())
            .select("doc_id", "label")
            .withColumn("origin", F.lit(f"round{r}"))
        )
        state = state.unionByName(newly)

    return (
        nodes.select("doc_id")
        .join(state, "doc_id", "left")
        .select(
            "doc_id",
            "label",
            F.coalesce("origin", F.lit("none")).alias("origin"),
        )
    )


def _oracle_lp() -> str:
    rounds = []
    prev = "seeds"
    for r in range(1, LP_ROUNDS + 1):
        rounds.append(f"""
    votes{r} AS (
        SELECT s.u AS doc_id, l.label, COUNT(*) AS n_votes
        FROM sym s JOIN state_{prev} l ON l.doc_id = s.v
        GROUP BY s.u, l.label
    ),
    maj{r} AS (
        SELECT doc_id, label FROM (
            SELECT doc_id, label,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY n_votes DESC, label) AS rk
            FROM votes{r}
        ) WHERE rk = 1
    ),
    state_r{r} AS (
        SELECT doc_id, label, origin FROM state_{prev}
        UNION ALL
        SELECT m.doc_id, m.label, 'round{r}' AS origin
        FROM maj{r} m
        WHERE m.doc_id NOT IN (SELECT doc_id FROM state_{prev})
    )""")
        prev = f"r{r}"
    return f"""
    WITH {edges_cte_prefix()},
    state_seeds AS (
        SELECT doc_id, lang AS label, 'seed' AS origin
        FROM documents WHERE doc_id % {SEED_MOD} = 0
    ),{','.join(rounds)}
    SELECT d.doc_id, s.label,
           COALESCE(s.origin, 'none') AS origin
    FROM documents d LEFT JOIN state_{prev} s ON s.doc_id = d.doc_id
    """


@register("graph_label_propagation", oracle=_oracle_lp())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spread seed language labels (doc_id % {SEED_MOD} == 0) through
    the LSH similarity graph for {LP_ROUNDS} clamped majority-vote
    rounds; `origin` records the round each document was reached."""
    return label_propagation(load_table(spark, sf_dir, "documents"))
