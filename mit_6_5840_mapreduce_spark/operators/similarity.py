"""Similarity search over the ``embeddings`` table
(vec_id BIGINT, embedding ARRAY<FLOAT>[64], label INT).

Cosine similarity is computed as an ordered left fold over the array
(``F.aggregate`` / DuckDB ``list_sum(list_transform(...))``) with explicit
DOUBLE accumulation, so both engines produce bit-identical sums and the
4-dp rounding in results can never disagree.

Scale design (100 TB of embeddings):
- ``embedding_topk``: the query set is small by definition — broadcast it;
  the big side streams once. Per-query top-k via window rank on the rounded
  score with vec_id tiebreak (deterministic on any engine/partitioning).
- ``ivf_assign``: the IVF coarse-quantization step — centroids broadcast,
  one narrow pass over the corpus. A full IVF search = ivf_assign on the
  corpus (build), then probe only matching cells (the equi-join replaces
  the cross join).
- ``embedding_neardup``: exact pairwise here (correctness surface); the
  documented scale path is ivf_assign first, then pairs within a cell —
  same shape as the LSH banding in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from mit_6_5840_mapreduce_spark.functions.numeric import floor4
from mit_6_5840_mapreduce_spark.sources.tables import load_table

N_QUERY_VECS = 8        # embedding_topk: vec_id < 8 are the query set
TOP_K = 5
N_CENTROIDS = 10        # ivf_assign: vec_id < 10 are the centroids
NEARDUP_COS = 0.35


def _dot(a: Column, b: Column) -> Column:
    """Ordered-fold dot product with DOUBLE accumulation (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (vec_id <
    N_QUERY_VECS), the TOP_K most similar other vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("cv"))
    scored = (
        c.crossJoin(broadcast(q))
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id",
                floor4(cosine(F.col("qv"), F.col("cv"))).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by cosine (centroids = vec_id < N_CENTROIDS; ties -> lowest id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"))
    scored = (
        emb.crossJoin(broadcast(cents))
        .select("vec_id", "centroid_id",
                floor4(cosine(F.col("embedding"), F.col("centroid")))
                 .alias("cos_sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "cos_sim")
    )


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= NEARDUP_COS, exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                floor4(cosine(F.col("ea"), F.col("eb"))).alias("cos_sim"))
        .where(F.col("cos_sim") >= NEARDUP_COS)
    )


QUERIES = {
    "embedding_topk": embedding_topk,
    "ivf_assign": ivf_assign,
    "embedding_neardup": embedding_neardup,
}

# DuckDB equivalents of _dot/_norm: ordered list folds with DOUBLE elements.
_D_DOT = ("list_sum(list_transform(range(1, len({a}) + 1), "
          "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")
_D_NORM = "sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"


def _d_cos(a: str, b: str) -> str:
    return (f"({_D_DOT.format(a=a, b=b)} / "
            f"({_D_NORM.format(a=a)} * {_D_NORM.format(a=b)}))")


ORACLES = {
    "embedding_topk": f"""
        SELECT query_id, cand_id, cos_sim, rank
        FROM (
            SELECT query_id, cand_id, cos_sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, cand_id) AS rank
            FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                       floor({_d_cos('q.embedding', 'c.embedding')} * 10000) / 10000
                           AS cos_sim
                FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < {N_QUERY_VECS}
            )
        )
        WHERE rank <= {TOP_K}
    """,
    "ivf_assign": f"""
        SELECT vec_id, centroid_id, cos_sim
        FROM (
            SELECT v.vec_id, c.vec_id AS centroid_id,
                   floor({_d_cos('v.embedding', 'c.embedding')} * 10000) / 10000
                       AS cos_sim,
                   row_number() OVER (PARTITION BY v.vec_id
                                      ORDER BY floor({_d_cos('v.embedding', 'c.embedding')} * 10000) / 10000 DESC,
                                               c.vec_id) AS rn
            FROM embeddings v JOIN embeddings c ON c.vec_id < {N_CENTROIDS}
        )
        WHERE rn = 1
    """,
    "embedding_neardup": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               floor({_d_cos('a.embedding', 'b.embedding')} * 10000) / 10000 AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE floor({_d_cos('a.embedding', 'b.embedding')} * 10000) / 10000 >= {NEARDUP_COS}
    """,
}
