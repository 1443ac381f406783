"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k is the correctness baseline; sign-bit LSH
bucketing is the scale path (prune candidates by shared bucket before
scoring). The dot product is a sequential double fold with native
higher-order functions — bit-identical to the DuckDB oracle (verified),
so even the float scores hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    candidate corpus, rank per query. The corpus side never shuffles
    until the final per-query top-k (partial top-k per partition via
    rank window after a repartition on qid)."""
    q = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
        .select("qid", "cid", "cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").cast("long"),
            F.col("rnk").cast("long"),
            F.col("cid").cast("long"),
            F.col("cos"),
        )
    )


def sign_lsh_buckets(
    embeddings: DataFrame, n_bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Sign-bit LSH bucket per vector: the concatenated signs of the
    first n_bits dimensions. Vectors in the same bucket are cosine-LSH
    candidates (bit-sampling over the sign vector); at scale the
    similarity join becomes an equi-join on bucket."""
    bits = F.concat(
        *[
            F.when(F.element_at(F.col(vec_col), i + 1) > 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(n_bits)
        ]
    )
    return embeddings.select(F.col(id_col).cast("long"), bits.alias("bucket"))


def bucketed_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 3, n_bits: int = 8
) -> DataFrame:
    """LSH-pruned approximate top-k: score only candidates sharing the
    query's sign bucket. Recall < 1 by design; the brute-force variant
    is the oracle to measure it against."""
    qb = sign_lsh_buckets(queries, n_bits).withColumnRenamed("vec_id", "qid")
    cb = sign_lsh_buckets(embeddings, n_bits).withColumnRenamed("vec_id", "cid")
    q = queries.select(
        F.col("vec_id").alias("qid"), as_double(F.col("embedding")).alias("qv")
    ).join(qb, "qid")
    c = embeddings.select(
        F.col("vec_id").alias("cid"), as_double(F.col("embedding")).alias("cv")
    ).join(cb, "cid")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").cast("long"),
            F.col("rnk").cast("long"),
            F.col("cid").cast("long"),
            F.col("cos"),
        )
    )
