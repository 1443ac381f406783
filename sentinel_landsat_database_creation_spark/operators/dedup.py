"""Deduplication operators (north-star extensions, BASELINE.json):
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Everything is native DataFrame ops — shingling and hashing are
higher-order array expressions over md5 (the cross-engine deterministic
hash), so each operator has an exact DuckDB oracle and stays inside
whole-stage codegen.

Scale design: the pairwise operators never materialize the O(N^2) cross
join. Jaccard joins on exploded shingles (frequency-bounded), MinHash
joins on LSH band buckets, SimHash joins on equal signatures — all
equi-joins whose fan-out is governed by bucket sizes, the standard
100 TB-safe shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import minhash_signature, shingles, simhash16


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one survivor (min id) per key group."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_" + id_col),
        F.count(F.lit(1)).alias("n_dups"),
    )


def _doc_shingles(docs: DataFrame, n: int) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id", F.array_distinct(shingles(toks, n)).alias("sh")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 2, threshold: float = 0.3
) -> DataFrame:
    """Exact n-gram Jaccard near-dup join: explode distinct shingles,
    equi-join on shingle, count intersections per pair, compute
    |A∩B| / (|A|+|B|-|A∩B|). The shingle join bounds the work by shingle
    frequency — no cross join."""
    sh = _doc_shingles(docs, n)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "s")
    b = ex.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "n_union",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        "n_inter",
        "n_union",
        "jaccard",
    )


def minhash_lsh_candidates(
    docs: DataFrame, n: int = 2, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """MinHash + LSH banding: signature of n_hashes md5-min values,
    split into ``bands`` bands; documents sharing any band become a
    candidate pair. Candidates only — verification composes with
    ngram_jaccard_pairs on the candidate set."""
    rows_per_band = n_hashes // bands
    sh = _doc_shingles(docs, n).filter(F.size("sh") > 0)
    sig = sh.select("doc_id", minhash_signature(F.col("sh"), n_hashes).alias("sig"))
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(i)),
                        *[
                            F.element_at("sig", i * rows_per_band + j + 1)
                            for j in range(rows_per_band)
                        ],
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"))
        .distinct()
    )


def simhash_docs(docs: DataFrame) -> DataFrame:
    """Per-document 16-bit SimHash over the token stream (frequency-
    weighted). Near-dups collide or differ in few bits; grouping by the
    signature is the candidate generator."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        F.col("doc_id").cast("long"), simhash16(toks).alias("simhash")
    )


def embedding_cosine_pairs(
    embeddings: DataFrame, threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-dup pairs above threshold.

    Brute-force O(N^2) within the join — correct baseline; the LSH
    bucket variant (similarity.sign_lsh_buckets) is the scale path that
    prunes the candidate space first."""
    from .similarity import cosine

    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = embeddings.select(F.col("vec_id"), dbl.alias("v"))
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select(F.col("vec_a").cast("long"), F.col("vec_b").cast("long"), "cos")
    )
