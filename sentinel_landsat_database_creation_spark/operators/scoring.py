"""Statistical document-scoring operators: TF-IDF term ranking and
unigram language-model surprisal (the CCNet/Gopher-style "perplexity
filter" reduced to its shuffle shape).

Extensions beyond the reference pipeline (SURVEY.md §6): the reference
stops at catalog pairing; a training-data pipeline additionally scores
every document against corpus-level statistics. Both operators here are
the same physical shape — one corpus-wide token aggregation producing a
TINY dictionary (bounded by vocabulary size, not corpus size), broadcast
back onto a per-document aggregation — so at 100 TB the only full-data
shuffle is the per-(doc, token) groupBy, and the dictionary join never
shuffles the big side.

Cross-engine determinism: the only transcendental (ln) is evaluated once
per DISTINCT token and immediately rounded to integer micros; every
per-document number is then integer arithmetic (sums and products of
BIGINTs), so Spark and DuckDB agree bit-for-bit regardless of
aggregation order. Ranking ties break on the token string. A mean kept
as a double is exactly two IEEE ops on integer-valued doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, tf) — per-document token occurrence counts.

    The whitespace tokenizer matches ``textops._tokens`` and every
    oracle's ``string_split(text, ' ')``.
    """
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``(doc_id, rank, tok, score_u)``.

    ``idf_u = round(ln(N / df) * 1e6)`` is computed on the distinct-token
    dictionary (tiny) and joined back broadcast; ``score_u = tf * idf_u``
    stays in exact BIGINT so the per-doc ranking is cross-engine
    deterministic. The corpus size ``N`` is a 1-row aggregate cross-joined
    broadcast — never a driver-side collect.

    Scale shape: one explode+groupBy over the corpus (the unavoidable
    shuffle), one tiny groupBy for df, two broadcast joins, and a
    per-doc-partitioned window — no global ordering anywhere.
    """
    tf = _doc_tokens(docs)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_tok = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        df_tok.crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
                * F.lit(1e6)
            )
            .cast("long")
            .alias("idf_u"),
        )
    )
    scored = tf.join(F.broadcast(idf), "tok").select(
        "doc_id", "tok", (F.col("tf") * F.col("idf_u")).alias("score_u")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_u").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc_id").cast("long"),
            F.col("rank").cast("long"),
            "tok",
            F.col("score_u").cast("long"),
        )
    )


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, bg, w1, tf) — per-document bigram occurrence counts.

    Bigrams are built array-native (two shifted slices through one
    zip_with — the measured-fast shingle pattern, functions/text.py:24)
    carrying the first token alongside the joined string in a struct, so
    ``w1`` is exact even if tokens contain the separator. Docs with < 2
    tokens contribute no rows (the ``when`` guard keeps slice lengths
    positive, same hazard as ``shingles``).
    """
    toks = F.split(F.col("text"), " ")
    length = F.size(toks) - 1
    pairs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, length),
            F.slice(toks, 2, length),
            lambda a, b: F.struct(
                F.concat(a, F.lit("_"), b).alias("bg"), a.alias("w1")
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<bg:string,w1:string>>"))
    return (
        docs.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.bg").alias("bg"), F.col("p.w1").alias("w1"))
        .groupBy("doc_id", "bg", "w1")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bigram_surprisal(docs: DataFrame) -> DataFrame:
    """Bigram conditional-LM negative log-likelihood per document:
    ``(doc_id, n_bigrams, nll2_u, mean_nll2)``.

    The model is the corpus itself: ``p(w2 | w1) = c(w1,w2) / c(w1·)``
    where ``c(w1·)`` sums bigram counts by first token — a proper
    conditional distribution with no out-of-vocabulary mass, so no
    backoff is needed. Like :func:`unigram_surprisal`, the only
    transcendental is evaluated once per DISTINCT bigram and rounded to
    integer micros; each document's NLL is then an exact BIGINT
    ``Σ tf·sur_u``, bit-identical across engines.

    Scale shape: one bigram explode+groupBy over the corpus (the
    unavoidable shuffle), two vocabulary-bounded aggregations, and
    broadcast joins of the tiny model tables. If the bigram vocabulary
    outgrows broadcast (open-domain web text), drop the ``broadcast``
    hints — the joins degrade to shuffle-hash on the already-partitioned
    ``bg`` key; the plan is otherwise unchanged.
    """
    tfb = _doc_bigrams(docs)
    c2 = tfb.groupBy("bg", "w1").agg(F.sum("tf").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = c2.join(F.broadcast(c1), "w1").select(
        "bg",
        F.round(
            -F.log(F.col("c2").cast("double") / F.col("c1").cast("double"))
            * F.lit(1e6)
        )
        .cast("long")
        .alias("sur_u"),
    )
    per_doc = (
        tfb.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("sur_u")).cast("long").alias("nll2_u"),
        )
    )
    return per_doc.select(
        F.col("doc_id").cast("long"),
        "n_bigrams",
        "nll2_u",
        (
            (F.col("nll2_u").cast("double") / F.col("n_bigrams").cast("double"))
            / F.lit(1e6)
        ).alias("mean_nll2"),
    )


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Unigram-LM negative log-likelihood per document:
    ``(doc_id, n_toks, nll_u, mean_nll)``.

    The corpus unigram model ``p(tok) = c(tok) / T`` lives in a tiny
    dictionary with per-token surprisal pre-rounded to integer micros
    (``sur_u = round(-ln(p) * 1e6)``); a document's NLL is then the exact
    BIGINT sum ``Σ tf·sur_u``. This is the quality filter CCNet runs with
    a KenLM model — here the model is the corpus itself, but the Spark
    plan (dictionary broadcast onto a token aggregation) is identical for
    any externally-supplied unigram table.
    """
    tf = _doc_tokens(docs)
    totals = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    t_all = totals.agg(F.sum("c").alias("t"))
    model = totals.crossJoin(F.broadcast(t_all)).select(
        "tok",
        F.round(
            -F.log(F.col("c").cast("double") / F.col("t").cast("double"))
            * F.lit(1e6)
        )
        .cast("long")
        .alias("sur_u"),
    )
    per_doc = (
        tf.join(F.broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_toks"),
            F.sum(F.col("tf") * F.col("sur_u")).cast("long").alias("nll_u"),
        )
    )
    return per_doc.select(
        F.col("doc_id").cast("long"),
        "n_toks",
        "nll_u",
        (
            (F.col("nll_u").cast("double") / F.col("n_toks").cast("double"))
            / F.lit(1e6)
        ).alias("mean_nll"),
    )
