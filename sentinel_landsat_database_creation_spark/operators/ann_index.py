"""Persisted IVFADC index lifecycle (r13, r12 VERDICT item 3).

The session-scoped IVFADC stack (operators/similarity.py:
ivfpq_topk_trained) recomputes cell assignments and PQ codes from the
trainer memo every session. A production corpus with a standing
10^9-vector index persists them once and probes/maintains the files
incrementally — the ``lsh_index_write`` lifecycle (operators/dedup.py:
1375-1593) applied to ANN. This module is that surface:

- :func:`ann_index_write`   — train-once encode of a corpus to disk
- :func:`ann_index_append`  — encode an ingest batch with the
  PERSISTED quantizers (no retraining) and land it beside the rest
- :func:`ann_index_delete`  — GDPR/takedown erasure of ids through the
  shared crash-safe sibling swap (doubles as a compaction)
- :func:`ann_index_probe`   — ADC top-k answered FROM THE FILES: no
  trainer, no corpus scan, only the probed cells' row groups

On-disk LAYOUT at ``path`` (all Spark parquet dirs):

- ``coarse/``    (cell BIGINT, s ARRAY<BIGINT>) — the trained coarse
  sum-vectors exactly as train_centroids emits them (K rows; tiny).
- ``codebooks/`` (sub INT, cent_id BIGINT, cv ARRAY<BIGINT>) — the
  trained PQ sub-codebooks on the quantize_vec grid (m·k* rows; tiny).
- ``codes/``     (cell BIGINT, cid BIGINT, sub INT, code BIGINT) — the
  encoded corpus: N·m rows of four small integers, repartitioned AND
  sorted on ``cell`` so a probe's cell filter prunes at the parquet
  row-group level. This is the only corpus-sized artifact.
- ``_ann_format.json`` sidecar at the ROOT (deliberately outside the
  swapped ``codes/`` dir, so the swap machinery never has to preserve
  it): format version + (m, d, k_coarse, scale). Appends and probes
  refuse a mismatched geometry mechanically (_check_ann_format) — the
  ANN twin of the LSH v2-vs-v3 width check: codes from two different
  quantizer geometries must never meet in one ADC sum.

Scale shape (100 TB): the index IS the materialized cell+code attach —
the one corpus-sized shuffle every session-scoped IVFADC plan pays
(the code groupBy in ivfpq_topk_trained) is paid once at write time;
probes touch only the probed cells' row groups (nq·nprobe cells out of
K), broadcast the per-query LUT, and shuffle only candidate rows into
the two-phase WindowGroupLimit ranking. Appends are O(batch·m);
deletes are one full-index scan through the sibling swap, the same
cost class as LSH index maintenance.

Reference parity: the reference engine has no persisted ANN index;
this extends its data model the way a training-data pipeline needs
(SURVEY.md LLM-extension mandate). Quantizer determinism story:
operators/similarity.py:train_centroids / train_pq_codebooks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import local_df
from .similarity import (
    QUANT_SCALE,
    _assign_trained,
    _l2_quant,
    _trained_centroid_frame,
    embedding_dim,
    pq_subvectors,
)

ANN_FORMAT_SIDECAR = "_ann_format.json"


def _write_ann_format(path: str, m: int, d: int, k_coarse: int) -> None:
    with open(os.path.join(path, ANN_FORMAT_SIDECAR), "w") as f:
        json.dump(
            {
                "format": 1,
                "kind": "ivfadc",
                "m": m,
                "d": d,
                "k_coarse": k_coarse,
                "scale": QUANT_SCALE,
            },
            f,
        )


def ann_index_format(path: str) -> dict:
    """The index's format sidecar, or a hard error for a directory
    this module did not write — unlike the LSH index there is no
    sidecar-less legacy generation to default to."""
    sidecar = os.path.join(path, ANN_FORMAT_SIDECAR)
    if not os.path.exists(sidecar):
        raise ValueError(
            f"no {ANN_FORMAT_SIDECAR} at {path} — not an ann_index_write "
            "layout (or the root dir was swapped instead of codes/)"
        )
    with open(sidecar) as f:
        return json.load(f)


def _check_ann_format(path: str, m: int | None, d: int, op: str) -> dict:
    fmt = ann_index_format(path)
    want_m = fmt["m"] if m is None else m
    if fmt["m"] != want_m or fmt["d"] != d:
        raise ValueError(
            f"{op}: index at {path} holds (m={fmt['m']}, d={fmt['d']}) "
            f"codes, but (m={want_m}, d={d}) was requested — codes from "
            "different quantizer geometries never sum into one ADC "
            "distance; rebuild with ann_index_write"
        )
    return fmt


def _encode_codes(
    vectors: DataFrame,
    coarse_df: DataFrame,
    codebook_df: DataFrame,
    m: int,
    dsub: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(cell, cid, sub, code) rows for ``vectors`` under the given
    quantizers — the corpus half of ivfpq_topk_trained's plan
    (similarity.py:1139), kept verbatim: broadcast codebook, exact
    BIGINT _l2_quant, min-struct code pick (ONE shuffle, map-side
    combined), struct-max cell assignment riding the same scan."""
    cdf = _trained_centroid_frame(vectors.sparkSession, coarse_df)
    cells = _assign_trained(
        vectors.select(F.col(id_col), F.col(vec_col).alias("embedding")),
        cdf,
        id_col,
        1,
    ).select(F.col(id_col).alias("cid"), "cell")
    sub_c = pq_subvectors(vectors, m, dsub, id_col, vec_col, out_id="cid")
    dist = sub_c.join(F.broadcast(codebook_df), "sub").withColumn(
        "dist", _l2_quant(F.col("sq"), F.col("cv"))
    )
    best = F.min(F.struct(F.col("dist"), F.col("cent_id")))
    codes = (
        dist.groupBy("cid", "sub")
        .agg(best.alias("b"))
        .select("cid", "sub", F.col("b.cent_id").alias("code"))
    )
    # narrow (cid, cell) side hashes per partition instead of sorting
    # the N·m code table — the ivfpq shuffle_hash pin
    return codes.join(cells.hint("shuffle_hash"), "cid").select(
        "cell", "cid", "sub", F.col("code").cast("long").alias("code")
    )


def ann_index_write(
    embeddings: DataFrame,
    path: str,
    coarse: list[tuple[int, list[int], int]],
    codebooks: list[tuple[int, int, list[int]]],
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus's IVFADC index: quantizers (from
    train_centroids / train_pq_codebooks) + encoded codes, laid out as
    the module docstring describes. Codes land repartitioned+sorted on
    ``cell`` for row-group skipping on the probe side — the same
    per-file discipline as lsh_index_write."""
    spark = embeddings.sparkSession
    d = embedding_dim(embeddings, vec_col)
    if d % m != 0:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    dsub = d // m
    coarse_df = local_df(
        spark, [(c, s) for c, s, _n in coarse], "cell long, s array<long>"
    )
    codebook_df = local_df(
        spark, codebooks, "sub int, cent_id long, cv array<long>"
    )
    os.makedirs(path, exist_ok=True)
    coarse_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "coarse")
    )
    codebook_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "codebooks")
    )
    codes = _encode_codes(
        embeddings, coarse_df, codebook_df, m, dsub, id_col, vec_col
    )
    (
        codes.repartition(F.col("cell"))
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "codes"))
    )
    _write_ann_format(path, m, d, len(coarse))


def ann_index_append(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Index maintenance for a GROWING corpus: encode an ingest batch
    with the PERSISTED quantizers — read back from ``coarse/`` and
    ``codebooks/``, never retrained, which is the point: training
    moved to write time, appends are O(batch·m) — and land its sorted
    code rows beside the existing ones (probes read the union;
    ann_index_delete doubles as the compaction between cycles).
    Geometry is checked against the sidecar: a batch whose embedding
    dim disagrees with the index raises instead of landing codes no
    probe can score."""
    spark = batch.sparkSession
    fmt = ann_index_format(path)
    probe = batch.select(F.size(vec_col).alias("d")).first()
    if probe is None:
        # empty ingest batch: nothing to encode, and its geometry is
        # unknowable — a no-op, not an error (the delete/re-ingest
        # cycle legitimately produces empty batches)
        return
    d = int(probe["d"])
    _check_ann_format(path, None, d, "ann_index_append")
    m = int(fmt["m"])
    dsub = d // m
    coarse_df = spark.read.parquet(os.path.join(path, "coarse"))
    codebook_df = spark.read.parquet(os.path.join(path, "codebooks"))
    codes = _encode_codes(
        batch, coarse_df, codebook_df, m, dsub, id_col, vec_col
    )
    (
        codes.repartition(F.col("cell"))
        .sortWithinPartitions("cell")
        .write.mode("append")
        .parquet(os.path.join(path, "codes"))
    )


def ann_index_delete(
    spark: SparkSession,
    path: str,
    tombstones: DataFrame,
    id_col: str = "vec_id",
) -> None:
    """The DELETE half of the takedown lifecycle for the ANN index:
    remove every code row whose ``cid`` is tombstoned, so probes stop
    ranking vectors the corpus no longer contains — the lsh_index_delete
    ghost-pair story, verbatim (a deleted-but-indexed vector would
    keep appearing in top-k results, the exact failure an erasure
    audit looks for). Rides the shared crash-safe sibling swap
    (operators/dedup.py:_sibling_swap_rewrite, key_col='cell') over
    ``codes/`` only — quantizers hold no per-vector data and stay in
    place, and the root sidecar sits outside the swapped dir by
    design. Re-lands survivors sorted on cell, so a delete doubles as
    a compaction of the appended file sets."""
    from .dedup import _sibling_swap_rewrite

    ann_index_format(path)  # refuse non-index dirs before any rewrite
    ids = tombstones.select(F.col(id_col).alias("cid")).distinct()
    _sibling_swap_rewrite(
        spark,
        os.path.join(path, "codes"),
        # re-select the canonical column order: the USING join moves
        # cid first, and the on-disk schema should stay stable across
        # maintenance cycles
        lambda idx: idx.join(F.broadcast(ids), "cid", "left_anti").select(
            "cell", "cid", "sub", "code"
        ),
        key_col="cell",
    )


def ann_index_probe(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k answered from the written files, no retraining and no
    corpus scan: returns (qid, rnk, cid, adc) — adc the exact-BIGINT
    squared-L2 LUT sum of ivfpq_topk_trained, WITHOUT the raw-vector
    cosine rerank (the index stores codes, not vectors; rerank, when
    wanted, is a bounded nq·k join back to the corpus table, the
    caller's move).

    Plan: quantizers broadcast (K + m·k* rows read from the two tiny
    dirs), queries assigned to nprobe cells against the coarse frame,
    the probed cell ids COLLECTED (bounded by nq·nprobe — a probe
    batch is small by definition) into an ``isin`` literal filter so
    the codes scan prunes at the parquet row-group level (the sorted
    cell column makes min/max stats decisive), per-query LUT broadcast
    (the LUT join IS the residual-entry pruning trick), one candidate
    groupBy, two-phase WindowGroupLimit ranking. Nothing corpus-sized
    shuffles: the cell+code attach was materialized at write time."""
    fmt = ann_index_format(path)
    probe = queries.select(F.size(vec_col).alias("d")).first()
    if probe is None:
        # empty probe batch: an empty result with the contract schema,
        # not a crash on the dimension probe
        return local_df(
            spark, [], "qid long, rnk long, cid long, adc long"
        )
    d = int(probe["d"])
    _check_ann_format(path, None, d, "ann_index_probe")
    m = int(fmt["m"])
    dsub = d // m
    coarse_df = spark.read.parquet(os.path.join(path, "coarse"))
    cdf = _trained_centroid_frame(spark, coarse_df)
    cells_q = _assign_trained(
        queries.select(F.col(id_col), F.col(vec_col).alias("embedding")),
        cdf,
        id_col,
        nprobe,
    ).select(F.col(id_col).alias("qid"), "cell")
    probed = sorted(
        {int(r["cell"]) for r in cells_q.select("cell").distinct().collect()}
    )
    codebook_df = spark.read.parquet(os.path.join(path, "codebooks"))
    lut = (
        pq_subvectors(queries, m, dsub, id_col, vec_col, out_id="qid")
        .join(F.broadcast(codebook_df), "sub")
        .select(
            "qid",
            "sub",
            F.col("cent_id").cast("long").alias("code"),
            _l2_quant(F.col("sq"), F.col("cv")).alias("d"),
        )
    )
    codes = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("cell").isin(probed)
    )
    cand = codes.join(F.broadcast(cells_q), "cell").filter(
        F.col("qid") != F.col("cid")
    )
    adc = (
        cand.join(F.broadcast(lut), ["qid", "sub", "code"])
        .groupBy("qid", "cid")
        .agg(F.sum("d").alias("adc"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("cid"))
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").cast("long"),
            F.col("rnk").cast("long"),
            F.col("cid").cast("long"),
            F.col("adc").cast("long"),
        )
    )


def exact_rerank(
    topk: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine rerank of a probe's (qid, rnk, cid, ...) rows —
    the deployment's second stage: the index answers from codes alone
    (ann_index_probe stores no raw vectors BY DESIGN), and the bounded
    nq·k survivor set joins back to the corpus table for exact
    scoring. Returns (qid, rnk, cid, cos) with rnk re-assigned by
    (cos desc, cid asc) within each qid — the ivfpq_topk_trained
    output contract, so a probe + rerank pipeline is column-compatible
    with the session-scoped trained stack. Both vector attaches
    broadcast the small side: queries into the survivor set, and the
    JOINED survivor set into the corpus scan — the hint must wrap the
    corpus join's immediate child (a hint on topk alone does NOT
    propagate through the first join, so the corpus's raw vectors
    would sort-merge shuffle; code-review finding, r13). The cosine
    attach deliberately restates ivfpq_topk_trained's rerank tail
    (similarity.py) — the shapes are pinned equal by
    tests/test_ann_index.py:test_exact_rerank_matches_trained_stack,
    which breaks loudly if either side's arithmetic drifts."""
    from pyspark.sql.window import Window

    from .similarity import dot_cast, norm_cast

    qv = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).withColumn("qn", norm_cast(F.col("qv")))
    cv = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    ).withColumn("cn", norm_cast(F.col("cv")))
    survivors = topk.select("qid", "cid").join(F.broadcast(qv), "qid")
    scored = cv.join(F.broadcast(survivors), "cid").withColumn(
        "cos",
        dot_cast(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return scored.select(
        F.col("qid").cast("long"),
        F.row_number().over(w).cast("long").alias("rnk"),
        F.col("cid").cast("long"),
        "cos",
    )
