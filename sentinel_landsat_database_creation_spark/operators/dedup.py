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
from pyspark.sql.window import Window

from ..functions.text import hash60, hash120, shingles
from ..session import local_df


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one survivor (min id) per key group."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_" + id_col),
        F.count(F.lit(1)).alias("n_dups"),
    )


def _check_width(width: int) -> None:
    """Shared guard for the r10 hash-width knob (r11 ADVICE): every
    family member that branches on ``width == 120`` must reject other
    values, or a typo (width=12) silently runs the 60-bit path — a
    different, unverified hash family — instead of erroring."""
    if width not in (60, 120):
        raise ValueError(f"width must be 60 or 120, got {width}")


def _shingle_rows(
    docs: DataFrame, n: int, width: int = 60, distinct: bool = True
) -> DataFrame:
    """Distinct (doc_id, shingle-key) rows: explode, hash each raw
    shingle to its 60-bit md5-prefix BIGINT (functions/text.py:hash60),
    then FRAME-level distinct. The per-row ``array_distinct``
    alternative is narrow (no shuffle) but runs O(len²) in the HOF
    interpreter per document — measured ~40% slower end-to-end at
    sf0.1 than letting the codegen'd hash-aggregate dedup the exploded
    stream. Revisit the trade-off for very long documents where the
    explode fan-out dominates. (Negative result, r4: round-robin
    widening the one-file sf0.1 scan before the explode moved the
    stage to 32 tasks but the wall time not at all — the cost is the
    distinct shuffle + checkpoint, not map-side serialization — so the
    extra shuffle was dropped.)

    Key narrowing (r8, the span-family lesson one family over): every
    downstream consumer tests shingle EQUALITY only (the distinct
    shuffle, the sparse-path equi-join, array_intersect verification,
    the salted signature family), and the raw ~50-byte window string
    is what the family's two heaviest shuffles used to carry. Hashing
    at the explode (one md5 per occurrence, map-side, before the
    distinct) makes every shuffled row (doc_id, BIGINT). Collision
    math as in _span_occurrences: ~n²/2⁶¹ expected colliding key
    pairs, and a collision only ever MERGES two shingles — for
    Jaccard/containment that can only nudge one pair's counts; for
    LSH candidacy it only ADDS candidates, which verification scores.
    Past ~1e10 distinct shingles widen to two prefix columns — the
    ``width`` knob (r10, executable since then: width=120 emits
    (doc_id, s, s2) with both hash120 words of the SAME digest, and
    every family member threads it — minhash_signatures /
    banded_buckets / minhash_lsh_candidates — with the DuckDB mirror
    parameterized the same way in the shared fragment generators;
    tests/test_hash60.py pins the 120-bit path end-to-end against
    DuckDB over real documents). Default 60 keeps every expression —
    and therefore every pinned plan — byte-identical. The DuckDB
    oracles mirror the identical substr(md5(raw), 1, 15) (and 16, 15)
    arithmetic, so driver hashes stay exact at either width."""
    _check_width(width)
    toks = F.split(F.col("text"), " ")
    ex = docs.select("doc_id", F.explode(shingles(toks, n)).alias("sraw"))
    if width == 60:
        out = ex.select("doc_id", hash60("sraw").alias("s"))
    else:
        w0, w1 = hash120("sraw")
        out = ex.select("doc_id", w0.alias("s"), w1.alias("s2"))
    # distinct=False (r13 optimization round): consumers whose
    # downstream aggregate is duplicate-INSENSITIVE — the MinHash
    # signature min in lsh_index_write/append — skip the
    # (doc_id, key) distinct, which is the only corpus-sized exchange
    # on that path (min over a multiset equals min over its set; the
    # signature groupBy's map-side partial min collapses occurrence
    # rows before its own shuffle). Set-semantics consumers (Jaccard
    # intersections, containment, the shared memo) keep the default.
    return out.distinct() if distinct else out


def shingle_rows_materialized(
    docs: DataFrame, n: int, width: int = 60
) -> DataFrame:
    """The distinct (doc_id, shingle) table, materialized once with
    localCheckpoint. Every dedup operator's heaviest stage is this
    explode + distinct shuffle; each consumer reads it 2-3 times
    (vocab + signature join, probe + bitmap pack, pair sides), so an
    uncheckpointed subtree runs the shuffle that many times (measured
    14 s -> ~5 s for minhash_lsh at sf0.1). Callers composing several
    dedup operators (neardup_pipeline, dedup_clusters) pass this one
    table through instead of re-shingling per stage.

    The materialization is additionally memoized ACROSS operator calls
    within one session, keyed on (session, analyzed-plan semantic hash,
    n): a dedup review session runs jaccard + minhash + pipeline +
    clustering + calibration over the SAME corpus, and re-running the
    explode+distinct shuffle per query is pure waste — this is the
    shared-dimension-table pattern, not a semantics change (the
    semantic hash keys on the logical source, so a different corpus or
    shingle width misses). Entries die with the session (checkpoint
    blocks are session-scoped); the cache holds a handful of tiny
    tables, never row data on the driver."""
    # width 60 keeps the historical memo key so warm-memo bench
    # attribution is unchanged; 120 gets its own keyspace
    key = ("shingles", n) if width == 60 else ("shingles", n, width)
    return _memo_checkpoint(
        docs, key, lambda: _shingle_rows(docs, n, width)
    )


# key -> (DataFrame handle, checkpoint-RDD ids captured at creation).
# RLock, not Lock: builders nest (the verified-pair-table memo's
# builder calls shingle_rows_materialized, itself a memo) — a plain
# Lock self-deadlocks on that re-entry.
_MEMO_CACHE: dict[tuple, tuple[DataFrame, frozenset]] = {}
_MEMO_LOCK = __import__("threading").RLock()

# Measurement hook (round-5 VERDICT): every memo MISS-branch build
# appends ("memo:<tag0>", seconds) here. Without this, per-query bench
# numbers swing with registry order — whichever family member runs
# first pays the shared build (r4: dedup_clusters 2.06 -> 4.92 s while
# neardup_pipeline 5.38 -> 0.11 s). bench.py drains the log after each
# timed query, charges the build seconds to separate "memo:*" bench
# lines, and subtracts them from the query's own number, so each
# query's cost is its warm-memo plan cost regardless of neighbor order.
# Nested builds (RLock re-entry) time only their OWN span: the inner
# memo's seconds are subtracted from the enclosing build's wall time
# so the logged lines sum to the real elapsed total, double-counting
# nothing.
MEMO_BUILD_LOG: list[tuple[str, float]] = []


def drain_memo_build_log() -> list[tuple[str, float]]:
    """Pop and return all (label, seconds) build records accumulated
    since the last drain. Thread-safe under the memo lock."""
    with _MEMO_LOCK:
        out = list(MEMO_BUILD_LOG)
        MEMO_BUILD_LOG.clear()
    return out


def log_setup_time(label: str, seconds: float) -> None:
    """Record a non-memo one-time setup cost (e.g. a fixture write)
    under the same attribution stream bench.py drains."""
    with _MEMO_LOCK:
        MEMO_BUILD_LOG.append((label, seconds))


_MEMO_TLS = __import__("threading").local()


def _memo_storage_level():
    """Storage level for memoized checkpoint blocks. Default (None) is
    localCheckpoint's MEMORY_AND_DISK(deser) — right for the bench's
    sf0.1 working sets. SPARK_GRAFT_MEMO_STORAGE=DISK_ONLY switches to
    disk-backed blocks: at 10x data the eager on-heap materialization
    of the shingle table alone killed a 1 GB JVM (measured,
    scripts/bench_scale.py) — the local-mode expression of the 100 TB
    rule that big shared intermediates land in storage you SIZED for
    them (parquet staging / disk-backed cache), never in executor
    heap."""
    import os as _os

    name = _os.environ.get("SPARK_GRAFT_MEMO_STORAGE")
    if not name:
        return None
    from pyspark import StorageLevel

    return getattr(StorageLevel, name)


def _timed_build(tag: tuple, builder):
    """Build + eagerly checkpoint a memo entry, logging the build's OWN
    wall seconds (minus nested memo builds) to MEMO_BUILD_LOG."""
    import time as _time

    stack = getattr(_MEMO_TLS, "stack", None)
    if stack is None:
        stack = _MEMO_TLS.stack = []
    stack.append(0.0)
    t0 = _time.perf_counter()
    try:
        out = builder().localCheckpoint(
            eager=True, storageLevel=_memo_storage_level()
        )
    except Exception:
        # Credit the failed attempt's wall time to the enclosing build
        # (round-5 ADVICE): an outer builder that catches this and
        # continues would otherwise log an "own span" silently inflated
        # by the failed inner attempt, breaking the sum-to-elapsed
        # invariant the accounting tests pin.
        elapsed = _time.perf_counter() - t0
        stack.pop()
        if stack:
            stack[-1] += elapsed
        raise
    elapsed = _time.perf_counter() - t0
    inner = stack.pop()
    if stack:
        stack[-1] += elapsed
    log_setup_time(f"memo:{tag[0] if tag else 'anon'}", elapsed - inner)
    return out


def _persistent_ids(spark) -> set:
    """Driver-side ids of currently-registered persistent RDDs (the
    registry localCheckpoint blocks live in)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return set(jmap.keySet().toArray())


def _release_checkpoint(spark, ids: frozenset) -> None:
    """Best-effort free of a memo entry's checkpoint blocks. Verified
    mechanism (probe, round 4): unpersisting the JVM handle from
    getPersistentRDDs removes the rdd_N_* blocks — a later scan of the
    handle fails with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. For exactly
    that reason the CACHE never calls this on eviction (a caller may
    still hold the evicted handle inside an unexecuted lazy plan, and a
    truncated-lineage handle whose blocks are gone can never
    recompute); it exists for explicit cleanup by owners who KNOW no
    live plan references the blocks, and for tests."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for i in ids:
            if jmap.containsKey(i):
                jmap.get(i).unpersist(False)
    except Exception:
        pass


def _memo_checkpoint(src: DataFrame, tag: tuple, builder) -> DataFrame:
    """Session-scoped memo of a localCheckpointed derived table, keyed
    on (applicationId, semantic hash of the source plan, tag). Misses
    fall back to building + checkpointing uncached; entries die with
    the session (checkpoint blocks are session-scoped), and the cache
    only ever holds DataFrame handles, never driver-side rows.

    localCheckpoint is non-reliable: lineage is truncated, so a handle
    whose blocks were unpersisted or lost with an executor can never
    recompute. Guards (round-4 ADVICE): each hit is validated against
    the driver's persistent-RDD registry (the checkpoint ids captured
    at creation must still be registered — a dropped id means the
    blocks are gone and the entry is rebuilt); and the cache is
    lock-serialized so the id-diff capture can't interleave across
    threads. Eviction deliberately drops dict REFERENCES only and does
    NOT release blocks: a caller may still hold an evicted handle
    inside an unexecuted lazy plan, and releasing would strand it
    unrecoverably (lineage is truncated) — the bounded leak dies with
    the session, which is the safe side of that trade. With nested
    memos (RLock re-entry) the outer entry's id-diff also captures the
    inner entry's checkpoint id — harmless, ids are only ever used for
    the validity probe."""
    spark = src.sparkSession
    try:
        key = (
            spark.sparkContext.applicationId,
            src._jdf.queryExecution().analyzed().semanticHash(),
        ) + tag
    except Exception:
        return _timed_build(tag, builder)
    with _MEMO_LOCK:
        hit = _MEMO_CACHE.get(key)
        if hit is not None:
            df, ck_ids = hit
            try:
                alive = ck_ids <= _persistent_ids(spark)
            except Exception:
                alive = False
            if alive:
                return df
            del _MEMO_CACHE[key]  # blocks gone — rebuild below
        try:
            before = _persistent_ids(spark)
        except Exception:
            before = None
        out = _timed_build(tag, builder)
        if before is None:
            return out
        try:
            ck_ids = frozenset(_persistent_ids(spark) - before)
        except Exception:
            return out
        if not ck_ids:
            # An empty diff means the checkpoint blocks could not be
            # attributed (e.g. a concurrent unpersist raced the probe):
            # caching would make the liveness check (subset test) pass
            # vacuously forever, handing out a handle whose blocks may
            # be gone. Match the other fallback paths: return uncached.
            return out
        if len(_MEMO_CACHE) > 16:
            _MEMO_CACHE.clear()  # references only — see docstring
        _MEMO_CACHE[key] = (out, ck_ids)
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.3,
    max_bitmap_bits: int = 4096,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup join, with an adaptive physical
    strategy (identical output either way):

    - dense vocabulary (≤ max_bitmap_bits distinct shingles): encode
      each document's shingle set as a fixed-width bitmap of longs and
      count intersections with bit_count(a & b) over blocked self-pairs
      — pure codegen arithmetic, no quadratic shuffle. A dense shared
      vocabulary is exactly the case where the explode-join explodes
      (every hot shingle joins every pair of its documents).
    - large vocabulary: explode distinct shingles, equi-join on shingle,
      count per pair. Fan-out is bounded by shingle document-frequency —
      the standard sparse path at web scale, where vocabularies are
      huge and individual shingles are rare.

    The vocabulary count is a plan-time probe (one aggregate job over
    the distinct-shingle table), the same class of decision as AQE's
    broadcast-vs-shuffle switch.

    The bitmap dictionary holds only shingles with document frequency
    >= 2: a df=1 shingle can never contribute to any intersection, so
    dropping it changes NO pair's n_inter, and set sizes (hence unions)
    are carried separately from the full shingle table. Docs left with
    zero df>=2 shingles intersect nothing and are excluded from the
    pair space outright (output pairs require n_inter >= 1 either way)
    — on natural text the singleton tail is large, so this both shrinks
    every bitmap and cuts N before the quadratic stage, and it widens
    bitmap-path eligibility to corpora whose RAW vocabulary exceeds
    max_bitmap_bits.

    ``shingle_rows`` lets callers that already materialized the distinct
    (doc_id, shingle) table (see shingle_rows_materialized) pass it in
    instead of re-shingling."""
    ex = (
        shingle_rows
        if shingle_rows is not None
        else shingle_rows_materialized(docs, n)
    )
    # Plan-time vocabulary probe: collect the df>=2 shingles (bounded
    # by max_bitmap_bits+1 — LIMIT keeps a huge-vocab corpus from ever
    # pulling its dictionary to the driver). ex is distinct per
    # (doc_id, s), so count(*) per s IS document frequency.
    vocab_rows = (
        ex.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("s")
        .limit(max_bitmap_bits + 1)
        .collect()
    )
    n_vocab = len(vocab_rows)
    if 0 < n_vocab <= max_bitmap_bits:
        vocab_ids = local_df(
            docs.sparkSession,
            [(r["s"], i) for i, r in enumerate(sorted(vocab_rows, key=lambda r: r["s"]))],
            "s long, sid int",
        )
        out = _jaccard_bitmap(ex, vocab_ids, n_vocab, threshold)
    else:
        sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        out = _jaccard_explode(ex, sizes, threshold)
    return out.select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        "n_inter",
        "n_union",
        "jaccard",
    )


def _jaccard_explode(ex: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """Sparse path: pair intersection counts via shingle equi-join, set
    sizes re-attached with broadcast joins. The shingle join is an
    EXPANDING join (hot shingles fan out to every document pair), so
    both sides pin full reducer width — see skew.full_width."""
    from .skew import full_width

    a = full_width(ex.select(F.col("doc_id").alias("doc_a"), "s"), "s")
    b = full_width(ex.select(F.col("doc_id").alias("doc_b"), "s"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
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


def _jaccard_bitmap(
    ex: DataFrame, vocab_ids: DataFrame, n_vocab: int, threshold: float
) -> DataFrame:
    """Dense path: dictionary-encode shingles to bit positions (the
    dictionary arrives as a literal (s, sid) table, already collected by
    the probe), pack each document into ceil(V/64) long words plus its
    set size, then finish entirely inside the blocked pair projection —
    intersection via an unrolled bit_count(a&b) sum, union/jaccard from
    the carried sizes. No per-pair joins after the pair join itself (the
    12.5M-pair stream at sf0.1 previously crossed two more broadcast
    joins just to fetch sizes).

    The dictionary covers df>=2 shingles only (see ngram_jaccard_pairs),
    so ``n_sh`` — the TRUE set size including singletons — comes from a
    separate aggregate over the full shingle table, joined back onto the
    packed rows; the inner dictionary join also drops docs with no
    shareable shingle before the quadratic stage.

    Negative result, measured: packing the words into ONE array<long>
    column (element_at per term instead of scalar columns) is ~7x
    SLOWER (50 s vs 7 s warm) — per-pair array handling through the
    join dwarfs the wider-row cost. Keep the words as scalar columns."""
    from .similarity import blocked_self_pairs

    n_words = (n_vocab + 63) // 64
    word_cols = [
        F.expr(
            f"aggregate(filter(ids, i -> i div 64 = {j}), CAST(0 AS BIGINT), "
            "(acc, i) -> acc | shiftleft(CAST(1 AS BIGINT), CAST(i % 64 AS INT)))"
        ).alias(f"w{j}")
        for j in range(n_words)
    ]
    sizes = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sh")
    )
    packed = (
        ex.join(vocab_ids, "s")
        .groupBy("doc_id")
        .agg(F.collect_list("sid").alias("ids"))
        .join(sizes, "doc_id")
        .select("doc_id", "n_sh", *word_cols)
    )
    pairs = blocked_self_pairs(packed, "doc_id")
    # Size-ratio prune BEFORE the popcount projection: J(A,B) <= min/max
    # of the set sizes, so pairs failing min >= t*max can never reach
    # the threshold — one comparison culls them ahead of the n_words
    # bit_count ops per pair (the dominant per-pair cost when the
    # vocabulary is near max_bitmap_bits).
    pairs = pairs.filter(
        F.least("a_n_sh", "b_n_sh").cast("double")
        >= F.lit(threshold) * F.greatest("a_n_sh", "b_n_sh").cast("double")
    )
    n_inter = F.bit_count(F.col("a_w0").bitwiseAND(F.col("b_w0")))
    for j in range(1, n_words):
        n_inter = n_inter + F.bit_count(
            F.col(f"a_w{j}").bitwiseAND(F.col(f"b_w{j}"))
        )
    n_union = F.col("a_n_sh") + F.col("b_n_sh") - F.col("n_inter")
    return (
        pairs.withColumn("n_inter", n_inter.cast("long"))
        # >= 1 matches the sparse path's inner join (shared shingle
        # required) and keeps 0/0 NaNs out of the threshold filter
        .filter(F.col("n_inter") >= 1)
        .select(
            F.least("a_doc_id", "b_doc_id").alias("doc_a"),
            F.greatest("a_doc_id", "b_doc_id").alias("doc_b"),
            F.col("n_inter"),
            n_union.cast("long").alias("n_union"),
            (
                F.col("n_inter").cast("double")
                / n_union.cast("long").cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    n: int = 2,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_rows: DataFrame | None = None,
    sig: DataFrame | None = None,
    width: int = 60,
) -> DataFrame:
    """MinHash + LSH banding: signature of n_hashes md5-min values,
    split into ``bands`` bands; documents sharing any band become a
    candidate pair. Candidates only — verification composes with
    ngram_jaccard_pairs on the candidate set.

    Physical shape: the salted md5 family is evaluated once per DISTINCT
    shingle (a dictionary table the optimizer broadcasts), not once per
    (document, shingle) occurrence — the signature min then comes from a
    plain groupBy. Identical signatures (min over the same multiset),
    ~6× less hashing on repetitive corpora, and the dictionary join is
    the scale-safe equi-join shape.

    The shingle table feeds BOTH the vocab subtree and the signature
    join, so it arrives materialized (shingle_rows_materialized) — an
    inline subtree would run the heaviest shuffle twice.

    Measured alternative (round 2): a fully narrow plan — per-doc
    array_distinct shingle array, signatures via
    array_min(transform(sh, md5)) with no shuffle before the band join —
    is ~2x SLOWER at sf0.1 (8.1 s vs 4.2 s for candidates): it hashes
    per (doc, shingle) occurrence in the HOF interpreter instead of per
    distinct shingle in codegen. Shuffle-count is not the whole story
    when the map-side work multiplies."""
    # zero-shingle docs are naturally absent from the exploded rows
    # (width: callers passing shingle_rows/sig through own consistency)
    ex = (
        shingle_rows
        if shingle_rows is not None
        else shingle_rows_materialized(docs, n, width)
    )
    # callers holding a MATERIALIZED signature table pass it through
    # (minhash_estimate: its plan reads the signatures four times —
    # both candidate-join sides plus the per-pair a/b attach — so an
    # inline subtree would run the md5 family + min-groupBy shuffle
    # that many times)
    if sig is None:
        sig = minhash_signatures(ex, n_hashes, width)
    banded = banded_buckets(sig, n_hashes, bands, width)
    from .skew import full_width

    # bucket join expands (every same-bucket doc pair): full reducer
    # width, not AQE's input-sized coalesce — see skew.full_width
    a = full_width(banded.select(F.col("doc_id").alias("doc_a"), "bucket"), "bucket")
    b = full_width(banded.select(F.col("doc_id").alias("doc_b"), "bucket"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"))
        .distinct()
    )


def banded_buckets(
    sig: DataFrame, n_hashes: int, bands: int, width: int = 60
) -> DataFrame:
    """(doc_id, bucket) rows: the signature split into ``bands`` bands,
    each band's h-values folded into ONE BIGINT bucket key — band index
    in bits 60+ (so band i never collides with band j, and
    ``bucket >> 60`` recovers the band), hash60 of the '|'-joined
    decimal h-values in the low 60 bits.

    This is the persisted LSH index's bucket column format since r8
    (string -> long; see lsh_index_write): a shuffled/landed bucket row
    is (long, long) instead of a ~70-byte band string. The fold drops
    bits from the band's h-values, so distinct bands can collide in a
    bucket key (~n²/2⁶¹ expected) — a collision only ever ADDS a
    candidate pair, which the verify stage scores; oracles mirror the
    identical band*2^60 + substr(md5(...),1,15) arithmetic. bands must
    stay < 8 for the key to fit in the positive int64 range (3 band
    bits + 60 hash bits).

    width=120: the band fold '|'-joins BOTH decimal words of each
    signature member (a then b, member order unchanged) but the bucket
    key itself stays ONE fold word + band bits — bucket collisions only
    ever ADD candidate pairs, which every consumer verifies downstream,
    so the key-width argument that forces 120-bit SIGNATURES does not
    apply to the bucket (the same reasoning that let the v2 format drop
    68 digest bits at width 60)."""
    _check_width(width)
    if bands >= 8:
        raise ValueError("banded_buckets packs the band id into bits "
                         "60..62 — bands must be < 8")
    rows_per_band = n_hashes // bands

    def _member_cols(i: int) -> list[Column]:
        idx = range(i * rows_per_band, (i + 1) * rows_per_band)
        if width == 120:
            return [
                F.col(f"h{j}_{w}").cast("string")
                for j in idx
                for w in ("a", "b")
            ]
        return [F.col(f"h{j}").cast("string") for j in idx]

    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.lit(i << 60)
                    + hash60(F.concat_ws("|", *_member_cols(i)))
                    for i in range(bands)
                ]
            )
        ).alias("bucket"),
    )


def minhash_signatures(
    ex: DataFrame, n_hashes: int = 8, width: int = 60
) -> DataFrame:
    """Per-document MinHash signature (h0..h{n-1}) from the distinct
    (doc_id, shingle-key) table: the salted md5 family evaluated once
    per DISTINCT key (dictionary join), min per doc — see
    minhash_lsh_candidates for the measured physical-shape rationale.

    Since the r8 narrowing each h is a 60-bit hash60 BIGINT of the
    salted decimal rendering of the shingle key, not a 32-char hex
    string: the signature groupBy — the family's second-heaviest
    shuffle — carries n_hashes longs per row instead of n_hashes hex
    strings (~8x narrower at n_hashes=8). min over int64 is the same
    min-wise scheme (md5 is uniform over the prefix), and the DuckDB
    oracles mirror the identical substr(md5('i:' || key), 1, 15)
    arithmetic, so signatures stay cross-engine exact.

    width=120 (r10, the hash120 consumer path): ``ex`` carries the
    two-word key (s, s2); each family member's salted input renders
    BOTH words ('i:' || s || ':' || s2) and the signature element is
    the two-word hash120 pair, min'd as a struct — exact by the
    two-word ordering lemma (functions/text.py:hash120). Output
    columns are h{i}_a / h{i}_b; the DuckDB mirror min's the 30-char
    hex prefix string and splits it, which the lemma makes equal
    word-for-word. Default 60 keeps the plan byte-identical."""
    _check_width(width)
    # the shingle table's shape must MATCH the requested width: a
    # width-120 ex fed to the 60 path would hash word0 alone (an
    # unverified family); a width-60 ex on the 120 path lacks s2
    has_s2 = "s2" in ex.columns
    if width == 120 and not has_s2:
        raise ValueError(
            "width=120 signatures need a two-word shingle table "
            "(columns s, s2 from _shingle_rows(width=120)); got "
            f"columns {ex.columns}"
        )
    if width == 60 and has_s2:
        raise ValueError(
            "shingle table carries a width-120 two-word key (s, s2) "
            "but width=60 was requested — signatures built from word0 "
            "alone are a different, unverified hash family; pass "
            "width=120 through the whole call chain"
        )
    if width == 120:
        pair_cols = []
        for i in range(n_hashes):
            salted = F.concat(
                F.lit(f"{i}:"),
                F.col("s").cast("string"),
                F.lit(":"),
                F.col("s2").cast("string"),
            )
            w0, w1 = hash120(salted)
            pair_cols.append(
                F.struct(w0.alias("a"), w1.alias("b")).alias(f"p{i}")
            )
        vocab = ex.select("s", "s2").distinct().select("s", "s2", *pair_cols)
        return (
            ex.join(vocab.hint("shuffle_hash"), ["s", "s2"])
            .groupBy("doc_id")
            .agg(*[F.min(f"p{i}").alias(f"p{i}") for i in range(n_hashes)])
            .select(
                "doc_id",
                *[
                    c
                    for i in range(n_hashes)
                    for c in (
                        F.col(f"p{i}.a").alias(f"h{i}_a"),
                        F.col(f"p{i}.b").alias(f"h{i}_b"),
                    )
                ],
            )
        )
    hash_cols = [
        hash60(F.concat(F.lit(f"{i}:"), F.col("s").cast("string"))).alias(
            f"h{i}"
        )
        for i in range(n_hashes)
    ]
    vocab = ex.select("s").distinct().select("s", *hash_cols)
    # shuffle_hash, both for scale and for planner sanity: the vocab
    # (distinct shingles) grows with the corpus — on 100 TB it is
    # billions of keys and must NEVER be broadcast, so the dictionary
    # join is a shuffle join on s by design. And without the hint the
    # planner actually broadcast the WRONG side here after the r8
    # narrowing: the checkpointed shingle table's accurate 40 MB stats
    # beat the vocab's (over)estimated distinct size, and building a
    # 2.5M-row HashedRelation in the busy 1 GB driver failed
    # ("Not enough memory to build and broadcast", sf1).
    return (
        ex.join(vocab.hint("shuffle_hash"), "s")
        .groupBy("doc_id")
        .agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)])
    )


def minhash_estimate(
    docs: DataFrame,
    n: int = 2,
    n_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """MinHash calibration: for every LSH candidate pair, the
    signature-agreement Jaccard ESTIMATE (n_match / n_hashes) next to
    the EXACT Jaccard — the table a 100 TB user reads to decide whether
    n_hashes/bands are tight enough to skip exact verification (the
    estimator's error bound is what the two-stage pipeline's verify
    stage insures against). Same shape as ann_recall for the ANN paths.

    Returns (doc_a, doc_b, n_match, est_jaccard, jaccard, abs_err) per
    candidate pair. Everything is exact: n_match is an integer, both
    ratios are single IEEE divisions, so the oracle hash-matches.

    Scale shape: candidates come from the banded equi-join (bounded
    fan-out); signatures re-attach by doc id; the exact side re-uses the
    one materialized shingle table. Work scales with candidate count —
    never N²."""
    ex = shingle_rows_materialized(docs, n)
    # materialized once: this query reads the signatures FOUR times
    # (both candidate-join sides + the a/b attach below) — inline, the
    # md5 family + min-groupBy shuffle ran per read (measured r5:
    # 4.3 s -> ~2.4 s warm at sf0.1 with the memo)
    sig = _memo_checkpoint(
        docs,
        ("minhash_sig", n, n_hashes),
        lambda: minhash_signatures(ex, n_hashes),
    )
    cand = minhash_lsh_candidates(
        docs, n=n, n_hashes=n_hashes, bands=bands, shingle_rows=ex, sig=sig
    )
    siga = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a_h{i}") for i in range(n_hashes)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b_h{i}") for i in range(n_hashes)],
    )
    n_match = sum(
        F.when(F.col(f"a_h{i}") == F.col(f"b_h{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    sh = ex.groupBy("doc_id").agg(F.collect_list("s").alias("sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    est = F.col("n_match").cast("double") / F.lit(float(n_hashes))
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .withColumn("n_match", n_match.cast("long"))
        .join(sha, "doc_a")
        .join(shb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            est.alias("est_jaccard"),
            jac.alias("jaccard"),
            F.abs(est - jac).alias("abs_err"),
        )
    )


def neardup_pipeline(
    docs: DataFrame,
    n: int = 2,
    n_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """The production two-stage near-dup shape: MinHash+LSH generates
    candidate pairs (cheap, recall-tuned by bands), exact Jaccard
    verifies ONLY the candidates (array_intersect per candidate pair —
    work scales with candidate count, never with N²). This is the
    composition a 100 TB dedup actually runs; ngram_jaccard_pairs is the
    exact-everything baseline it's measured against.

    Returns (doc_a, doc_b, jaccard) for verified pairs.

    The materialized shingle table is computed ONCE and shared by the
    candidate stage and both verify sides — re-shingling per stage would
    run the explode+distinct shuffle three times (it did; measured in
    BENCH_r01's 9.6 s). The verified pair table itself is memoized per
    session too: both clustering engines and the pipeline query consume
    the SAME upstream (identical source + parameters), and re-running
    candidates + verify per consumer is the same waste the shingle memo
    removes one level down."""

    def build() -> DataFrame:
        ex = shingle_rows_materialized(docs, n)
        cand = minhash_lsh_candidates(
            docs, n=n, n_hashes=n_hashes, bands=bands, shingle_rows=ex
        )
        # ex is already distinct per (doc_id, shingle): collect_list
        # gives exactly the per-doc distinct shingle set (order
        # irrelevant to array_intersect/size below).
        sh = ex.groupBy("doc_id").agg(F.collect_list("s").alias("sh"))
        a = sh.select(
            F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
        )
        b = sh.select(
            F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return (
            cand.join(a, "doc_a")
            .join(b, "doc_b")
            .withColumn(
                "jaccard", inter.cast("double") / union.cast("double")
            )
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )

    return _memo_checkpoint(
        docs, ("neardup", n, n_hashes, bands, threshold), build
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 2,
    n_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
    probe_small_max: int | None = None,
    probe_df_max: int | None = None,
) -> DataFrame:
    """One-sided shingle-set CONTAINMENT over the MinHash-LSH candidate
    pairs — the truncation/subset duplicate class that symmetric
    Jaccard systematically under-scores (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022, discusses
    substring-contained duplicates; Broder's original resemblance
    paper defines containment alongside resemblance — both public).

    For a pair (A, B): containment(A in B) = |A∩B| / |A|. A 100-token
    document fully embedded in a 10k-token page has containment 1.0
    but Jaccard ≈ 0.01, so a Jaccard-thresholded pipeline never flags
    it; a training-data pipeline wants it flagged (the small doc adds
    no new tokens). ``cont_max`` below is the larger of the two
    one-sided containments = n_inter / min(|A|, |B|) — the smaller
    side's coverage.

    Candidate generation is SHARED with neardup_pipeline (same banded
    LSH at the same parameters, same memoized shingle table), so the
    verify stage's work scales with candidate count, never N².

    Recall at extreme size ratios (r7 VERDICT item 3): MinHash band
    collision probability tracks JACCARD, so the exact pair this
    operator advertises — a 100-token doc inside a 10k-token page,
    Jaccard ~0.01 — essentially never reaches LSH candidacy. The
    ``probe_small_max`` path closes that hole EXACTLY for the class
    that causes it: docs with at most that many shingles additionally
    probe the full inverted shingle index (one equi-join of the small
    side's shingle rows against the shingle table — any pair sharing
    even one shingle is scored, so every small-side
    containment pair with n_inter >= 1 is found, recall 1.0 by
    construction for |A| <= probe_small_max; the one-sided stratify
    is sound because cont_max's min() side IS the small doc). Extra
    work is bounded by (small-doc shingle rows) x (per-shingle
    document frequency) — the size-stratified budget a dedicated
    containment search would spend. ``probe_df_max`` (r9, executable
    form of the df-cap note) bounds that fan-out on
    boilerplate-dominated corpora LOSSLESSLY: probe shingles past the
    mandatory first miss+1 are kept only while their document
    frequency is <= the cap (rarest-first order means the dropped
    ones are exactly the hottest), and the count filter's demand
    shrinks in step (see the plen accounting in the code). Worst case
    — a small doc whose every shingle is hot — still probes its
    miss+1 rarest, the pigeonhole minimum, so the fan-out bound drops
    from (2*miss+1)*df_hot to (miss+1)*df_hot with recall untouched.
    Pairs where BOTH
    sides exceed probe_small_max have bounded size ratio
    (min/max >= small_max/corpus_max is not guaranteed, but their
    Jaccard >= threshold*min/max stays in LSH range for moderate
    ratios) and keep the LSH-candidacy caveat — stated, not hidden.
    Default None preserves the r7 LSH-only behavior.

    Measured decade-2 shape (capped local[8], 1 GB, DISK_ONLY memo,
    shared shingle/signature memo builds itemized out): sf1 ~18 s ->
    sf10 ~150 s, 27,827 rows — exponent ~0.9, i.e. candidates track
    N when the
    vocabulary grows with the corpus (the scale synthetic's
    per-copy-suffixed tokens; a FIXED tiny vocabulary degrades
    toward quadratic, which is what the cascade bounds). Not in the
    tier-2 verify cohort only because the DuckDB side of its oracle
    needs ~tens of minutes at sf10 — values are pinned exact at sf1
    (4,799 rows) and sf0.01 under the driver hash.

    Returns (doc_a, doc_b, n_inter, n_a, n_b, cont_max) for candidate
    pairs with cont_max >= threshold; integer counts plus one IEEE
    division, so the DuckDB oracle hash-matches exactly."""
    from .skew import full_width

    ex = shingle_rows_materialized(docs, n)
    # identical memo tag + builder as minhash_estimate: within a
    # session the signature table is built once and shared (measured:
    # the inline-signature variant ran 4.4 s warm at sf0.1 vs ~2 s with
    # the shared memo — the same r5 lesson that memoized it there)
    sig = _memo_checkpoint(
        docs,
        ("minhash_sig", n, n_hashes),
        lambda: minhash_signatures(ex, n_hashes),
    )
    cand = minhash_lsh_candidates(
        docs, n=n, n_hashes=n_hashes, bands=bands, shingle_rows=ex, sig=sig
    )
    if probe_small_max is not None:
        # Exact small-side probe as a PPJoin-style lossless filter
        # cascade (Bayardo et al. WWW'07 / Xiao et al.'s prefix and
        # count filters, adapted to one-sided containment) — the naive
        # inverted-index self-join is a measured 1 GB-heap killer on a
        # boilerplate-dominated corpus (sf1 synthetic: 9,310 distinct
        # shingles over 50k docs, avg df ~275 -> 171M probe-join rows,
        # killed two fresh JVMs in a row; the cascade measured ~37M
        # narrow rows -> ~0.5M candidates vs 1,250 true pairs).
        #
        # For a pair to pass cont_max >= t with small side A
        # (|A| <= probe_small_max <= |B|), B may MISS at most
        # miss = |A| - ceil(t*|A|) of A's shingles. Pigeonhole, in its
        # general form (r9, the r8 ADVICE bound): among ANY fixed
        # subset of plen of A's shingles, B matches at least
        # plen - miss — so probing A's plen globally RAREST shingles
        # (df asc, key asc — rarity order is engine-internal, the
        # oracle never sees it) and demanding m >= plen - miss is
        # lossless for every plen >= miss + 1 (the minimum that
        # guarantees a true pair shares >= 1 probed shingle and thus
        # APPEARS in the join at all; miss + 1 <= |A| always, since
        # ceil(t*|A|) >= 1 for t > 0). plen = 2*miss + 1 is the
        # default width — it maximizes the count filter's selectivity
        # (demand miss + 1 matches) — TRUNCATED to what actually
        # exists or survives the df cap: min(2*miss+1, |A|) without a
        # cap (|A| < 2*miss+1 exactly when t <= 0.5 — the regime the
        # r8 fixed miss+1 demand silently over-filtered), minus any
        # beyond-the-mandatory-miss+1 shingles hotter than
        # probe_df_max with one. The demand shrinks in step with the
        # kept count, so both filters still only ever DROP pairs that
        # provably fail the final threshold — the result set (and
        # thus the committed oracle, which states the unfiltered
        # formulation) is IDENTICAL; the 1e-9 ceil slack is
        # one-directionally safe (it can only shrink miss's
        # subtrahend, i.e. ADD candidates).
        if threshold <= 0:
            raise ValueError(
                "probe_small_max requires threshold > 0: at t <= 0 a "
                "qualifying pair may share no shingle at all, which no "
                "inverted-index probe can find"
            )
        sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        miss = (
            F.col("n_sh")
            - F.ceil(F.lit(float(threshold)) * F.col("n_sh") - F.lit(1e-9))
        ).cast("long")
        wrk = Window.partitionBy("doc_id").orderBy("df", "s")
        keep = F.col("rk") <= 2 * F.col("miss") + 1
        if probe_df_max is not None:
            keep = keep & (
                (F.col("rk") <= F.col("miss") + 1)
                | (F.col("df") <= F.lit(int(probe_df_max)))
            )
        # plen: the per-doc KEPT probe width — a second window over the
        # same partitioning (no extra shuffle), counted after the keep
        # filter so the count demand below matches what was probed
        wcnt = Window.partitionBy("doc_id")
        ranked = (
            ex.join(
                sizes.filter(F.col("n_sh") <= probe_small_max), "doc_id"
            )
            .join(dfreq, "s")
            .withColumn("miss", miss)
            .withColumn("rk", F.row_number().over(wrk))
            .filter(keep)
            .withColumn("plen", F.count(F.lit(1)).over(wcnt))
            .select(F.col("doc_id").alias("doc_s"), "s", "miss", "plen")
        )
        # the probe join still EXPANDS (rare shingles fan out less,
        # but fan out) — full reducer width on both sides, like every
        # expanding join in this module; the count filter then runs
        # on three-long rows before anything wide exists.
        pa = full_width(ranked, "s")
        pb = full_width(ex.select(F.col("doc_id").alias("doc_o"), "s"), "s")
        joined = (
            # shuffle_hash: the full shingle table is NOT broadcastable
            # (2.5M-row HashedRelation build died in the 1 GB driver at
            # sf1 even though its on-wire stats look small)
            pa.join(pb.hint("shuffle_hash"), "s")
            .filter(F.col("doc_s") != F.col("doc_o"))
        )
        probe = (
            # the count-filter's hash-aggregate STATE is one entry per
            # directed pair sharing a probed shingle (~270M at the sf10
            # tier) — widened 8x over shuffle.partitions so the
            # per-task map fits an executor share (full_width's factor
            # docstring has the measured OOM boundary)
            full_width(joined, "doc_s", "doc_o", factor=8)
            .groupBy("doc_s", "doc_o")
            .agg(
                F.count(F.lit(1)).alias("m"),
                F.max("miss").alias("miss"),
                F.max("plen").alias("plen"),
            )
            # the universally tight pigeonhole demand: B matched m of
            # the plen probed, so it missed >= plen - m of them; a
            # qualifying pair misses <= miss total. Equals the r8
            # miss+1 demand exactly when the full 2*miss+1 prefix
            # exists (t > 0.5, no df cap) — and stays lossless when it
            # doesn't.
            .filter(F.col("m") >= F.col("plen") - F.col("miss"))
            .select(
                F.least("doc_s", "doc_o").alias("doc_a"),
                F.greatest("doc_s", "doc_o").alias("doc_b"),
            )
        )
        cand = cand.unionByName(probe).distinct()
    sh = ex.groupBy("doc_id").agg(F.collect_list("s").alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    n_a = F.size("sh_a").cast("long")
    n_b = F.size("sh_b").cast("long")
    cont = F.col("n_inter").cast("double") / F.least(
        F.col("n_a"), F.col("n_b")
    ).cast("double")
    # shuffle_hash on the array attaches: with the probe path the
    # candidate table reaches ~0.5M pairs, and letting AQE broadcast
    # either it or the collect_list table dies in the driver-side
    # HashedRelation build ("not enough memory to build and
    # broadcast", measured at sf1 in the 1 GB harness) — the arrays'
    # JVM-object broadcast footprint is several times their on-wire
    # size. A shuffled hash join streams both sides.
    return (
        cand.join(a.hint("shuffle_hash"), "doc_a")
        .join(b.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_inter.alias("n_inter"),
            n_a.alias("n_a"),
            n_b.alias("n_b"),
        )
        .withColumn("cont_max", cont)
        .filter(F.col("cont_max") >= threshold)
    )


def _span_occurrences(
    docs: DataFrame, span_tokens: int, width: int = 60
) -> DataFrame:
    """Positional rolling-window occurrence stream — one row per
    (doc_id, pos, s) where ``s`` is a 60-bit md5-prefix key of the
    '_'-joined ``span_tokens``-token window starting at 0-based token
    index ``pos``. Memoized once per (source, span_tokens) and shared
    by ``span_dedup`` (which projects pos away) and ``scrub_spans``
    (which needs it): sharing means one explode pass instead of two
    when both operators run in a session.

    Why a hashed key and not the raw window string: every downstream
    consumer only ever tests span EQUALITY (the shared-span dictionary
    groupBy and the semi-join probe), and the raw ~50-byte string is
    what the two heaviest shuffles carry. Hashing to one BIGINT cuts
    occurrence-row width ~3x; measured at the sf10 capped tier
    (local[8], 1 GB, DISK_ONLY memo) scrub_spans went 40.2 s -> 22.6 s
    (isolated A/B 20.9 s) and its decade-2 exponent from 1.19 to 0.64
    (span_dedup 0.81 -> 0.72), recorded probe in BENCH_SCALE.json.
    Collision math: 15
    hex chars = 60 bits; at the sf10 tier's ~45M distinct spans the
    expected collision count is n^2/2^61 ~ 1e-3 — and a collision
    only ever marks a unique span as shared (conservative for
    scrubbing). At a true 100 TB span count (~1e12) this prefix WOULD
    collide (~2e5 expected); widen to two 60-bit prefix columns
    before that point — the ``width`` knob (r10, executable: width=120
    emits (doc_id, pos, s, s2) with both hash120 words, span_dedup
    threads it through its groupBy/semi-join keys, and the 120-bit
    span path is pinned against DuckDB in tests/test_hash60.py;
    functions/text.py:hash120 holds the full cross-engine contract +
    two-word ordering lemma). Default 60 keeps every expression — and
    every pinned plan — byte-identical. The DuckDB oracles mirror the
    identical substr(md5(...), 1, 15) (and 16, 15) arithmetic, so the
    driver hash stays exact at either width.

    NULL text coalesces to '' before tokenization (r9, closing the r7
    ADVICE divergence): '' splits to [''] — one token, zero windows —
    identically on both engines, so the PERMISSIVE JSONL ingest path's
    NULL rows flow through the whole span family instead of tripping a
    documented precondition. The oracles coalesce in the same place."""
    _check_width(width)
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    exploded = lambda: docs.select(  # noqa: E731 - tiny plan thunk
        "doc_id",
        F.posexplode(shingles(toks, span_tokens)).alias("pos", "sraw"),
    )
    if width == 120:
        def build120() -> DataFrame:
            w0, w1 = hash120("sraw")
            return exploded().select(
                "doc_id", "pos", w0.alias("s"), w1.alias("s2")
            )

        return _memo_checkpoint(docs, ("spanpos120", span_tokens), build120)
    return _memo_checkpoint(
        docs,
        ("spanpos60", span_tokens),
        lambda: exploded().select("doc_id", "pos", hash60("sraw").alias("s")),
    )


def span_dedup(
    docs: DataFrame, span_tokens: int = 8, width: int = 60
) -> DataFrame:
    """Cross-document span-level duplication (the memorization-risk
    metric): for every rolling ``span_tokens``-token window, find spans
    that appear in MORE THAN ONE document, and report per document how
    much of it is such shared text —
    (doc_id, n_spans, n_dup_spans, dup_ratio).

    This is sub-document dedup in the sense of Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better": exact
    doc-level dedup misses boilerplate spans pasted across otherwise
    distinct pages. Their suffix-array approach is inherently
    single-machine; the Spark-scale shape is the same rolling-window
    explode the n-gram Jaccard path uses (functions/text.py:shingles),
    with the span dictionary built by ONE map-side-combining groupBy:

    - occurrences: one row per (doc, window position) — explode, narrow.
    - shared spans: groupBy(span) keeping count(distinct doc) >= 2; at
      web scale this dictionary is frequency-bounded exactly like the
      Jaccard vocabulary (hot boilerplate is rare relative to the
      occurrence stream).
    - per-doc stats: semi-join occurrences against the shared-span set,
      one groupBy(doc_id). Both joins are bounded-fanout equi-joins —
      no pair space ever forms, so this survives 100 TB where the
      pairwise operators need candidate pruning.

    A document consisting entirely of spans seen elsewhere has
    dup_ratio 1.0 — the "drop or strip" signal."""
    # the occurrence stream feeds BOTH the shared-span dictionary and
    # the semi-join probe; inline, the rolling-window explode (an
    # 8-token string concat per position over every document) ran
    # twice — materialized once it's the usual halving (measured r5:
    # 3.2 s -> ~1.9 s warm at sf0.1, build charged to memo:spanpos60,
    # shared with scrub_spans since r7)
    _check_width(width)
    key = ["s"] if width == 60 else ["s", "s2"]
    occ = _span_occurrences(docs, span_tokens, width).select("doc_id", *key)
    shared = (
        occ.groupBy(*key)
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select(*key)
    )
    # shuffle_hash on the dictionary side: past the broadcast threshold
    # Spark's default is a sort-merge semi join, which SORTS the whole
    # occurrence stream by span key — the dictionary is the build side
    # at every scale (same lesson as the r6 SimHash vocab broadcast,
    # one durability grade down: too big to broadcast, small enough to
    # hash per partition)
    per_doc = (
        occ.join(shared.hint("shuffle_hash"), key, "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_spans"))
    )
    # coalesce mirrors _span_occurrences (and the oracle): NULL text
    # counts 1 token / 0 spans on both engines, not an engine-dependent
    # greatest(NULL, 0)
    totals = docs.select(
        "doc_id",
        F.greatest(
            F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
            - (span_tokens - 1),
            F.lit(0),
        )
        .cast("long")
        .alias("n_spans"),
    )
    return totals.join(per_doc, "doc_id", "left").select(
        F.col("doc_id").cast("long"),
        "n_spans",
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.when(
            F.col("n_spans") > 0,
            F.coalesce("n_dup_spans", F.lit(0)).cast("double")
            / F.col("n_spans").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )


def scrub_spans(docs: DataFrame, span_tokens: int = 8) -> DataFrame:
    """Duplicate-span REMOVAL — the transform half of Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better":
    ``span_dedup`` only *reports* how much of a document is cross-
    document boilerplate; this operator actually cuts it out. Every
    rolling ``span_tokens``-token window that appears in more than one
    document is a duplicate hit; per document, overlapping/adjacent hit
    windows are merged into MAXIMAL token ranges, those ranges are
    removed, and the scrubbed text survives. Returns
    (doc_id, n_tokens, n_ranges, n_removed, kept_md5) — kept_md5 is
    the md5 of the space-rejoined surviving tokens (md5('') for a
    fully-boilerplate document), so the driver hash pins the exact
    scrubbed text without shipping it.

    Range-merge rule: a hit at pos covers tokens [pos, pos+k-1]; the
    next hit starts a NEW range only when its start is more than k
    past the previous hit (pos - prev > k), i.e. at least one token
    between the ranges survives. Equal-to-k gaps produce touching
    ranges and are merged — ranges are therefore disjoint and maximal,
    and n_removed = Σ(b - a + 1) counts each dropped token once.

    Scale shape (100 TB): the occurrence stream is the shared
    ``_span_occurrences`` memo (explode once, narrow rows); the shared-
    span dictionary is one map-side-combining groupBy exactly like
    span_dedup's; hit positions come back through a left_semi equi-join
    (no pair space). The ONLY window function is partitioned BY
    DOCUMENT and ordered by pos — state bounded by a single document's
    hit count, never a global sort. Per-doc ranges return to the text
    row as one collected array (bounded by n_tokens/k, in practice the
    handful of boilerplate blocks), and the final token filter is a
    row-local HOF: O(n_tokens x n_ranges) in the interpreter per
    document, the cheap alternative to a per-token anti range-join
    whose shuffle would carry every token of the corpus.

    NULL text (r9, the deferred r7 ADVICE fix): coalesced to '' before
    tokenization, exactly where the SQL oracle coalesces — a NULL-text
    row from the PERMISSIVE JSONL ingest path emits (n_tokens=1,
    n_ranges=0, n_removed=0, kept_md5=md5('')) identically on both
    engines ('' splits to the single empty token on Spark and DuckDB
    alike), instead of the NULL kept_md5 the two engines used to render
    differently."""
    from pyspark.sql.window import Window

    k = span_tokens
    text_nn = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(text_nn, " ")
    occ = _span_occurrences(docs, k)
    shared = (
        occ.groupBy("s")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("s")
    )
    # both hints below force shuffle-hash builds over the default
    # sort-merge: without them the sf10 capped probe sorted the 45M-row
    # occurrence stream by span key AND the full text corpus by doc_id.
    # Measured there (A/B/C, identical digests): raw-string key
    # unhinted 40.2 s -> raw-string hinted 33.7 s -> hashed key +
    # hints 20.9 s. The build sides — the shared-span dictionary and
    # the per-doc ranges — are the small sides at every scale but need
    # not fit a broadcast.
    hits = occ.join(shared.hint("shuffle_hash"), "s", "left_semi").select(
        "doc_id", "pos"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    is_new = F.coalesce(
        (F.col("pos") - F.lag("pos").over(w) > k).cast("int"), F.lit(1)
    )
    seg = hits.select("doc_id", "pos", F.sum(is_new).over(w).alias("seg_id"))
    ranges = seg.groupBy("doc_id", "seg_id").agg(
        F.min("pos").alias("a"), (F.max("pos") + (k - 1)).alias("b")
    )
    rpd = ranges.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranges"),
        F.sum(F.col("b") - F.col("a") + 1).cast("long").alias("n_removed"),
        F.sort_array(F.collect_list(F.struct("a", "b"))).alias("rs"),
    )
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("rs"), lambda r: (i >= r["a"]) & (i <= r["b"])
        ),
    )
    return docs.join(rpd.hint("shuffle_hash"), "doc_id", "left").select(
        F.col("doc_id").cast("long"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.coalesce("n_ranges", F.lit(0)).cast("long").alias("n_ranges"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        F.md5(
            F.when(F.col("rs").isNull(), text_nn).otherwise(
                F.concat_ws(" ", kept)
            )
        ).alias("kept_md5"),
    )


def delta_dedup(
    corpus: DataFrame, batch: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Incremental ingest dedup: which documents of an incoming batch
    are exact-text duplicates of the EXISTING corpus (content hash anti
    semantics), the decision every periodic crawl append runs before
    landing. Returns (doc_id, is_dup) for the batch.

    Shape: both sides reduce to (md5(text)) before the join — the
    corpus side as a distinct hash set (at 100 TB this lives as a
    bucketed hash table landed once, not recomputed; the plan is the
    same equi-join either way), the batch side joins against it
    left_semi-style via a left join on the hash. No text ever crosses
    the shuffle — only 32-byte hashes."""
    ch = corpus.select(F.md5("text").alias("h")).distinct()
    return (
        batch.select(id_col, F.md5("text").alias("h"))
        .join(ch.withColumn("_hit", F.lit(1)), "h", "left")
        .select(
            F.col(id_col).cast("long"),
            F.col("_hit").isNotNull().alias("is_dup"),
        )
    )


# v3 sidecar name: leading underscore makes Spark/parquet readers skip
# it, and it travels with the directory through os-level swaps.
_LSH_FORMAT_SIDECAR = "_lsh_format.json"


def _write_index_format(path: str, width: int, n: int, n_hashes: int,
                        bands: int) -> None:
    """Land the v3 format sidecar for a width-120 index. Width-60
    directories stay sidecar-less BY DESIGN: absence == v2/width-60,
    which keeps every pre-r12 index (and the pinned fixtures) valid
    and byte-identical on disk."""
    import json
    import os

    if width == 60:
        return
    payload = {
        "format": 3,
        "width": width,
        "n": n,
        "n_hashes": n_hashes,
        "bands": bands,
    }
    with open(os.path.join(path, _LSH_FORMAT_SIDECAR), "w") as f:
        json.dump(payload, f)


def lsh_index_format(path: str) -> dict:
    """Read an index directory's format descriptor: the v3 sidecar if
    present, else the implicit v2/width-60 contract (every index
    written before r12, and every width-60 index since)."""
    import json
    import os

    sidecar = os.path.join(path, _LSH_FORMAT_SIDECAR)
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return {"format": 2, "width": 60}


def _check_index_width(path: str, width: int, op: str) -> None:
    """Refuse cross-family index operations: a width-120 probe/append
    against a v2 directory (or vice versa) joins buckets from two
    DIFFERENT hash families — it would silently match nothing (or
    wrong rows), the v1-vs-v2 failure mode the lsh_index_write
    docstring warns about, now mechanical."""
    have = int(lsh_index_format(path).get("width", 60))
    if have != width:
        raise ValueError(
            f"{op}: index at {path} is width-{have} "
            f"(format v{lsh_index_format(path).get('format', 2)}), but "
            f"width={width} was requested — buckets from different "
            "hash families never match; rebuild with lsh_index_write "
            "at the desired width"
        )


def lsh_index_write(
    corpus: DataFrame,
    path: str,
    n: int = 2,
    n_hashes: int = 8,
    bands: int = 4,
    width: int = 60,
) -> None:
    """Persist the corpus's LSH bucket index as parquet (bucket,
    doc_id): the standing near-dup index a growing corpus maintains so
    each incoming batch probes buckets instead of re-scanning the
    corpus. Written sorted within partitions on bucket for row-group
    skipping on the probe side.

    On-disk FORMAT (v2, r8): ``bucket`` is a BIGINT — band id in bits
    60..62, hash60 of the band's '|'-joined decimal h-values in bits
    0..59 (banded_buckets docstring) — and ``doc_id`` a BIGINT; the
    index is O(corpus x bands) rows of two longs. Until r7 the column
    was the '|'-joined band STRING; v1 directories cannot be probed by
    v2 code (the bucket equi-join would silently match nothing) —
    rebuild with lsh_index_write, as the session-scoped driver
    fixtures do automatically. Probes, appends, and compaction all
    carry the same column, so the format changes atomically with this
    module.

    FORMAT v3 (r12, the width knob the hash60 docstring commits to
    past ~1e10 distinct shingle keys): width=120 keeps the SAME
    (bucket BIGINT, doc_id BIGINT) schema — the bucket key is still
    band bits + one fold word, banded_buckets' collision argument —
    but the hash FAMILY underneath is the two-word hash120 signature
    chain, so v2 and v3 rows must never meet in one probe. A
    ``_lsh_format.json`` sidecar (ignored by parquet readers,
    preserved through the crash-safe swaps) marks v3 directories;
    absence == v2/width-60, keeping every existing index valid.
    lsh_index_append / delta_neardup refuse a width mismatch
    mechanically (_check_index_width); delete/compact are
    family-agnostic row operations and work on either."""
    _check_width(width)
    # distinct=False: the signature min is duplicate-insensitive, so
    # the (doc_id, key) distinct — the only corpus-sized exchange on
    # the index-write path — is pure cost here (identical buckets;
    # measured r13-opt: one full exchange removed, see
    # OPTIMIZATION_r13.md)
    ex = _shingle_rows(corpus, n, width, distinct=False)
    banded = banded_buckets(
        minhash_signatures(ex, n_hashes, width), n_hashes, bands, width
    )
    (
        banded.repartition(F.col("bucket"))
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .parquet(path)
    )
    _write_index_format(path, width, n, n_hashes, bands)


def lsh_index_append(
    batch: DataFrame,
    path: str,
    n: int = 2,
    n_hashes: int = 8,
    bands: int = 4,
    width: int = 60,
) -> None:
    """Index maintenance for a GROWING corpus (round-5 VERDICT item 4):
    append an accepted ingest batch's LSH buckets into an existing
    ``lsh_index_write`` layout, so the standing index tracks the corpus
    without a full rebuild per ingest cycle. Parquet append with the
    same per-file discipline as the initial write (repartition on
    bucket + sortWithinPartitions for row-group skipping on probes) —
    each append lands new sorted files beside the old ones; probes read
    the union. Parameters (shingle width, hash count, bands) must match
    the index being appended to — a mismatched append would land
    buckets no probe can hit; ``lsh_index_compact`` rewrites the
    directory back into one aligned file set between ingest cycles,
    keeping the file count bounded under continuous appends.

    The production loop this completes: lsh_index_write(corpus) once,
    then per ingest cycle (1) delta_neardup(batch) probes the index,
    (2) accepted survivors append to the corpus, (3) lsh_index_append
    indexes exactly those survivors. Work per cycle is
    O(batch x bands), never O(corpus).

    ``width`` must match the directory's format (the v3 sidecar /
    implicit v2 — lsh_index_write docstring): a cross-family append
    would land buckets no probe can hit, so the mismatch raises."""
    _check_width(width)
    import os

    if os.path.isdir(path):
        _check_index_width(path, width, "lsh_index_append")
    # distinct=False: same duplicate-insensitive signature argument as
    # lsh_index_write
    ex = _shingle_rows(batch, n, width, distinct=False)
    banded = banded_buckets(
        minhash_signatures(ex, n_hashes, width), n_hashes, bands, width
    )
    (
        banded.repartition(F.col("bucket"))
        .sortWithinPartitions("bucket")
        .write.mode("append")
        .parquet(path)
    )
    # an append that CREATED the directory (fresh path) must land the
    # v3 marker too, or the new width-120 index reads as v2 and every
    # later width-120 operation refuses it (self-review r12)
    if width != 60 and not os.path.exists(
        os.path.join(path, _LSH_FORMAT_SIDECAR)
    ):
        _write_index_format(path, width, n, n_hashes, bands)


def lsh_index_compact(spark, path: str) -> None:
    """Index maintenance, part 2: rewrite an appended-to
    ``lsh_index_write`` directory back into the canonical layout.
    Continuous ingest leaves one sorted file set per append
    (lsh_index_append) — probes read the union correctly, but the file
    count grows per cycle and per-file bucket ranges overlap, eroding
    the row-group skipping the initial write bought. Compaction reads
    the whole index once, re-partitions on bucket, and lands a single
    aligned, sorted file set — the same move compact_corpus makes for
    corpus shards (sources/corpus.py).

    The rewrite goes through a sibling directory and a filesystem swap
    (Spark cannot overwrite a path it is reading), so ``path`` must be
    on a filesystem the driver can rename on — same assumption as the
    op-8 raster sink. Run it between ingest cycles, never concurrently
    with a probe: a probe planned against the pre-swap listing would
    read files the swap removes. delta_neardup's candidate memo keys
    on the concrete file listing, so the first probe after compaction
    misses and rebuilds instead of serving stale candidates.

    Crash safety (round-5 ADVICE): the index is restorable at every
    step. The live set stays at ``path`` until the full compacted set
    exists at ``__compacting``; the swap parks it at ``__old``, which
    is deleted only after the new set is in place. A run that died
    mid-swap leaves either (a) ``__old`` holding the live index with
    ``path`` absent — recovered at the next entry by moving it back —
    or (b) both ``path`` (new set) and ``__old`` (pre-compact set),
    where ``path`` is already correct and ``__old`` is stale. Stale
    sibling dirs from crashed runs are pre-removed so shutil.move
    renames instead of nesting the index inside a leftover target.
    (r11: the swap machinery is factored into _sibling_swap_rewrite,
    shared with lsh_index_delete — identical semantics.)"""
    _sibling_swap_rewrite(spark, path, lambda idx: idx)


def _sibling_swap_rewrite(spark, path: str, transform, key_col: str = "bucket") -> None:
    """Rewrite a parquet index directory in place through the
    crash-safe sibling swap (full story in lsh_index_compact's
    docstring — this is its machinery, factored in r11 so
    lsh_index_delete shares it instead of duplicating the recovery
    rules): read ``path``, apply ``transform`` (a DataFrame ->
    DataFrame function; identity = pure compaction), land the result
    repartitioned+sorted on ``key_col`` at ``__compacting``, park the
    live set at ``__old``, move the new set in, delete the park. The
    v3 format sidecar (r12) is copied onto the new set BEFORE the
    swap, so a width-120 index keeps its family marker through
    compaction and deletion (both are family-agnostic row
    operations); the copy is a no-op for sidecar-less v2 directories.
    ``key_col`` (r13) lets the persisted ANN index
    (operators/ann_index.py) share the machinery with its codes table
    sorted on ``cell``; the default keeps every LSH plan unchanged."""
    import os
    import shutil

    from pyspark.sql import functions as _F

    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__old"
    if os.path.isdir(old) and not os.path.isdir(path):
        # a prior run died between the two swap moves: __old holds the
        # live index — restore it before rewriting
        shutil.move(old, path)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    (
        transform(spark.read.parquet(path))
        .repartition(_F.col(key_col))
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    sidecar = os.path.join(path, _LSH_FORMAT_SIDECAR)
    if os.path.exists(sidecar):
        shutil.copy2(sidecar, os.path.join(tmp, _LSH_FORMAT_SIDECAR))
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)


def lsh_index_delete(
    spark,
    path: str,
    tombstones,
    id_col: str = "doc_id",
) -> None:
    """Index maintenance part 4 — the DELETE half of the corpus
    takedown lifecycle (r10 VERDICT item 4): remove every index row
    whose ``doc_id`` is in ``tombstones`` (a DataFrame of ids, small
    by construction — takedown batches), so probes stop matching
    documents that sources/corpus.py:delete_from_corpus removed.
    Without this, the persisted index keeps serving GHOST pairs: a
    re-ingested copy of a deleted document would be suppressed as a
    near-dup of data the corpus no longer contains — the exact
    failure a GDPR erasure audit looks for.

    The rewrite rides the same crash-safe sibling swap as
    lsh_index_compact (shared _sibling_swap_rewrite; same recovery
    rules, same "never concurrent with a probe" operational note) and
    re-lands the survivors sorted on bucket, so a delete doubles as a
    compaction — one full-index scan + one bounded shuffle, the same
    cost class as the compaction the maintenance window already pays.
    The anti-join broadcasts the tombstone set; work is O(index), and
    the index is O(corpus × bands) rows of two BIGINTs.

    Run it in the same maintenance window as the corpus delete:
    delta_neardup's candidate memo keys on the concrete file listing,
    so the first probe after the swap rebuilds instead of serving
    stale candidates."""
    from pyspark.sql import functions as _F

    ids = tombstones.select(_F.col(id_col).alias("doc_id")).distinct()
    _sibling_swap_rewrite(
        spark,
        path,
        lambda idx: idx.join(_F.broadcast(ids), "doc_id", "left_anti"),
    )


def delta_neardup(
    corpus: DataFrame,
    batch: DataFrame,
    index: DataFrame,
    n: int = 2,
    n_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.3,
    width: int = 60,
) -> DataFrame:
    """Incremental NEAR-dup: which documents of an incoming batch are
    near-duplicates of the existing corpus, probed through the
    PERSISTED LSH index (``index`` = a read of lsh_index_write's
    output) and exact-verified on the candidates only. This is the
    production shape for a continuously-growing corpus: per batch, work
    scales with batch size x bucket hit rate — the corpus is touched
    only to re-shingle the handful of candidate partners (semi-join
    pruned scan), never re-indexed.

    Returns (batch_doc, corpus_doc, n_inter, n_union, jaccard) for
    verified pairs at/above ``threshold``. Complements delta_dedup
    (exact content-hash) the way two_stage_neardup complements
    exact_dedup for the full-corpus case.

    ``width=120`` (r12): probes a FORMAT v3 index — the whole batch
    chain (shingles, signatures, buckets) runs the two-word hash120
    family and the exact verify intersects (s, s2) struct keys, the
    collision-free key set the width exists for. The caller is
    responsible for the index/width pairing when passing a DataFrame
    (path-based lifecycle ops check the sidecar mechanically)."""
    _check_width(width)
    from .skew import full_width

    # memoized: the batch shingle table feeds signatures AND the
    # verification sets below — one explode+distinct shuffle, not two
    bex = shingle_rows_materialized(batch, n, width)
    b_banded = banded_buckets(
        minhash_signatures(bex, n_hashes, width), n_hashes, bands, width
    )

    def _cand():
        return (
            full_width(
                b_banded.select(F.col("doc_id").alias("batch_doc"), "bucket"),
                "bucket",
            )
            .join(
                full_width(
                    index.select(
                        F.col("doc_id").alias("corpus_doc"), "bucket"
                    ),
                    "bucket",
                ),
                "bucket",
            )
            .select("batch_doc", "corpus_doc")
            .distinct()
        )

    # two consumers (partner probe + scoring join); the memo also
    # dedupes across repeated invocations in one session and keeps the
    # blocks under the cache's management instead of leaking per call.
    # The key must cover BOTH inputs: the batch plan (memo src) and the
    # index CONTENT. A plan hash is not enough for the index — a
    # rewritten index at the same path analyzes to the same plan — so
    # the tag uses the concrete file listing (every parquet overwrite
    # generates fresh part-file names, so a rebuilt index always
    # misses instead of serving stale candidates).
    try:
        idx_key = hash(tuple(sorted(index.inputFiles())))
    except Exception:
        idx_key = object()  # unique -> never collides, memo still works
    # width 60 keeps the historical memo key (warm-memo continuity, the
    # shingle_rows_materialized discipline)
    memo_tag = (
        ("delta_neardup_cand", n, n_hashes, bands, idx_key)
        if width == 60
        else ("delta_neardup_cand", n, n_hashes, bands, idx_key, width)
    )
    cand = _memo_checkpoint(batch, memo_tag, _cand)
    # exact verification on candidates only: corpus side re-shingles
    # just the candidate partners (semi join prunes the scan)
    partners = cand.select(F.col("corpus_doc").alias("doc_id")).distinct()
    cex = _shingle_rows(
        corpus.join(F.broadcast(partners), "doc_id", "left_semi"), n, width
    )
    # the verify key: at width 120 the collision-free unit is the
    # two-word (s, s2) pair — intersecting word0 alone would re-admit
    # exactly the collisions the width exists to remove
    vkey = (
        F.col("s") if width == 60 else F.struct(F.col("s"), F.col("s2"))
    )
    b_sets = bex.groupBy("doc_id").agg(F.collect_list(vkey).alias("sh"))
    c_sets = cex.groupBy("doc_id").agg(F.collect_list(vkey).alias("sh"))
    scored = (
        cand.join(
            b_sets.select(
                F.col("doc_id").alias("batch_doc"), F.col("sh").alias("sh_b")
            ),
            "batch_doc",
        )
        .join(
            c_sets.select(
                F.col("doc_id").alias("corpus_doc"), F.col("sh").alias("sh_c")
            ),
            "corpus_doc",
        )
        .withColumn(
            "n_inter",
            F.size(F.array_intersect("sh_b", "sh_c")).cast("long"),
        )
        .withColumn(
            "n_union",
            (F.size("sh_b") + F.size("sh_c") - F.col("n_inter")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return scored.select(
        F.col("batch_doc").cast("long"),
        F.col("corpus_doc").cast("long"),
        "n_inter",
        "n_union",
        "jaccard",
    )


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected pair list
    (doc_a, doc_b): iterative min-label propagation, the Pregel-style
    loop run as driver-coordinated DataFrame iterations (each round is
    one shuffle; rounds are bounded by component diameter, which for
    near-dup graphs is tiny). Labels converge to the component's minimum
    doc_id — the canonical survivor.

    Returns (doc_id, cluster) for every node that appears in a pair.
    This is the step that turns near-dup PAIRS into dedup DECISIONS:
    keep doc_id == cluster, drop the rest.

    Each round combines one hop of neighbor-min propagation with a
    pointer jump (label(label(d)) — one extra self-join of the small
    labels table), so convergence needs O(log diameter) rounds, not
    O(diameter): max_iter=20 covers component diameters up to ~2^20,
    where plain propagation stalls at 20 (the long-chain wrong-labels
    hazard flagged in round 1). Exhausting max_iter still raises."""
    # localCheckpoint: iterative algorithms MUST truncate lineage —
    # otherwise every round re-executes the whole upstream pair pipeline
    # (measured 26 s vs 4 s at sf0.1) and the plan grows per iteration.
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("cluster").alias("n_cluster"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("n_cluster").alias("neighbor_cluster"))
        )
        # pointer jump: follow each label one more step (grandparent)
        jumped = labels.join(
            labels.select(
                F.col("doc_id").alias("cluster"),
                F.col("cluster").alias("grand_cluster"),
            ),
            "cluster",
            "left",
        )
        new_labels = (
            jumped.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster"),
                    F.coalesce(F.col("grand_cluster"), F.col("cluster")),
                    F.coalesce(F.col("neighbor_cluster"), F.col("cluster")),
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Exhausting max_iter without convergence means some component's
        # diameter exceeds the iteration budget and the labels are WRONG
        # (not just suboptimal) — fail loudly rather than return them.
        # Min-label propagation needs at most diameter(G) rounds; raise
        # max_iter (or square the graph / use large-star small-star) for
        # long-chain graphs.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); raise "
            "max_iter for graphs with long chains"
        )
    return labels


def connected_components_lss(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the canonical shuffle-bounded CC algorithm at cluster
    scale, here as a second engine with output identical to
    ``connected_components`` (min-label propagation) and the same
    recursive-CTE oracle.

    Why a second algorithm: min-label propagation shuffles the FULL edge
    list every round and converges in O(log diameter) rounds only with
    the pointer-jump assist; large-star/small-star provably converges in
    O(log^2 n) rounds while MONOTONICALLY SHRINKING the edge set toward
    one star per component — at 100 TB the per-round shuffle volume
    decays instead of staying constant, which is why it is the published
    choice for web-graph-sized inputs.

    - large-star: every node links its LARGER neighbors to its minimum
      neighborhood node — long chains fold toward small ids in parallel.
    - small-star: every node links its smaller-or-equal neighbors (and
      itself) to the neighborhood minimum — stars flatten.

    Each op is one groupBy + one equi-join on node id (no windows, no
    driver data). Convergence = the canonical edge set reaches a fixed
    point, detected by (count, order-independent xxhash64 XOR-fold)
    staying equal across a round — an exact set invariant up to 64-bit
    collision (XOR, not SUM: an ANSI-mode long sum overflows on real
    hash values), which the oracle equivalence gate independently
    covers.
    Exhausting max_iter raises, like connected_components.

    Returns (doc_id, cluster) for every node in ``pairs``."""
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def canon_sig(e: DataFrame) -> tuple[int, int]:
        row = e.select(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "bit_xor(xxhash64(least(u, v), greatest(u, v)))"
            ).alias("h"),
        ).first()
        return (row["n"] or 0, row["h"] or 0)

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # no .distinct() here: duplicate (v, m) edges are collapsed by
        # small_star's output distinct in the same round, and the extra
        # rows they add to its groupBy/join are bounded by the dup count
        # — dropping the shuffle is a measured win per round.
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        linked = (
            oriented.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return linked

    sig = canon_sig(edges)
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        new_sig = canon_sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_lss did not converge in {max_iter} "
            "alternation rounds; raise max_iter"
        )
    # fixed point: edges are stars (v -> component min). Labels: every
    # left side maps to its root; roots and any node only ever seen as a
    # root map to themselves.
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    return (
        nodes.join(
            edges.select(F.col("u").alias("doc_id"), F.col("v").alias("c")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce("c", F.col("doc_id")).alias("cluster")
        )
    )


def simhash_docs(docs: DataFrame) -> DataFrame:
    """Per-document 16-bit SimHash over the token stream (frequency-
    weighted). Near-dups collide or differ in few bits; grouping by the
    signature is the candidate generator.

    Physical shape: per-bit ±1 votes are precomputed once per DISTINCT
    token (the array-HOF formulation re-evaluated md5 over every token
    occurrence 16 times — once per bit aggregate); occurrences then
    explode and a single groupBy sums the 16 vote columns. The token
    dictionary join is an EXPLICIT broadcast (r6): left to the
    planner, a small autoBroadcastJoinThreshold turns it into a
    sort-merge join that shuffles the whole occurrence stream on the
    token key — a few hundred distinct keys whose small compressed
    bytes AQE then coalesces onto ONE reducer doing all the join+agg
    work (measured: 20 s vs 6 s for 10x the data at the sf1 scale
    tier). Shuffling occurrences on a low-cardinality skewed key is
    wrong at every scale; the dictionary (even a web-corpus vocabulary
    at ~100s of MB) is the side that moves."""
    ex = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    h = F.md5(F.col("t"))
    vote_cols = [
        F.when(F.conv(F.substring(h, j + 1, 1), 16, 10).cast("int") >= 8, 1)
        .otherwise(-1)
        .alias(f"v{j}")
        for j in range(16)
    ]
    vocab = ex.select("t").distinct().select("t", *vote_cols)
    votes = (
        ex.join(F.broadcast(vocab), "t")
        .groupBy("doc_id")
        .agg(*[F.sum(f"v{j}").alias(f"v{j}") for j in range(16)])
    )
    sh = F.lit(0)
    for j in range(16):
        sh = sh + F.when(F.col(f"v{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return votes.select(
        F.col("doc_id").cast("long"), sh.cast("int").alias("simhash")
    )


def embedding_cosine_pairs(
    embeddings: DataFrame, threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-dup pairs above threshold.

    Brute-force O(N^2) within the join — correct baseline; the LSH
    bucket variant (similarity.sign_lsh_buckets) is the scale path that
    prunes the candidate space first.

    The pair space comes from similarity.blocked_self_pairs (codegen'd
    equi-join on block-pair keys — a cross join would run the N² loop
    interpreted inside BroadcastNestedLoopJoin). Per-pair cost is a flat
    compact fold; norms hoist to the N side behind the block shuffle, so
    they compute N times, not N².

    The float->double cast happens ONCE per fanned-out row, map-side of
    the block shuffle, not per pair: the join's Exchange materializes
    the pre-cast double array, so the per-pair fold multiplies already-
    double elements (measured ~8-10% faster at sf0.1 than casting inside
    the zip_with lambda; add order unchanged, so scores stay
    bit-identical to the oracle). This does NOT hit dot_cast's
    CollapseProject trap — that trap is aliasing a cast array reused
    within ONE projection stage; here a shuffle boundary sits between
    the cast and every per-pair use. Round-3 note on BENCH_r02's
    5.2->8.9 s regression: A/B showed it was session warmth, not plan —
    n_blocks=64 beats 8/16/32 warm AND cold, releasing leaked
    localCheckpoint blocks changes nothing, and the same plan re-run
    warm lands at ~4-5 s."""
    from .similarity import blocked_self_pairs

    def dot_d(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    v = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    ).withColumn("nv", F.sqrt(dot_d(F.col("v"), F.col("v"))))
    pairs = blocked_self_pairs(v, "vec_id")
    # cos is symmetric: score the unoriented pair, orient only the ids.
    return (
        pairs.withColumn(
            "cos",
            dot_d(F.col("a_v"), F.col("b_v"))
            / (F.col("a_nv") * F.col("b_nv")),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.least("a_vec_id", "b_vec_id").cast("long").alias("vec_a"),
            F.greatest("a_vec_id", "b_vec_id").cast("long").alias("vec_b"),
            "cos",
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken, "Winnowing:
# Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the
# MOSS algorithm; public). Complements span_dedup: where span_dedup
# explodes EVERY k-gram position into the cross-document dictionary,
# winnowing selects a guaranteed-covering subset with expected density
# 2/(w+1), so the shuffled fingerprint table is ~(w+1)/2 times smaller
# for the same detection guarantee (any shared run of w+k-1 tokens
# shares at least one selected fingerprint) — the 100 TB lever.

_WINNOW_POS_OFF = 1 << 20  # packed-key position offset: docs must have
_WINNOW_POS_MOD = 1 << 21  # fewer than 2^20 k-grams (1M tokens/doc)
_WINNOW_POS_BITS = 21  # log2(_WINNOW_POS_MOD): h = key >> 21, exact


def winnow_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 5
) -> DataFrame:
    """Robust-winnowing fingerprint selection, entirely row-local:
    ``(doc_id, p, h)`` — position (1-based k-gram index) and 32-bit
    hash of each selected k-gram.

    Selection rule (the paper's): in every window of ``w`` consecutive
    k-gram hashes keep the minimum, breaking ties by the RIGHTMOST
    position; record each kept (position, hash) once. Implemented by
    packing (h, p) into one int64 — ``h * 2^21 + (2^20 - p)`` — whose
    plain ``array_min`` over each window IS min-hash-then-rightmost,
    so the whole selection runs as native array HOFs inside the row:
    no explode, no shuffle, no window function. Short docs (0 < n < w
    k-grams) winnow their single truncated window; ``slice`` past the
    array end truncates, which is exactly that semantics.

    Only the selected fingerprints (density 2/(w+1)) ever leave the
    row via explode — contrast span_dedup's full-position explode.
    Packing bound: p < 2^20; h < 2^32 keeps the key < 2^53, exact in
    int64 and in any engine's arithmetic. The p bound is ENFORCED —
    a doc with >= 2^20 k-grams raises at evaluation instead of
    silently corrupting keys (_winnow_select docstring).
    """
    sel = winnow_selected_materialized(docs, k, w)
    return sel.select(
        "doc_id", F.explode("fps").alias("key")
    ).select(
        "doc_id",
        (F.lit(_WINNOW_POS_OFF) - F.col("key") % _WINNOW_POS_MOD).alias("p"),
        F.shiftright("key", _WINNOW_POS_BITS).alias("h"),
    )


def winnow_selected_materialized(
    docs: DataFrame, k: int, w: int
) -> DataFrame:
    """``(doc_id, n_kgrams, fps)`` — the per-doc selected packed-key
    fingerprint array, materialized once per (session, corpus, k, w)
    via the shared memo (the shingle-table pattern). The checkpoint is
    load-bearing for COST, not just reuse: Catalyst inlines the
    selection expression into ``explode``'s Generate input (the
    multi-reference CollapseProject guard does not protect Generate),
    and with the k-gram key array inlined into the per-window lambda
    every window re-ran the full shingle+md5 chain — measured 31 s for
    the explode path at sf0.1 vs 0.9 s reading the materialized table.
    """
    return _memo_checkpoint(
        docs, ("winnow", k, w), lambda: _winnow_select(docs, k, w)
    )


def _winnow_select(docs: DataFrame, k: int, w: int) -> DataFrame:
    """``(doc_id, n_kgrams, fps)`` — one-pass winnowing selection.

    STAGING IS LOAD-BEARING: the k-gram key array must be materialized
    by its own projection before any per-window lambda touches it.
    Catalyst inlines a Column-expression alias into lambda bodies, and
    HOF lambdas are interpreted per element — with the key array
    inlined, every one of the ~n windows re-ran the full shingle+md5
    chain (O(n^2) md5 per doc; measured 98 s at sf0.1 vs ~2 s staged).
    Multiple references from the NEXT projection keep the alias out of
    CollapseProject, so the lambdas see a plain attribute (same lesson
    as operators/similarity.py:dot_cast).

    ENFORCED packing bound (r7 VERDICT item 2): the (hash, position)
    int64 packing ``h * 2^21 + (2^20 - p)`` is exact only for
    p < 2^20 — a document with >= 2^20 k-grams (~a 4 MB page at one
    token per ~4 bytes, which a 100 TB crawl does contain) would wrap
    the position term into the hash bits and SILENTLY select wrong
    fingerprints. The guard raises at evaluation time via a
    ``raise_error`` branch on the n_kgrams column (data-dependent, so
    it must live in the plan — the train_centroids ceiling guard is
    driver-side because its bound is parameter-only). The raise names
    the offending doc_id. Oversized docs should be chunked upstream
    (chunk_split) before fingerprinting; widening the packing to
    struct<h,p> ordering is the alternative if 1M+-k-gram docs must
    stay whole.
    """
    if w < 1 or k < 1:
        raise ValueError("winnow needs k >= 1, w >= 1")
    toks = F.split("text", " ")
    sh = shingles(toks, k) if k > 1 else toks
    key = lambda s, i: (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        * _WINNOW_POS_MOD
        + (F.lit(_WINNOW_POS_OFF) - (i + 1))
    )
    n_kg = F.greatest(F.size(toks) - (k - 1), F.lit(0)).cast("long")
    n_kg_guarded = F.when(n_kg < F.lit(_WINNOW_POS_OFF), n_kg).otherwise(
        F.raise_error(
            F.concat(
                F.lit("winnow packed-key bound exceeded: doc_id "),
                F.col("doc_id").cast("string"),
                F.lit(
                    f" has >= {_WINNOW_POS_OFF} k-grams; the h*2^21 + "
                    "(2^20 - p) packing would silently corrupt "
                    "fingerprints — chunk oversized docs (chunk_split) "
                    "before winnowing"
                ),
            )
        ).cast("long")
    )
    staged = docs.select(
        "doc_id",
        n_kg_guarded.alias("n_kgrams"),
        F.transform(sh, key).alias("ks"),
    )
    ks = F.col("ks")
    n_pos = F.size(ks)
    n_win = F.greatest(n_pos - (w - 1), F.least(n_pos, F.lit(1)))
    wins = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda s: F.array_min(F.slice(ks, s, w)),
    )
    fps = F.when(n_pos > 0, F.array_distinct(wins)).otherwise(
        F.array_repeat(F.lit(0).cast("long"), 0)
    )
    return staged.select("doc_id", "n_kgrams", fps.alias("fps"))


def winnow_summary(docs: DataFrame, k: int = 4, w: int = 5) -> DataFrame:
    """Per-document winnowing profile with cross-document sharing:
    ``(doc_id, n_kgrams, n_fp, n_shared_fp, sum_h, sum_p)`` where
    n_shared_fp counts this doc's DISTINCT fingerprint hashes that some
    other document also selected (the near-dup signal winnowing exists
    for), and sum_h / sum_p pin the exact selected set order-free.

    Shuffle budget: n_kgrams / n_fp / sum_h / sum_p never leave the
    row — they are array-fold projections over the same selected-set
    expression, so the per-doc profile costs ZERO shuffle. Only the
    cross-doc signal shuffles: distinct (doc_id, h) pairs (hash-only
    rows at 2/(w+1) density) -> tiny duplicated-hash dictionary ->
    one join back to the spine. Docs with fewer than k tokens surface
    with all-zero counts (left join keeps the spine complete) — the
    same no-silent-drop rule the catalog operators follow.
    """
    z = F.lit(0).cast("long")
    sel = winnow_selected_materialized(docs, k, w)
    spine = sel.select(
        "doc_id",
        "n_kgrams",
        F.size("fps").cast("long").alias("n_fp"),
        F.aggregate(
            "fps", z, lambda a, x: a + F.shiftright(x, _WINNOW_POS_BITS)
        ).alias("sum_h"),
        F.aggregate(
            "fps",
            z,
            lambda a, x: a + (F.lit(_WINNOW_POS_OFF) - x % _WINNOW_POS_MOD),
        ).alias("sum_p"),
    )
    doc_h = (
        sel.select("doc_id", F.explode("fps").alias("key"))
        .select("doc_id", F.shiftright("key", _WINNOW_POS_BITS).alias("h"))
        .distinct()
    )
    shared_h = (
        doc_h.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    shared = (
        doc_h.join(shared_h, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
    )
    return spine.join(shared, "doc_id", "left").select(
        "doc_id",
        "n_kgrams",
        "n_fp",
        F.coalesce(F.col("n_shared_fp").cast("long"), z).alias(
            "n_shared_fp"
        ),
        "sum_h",
        "sum_p",
    )
