"""Corpus-curation operators (north-star extension): eval-set
decontamination, deterministic stratified sampling, vocabulary-coverage
quality scoring.

These are the corpus-level steps a training-data pipeline runs between
raw ingestion and dedup/split (the reference pipeline stops at pairing —
see SURVEY.md §6 for the extension rationale):

- ``contaminated_docs``: GPT-3-style n-gram decontamination — drop any
  training document sharing a long n-gram with the held-out eval set.
  Physical shape: the eval side is small by construction (benchmarks are
  thousands of docs), so its distinct n-gram set broadcasts; the train
  side is a narrow explode feeding a broadcast semi-ish join + one
  groupBy on doc_id. No shuffle touches the eval side; train-side
  fan-out is bounded by document length. 100 TB-safe.
- ``stratified_sample``: per-class downsampling by content-independent
  hash bucket (md5 of the id), the same family as the 90/5/5 split in
  ``q_chunk_split`` — deterministic under reshuffles, repartitions, and
  incremental reruns, which per-partition RNG sampling is not. A narrow
  map + filter; no shuffle at all.
- ``vocab_coverage``: two-pass dictionary filter — pass 1 aggregates the
  corpus-wide top-K token vocabulary (tiny: K rows), pass 2 broadcasts
  it back and scores each document by the fraction of its token
  occurrences covered. The classic "word-list quality" heuristic (e.g.
  C4's bad-words pass, Gopher's dictionary rules) expressed as two
  aggregations and a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles
from ..session import local_df

# the 90/5/5 split's bucket boundary (plans/driver_queries_ext.py:
# q_chunk_split):
# md5 first-byte < 230 -> train; the rest (val+test) is held out.
TRAIN_BUCKET_BOUND = 230


def _hash_bucket(id_col):
    """First byte of md5(id) as an int in [0, 256) — the deterministic,
    content-independent bucket both split and sampling key on."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 2), 16, 10
    ).cast("int")


def contaminated_docs(
    train: DataFrame, eval_docs: DataFrame, n: int = 8
) -> DataFrame:
    """Training documents sharing at least one word n-gram with the eval
    corpus; returns (doc_id, n_hits = distinct shared n-grams).

    The eval n-gram dictionary is DISTINCT'd before the join (its size
    is bounded by eval-corpus length, not train size) and broadcast, so
    the only shuffle is the per-doc hit count groupBy. n=8 follows the
    published 8-to-13-gram range for benchmark decontamination."""
    toks = F.split(F.col("text"), " ")
    grams = F.explode(F.array_distinct(shingles(toks, n))).alias("s")
    ev = eval_docs.select(grams).distinct()
    tr = train.select("doc_id", grams)
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def stratified_sample(
    docs: DataFrame, class_col: str, rates: dict[str, float], id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic per-class downsampling: keep a row iff its hash
    bucket falls under ceil(rate*256) for its class (unlisted classes
    keep everything). Pure narrow filter — sampling decisions are a
    function of (id, class) alone, so reruns and late-arriving
    partitions sample identically, unlike ``df.sampleBy`` whose
    per-partition RNG changes under repartitioning."""
    bucket = _hash_bucket(F.col(id_col))
    bound = None
    for cls, rate in rates.items():
        thresh = int(rate * 256 + 0.5)
        branch = F.when(F.col(class_col) == cls, F.lit(thresh))
        bound = branch if bound is None else bound.when(
            F.col(class_col) == cls, F.lit(thresh)
        )
    bound = F.lit(256) if bound is None else bound.otherwise(F.lit(256))
    return docs.filter(bucket < bound)


def vocab_coverage(docs: DataFrame, k: int = 16) -> DataFrame:
    """Per-document fraction of token OCCURRENCES covered by the
    corpus-wide top-k token vocabulary (ties broken by token asc, so the
    vocabulary — and the oracle — is deterministic).

    Pass 1 (vocab) ends in k rows; Spark broadcasts it into pass 2's
    join, so the expensive side runs explode -> broadcast-join ->
    doc_id groupBy: one shuffle, partial aggregation map-side.

    The top-k itself is ``orderBy(...).limit(k)``, which Spark plans as
    TakeOrderedAndProject — per-partition bounded top-k heaps merged on
    the driver. At web scale the distinct-token table is hundreds of
    millions of rows; the earlier ``row_number() OVER (ORDER BY ...)``
    formulation funneled ALL of it through one unpartitioned-window task
    (the classic hidden scale-killer), while TakeOrderedAndProject never
    materializes more than k rows per partition. (tok, n) is a total
    order (tok is unique), so the k-th-place tie-break is deterministic
    and the oracle still hash-matches."""
    tok_rows = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    counts = tok_rows.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(k)
    per_doc = (
        tok_rows.join(F.broadcast(vocab.select("tok")), "tok", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_in_vocab"))
    )
    totals = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_toks")
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce("n_in_vocab", F.lit(0)).cast("long").alias("n_in_vocab"),
        (
            F.coalesce("n_in_vocab", F.lit(0)).cast("double")
            / F.col("n_toks").cast("double")
        ).alias("coverage"),
    )


def quality_gate(
    docs: DataFrame,
    min_toks: int = 20,
    max_toks: int = 500,
    min_coverage: float = 0.2,
    k: int = 16,
) -> DataFrame:
    """The composed keep/drop decision a C4/Gopher-style cleaning pass
    actually emits: per document, the signals plus one boolean per
    rejection rule and the final ``keep`` — so downstream can both
    filter and audit WHY documents fell out (rule attribution is what
    you tune the thresholds by).

    Rules: token-count band [min_toks, max_toks] and top-k-vocabulary
    coverage >= min_coverage. All signals come from one
    ``vocab_coverage`` pass (explode -> broadcast semi join -> one
    groupBy), so the gate costs what the coverage score costs; flags
    are pure column arithmetic on top."""
    cov = vocab_coverage(docs, k=k)
    too_short = F.col("n_toks") < min_toks
    too_long = F.col("n_toks") > max_toks
    low_cov = F.col("coverage") < min_coverage
    return cov.select(
        "doc_id",
        "n_toks",
        "coverage",
        too_short.alias("too_short"),
        too_long.alias("too_long"),
        low_cov.alias("low_coverage"),
        (~(too_short | too_long | low_cov)).alias("keep"),
    )


def mixture_plan(
    docs: DataFrame,
    class_col: str,
    weights: dict[str, int],
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic data-mixing: plan per-class downsampling rates that
    hit a target mixture (integer ``weights``) with maximal retention,
    execute them with the hash-bucket sampler, and report plan vs
    achievement — the step that turns "train on 40% en / 15% each of the
    rest" into reproducible per-class keep decisions.

    Arithmetic is all integer, so the plan is cross-engine exact: the
    retention-maximal post-mix total is T = min_c floor(n_c * W / w_c)
    (the binding class is kept whole), per-class keep targets are
    floor(T * w_c / W) capped at n_c, and the sampler threshold is
    floor(keep * n_buckets / n) — the quantization the bucket sampler
    imposes anyway, reported honestly as ``achieved`` (count after the
    actual ``stratified_sample`` filter) next to ``keep_target``.
    Classes without a weight are dropped (that is what a mixture means);
    classes weighted but absent contribute nothing.

    Scale shape: the per-class count probe collects #classes rows (a
    mixture spec is dozens of classes at most — plan-time metadata, same
    class of decision as dedup's vocabulary probe); the sampling filter
    is narrow (stratified_sample), and the achieved count is one
    map-side-combining groupBy. ``n_buckets`` must be a divisor of the
    sampler's fixed 256-bucket space (md5 first byte): > 256 would
    report a ``thresh`` finer than the sampler can apply, and a
    non-divisor would make the applied cutoff int(rate*256+0.5) differ
    from the reported thresh/n_buckets — both are rejected rather than
    silently skewing achieved vs keep_target. Divisors < 256 coarsen
    the quantization; the reported rate is then still exactly what the
    sampler applies."""
    rows, rates = _mixture_math(docs, class_col, weights, n_buckets)
    plan = local_df(
        docs.sparkSession,
        rows,
        f"{class_col} string, n_docs long, weight long, "
        "keep_target long, thresh long",
    )
    weighted_docs = docs.join(
        F.broadcast(plan.select(class_col)), class_col, "left_semi"
    )
    achieved = (
        stratified_sample(weighted_docs, class_col, rates)
        .groupBy(class_col)
        .agg(F.count(F.lit(1)).cast("long").alias("achieved"))
    )
    return plan.join(achieved, class_col, "left").select(
        class_col,
        "n_docs",
        "weight",
        "keep_target",
        "thresh",
        F.coalesce("achieved", F.lit(0)).cast("long").alias("achieved"),
    )


def _mixture_math(
    docs: DataFrame,
    class_col: str,
    weights: dict[str, int],
    n_buckets: int,
) -> tuple[list[tuple], dict[str, float]]:
    """The shared integer plan arithmetic behind mixture_plan and
    mixture_sample (see mixture_plan's docstring for the derivation):
    per present weighted class, (class, n, weight, keep_target, thresh)
    rows plus the sampler rates dict."""
    if n_buckets < 1 or 256 % n_buckets != 0:
        raise ValueError(
            "n_buckets must be a divisor of 256 (the hash-bucket "
            f"sampler quantizes on the md5 first byte); got {n_buckets}"
        )
    counts = {
        r[class_col]: r["n"]
        for r in docs.groupBy(class_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total_w = sum(weights.values())
    present = {c: w for c, w in weights.items() if counts.get(c, 0) > 0}
    if not present:
        raise ValueError("no weighted class present in the corpus")
    t_max = min(counts[c] * total_w // w for c, w in present.items())
    rows = []
    rates: dict[str, float] = {}
    for c, w in sorted(present.items()):
        n = counts[c]
        keep = min(t_max * w // total_w, n)
        thresh = keep * n_buckets // n
        rates[c] = thresh / n_buckets
        rows.append((c, n, w, keep, thresh))
    return rows, rates


def mixture_sample(
    docs: DataFrame,
    class_col: str,
    weights: dict[str, int],
    n_buckets: int = 256,
) -> DataFrame:
    """The EXECUTED side of ``mixture_plan``: the sampled document rows
    themselves (every input column), for pipelines that feed the mixed
    corpus onward (pack, write) instead of reporting the plan. Same
    integer plan arithmetic (``_mixture_math``), same hash-bucket
    sampler, same unweighted-class drop — a row survives iff
    mixture_plan's ``achieved`` would count it. Narrow after the
    #classes-row count probe: one broadcast semi-join on the class plus
    the deterministic bucket filter (see stratified_sample for why hash
    buckets, not RNG)."""
    rows, rates = _mixture_math(docs, class_col, weights, n_buckets)
    kept_classes = local_df(
        docs.sparkSession, [(c,) for c, *_ in rows], f"{class_col} string"
    )
    weighted_docs = docs.join(
        F.broadcast(kept_classes), class_col, "left_semi"
    )
    return stratified_sample(weighted_docs, class_col, rates)


def pack_assignments(
    docs: DataFrame, budget: int = 512, n_shards: int = 32
) -> DataFrame:
    """Per-document packing assignment — pack_sequences' underlying
    (doc_id, shard, seq_id, n_toks) mapping, for pipelines that need to
    know WHICH sequence each document landed in (e.g. the end-to-end
    curation write, which fingerprints sequence contents). Same
    shard-local streaming-fill rule; pack_sequences is exactly this
    plus the per-sequence rollup."""
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = F.floor(
        F.coalesce(F.sum("n_toks").over(w), F.lit(0)) / F.lit(budget)
    )
    return sized.withColumn("seq_id", seq)


def pack_sequences(
    docs: DataFrame, budget: int = 512, n_shards: int = 32
) -> DataFrame:
    """Greedy contiguous sequence packing for LLM training batches:
    assign documents, in deterministic id order, to fixed token-budget
    training sequences; returns one row per packed sequence
    ``(shard, seq_id, n_docs, n_toks_packed)``.

    Packing needs an ordered running total, which is inherently
    sequential — so it must NOT be a single global window (one task would
    stream the whole corpus). Instead documents are sharded by
    ``doc_id % n_shards`` and packed WITHIN each shard: the cumulative
    sum parallelizes across shards, each sequence stays inside one
    shard's ordered stream, and the result is still fully deterministic
    (reshuffle- and rerun-stable, like ``stratified_sample``). At 100 TB
    you raise ``n_shards`` to ~the executor count; packing quality is
    unaffected because sequences never straddle shards anyway.

    A document lands in the sequence its FIRST token falls into
    (``floor(cum_before / budget)``), the streaming-fill rule: sequences
    may overshoot the budget by at most one document's tokens, matching
    how training-data packers chunk an ordered token stream.
    """
    return (
        pack_assignments(docs, budget=budget, n_shards=n_shards)
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_toks_packed"),
        )
        .select(
            F.col("shard").cast("long"),
            F.col("seq_id").cast("long"),
            "n_docs",
            "n_toks_packed",
        )
    )


def domain_quota(
    docs: DataFrame,
    group_col: str = "source",
    quota: int = 25,
    score_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap: keep at most ``quota`` documents per
    ``group_col``, ranked by ``score_col`` DESC with ``id_col`` ASC
    tie-break — the standard pretraining curation step that stops one
    crawl domain from dominating the mixture.

    Semantically identical to ``row_number() OVER (PARTITION BY group
    ORDER BY score DESC, id) <= quota``, but that window sorts each
    domain's ENTIRE row set in one task — at 100 TB a mega-domain is a
    multi-TB single-task sort. Same fix as ``length_trim``: because
    rank-above is a function of the VALUE, aggregate to per-(group,
    score) counts first (bounded by #distinct scores x #groups), run
    the cumulative window over that bounded table to find each group's
    boundary score, keep whole value-groups above it, and row-sort ONLY
    the boundary ties (windows partitioned by (group, score) — the one
    place row identity matters). Output: the kept rows
    (group, id, score).
    """
    s = F.col(score_col)
    counts = docs.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_above = (
        Window.partitionBy(group_col)
        .orderBy(s.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_above = F.coalesce(F.sum("cnt").over(w_above), F.lit(0))
    decided = counts.withColumn("n_above", n_above).filter(
        F.col("n_above") < quota
    )
    # per value-group: how many of its rows survive (cnt if wholly
    # above the boundary, quota - n_above at the boundary)
    decided = decided.select(
        group_col,
        score_col,
        F.least(F.col("cnt"), F.lit(quota) - F.col("n_above")).alias("keep_m"),
        (F.col("cnt") + F.col("n_above") <= quota).alias("whole"),
    )
    joined = docs.select(group_col, id_col, score_col).join(
        decided, [group_col, score_col]
    )
    full = joined.filter(F.col("whole")).select(group_col, id_col, score_col)
    w_tie = Window.partitionBy(group_col, score_col).orderBy(id_col)
    ties = (
        joined.filter(~F.col("whole"))
        .withColumn("_rn", F.row_number().over(w_tie))
        .filter(F.col("_rn") <= F.col("keep_m"))
        .select(group_col, id_col, score_col)
    )
    return full.unionByName(ties)


def length_trim(
    docs: DataFrame, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Per-language robust length trim: keep documents whose character
    length sits inside the [lo, hi] percent-rank band of their language,
    and report ``(lang, n_kept, min_chars, max_chars)`` for the band.

    The C4/Gopher-style "too short / absurdly long" filter as rank
    arithmetic: ``percent_rank() = (rank - 1) / (n - 1)`` is integers and
    one division, so the band edges are cross-engine exact — no
    approximate quantiles, no float summation.

    Skew design: a direct ``percent_rank() OVER (PARTITION BY lang ORDER
    BY n_chars)`` sorts each language's ENTIRE corpus in one window task
    — at 100 TB the dominant language is ~45% of the corpus (see
    sources/corpus.py), i.e. one task sorting ~45 TB. Since rank() ties
    share a rank, percent_rank is a function of the VALUE, not the row:
    pr(v) = (#rows < v) / (n_lang - 1). So aggregate to per-(lang,
    n_chars) counts first (a map-side-combining groupBy bounded by
    #distinct lengths x #languages, NOT by corpus size), then run the
    cumulative window over that bounded table. Per-language sequential
    work drops from O(docs) to O(distinct lengths) — the same exact
    output, hash-identical to the oracle.
    """
    g = docs.groupBy("lang", "n_chars").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_lang = Window.partitionBy("lang")
    n_before = F.coalesce(F.sum("cnt").over(w_cum), F.lit(0))
    n_lang = F.sum("cnt").over(w_lang)
    # rank(first row of value group) - 1 == #rows with a smaller value;
    # Spark defines percent_rank = 0 for a single-row partition.
    pr = F.when(
        n_lang > 1, n_before.cast("double") / (n_lang - 1).cast("double")
    ).otherwise(F.lit(0.0))
    kept = g.withColumn("pr", pr).filter(
        (F.col("pr") >= lo) & (F.col("pr") <= hi)
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_kept"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


def epoch_shuffle(
    df: DataFrame, seed: int, n_shards: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic epoch shuffle — the training-order randomization a
    data loader needs per epoch, computed WITHOUT a global sort: every
    row gets (shard, pos) where ``shard`` is a seeded hash bucket and
    ``pos`` is the row's rank within its shard by the same hash.
    Re-running with the same seed reproduces the order bit-for-bit
    (resumable training, auditable batches); a new seed is a fresh
    permutation. Emits (id, shard, pos).

    Why not ``ORDER BY rand()`` or a global ``row_number``: a global
    order is ONE window task sorting the entire corpus — the canonical
    100 TB scale-killer. Here the only window is PARTITIONED BY SHARD:
    md5 keys are uniform, so each shard is ~corpus/n_shards regardless
    of data skew (the hash launders any hot key), and n_shards is the
    explicit knob that sizes per-task sort state — set it so a shard
    matches what one task's external sort should own (e.g. ~1-4 GB);
    the loader then interleaves shard files. Within a shard the order
    is the md5 order, i.e. uniformly random with respect to any data
    attribute, which is exactly the property epoch shuffling needs.

    Determinism contract: shard = integer value of the first 4 hex
    chars of md5(seed ':' id) mod n_shards; pos orders by the full
    hash with the id as tie-break (md5 collisions on distinct ids are
    not expected, but the tie-break keeps the contract total and the
    oracle exact either way)."""
    h = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    shard = F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    keyed = df.select(
        F.col(id_col).cast("long").alias(id_col),
        h.alias("h"),
        shard.alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return keyed.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )
