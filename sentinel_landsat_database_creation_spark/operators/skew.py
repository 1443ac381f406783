"""Skew-mitigated joins: explicit key salting.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
transparently, but two cases still need explicit salting at 100 TB:
aggregations onto a hot key, and shuffled joins where one side's hot
key exceeds what AQE can split (a single key cannot be subdivided by
partition splitting when the OTHER side must see all of it).

``salted_join`` implements the standard pattern: the skewed (big) side
gets a deterministic salt in [0, n_salts) derived from a high-cardinality
column, the small side is replicated once per salt, and the join runs on
(key, salt) — the hot key's rows now spread across n_salts reducers.
Replication multiplies the small side by n_salts, so size it like a
broadcast decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_width(df: DataFrame, *cols: str, factor: int = 1) -> DataFrame:
    """Repartition on ``cols`` with an EXPLICIT partition count (the
    session's shuffle.partitions), for the inputs of EXPANDING joins.

    AQE sizes reducers on an exchange's INPUT bytes; when a join's
    inputs are small but its output is quadratic-ish (shingle-join pair
    expansion, LSH bucket joins, blocked all-pairs), the tiny input
    coalesces to 1-2 reducers and the whole expansion serializes on
    them (measured r4: 12.5M cosine pairs on 2 tasks, 4.0 s -> 1.2 s at
    full width; the jaccard shingle join showed the same 2-task stage).
    A user-specified partition count is exempt from AQE coalescing, and
    since the join keys match the repartition keys the join reuses this
    exchange — no extra shuffle. Apply to both sides of the expanding
    join; leave normal (non-expanding) joins to AQE.

    ``factor`` multiplies the width for stages whose PER-TASK STATE
    (not just output bytes) scales with the expansion — hash-aggregate
    maps keyed by expanded pairs are the canonical case: a group count
    over an expanding join's output holds ~groups/width entries per
    task, and at width = shuffle.partitions the per-task map outgrows
    the executor share long before the shuffled bytes matter
    (measured r8: containment's probe count-filter at the sf10 tier —
    ~270M directed-pair groups over 32 partitions is ~8.4M
    groups/task, an OOM in the 1 GB harness at 8 slots; factor=8 puts
    ~1M groups ≈ tens of MB per task, which fits and spills cleanly).
    A repartition by the GROUP KEYS ahead of the groupBy satisfies the
    aggregate's required distribution, so the widened exchange is the
    only one."""
    n_parts = factor * int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return df.repartition(n_parts, *[F.col(c) for c in cols])


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key_col: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` x ``small`` on ``key_col`` with the skewed
    side's rows spread over ``n_salts`` sub-keys.

    ``salt_source`` names a column whose hash spreads rows; by default
    the salt is ``xxhash64`` over EVERY column of the skewed row — a
    pure function of row content, so a retried or re-shuffled task
    assigns the same salt and can never double- or zero-match (the
    earlier ``spark_partition_id + monotonically_increasing_id`` default
    changed under retries/repartition). Identical rows share a salt,
    which only matters if one key's rows are also byte-identical — pass
    ``salt_source`` (a distinct-ish column) for that corner. Output
    columns = skewed's + small's (minus the duplicate key), same as a
    plain join.
    """
    if salt_source is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    else:
        # map-typed columns are not xxhash64-hashable: exclude them
        # (same guard + degeneracy notes as salted_agg; expression
        # byte-identical for map-free frames, so pinned plans hold)
        hashable = [c for c, t in skewed.dtypes if not t.startswith("map")]
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in (hashable or [key_col])]),
            F.lit(n_salts),
        )
    l = skewed.withColumn("_salt", salt.cast("int"))
    r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return l.join(r, [key_col, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, "F.Column"]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: groupBy(key, salt)
    computes bounded-size partials in parallel even when one key owns
    most rows; a second tiny groupBy(key) merges them.

    ``aggs`` maps output name -> (merge_fn_name, partial_agg_column);
    merge_fn must be an algebraic combiner ('sum', 'max', 'min') so the
    two-stage result equals the one-stage result exactly (count merges
    with 'sum' — partial counts add).

    The salt is a DETERMINISTIC row-content hash, not rand(): a salt
    drawn from rand feeding a shuffle key is the SPARK-38388 hazard —
    if a fetch failure re-runs part of the map stage, retried tasks
    redraw and rows can land under a different salt than the partials
    already fetched, double- or zero-counting them (the guide's §2.5
    rule; salted_join was fixed for the same class in r6). Identical
    rows share a salt — only relevant when one hot key's rows are also
    byte-identical, the salted_join caveat verbatim. The merged result
    is salt-independent either way (algebraic combiners), so outputs
    and oracles are unchanged.

    Input-shape limits of the content hash (r13 ADVICE — rand()
    accepted any frame, xxhash64 does not): map-typed columns are not
    hashable and are EXCLUDED from the salt (still deterministic — a
    pure function of the remaining columns); a frame whose columns are
    ALL maps, or only the key columns, degenerates to one salt per key
    and the two-stage plan silently loses its skew spread (results
    still correct). Duplicate column names fail analysis (ambiguous
    reference) — dedupe upstream. For non-map frames the salt
    expression is byte-identical to the r13 form, so pinned consumer
    plans (salted_skew_checks) are unchanged."""
    hashable = [c for c, t in df.dtypes if not t.startswith("map")]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in (hashable or key_cols)]),
        F.lit(n_salts),
    ).cast("int").alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(
        *[col.alias(f"_p_{name}") for name, (_, col) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn)(f"_p_{name}").alias(name)
            for name, (merge_fn, _) in aggs.items()
        ]
    )
