"""Training-data sampling and sequence packing.

The operations a pretraining-data pipeline runs after dedup/quality:
deterministic (resumable, cluster-size-independent) sampling, a
pseudorandom global shuffle, and token-budget sequence packing. Everything
derives randomness from the portable ``cells.h1`` integer hash so results
are bit-reproducible on any cluster, restartable mid-job, and expressible
in ANSI SQL for the DuckDB oracles — the same discipline as the synthetic
geometry.

``key`` must be an INTEGRAL column (``cells.h1_col`` shifts and
multiplies it): string ids like the canonical ``'doc-%013d'`` fail at plan
time — pre-cast with ``synth.doc_key_col``-style recovery (every in-repo
call site casts to long first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import cells


def deterministic_sample(
    df: DataFrame, fraction: float, key: str = "doc_id", salt: int = 0
) -> DataFrame:
    """Keep each row iff ``h1(key + salt)/2^32 < fraction`` — a
    deterministic Bernoulli sample: no RNG state, independent of
    partitioning, stable under retries/resume (the property ``df.sample``
    does NOT have), and different salts give independent samples."""
    u = cells.h1_col(F.col(key) + F.lit(salt * 1_000_003)) / F.lit(2.0**32)
    return df.where(u < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata: str,
    key: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample (``sampleBy`` with
    reproducibility): ``fractions`` maps stratum value → keep fraction;
    unlisted strata drop. The fraction table is a literal CASE — no join,
    pure codegen scan."""
    u = cells.h1_col(F.col(key) + F.lit(salt * 1_000_003)) / F.lit(2.0**32)
    frac = None
    for k, v in fractions.items():
        cond = F.col(strata) == F.lit(k)
        frac = F.when(cond, float(v)) if frac is None else frac.when(cond, float(v))
    if frac is None:
        return df.where(F.lit(False))
    return df.where(u < frac.otherwise(F.lit(0.0)))


def weighted_repeat(
    df: DataFrame,
    weights: dict,
    strata: str,
    key: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic FRACTIONAL upsampling for corpus mixing (the
    "3.5 epochs of Wikipedia, 0.25 of CommonCrawl" recipe of a pretraining
    data plan): each row of stratum ``s`` appears ``⌊w_s⌋ + Bernoulli(w_s
    − ⌊w_s⌋)`` times, the Bernoulli drawn from the portable hash so the
    mix is bit-reproducible and resumable (same discipline as
    :func:`deterministic_sample`; unlisted strata get weight 0 and drop).
    Output adds ``copy_id`` (0-based) — feed ``(key, copy_id)`` to
    :func:`pseudo_shuffle` so copies of one document spread across the
    epoch instead of sitting adjacent. Weight table is a literal CASE
    (codegen, no join); the explode is O(output rows), shuffle-free.

    The Bernoulli stream is ``h2`` (not ``h1``): deterministic_sample /
    stratified_sample draw from ``h1``, and drawing the repeat fraction
    from the same stream would fully correlate with an upstream sample at
    the same salt (every sample survivor has small u → the fractional
    copy would fire for 100% of them, silently biasing the mix)."""
    u = cells.h2_col(F.col(key) + F.lit(salt * 1_000_003)) / F.lit(2.0**32)
    n = None
    for k, w in weights.items():
        whole, frac = int(w), float(w) - int(w)
        cnt = F.lit(whole) + (u < F.lit(frac)).cast("long")
        cond = F.col(strata) == F.lit(k)
        n = F.when(cond, cnt) if n is None else n.when(cond, cnt)
    n = F.lit(0).cast("long") if n is None else n.otherwise(F.lit(0)).cast("long")
    return (
        df.withColumn("_n", n)
        .where(F.col("_n") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def pseudo_shuffle(df: DataFrame, key: str = "doc_id", salt: int = 0) -> DataFrame:
    """Deterministic global shuffle: attach ``shuffle_key = h1(key+salt)``
    and range-repartition/sort by it — the epoch-reshuffle a training
    reader wants, reproducible across runs (different salts ≙ different
    epochs)."""
    sk = cells.h1_col(F.col(key) + F.lit(salt * 1_000_003))
    return df.withColumn("shuffle_key", sk).repartitionByRange(
        df.sparkSession.sparkContext.defaultParallelism, "shuffle_key", key
    ).sortWithinPartitions("shuffle_key", key)


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_tokens: str = "n_tokens",
    key: str = "doc_id",
    salt: int = 0,
    bucket_bits: int = 10,
) -> DataFrame:
    """Token-budget sequence packing: order documents by the deterministic
    shuffle key, then assign each document to the context-window bin
    ``floor(running_token_sum_exclusive / budget)`` — streaming first-fit
    packing (a doc may straddle two bins; the trainer's
    concat-and-chunk contract, where ``bin_id`` is the chunk a document
    STARTS in).

    Distributed prefix sum, no global window: per-high-bit-bucket token
    totals (collected — O(2^bucket_bits) rows, 1024 at the default)
    broadcast back as offsets, then the running sum windows only WITHIN
    buckets. Returns the input plus (shuffle_key, start_offset, bin_id)."""
    sk = cells.h1_col(F.col(key) + F.lit(salt * 1_000_003))
    d = df.withColumn("shuffle_key", sk).withColumn(
        "_bkt", F.shiftright(F.col("shuffle_key"), 32 - bucket_bits)
    )
    totals = {
        r["_bkt"]: r["t"]
        for r in d.groupBy("_bkt").agg(F.sum(n_tokens).alias("t")).collect()
    }
    acc, offs = 0, []
    for b in sorted(totals):
        offs.append((int(b), acc))
        acc += totals[b]
    spark = df.sparkSession
    odf = F.broadcast(spark.createDataFrame(offs, "_bkt long, _off long"))
    w = (
        Window.partitionBy("_bkt")
        .orderBy("shuffle_key", key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_off") + F.coalesce(F.sum(n_tokens).over(w), F.lit(0))
    return (
        d.join(odf, "_bkt")
        .withColumn("start_offset", start)
        # integer div, not floor(double /): token prefix sums pass 2^53 at
        # 100-TB corpora and double division would lose exactness
        .withColumn("bin_id", F.expr(f"start_offset div {int(budget)}"))
        .drop("_bkt", "_off")
    )
