"""Deduplication operators over a document table.

Exact dedup, MinHash+LSH, SimHash, and n-gram Jaccard — the large-scale
training-pipeline ops (task brief). All hashing uses md5-prefix → int64 so
the SAME hash is computable in Spark (``conv(substr(md5(s),1,8),16,10)``)
and DuckDB (``CAST('0x'||substr(md5(s),1,8) AS BIGINT)``): every stage of
minhash/LSH is SQL-oracle-checkable, not just row counts.

Scale notes: shingling explodes ~L tokens per doc — at 10^12 docs the
shingle table is the big side; every aggregation below is decomposable
(min/bit_or), so Spark's partial aggregation keeps the shuffle at
(doc × n_hashes) rows, not (doc × shingles). LSH banding turns near-dup
search into an equi-join on (band, band_hash) — broadcast-free,
AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5-prefix portable 32-bit hash of a string column (bit-equal in DuckDB;
# kept to 32 bits so a*h below stays inside int64 under Spark-4 ANSI mode)
def str_hash64(c: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def str_hash_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"


# Universal-hash family over the 32-bit shingle hash: (a_i * h + b_i) mod p.
# a < 2^29 and h < 2^32 keep a*h + b < 2^62 — no int64 overflow in either
# engine; p prime.
_P = 2305843009213693951  # 2^61 - 1 (Mersenne prime)
_A = [268435399, 268435367, 268435361, 268435337, 268435331, 268435313, 268435291, 268435273]
_B = [1013904223, 433494437, 362437, 40503, 2654435769, 97531, 12345, 7919]


def tokens_col(text: str = "text") -> F.Column:
    """Whitespace tokens, lowercased, empties dropped — identical to the SQL
    ``regexp_split_to_array(lower(trim(text)), '\\s+')`` modulo empty filter."""
    return F.filter(F.split(F.lower(F.trim(F.col(text))), r"\s+"), lambda t: t != "")


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Word n-gram shingles → (id, shingle) distinct."""
    toks = tokens_col(text)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing ≥
    ``min_hits`` distinct word n-grams with a held-out benchmark set (the
    standard n-gram-overlap test-set-leakage check of a pretraining
    pipeline). Returns the docs' columns + ``n_contaminated_ngrams``
    (0 for clean docs) + ``contaminated`` boolean.

    100-TB shape: the benchmark is SMALL by nature (eval sets), so its
    distinct shingle set broadcasts; the corpus side explodes to shingles,
    hash-semi-joins the broadcast set, and the per-doc hit count is a
    map-side-combined aggregate — corpus rows are never shuffled wider
    than (id, hit-shingle). The final count joins back LEFT so clean
    documents survive with 0."""
    bench_sh = F.broadcast(
        shingles(benchmark, n=n, id_col=id_col, text=text)
        .select("shingle").distinct()
    )
    hits = (
        shingles(docs, n=n, id_col=id_col, text=text)
        .join(bench_sh, "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
        .withColumnRenamed("id", "_decon_id")  # docs may themselves use 'id'
    )
    out = docs.join(hits, F.col(id_col) == F.col("_decon_id"), "left").drop("_decon_id")
    n_hits = F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0))
    return out.withColumn("n_contaminated_ngrams", n_hits).withColumn(
        "contaminated", n_hits >= F.lit(min_hits)
    )


def minhash_signatures(sh: DataFrame, n_hashes: int = 8) -> DataFrame:
    """(id, sig array<long>) — min over the universal-hash family per doc.

    Decomposable min-agg → map-side combine collapses the shingle explosion
    before shuffle. The md5 base hash is PROJECTED once below the
    aggregate: inlining it into each min() made the partial aggregate
    carry n_hashes copies of the md5→conv chain per row (r7 plan audit —
    one md5 per shingle, not eight)."""
    hashed = sh.select("id", str_hash64(F.col("shingle")).alias("_h"))
    mins = [
        F.min((F.lit(_A[i]) * F.col("_h") + F.lit(_B[i])) % F.lit(_P)).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    g = hashed.groupBy("id").agg(*mins)
    return g.select("id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig"))


def lsh_pairs(sig: DataFrame, bands: int = 4, rows_per_band: int = 2) -> DataFrame:
    """Banded LSH candidate pairs: docs sharing any band bucket.
    → (id_a, id_b) with id_a < id_b, distinct."""
    b = sig
    pieces = []
    for i in range(bands):
        band_cols = [F.col("sig")[j] for j in range(i * rows_per_band, (i + 1) * rows_per_band)]
        pieces.append(
            b.select(
                "id",
                F.lit(i).alias("band"),
                F.xxhash64(*band_cols).alias("bucket"),
            )
        )
    u = pieces[0]
    for p in pieces[1:]:
        u = u.unionByName(p)
    l = u.select(F.col("id").alias("id_a"), "band", "bucket")
    r = u.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(sh: DataFrame, min_sim: float = 0.5, max_df: int | None = 1000) -> DataFrame:
    """Pairwise n-gram Jaccard over the shingle table:
    |A∩B| via shingle self-join, |A∪B| = |A|+|B|−|A∩B|.
    → (id_a, id_b, jaccard) for pairs ≥ min_sim.

    ``max_df`` caps shingle document frequency BEFORE the self-join: one
    stopword shingle shared by d documents creates a d² bucket in the
    shuffle — the quadratic skew-bomb at web scale. Shingles with df >
    max_df are dropped from intersection AND sizes (Jaccard over the
    filtered shingle universe, the standard df-capped similarity).

    The cap DEFAULTS ON (1000, VERDICT r2 #8): a bare call at web scale
    must not be quadratic. Exact Jaccard over all shingles — the ground
    truth for small corpora — is the explicit opt-in ``max_df=None``."""
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sza"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "szb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .where(F.col("jaccard") >= min_sim)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_clusters(
    ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate CLUSTER resolution: connected components over the
    similarity-pair graph → one row per document
    ``(id, cluster, is_keeper)`` with cluster = min id of the component
    and keeper = the cluster root (the standard "keep one representative
    per near-dup cluster" pretraining-dedup step; pairs come from
    :func:`ngram_jaccard` / :func:`lsh_candidate_pairs` /
    ``ann.near_dup_pairs``).

    Distributed via the shared edge-CC solver
    (:func:`pyramids_spark.operators.vectorize.edge_components_df`):
    one-task vectorized min-propagation for small graphs, Spark
    pointer-jumping fixpoint above — never a driver union-find."""
    from ..operators.vectorize import edge_components_df

    half = pairs.select(
        F.col("id_a").alias("label"), F.col("id_b").alias("label2")
    )
    mapping = edge_components_df(half)
    out = (
        ids.select(F.col(id_col))
        .join(mapping.withColumnRenamed("label", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("root", F.col(id_col)).alias("cluster"),
        )
    )
    return out.withColumn("is_keeper", (F.col(id_col) == F.col("cluster")))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min id.
    → (text_hash, n_dups, keeper_id)."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_id"))
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text: str = "text", bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per-token hash bit-vote, sign of the vote per bit.

    Expressed as explode(tokens) → per-bit ±1 sum → bit assembly: pure
    aggregation (decomposable), no UDF. ``bits`` kept small so the oracle
    stays tractable; production would use 64."""
    toks = df.select(F.col(id_col).alias("id"), F.explode(tokens_col(text)).alias("tok"))
    h = str_hash64(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    g = toks.groupBy("id").agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return g.select("id", fp.alias("simhash"))
