"""Text quality / language-ID / token stats / fingerprinting.

All pure column expressions (codegen, no UDFs) with exact DuckDB-SQL
twins — see ``__spark_entry__.oracle_sql``. The stopword-hit counter uses
the length-difference idiom ``(len(s) - len(replace(s, w, ''))) / len(w)``
which is identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " y ", " de la "],
}


def _count_occurrences(text: F.Column, pat: str) -> F.Column:
    return (F.length(text) - F.length(F.replace(text, F.lit(pat), F.lit("")))) / F.lit(len(pat))


def token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (word-chunks of
    ≤4 chars: ceil(len(word)/4) summed ≙ count of 4-char chunks)."""
    t = F.lower(F.trim(F.col(text)))
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    bpe = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long")
    )
    return df.withColumn("n_tokens", F.size(toks).cast("long")).withColumn("n_bpe", bpe)


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio heuristic score in [0,1]:
    score = 0.4·min(len/1000,1) + 0.3·(1−punct_ratio·5 clamped) + 0.3·min(stop_ratio·10,1)."""
    t = F.col(text)
    length = F.length(t).cast("double")
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
    punct_ratio = F.when(length > 0, punct / length).otherwise(F.lit(0.0))
    low = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = sum(_count_occurrences(low, w) for w in STOPWORDS["en"])
    words = F.size(F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")).cast("double")
    stop_ratio = F.when(words > 0, stop_hits / words).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(length / 1000.0, F.lit(1.0))
        + F.lit(0.3) * F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
        + F.lit(0.3) * F.least(stop_ratio * 10.0, F.lit(1.0))
    )
    return df.withColumn("quality", F.round(score, 6))


def lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """N-gram (stopword-trigram) language heuristic: language with the most
    stopword hits; tie → 'und' (undetermined also when zero hits)."""
    low = F.concat(F.lit(" "), F.lower(F.col(text)), F.lit(" "))
    hits = {
        lang: sum(_count_occurrences(low, w) for w in ws).alias(f"hits_{lang}")
        for lang, ws in STOPWORDS.items()
    }
    d = df.select("*", *hits.values())
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    n_best = sum(F.when(F.col(f"hits_{l}") == best, 1).otherwise(0) for l in langs)
    pred = F.when((best > 0) & (n_best == 1),
                  F.coalesce(*[F.when(F.col(f"hits_{l}") == best, F.lit(l)) for l in langs])
                  ).otherwise(F.lit("und"))
    return d.withColumn("lang_pred", pred).drop(*[f"hits_{l}" for l in langs])


def fingerprint(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Rolling document fingerprint: polynomial hash over word-token md5s —
    order-sensitive (unlike a bag-of-words hash), decomposed as
    Σ h(tok_i)·31^(n−1−i) mod p via aggregate(); deterministic and
    SQL-twinnable."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text))), r"\s+"), lambda x: x != "")
    # p near 2^40: acc*31 + h(32-bit) < 2^45 + 2^32 — overflow-safe int64
    p = 1099511627689
    h = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * F.lit(31) + h(w)) % F.lit(p),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
