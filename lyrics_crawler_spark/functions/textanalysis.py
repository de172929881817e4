"""Text-analysis operators for the training-data pipeline: language id
(stopword-ratio heuristic), quality scoring, token counting, and document
fingerprinting. All pure Catalyst; all ratios are integer-exact
(thousandths) so DuckDB oracles verify bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lyrics_crawler_spark.operators.textdedup import tokens_expr

EN_STOPWORDS = (
    "the of and a to in is it you that he was for on are as with his they "
    "i at be this have from or had by not word but what some we can out "
    "other were all there when up use your how said an each she"
).split()


def _stop_set_sql() -> str:
    inner = ",".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"array({inner})"


def text_features(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Per-document features: token count, char count, stopword ratio
    (thousandths), punctuation ratio (thousandths), mean token length
    (thousandths), language guess, quality score (0-1000)."""
    toks = tokens_expr(text_col)
    stop = _stop_set_sql()
    out = docs.selectExpr(
        key_col,
        f"length({text_col}) as n_chars",
        f"size({toks}) as n_tokens",
        f"size(filter({toks}, t -> array_contains({stop}, t))) as n_stop",
        f"length(regexp_replace({text_col}, '[a-zA-Z0-9 ]', '')) as n_punct",
        f"aggregate({toks}, 0L, (acc, t) -> acc + length(t)) as tok_chars",
    )
    out = (
        out.withColumn(
            "stop_ratio_m",
            F.floor(F.lit(1000) * F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))).cast("bigint"),
        )
        .withColumn(
            "punct_ratio_m",
            F.floor(F.lit(1000) * F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1))).cast("bigint"),
        )
        .withColumn(
            "mean_tok_len_m",
            F.floor(F.lit(1000) * F.col("tok_chars") / F.greatest(F.col("n_tokens"), F.lit(1))).cast("bigint"),
        )
        .withColumn(
            "lang_guess",
            F.when(F.col("stop_ratio_m") >= 150, F.lit("en")).otherwise(F.lit("other")),
        )
    )
    # quality: long enough, not punctuation soup, plausible token lengths
    return out.withColumn(
        "quality_m",
        F.greatest(
            F.lit(0),
            F.least(F.lit(1000), F.col("n_tokens") * 2)
            - F.col("punct_ratio_m")
            - F.when(
                (F.col("mean_tok_len_m") < 2000) | (F.col("mean_tok_len_m") > 12000),
                F.lit(200),
            ).otherwise(F.lit(0)),
        ).cast("bigint"),
    )


def repetition_ratio(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Within-document repetition (Gopher-style quality rule: "fraction
    of duplicate n-grams"): 1 − distinct/total over word n-gram
    shingles, in integer thousandths. High values flag boilerplate,
    chorus-looping, and template spam — the single strongest in-document
    text-quality signal for training-data filtering. Pure Catalyst
    (array ops on the shingle expression shared with the dedup family);
    docs too short for one shingle report 0 repetition over 0 shingles."""
    from lyrics_crawler_spark.operators.textdedup import shingles_expr

    sh = shingles_expr(text_col, n)
    return docs.selectExpr(
        key_col,
        f"cast(size({sh}) as bigint) as n_shingles",
        f"cast(size(array_distinct({sh})) as bigint) as n_distinct",
    ).selectExpr(
        key_col,
        "n_shingles",
        "n_distinct",
        "cast(floor(1000 * (n_shingles - n_distinct) / greatest(n_shingles, 1L)) "
        "as bigint) as rep_m",
    )


def fingerprint(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercase, whitespace-
    collapsed text (portable to any engine with md5)."""
    return docs.selectExpr(
        key_col,
        f"md5(regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')) as fingerprint",
    )
