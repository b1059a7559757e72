"""Corpus bigram language model scoring — the statistical-LM quality
gate for training-data curation.

doc_stats/repetition gates catch length and degenerate-repeat
pathologies; what they miss is SCRAMBLED text — real words in
improbable order (boilerplate shreds, OCR soup, spam keyword salads).
The classic cheap detector is an n-gram LM trained on the corpus
itself: score each document by the average add-one-smoothed
conditional probability of its own bigrams; garbled documents sit in
the left tail.

Integer exactness: probabilities never touch floats.  With corpus
counts c(w1,w2), context counts c(w1·) and vocabulary size V, each
bigram scores

    p_permille = (1000 * (c(w1,w2) + 1)) DIV (c(w1·) + V)

and a document scores the integer mean of its bigram scores — so the
driver's DuckDB oracle replicates every value bit-for-bit.

Scale shape: per-doc bigram lists are map-only array ops; the global
bigram/context counts shuffle the VOCABULARY (map-side partial agg),
not the corpus; scoring re-shuffles doc-bigrams once on the bigram key
to meet the counts, then once on doc_id to average.  At 100 TB you
would additionally ``max_df``-prune stop-bigrams like the dedup
family; the corpus here is small enough not to bother — noted, not
implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# greatest(..., 0): slice() rejects a negative length, which an EMPTY
# document's token array would otherwise produce.
_PAIRS = (
    "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)),"
    " (x, i) -> struct(x AS w1, element_at(_toks, i + 2) AS w2))"
)


def bigram_lm_scores(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc, n_bigrams, lm_score_permille) for every document; docs
    with fewer than one bigram score 0 over 0 bigrams."""
    toks = docs.select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda x: x != F.lit("")).alias("_toks"),
    )
    doc_bigrams = toks.select(
        id_col, F.explode(F.expr(_PAIRS)).alias("p")
    ).select(id_col, "p.w1", "p.w2")
    bg = doc_bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = doc_bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_ctx"))
    vocab = toks.select(F.explode("_toks").alias("t")).agg(
        F.countDistinct("t").cast("long").alias("v")
    )
    scored = (
        doc_bigrams.join(bg, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.expr("CAST((1000 * (c_bg + 1)) DIV (c_ctx + v) AS BIGINT)").alias("p_pm"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("CAST(SUM(p_pm) DIV COUNT(1) AS BIGINT)").alias("lm_score_permille"),
    )
    all_docs = docs.select(id_col)
    return (
        all_docs.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lm_score_permille", F.lit(0)).cast("long").alias(
                "lm_score_permille"
            ),
        )
    )
