"""Lexical retrieval: BM25 top-k document search over an inverted
index, computed entirely in exact integer arithmetic.

The LLM-pipeline gap this fills: the engine has embedding ANN
(`operators/similarity.py`) but training-data curation also needs
LEXICAL retrieval — benchmark decontamination by query, targeted
corpus slicing, hard-negative mining for retriever training.

Scale shape (the standard search plan, declared as DataFrame ops):
  1. tokenize once per doc; doc length rides along (no second scan),
  2. postings are filtered to the QUERY terms *before* the explode's
     aggregation, so the (doc, term, tf) shuffle carries only terms
     someone asked about — never the whole vocabulary,
  3. df and the corpus constants (D docs, T tokens → avgdl) are tiny
     aggregates broadcast into the scoring join,
  4. per-(query, doc) scores sum per-term integers; top-k is a
     row_number window per query — shuffle keyed by (tiny) query id.

Integer exactness: this is the RATIONAL BM25 variant — Robertson's
idf (D − df + 0.5)/(df + 0.5) WITHOUT the log wrap — because ln() is
not guaranteed bit-identical across engines but staged integer DIV is.
Every stage is scaled-integer (milli/micro) with explicit DIV, all
operands non-negative, so Spark's DIV (truncate) and DuckDB's //
(floor) agree and the driver's value-hash oracle can replicate scores
bit-for-bit.  Ranking quality: monotone in tf and 1/df like log-BM25,
with idf weight decaying polynomially instead of logarithmically.

Magnitude bounds (why nothing overflows int64): tf_norm_milli ≤
(k1+1)·1000 ≈ 2200; idf_milli ≤ 1000·(2D+1); their product at
D = 10^10 docs is < 4.5·10^16 — two orders under 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_score_micro(tf: str, dl: str, df: str, d: str, t: str, *,
                     k1_milli: int = 1200, b_milli: int = 750) -> Column:
    """Per-(doc, term) BM25 partial score in exact integer micro-units.

    All column names are substituted into ONE SQL string so the Spark
    expression text and the DuckDB oracle (``bm25_score_micro_sql``)
    stay structurally identical."""
    return F.expr(bm25_score_micro_sql(tf, dl, df, d, t, k1_milli=k1_milli, b_milli=b_milli))


def bm25_score_micro_sql(tf: str, dl: str, df: str, d: str, t: str, *,
                         k1_milli: int = 1200, b_milli: int = 750,
                         div: str = "DIV") -> str:
    """The scoring expression as engine-portable SQL text.

    ``div='DIV'`` for Spark, ``div='//'`` for DuckDB — every operand is
    non-negative so truncating and flooring integer division agree."""
    one_minus_b = 1000 - b_milli
    avgdl = f"((1000 * {t}) {div} {d})"
    dlr = f"((1000000 * {dl}) {div} {avgdl})"
    inner = f"({one_minus_b} + ({b_milli} * {dlr}) {div} 1000)"
    k1t = f"(({k1_milli} * {inner}) {div} 1000)"
    den = f"(1000 * {tf} + {k1t})"
    tfn = f"((({1000 + k1_milli} * {tf}) * 1000) {div} {den})"
    idf = f"((1000 * (2 * ({d} - {df}) + 1)) {div} (2 * {df} + 1))"
    return f"CAST(({tfn} * {idf}) {div} 1000 AS BIGINT)"


def bm25_topk(docs: DataFrame, queries: list[tuple[str, list[str]]], *,
              k: int = 5, id_col: str = "doc_id", text_col: str = "text",
              k1_milli: int = 1200, b_milli: int = 750) -> DataFrame:
    """Top-k docs per query by rational BM25.

    ``queries`` is a small in-memory list of (query_id, terms) — it
    broadcasts.  Returns (query_id, rank, doc_id, score_micro)."""
    spark = docs.sparkSession
    qterms = sorted({t for _, ts in queries for t in ts})
    toks = docs.select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda x: x != F.lit("")).alias("toks"),
    )
    # tf AND dl in one pass: dl is constant per doc, so it rides the
    # (doc, term) group-by instead of costing a second join against a
    # lengths table.
    postings = (
        toks.select(
            id_col,
            F.size("toks").cast("long").alias("dl"),
            F.explode(F.filter("toks", lambda x: x.isin(*qterms))).alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = toks.agg(
        F.count(F.lit(1)).cast("long").alias("d_docs"),
        F.sum(F.size("toks")).cast("long").alias("t_tokens"),
    )
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in queries for t in ts], "query_id string, term string"
    )
    scored = (
        postings.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "query_id",
            id_col,
            bm25_score_micro(
                "tf", "dl", "df", "d_docs", "t_tokens",
                k1_milli=k1_milli, b_milli=b_milli,
            ).alias("term_score_micro"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("term_score_micro").cast("long").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_micro").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score_micro")
    )


def bm25_topk_oracle_sql(queries: list[tuple[str, list[str]]], *, k: int = 5,
                         k1_milli: int = 1200, b_milli: int = 750) -> str:
    """DuckDB twin of ``bm25_topk`` built from the SAME query list and
    the SAME scoring-SQL generator, so the two engines cannot drift."""
    values = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in queries for t in ts
    )
    in_list = ", ".join(f"'{t}'" for t in sorted({t for _, ts in queries for t in ts}))
    score = bm25_score_micro_sql(
        "tf", "dl", "df", "d_docs", "t_tokens",
        k1_milli=k1_milli, b_milli=b_milli, div="//",
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             x -> x <> '') AS toks
  FROM documents
),
posting AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, tok AS term,
         CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, toks, unnest(toks) AS tok FROM toks)
  WHERE tok IN ({in_list})
  GROUP BY doc_id, dl, term
),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM posting GROUP BY term),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS d_docs,
         CAST(COALESCE(SUM(len(toks)), 0) AS BIGINT) AS t_tokens
  FROM toks
),
q(query_id, term) AS (VALUES {values}),
scored AS (
  SELECT query_id, doc_id, CAST(SUM({score}) AS BIGINT) AS score_micro
  FROM posting JOIN q USING (term) JOIN dfs USING (term), corpus
  GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id, score_micro FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame, *, k: int = 10,
             c_const: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of two (query_id, doc_id, rank) lists —
    the standard way to merge lexical (BM25) and vector (ANN) rankings
    without comparable scores.  Contribution of each list is
    floor(10^6 / (c + rank)) — integer DIV, so the fused scores are
    engine-exact.  A doc present in only one list simply gets one
    contribution (the union-groupBy IS the full outer join).

    Scale: both inputs are already top-k-per-query (tiny relative to
    the corpus); the fuse is one shuffle keyed by (query, doc)."""
    def pts(df: DataFrame) -> DataFrame:
        return df.select(
            "query_id", "doc_id",
            F.expr(f"1000000 DIV ({c_const} + rank)").alias("pts"),
        )

    fused = (
        pts(ranked_a).unionByName(pts(ranked_b))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("pts").cast("long").alias("rrf_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_micro").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_micro")
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search via a POSITIONAL inverted index: emit
    (doc, n_matches) for documents containing the tokens of ``phrase``
    consecutively, in order.

    Plan: one posexplode builds (doc, pos, term) postings, FILTERED to
    the phrase's terms before any shuffle (the pruning that makes a
    positional index beat a LIKE scan at 100 TB — the join moves only
    the phrase terms' postings, typically a sliver of the corpus), then
    len(phrase)−1 equi-joins on (doc, pos+i) stitch adjacency.  Match
    positions count in TOKEN space, so overlapping self-phrases
    ('table table' in 'table table table' = 2) count per start
    position — same contract as the SQL twin's adjacency count."""
    if len(phrase) < 2:
        raise ValueError("phrase needs >= 2 tokens (use tf/df search for one)")
    terms = [t.lower() for t in phrase]
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    ).where(F.col("term").isin(terms))
    out = (
        toks.where(F.col("term") == terms[0])
        .select("doc", F.col("pos").alias("p0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = toks.where(F.col("term") == t).select(
            "doc", (F.col("pos") - i).alias("p0")
        )
        out = out.join(nxt, ["doc", "p0"])
    return (
        out.groupBy("doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
        .select(F.col("doc").alias(id_col), "n_matches")
    )


def proximity_search(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    window: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR/w search: documents where ``term_a`` and ``term_b`` occur
    within ``window`` token positions (either order) — the ranked-
    retrieval primitive between exact phrase and bag-of-words.

    Same positional-index shape as `phrase_search` (postings pruned to
    the two terms pre-shuffle), but the stitch is a |Δpos| ≤ w band
    join on the doc key.  Output (doc, n_pairs, min_dist): pair count
    and the closest co-occurrence distance, both token-space integers."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    ).where(F.col("term").isin([term_a.lower(), term_b.lower()]))
    a = toks.where(F.col("term") == term_a.lower()).select("doc", F.col("pos").alias("pa"))
    b = toks.where(F.col("term") == term_b.lower()).select("doc", F.col("pos").alias("pb"))
    pairs = a.join(b, "doc").where(
        F.abs(F.col("pa") - F.col("pb")) <= window
    )
    return (
        pairs.groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min(F.abs(F.col("pa") - F.col("pb"))).cast("long").alias("min_dist"),
        )
        .select(F.col("doc").alias(id_col), "n_pairs", "min_dist")
    )
