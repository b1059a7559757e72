"""Text-analysis expressions for large-scale corpus pipelines.

All pure Catalyst expressions (JVM-side, codegen'd) — no Python UDFs in
the hot path.  The reference's only scalar function is int-parse
(SURVEY.md §2.2); this module is the LLM-pipeline extension surface:
tokenization, quality scoring, fingerprinting, language ID.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

TOKEN_SPLIT_RE = r"\s+"
PUNCT_CLASS = "[.,!?;:]"
# Small, fixed stopword profiles.  Deliberately tiny and deterministic —
# a language-ID *heuristic*, not a model; swap in real profiles at will.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "du", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "del", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.trim(F.lower(text)), TOKEN_SPLIT_RE)


def bpe_ish_tokens(text: Column) -> Column:
    """Sub-word-ish tokenization: split on whitespace AND punctuation /
    letter-digit boundaries — a cheap stand-in for BPE token counting."""
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(text), r"([\p{Punct}])", r" $1 "),
        r"(\d+)",
        r" $1 ",
    )
    return F.filter(F.split(F.trim(normalized), r"\s+"), lambda t: t != F.lit(""))


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Number of tokens (with repeats) that appear in ``words``."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality statistics.

    Ratios are returned as exact integers per mille (floor(1000·x)) so the
    result is bit-stable across engines (IEEE division then floor is
    deterministic; raw double ratios are hash-fragile).
    """
    # Tokenize and count in their own projection (no CSE across sibling
    # expressions): the regex split and the distinct-size each run once
    # per row instead of once per consumer.
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        F.col(text_col),
        F.col("_toks"),
        F.size("_toks").alias("_n_tokens"),
        F.size(F.array_distinct("_toks")).alias("_n_uniq"),
    )
    n_chars = F.length(F.col(text_col))
    stop = stopword_hits(F.col("_toks"), STOPWORDS["en"])
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    return base.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        F.col("_n_tokens").cast("long").alias("n_tokens"),
        F.col("_n_uniq").cast("long").alias("n_uniq_tokens"),
        punct.cast("long").alias("n_punct"),
        stop.cast("long").alias("n_stopwords"),
        F.floor(F.lit(1000.0) * stop / F.col("_n_tokens"))
        .cast("long")
        .alias("stopword_permille"),
        F.floor(F.lit(1000.0) * F.col("_n_uniq") / F.col("_n_tokens"))
        .cast("long")
        .alias("uniq_permille"),
    )


def lang_id_from_tokens(toks: Column) -> Column:
    """Heuristic language ID over a pre-tokenized array: argmax of
    stopword-profile hit counts.

    Ties break lexicographically-descending on the language code via the
    struct ordering, making the answer deterministic.  Returns 'und' when
    no profile matches at all.

    ``toks`` is referenced once per language profile, and Catalyst does
    NOT de-duplicate sibling expressions — pass a projected COLUMN (a
    cheap leaf reference), not the ``tokens(...)`` regex-split
    expression, or the split runs once per profile (measured ~2× on
    `lang_id_documents`).
    """
    scored = F.array(
        *[
            F.struct(
                stopword_hits(toks, words).alias("score"),
                F.lit(code).alias("lang"),
            )
            for code, words in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(text: Column) -> Column:
    """One-expression convenience wrapper over ``lang_id_from_tokens``
    (re-tokenizes per profile; prefer projecting tokens first in hot
    paths)."""
    return lang_id_from_tokens(tokens(text))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized, lowercased text.

    Identical in any engine with md5 (DuckDB oracle included); the
    rolling-hash winnowing variant lives in operators/dedup.py (simhash).
    """
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "))


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}[-.][0-9]{3,4}[-.]?[0-9]{0,4}"


def redact_pii(text: Column) -> Column:
    """Scrub email addresses then phone-like digit runs, replacing each
    with a typed token.  Both patterns stay inside the regex subset that
    Java regex (Spark) and RE2 (DuckDB oracle) treat identically — no
    backreferences, no lookaround — so redaction is engine-exact.
    Expression-only: runs inside whole-stage codegen, no UDF."""
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in ``text``; counting emails first and
    phones on the email-redacted text mirrors ``redact_pii``'s pass
    order so counts always equal replacements."""
    n_email = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
    redacted = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    n_phone = F.size(F.regexp_extract_all(redacted, F.lit(PHONE_RE), 0))
    return n_email, n_phone


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition signals (Gopher-style quality gates):
    the per-mille share of the most frequent token and of the most
    frequent token bigram.  High values mean degenerate/boilerplate text
    a curation pass drops.

    ONE corpus pass: unigrams and bigrams explode together as tagged
    structs, so the corpus is tokenized once and one shuffle carries all
    (doc, kind, gram) counts; per-doc signals come from a conditional
    aggregate, no join (an earlier two-branch version tokenized the
    corpus twice — once per signal)."""
    toks = df.select(F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("ts"))
    uni = F.transform(F.col("ts"), lambda t: F.struct(F.lit("u").alias("kind"), t.alias("g")))
    bi = F.expr(
        "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
        " (t, i) -> struct('b' AS kind, concat(t, ' ', ts[i + 1]) AS g))"
    )
    both = (
        toks.select("doc", F.explode(F.concat(uni, bi)).alias("kg"))
        .select("doc", F.col("kg.kind").alias("kind"), F.col("kg.g").alias("g"))
        .where(F.col("g") != "")  # empty/whitespace-only docs drop out (oracle parity)
    )
    counts = both.groupBy("doc", "kind", "g").agg(F.count(F.lit(1)).alias("c"))
    u_c = F.when(F.col("kind") == "u", F.col("c"))
    b_c = F.when(F.col("kind") == "b", F.col("c"))
    return (
        counts.groupBy("doc")
        .agg(
            F.max(u_c).alias("u_top"), F.sum(u_c).alias("u_n"),
            F.max(b_c).alias("b_top"), F.sum(b_c).alias("b_n"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.floor(F.lit(1000.0) * F.col("u_top") / F.col("u_n")).cast("long").alias("top_token_permille"),
            F.coalesce(
                F.floor(F.lit(1000.0) * F.col("b_top") / F.col("b_n")).cast("long"), F.lit(0)
            ).alias("top_bigram_permille"),
        )
    )


def tf_df_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document most DISTINCTIVE terms: top-k by the tf/df ratio —
    the tf-idf ordering with the corpus-constant factor dropped and the
    log removed, so the score floor(10^6·tf/df) is integer-operand IEEE
    division + floor: bit-identical across engines (double SUMS are
    shuffle-order-sensitive; a single division of two small ints is
    correctly rounded everywhere).  Ties break on the term.

    Plan: one (doc, term) count aggregate; document frequency is a
    second aggregate OVER THE FIRST's output (rows are distinct
    (doc, term), so count = df — the corpus is not re-scanned); a
    broadcast-friendly join keyed by term; per-doc top-k window.  The
    shuffles carry (doc, term) count rows, never the corpus text.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = (
        toks.where(F.col("term") != "")  # empty docs drop out (oracle parity)
        .groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf feeds both dfreq and the join's left side: persist + eager
    # count so the corpus explode+aggregate runs once, not per subtree
    # (the repo-wide shared-subtree convention; see dedup.py).
    from ..caching import persist_scoped

    tf = persist_scoped(tf, "uwms.text")
    tf.count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.floor(F.lit(1_000_000.0) * F.col("tf") / F.col("df")).cast("long")
    )
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("doc").alias(id_col), "term", "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
