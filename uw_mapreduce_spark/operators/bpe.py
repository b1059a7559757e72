"""BPE (byte-pair-encoding) merge training: learn a subword merge
table from the corpus — the tokenizer-training step of an LLM data
pipeline, as an iterative Spark algorithm.

Scale shape (how real BPE trainers stay fast, declared in DataFrame
ops): training runs on the WORD HISTOGRAM, not the corpus — one
explode+groupBy collapses 100 TB of text into a vocabulary-sized
(word, count) table, and every subsequent iteration touches only that.
Each merge round is
  1. one pair-count aggregate (explode adjacent symbol pairs, weighted
     by word count — map-side partial agg carries (pair, count)),
  2. a ONE-ROW argmax collect (the driver picks the next merge — the
     same bounded-collect idiom as the catalog's scalar subqueries),
  3. a map-only fold that applies the merge inside each word's symbol
     array (greedy left-to-right, the standard BPE application order).
localCheckpoint every few rounds keeps the lineage flat, as in
``operators/graph.connected_components``.

Determinism: ties on pair count break lexicographically on (left,
right), so the merge table is a pure function of the corpus.  No SQL
twin exists (the loop is inherently iterative — same class as IVF
k-means), so the catalog entry takes the driver's rows-only check and
the pytest suite pins the result against a pure-Python reference
trainer exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _sq(s: str) -> str:
    """Escape a symbol for embedding in a SQL string literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(left: str, right: str) -> str:
    """Greedy left-to-right application of one merge inside a symbol
    array, as a fold: if the top of the accumulator is ``left`` and the
    incoming symbol is ``right``, replace the top with the merged
    symbol; otherwise push.  Non-overlapping by construction (the
    merged symbol no longer equals ``left`` unless left+right == left,
    which is impossible for non-empty right)."""
    l, r = _sq(left), _sq(right)
    return f"""
      aggregate(s, CAST(array() AS array<string>), (acc, x) ->
        CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l}' AND x = '{r}'
             THEN concat(slice(acc, 1, size(acc) - 1), array('{l}{r}'))
             ELSE concat(acc, array(x)) END)
    """


def bpe_train(docs: DataFrame, *, n_merges: int = 8, text_col: str = "text",
              min_pair_count: int = 2, checkpoint_every: int = 4) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns a driver-built DataFrame (merge_rank, left, right,
    pair_count) — deterministic in the corpus, independent of
    partitioning.  Stops early when no pair reaches
    ``min_pair_count``."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    syms = words.select(
        F.expr("filter(split(w, ''), x -> x <> '')").alias("s"), "n"
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        pairs = (
            syms.select(
                F.explode(
                    F.expr(
                        "transform(slice(s, 1, size(s) - 1),"
                        " (x, i) -> struct(x AS l, element_at(s, i + 2) AS r))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "l", "r").limit(1).collect()
        if not top or top[0]["cnt"] < min_pair_count:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((i, l, r, cnt))
        syms = syms.select(F.expr(_merge_expr(l, r)).alias("s"), "n")
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]], *,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge table: (doc, n_words, n_tokens) per doc —
    the deliverable a tokenizer-training run feeds back into the
    pipeline (tokens-per-doc under the learned vocab drives packing
    and cost estimates).

    Map-only: each merge is one fold expression applied in rank order
    (the order BPE semantics require); n merges nest n folds over each
    word's symbol array — all Catalyst, no shuffle, no python."""
    words = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    sym_of_word = "filter(split(w, ''), x -> x <> '')"
    expr = sym_of_word
    for left, right in merges:
        l, r = _sq(left), _sq(right)
        expr = f"""
          aggregate({expr}, CAST(array() AS array<string>), (acc, x) ->
            CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l}' AND x = '{r}'
                 THEN concat(slice(acc, 1, size(acc) - 1), array('{l}{r}'))
                 ELSE concat(acc, array(x)) END)
        """
    per_word = F.expr(f"transform(_words, w -> size({expr}))")
    return (
        docs.select(F.col(id_col), words.alias("_words"))
        .select(
            id_col,
            F.size("_words").cast("long").alias("n_words"),
            F.aggregate(
                per_word, F.lit(0), lambda a, v: a + v
            ).cast("long").alias("n_tokens"),
        )
    )


def bpe_prefix_token_totals(docs: DataFrame,
                            merges: list[tuple[str, str]], *,
                            text_col: str = "text") -> list[int]:
    """Corpus-total token counts under every PREFIX of the merge table:
    element k = Σ tokens with the first k merges applied (element 0 =
    raw symbol count, element len(merges) = the full vocabulary).

    One map-only pass: the k+1 prefix encoders are sibling sum
    aggregates over the same scan (each prefix expression nests the
    previous one, so Catalyst evaluates a chain, not k² folds), and the
    single collected row is the bookkeeping a trainer audits — the
    per-rank token reduction each merge actually achieved."""
    words = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    sym_of_word = "filter(split(w, ''), x -> x <> '')"
    exprs = [sym_of_word]
    for left, right in merges:
        l, r = _sq(left), _sq(right)
        exprs.append(f"""
          aggregate({exprs[-1]}, CAST(array() AS array<string>), (acc, x) ->
            CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l}' AND x = '{r}'
                 THEN concat(slice(acc, 1, size(acc) - 1), array('{l}{r}'))
                 ELSE concat(acc, array(x)) END)
        """)
    aggs = [
        F.sum(
            F.expr(
                f"aggregate(transform(_words, w -> size({e})), 0L, (a, v) -> a + v)"
            )
        ).cast("long").alias(f"t{k}")
        for k, e in enumerate(exprs)
    ]
    row = docs.select(words.alias("_words")).agg(*aggs).collect()[0]
    return [int(row[f"t{k}"]) for k in range(len(exprs))]
