"""BM25 retrieval (`operators/retrieval.py`).

The DuckDB oracle proves Spark↔DuckDB agreement; this test proves both
agree with the MATH by re-implementing the rational-BM25 integer
formula in plain Python on a tiny corpus and comparing exactly.
"""

from __future__ import annotations

from uw_mapreduce_spark.operators.retrieval import bm25_topk

DOCS = [
    ("d1", "hash join hash join hash"),
    ("d2", "hash scan filter scan scan scan scan scan"),
    ("d3", "join join window stream window"),
    ("d4", "filter"),
]
QUERIES = [("q1", ["hash", "join"]), ("q2", ["filter"])]


def _py_bm25(docs, queries, k1_milli=1200, b_milli=750):
    toks = {i: t.split() for i, t in docs}
    d = len(toks)
    t_total = sum(len(v) for v in toks.values())
    terms = {t for _, ts in queries for t in ts}
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for qid, qterms in queries:
        scores = {}
        for i, v in toks.items():
            s = 0
            for term in qterms:
                tf = v.count(term)
                if not tf:
                    continue
                avgdl = (1000 * t_total) // d
                dlr = (1000000 * len(v)) // avgdl
                inner = (1000 - b_milli) + (b_milli * dlr) // 1000
                k1t = (k1_milli * inner) // 1000
                den = 1000 * tf + k1t
                tfn = ((1000 + k1_milli) * tf * 1000) // den
                idf = (1000 * (2 * (d - df[term]) + 1)) // (2 * df[term] + 1)
                s += (tfn * idf) // 1000
            if s:
                scores[i] = s
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def test_bm25_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in bm25_topk(docs, QUERIES, k=10).collect()
    }
    want = _py_bm25(DOCS, QUERIES)
    for qid, ranked in want.items():
        for rank, (doc, score) in enumerate(ranked, start=1):
            assert got[(qid, rank)] == (doc, score)
    assert len(got) == sum(len(v) for v in want.values())


def test_bm25_rewards_tf_and_penalizes_df(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    rows = {r["rank"]: r for r in bm25_topk(docs, [("q", ["hash"])], k=10).collect()}
    # d1 has tf=3 of 'hash' in a short doc; d2 has tf=1 in a longer doc.
    assert rows[1]["doc_id"] == "d1" and rows[2]["doc_id"] == "d2"
    assert rows[1]["score_micro"] > rows[2]["score_micro"] > 0


def test_rrf_fuse_prefers_docs_in_both_lists(spark):
    from uw_mapreduce_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        "query_id string, doc_id string, rank long",
    )
    b = spark.createDataFrame(
        [("q", "d2", 1), ("q", "d4", 2)],
        "query_id string, doc_id string, rank long",
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(a, b, k=10).collect()}
    # d2 appears in both lists: 1e6//62 + 1e6//61 beats d1's 1e6//61.
    assert rows["d2"]["rank"] == 1
    assert rows["d2"]["rrf_micro"] == 1000000 // 62 + 1000000 // 61
    assert rows["d1"]["rrf_micro"] == 1000000 // 61
    assert set(rows) == {"d1", "d2", "d3", "d4"}


def test_phrase_search_adjacency_and_overlaps(spark):
    from uw_mapreduce_spark.operators.retrieval import phrase_search

    rows = [
        (1, "value table wins"),          # one match
        (2, "value of the table"),        # terms present, not adjacent
        (3, "value table value table"),   # two matches
        (4, "table value"),               # wrong order
        (5, "table table table"),         # self-phrase overlap below
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_matches for r in phrase_search(df, ["value", "table"]).collect()}
    assert got == {1: 1, 3: 2}
    # Overlapping self-phrase counts per start position (token space).
    got2 = {r.doc_id: r.n_matches for r in phrase_search(df, ["table", "table"]).collect()}
    assert got2 == {5: 2}
    # 3-token phrase stitches two adjacency joins.
    got3 = {r.doc_id: r.n_matches for r in phrase_search(df, ["value", "table", "wins"]).collect()}
    assert got3 == {1: 1}


def test_proximity_search_window_and_distance(spark):
    from uw_mapreduce_spark.operators.retrieval import proximity_search

    rows = [
        (1, "scan the big query now"),       # dist 3
        (2, "scan a b c d e f query"),       # dist 7 > 5 -> out
        (3, "query then scan then query"),   # dists 2 and 2 -> 2 pairs
        (4, "scan only here"),               # missing term
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_pairs, r.min_dist)
        for r in proximity_search(df, "scan", "query", window=5).collect()
    }
    assert got == {1: (1, 3), 3: (2, 2)}
