"""BPE merge training (`operators/bpe.py`) vs a pure-Python reference
trainer — exact merge-table equality, including tie-breaks and the
greedy left-to-right application order ("aaa" + (a,a) -> [aa, a]).
"""

from __future__ import annotations

from collections import Counter

from uw_mapreduce_spark.operators.bpe import bpe_train


def _py_bpe(texts, n_merges, min_count=2):
    words = Counter(w for t in texts for w in t.lower().split() if w)
    syms = {w: [list(w), n] for w, n in words.items()}
    merges = []
    for rank in range(n_merges):
        cnt = Counter()
        for s, n in syms.values():
            for a, b in zip(s, s[1:]):
                cnt[(a, b)] += n
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        if c < min_count:
            break
        merges.append((rank, l, r, c))
        for v in syms.values():
            out = []
            for x in v[0]:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            v[0] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest low newer",
    "aaa aaaa aa low",
]


def test_bpe_train_matches_pure_python(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=10).orderBy("merge_rank").collect()
    ]
    want = _py_bpe(TEXTS, 10)
    assert got == want
    assert len(got) > 3  # the corpus genuinely trains several merges


def test_bpe_greedy_merge_is_left_to_right(spark):
    # One word 'aaaa' (x3 so pairs clear min count): pair (a,a) counts
    # 3 per word occurrence; after merging, 'aaaa' -> [aa, aa] and the
    # next merge is (aa, aa).
    docs = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = [
        (r["left"], r["right"]) for r in bpe_train(docs, n_merges=2).orderBy("merge_rank").collect()
    ]
    assert got == [("a", "a"), ("aa", "aa")]


def test_bpe_encode_applies_merges_in_order(spark):
    from uw_mapreduce_spark.operators.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [("d1", "low lower low"), ("d2", "aaaa")], "doc_id string, text string"
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
    ]
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"]) for r in
           bpe_encode(docs, merges).collect()}

    def py_apply(word):
        s = list(word)
        for l, r in merges:
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            s = out
        return len(s)

    want = {
        "d1": (3, sum(py_apply(w) for w in "low lower low".split())),
        "d2": (1, py_apply("aaaa")),
    }
    assert got == want
    # merges genuinely compress: tokens < characters
    assert got["d1"][1] < len("lowlowerlow")


def test_bpe_prefix_totals_bookkeeping(spark):
    """Per-rank token reductions must reconcile with the trainer's
    recorded pair counts: exact when left != right (disjoint
    occurrences, greedy applies all), within [ceil(c/2), c] when
    left == right (overlapping runs: 'aaaa' counts 3 pairs, merges 2).
    The corpus includes both shapes."""
    import math

    from uw_mapreduce_spark.operators.bpe import bpe_prefix_token_totals

    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    mt = bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    totals = bpe_prefix_token_totals(docs, [(r["left"], r["right"]) for r in mt])
    assert len(totals) == len(mt) + 1
    # totals[0] is the raw symbol count of the tokenized corpus.
    raw = sum(len(w) for t in TEXTS for w in t.lower().split() if w)
    assert totals[0] == raw
    for k, r in enumerate(mt):
        red = totals[k] - totals[k + 1]
        if r["left"] == r["right"]:
            assert math.ceil(r["pair_count"] / 2) <= red <= r["pair_count"]
        else:
            assert red == r["pair_count"]
