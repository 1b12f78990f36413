"""BM25 retrieval: integer-exact scoring vs an independent pure-Python
replica, ranking semantics, and plan shape (postings pruned by broadcast
before the aggregation shuffle)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from geojson_spark.operators.retrieval import bm25_topk

DOCS = [
    (1, "red fish blue fish"),
    (2, "red red red herring"),
    (3, "blue whale"),
    (4, "green  eggs and ham"),  # double space: empty tokens must drop
    (5, "fish and chips and fish"),
    (6, "completely unrelated words here"),
]
QUERY_TERMS = [(0, "red"), (0, "fish"), (1, "blue"), (1, "whale"), (2, "zzz")]


def _reference_bm25(docs, query_terms, k=5):
    """Independent replica with Python ints (arbitrary precision)."""
    words = {d: t.split() for d, t in docs}
    dl = {d: len(w) for d, w in words.items()}
    n, t_corpus = len(words), sum(dl.values())
    tf = {d: Counter(w) for d, w in words.items()}
    terms = {w for _, w in query_terms}
    df = {w: sum(1 for d in words if tf[d][w] > 0) for w in terms}
    out = []
    for q in sorted({q for q, _ in query_terms}):
        scores = {}
        for qq, w in query_terms:
            if qq != q or df.get(w, 0) == 0:
                continue
            idf = (1000 * (2 * n - 2 * df[w] + 1)) // (2 * df[w] + 1)
            for d in words:
                f_ = tf[d][w]
                if f_ == 0:
                    continue
                tn = (1000 * 22 * t_corpus * f_) // (
                    10 * t_corpus * f_ + 3 * t_corpus + 9 * dl[d] * n
                )
                scores[d] = scores.get(d, 0) + idf * tn
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out.extend((q, d, s, i + 1) for i, (d, s) in enumerate(ranked))
    return sorted(out)


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame(QUERY_TERMS, "q_id int, term string")
    got = sorted(tuple(r) for r in bm25_topk(docs, qt, k=5).collect())
    assert got == _reference_bm25(DOCS, QUERY_TERMS)
    # query 2's only term matches nothing → no rows for it
    assert not [r for r in got if r[0] == 2]
    # rare term outranks common: doc 3 ("blue whale") tops query 1 because
    # whale's idf dwarfs blue's
    q1_top = next(r for r in got if r[0] == 1 and r[3] == 1)
    assert q1_top[1] == 3


def test_bm25_rank_is_dense_and_bounded(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame(QUERY_TERMS, "q_id int, term string")
    rows = bm25_topk(docs, qt, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r.rn)
    for q, rns in by_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))
        assert len(rns) <= 2


def test_bm25_plan_prunes_postings_before_shuffle(spark):
    """The explode→terms join must be a BroadcastHashJoin BELOW the
    (doc, term) HashAggregate, so non-query words never reach a shuffle.
    Inspected through the lazy (corpus_stats-provided) variant — the
    self-managed variant materializes eagerly via localCheckpoint, whose
    executed plan is just the RDD scan."""
    from geojson_spark.operators.retrieval import bm25_corpus_stats

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame(QUERY_TERMS, "q_id int, term string")
    out = bm25_topk(docs, qt, k=5, corpus_stats=bm25_corpus_stats(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere: every join side is broadcast-sized
    assert "SortMergeJoin" not in plan
    # bounded pre-reduce: the per-(query, salt) top-k window runs before
    # the global per-query rank, so two row_number windows appear
    assert plan.count("row_number") >= 2
    # both variants agree with each other (two-stage rank is lossless)
    lazy = sorted(tuple(r) for r in out.collect())
    eager = sorted(tuple(r) for r in bm25_topk(docs, qt, k=5).collect())
    assert lazy == eager


def test_bm25_releases_its_persist_and_handles_null_text(spark):
    """Self-managed corpus stats must not leak storage across calls, and a
    null-text doc must count as dl = 0 toward corpus stats (never the
    F.size(NULL) = -1 hazard) while matching no terms."""
    docs_null = DOCS + [(7, None)]
    docs = spark.createDataFrame(docs_null, "doc_id long, text string")
    qt = spark.createDataFrame(QUERY_TERMS, "q_id int, term string")
    jsc = spark.sparkContext._jsc.sc()
    before = {s.id() for s in jsc.getRDDStorageInfo()}
    got = sorted(tuple(r) for r in bm25_topk(docs, qt, k=5).collect())
    # reference replica treats the null doc as empty text
    ref = _reference_bm25([(d, t or "") for d, t in docs_null], QUERY_TERMS)
    assert got == ref
    assert not [r for r in got if r[1] == 7]
    # the corpus-wide tokenized persist is released before returning; the
    # only NEW storage is the bounded localCheckpoint of the result itself
    # (one generically-named MapPartitionsRDD) — a leaked `sized` persist
    # would show up as a second new cached RDD
    new = [
        s for s in jsc.getRDDStorageInfo()
        if s.id() not in before and s.numCachedPartitions() > 0
    ]
    assert len(new) <= 1, [(s.id(), s.name()) for s in new]


def test_repetition_stats_hand_checked(spark):
    from geojson_spark.functions.spark_funcs import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # words: 4/2 distinct, top=3; bigrams: a a, a a, a b → 3/2; tri: a a a, a a b → 2/2
            (2, "x"),                # 1 word, no bigrams/trigrams
            (3, ""),                 # empty → all zero
            (4, "p q p q p q"),      # period-2: bigrams 5/2 distinct, trigrams 4/2
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = rows[1]
    assert (r1.n_words, r1.n_distinct_words, r1.top_word_freq) == (4, 2, 3)
    assert (r1.n_bigrams, r1.n_distinct_bigrams) == (3, 2)
    assert (r1.n_trigrams, r1.n_distinct_trigrams) == (2, 2)
    assert r1.dup_word_milli == 1000 * 2 // 4 and r1.dup_bigram_milli == 1000 * 1 // 3
    assert r1.dup_trigram_milli == 0
    r2 = rows[2]
    assert (r2.n_words, r2.top_word_freq, r2.n_bigrams, r2.n_trigrams) == (1, 1, 0, 0)
    r3 = rows[3]
    assert (r3.n_words, r3.top_word_freq, r3.dup_word_milli) == (0, 0, 0)
    r4 = rows[4]
    assert (r4.n_bigrams, r4.n_distinct_bigrams) == (5, 2)
    assert (r4.n_trigrams, r4.n_distinct_trigrams) == (4, 2)
    assert r4.dup_word_milli == 1000 * 4 // 6


def test_repetition_stats_is_zero_shuffle(spark):
    from geojson_spark.functions.spark_funcs import repetition_stats

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
