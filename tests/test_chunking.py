"""Unit semantics for datapipe.chunking: span dedup keep-first, chunk
boundary arithmetic, tf-idf ranking, posting-list caps."""

import math

import pytest
from pyspark.sql import functions as F

from imposm3_spark.datapipe import chunking as ck


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# span_dedup
# ---------------------------------------------------------------------------


def test_span_dedup_keep_first(spark):
    # width=2 spans; doc 1 repeats doc 0's first span, doc 2 repeats its own
    docs = _docs(
        spark,
        [
            (0, "a b c d"),       # spans: "a b", "c d"
            (1, "a b x y"),       # "a b" dup of doc0 span0 -> dropped
            (2, "p q p q"),       # second "p q" dup of its own first
        ],
    )
    out = {
        r["doc_id"]: r
        for r in ck.span_dedup(docs, width=2).collect()
    }
    assert out[0]["n_spans"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["dedup_text"] == "a b c d"
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["dedup_text"] == "x y"
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["dedup_text"] == "p q"


def test_span_dedup_short_tail_and_case(spark):
    # 5 tokens at width=2 -> 3 spans, last is a single token; case-folds
    docs = _docs(spark, [(0, "A b a B x")])
    row = ck.span_dedup(docs, width=2).collect()[0]
    assert row["n_spans"] == 3
    # spans: "a b", "a b" (dup), "x"
    assert row["n_kept"] == 2
    assert row["dedup_text"] == "a b x"


def test_span_dedup_empty_doc_omitted(spark):
    docs = _docs(spark, [(0, "a b"), (1, "   ")])
    ids = [r["doc_id"] for r in ck.span_dedup(docs, width=2).collect()]
    assert ids == [0]


# ---------------------------------------------------------------------------
# chunk_overlap
# ---------------------------------------------------------------------------


def test_chunk_boundaries(spark):
    toks = [f"t{i}" for i in range(11)]
    docs = _docs(spark, [(0, " ".join(toks))])
    rows = sorted(
        ck.chunk_overlap(docs, chunk_size=4, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    # n=11, C=4, S=3 -> 1 + ceil(7/3) = 4 chunks: [0:4),[3:7),[6:10),[9:11)
    assert [r["chunk_text"] for r in rows] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
        "t9 t10",
    ]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 2]


def test_chunk_exact_fit_no_empty_tail(spark):
    docs = _docs(spark, [(0, "a b c d e f")])
    rows = ck.chunk_overlap(docs, chunk_size=3, stride=3).collect()
    # n=6, C=S=3 -> exactly 2 chunks, no empty third
    assert sorted(r["chunk_text"] for r in rows) == ["a b c", "d e f"]


def test_chunk_short_doc_single_chunk(spark):
    docs = _docs(spark, [(0, "a b"), (1, "")])
    rows = ck.chunk_overlap(docs, chunk_size=5, stride=4).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b"


def test_chunk_bad_stride_rejected(spark):
    docs = _docs(spark, [(0, "a")])
    with pytest.raises(ValueError):
        ck.chunk_overlap(docs, chunk_size=3, stride=4)


# ---------------------------------------------------------------------------
# tfidf_topk / inverted_index
# ---------------------------------------------------------------------------


def test_tfidf_values_and_ranking(spark):
    docs = _docs(
        spark,
        [
            (0, "x x x common"),
            (1, "y common"),
            (2, "common common"),
        ],
    )
    rows = ck.tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'common' appears in all 3 docs -> idf = ln(1) = 0 everywhere
    for r in rows:
        if r["term"] == "common":
            assert r["tfidf"] == 0.0
    # doc0: x has cnt=3, df=1 -> 3*ln(3)
    top0 = sorted(by_doc[0], key=lambda r: -r["tfidf"])[0]
    assert top0["term"] == "x"
    assert top0["tfidf"] == pytest.approx(round(3 * math.log(3), 6))
    # k=2 cap holds
    assert all(len(v) <= 2 for v in by_doc.values())


def test_inverted_index_postings_sorted_capped(spark):
    docs = _docs(spark, [(i, "w shared") for i in range(30)] + [(99, "only")])
    rows = {r["term"]: r for r in ck.inverted_index(docs, max_postings=10).collect()}
    assert rows["shared"]["df"] == 30
    assert rows["shared"]["postings"] == list(range(10))  # capped, ascending
    assert rows["only"]["postings"] == [99]
    # duplicate tokens inside one doc count once
    assert rows["w"]["df"] == 30


# ---------------------------------------------------------------------------
# property-based invariants (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=30
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_words, min_size=1, max_size=6))
def test_span_dedup_invariants(spark, docs_tokens):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    out = ck.span_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"), width=3
    ).collect()
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_spans"]
    # keep-first semantics imply exactly one survivor per distinct span:
    # sum(n_kept) == number of distinct spans in the corpus
    import itertools

    def spans(toks):
        return [
            " ".join(toks[i : i + 3]) for i in range(0, len(toks), 3)
        ]

    corpus_spans = list(
        itertools.chain.from_iterable(spans(t) for t in docs_tokens if t)
    )
    assert sum(r["n_kept"] for r in out) == len(set(corpus_spans))
    assert sum(r["n_spans"] for r in out) == len(corpus_spans)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=40),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=8),
)
def test_chunk_overlap_coverage(spark, toks, chunk_size, stride):
    if stride > chunk_size:
        stride = chunk_size
    text = " ".join(toks)
    rows = sorted(
        ck.chunk_overlap(
            spark.createDataFrame([(0, text)], "doc_id long, text string"),
            chunk_size=chunk_size,
            stride=stride,
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    n = len(toks)
    # every token index is covered by at least one chunk
    covered = set()
    for r in rows:
        start = r["chunk_id"] * stride
        covered.update(range(start, min(start + chunk_size, n)))
        # no empty chunks, each chunk matches the source slice
        assert r["chunk_text"] == " ".join(toks[start : start + chunk_size])
    assert covered == set(range(n))
    # chunk count matches the closed form
    import math

    assert len(rows) == 1 + math.ceil(max(n - chunk_size, 0) / stride)


def test_unigram_nll_properties(spark):
    """Repeated-token docs are more predictable (lower nll) than rare-token
    docs; empty docs drop; partitioning-independent."""
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe.text import unigram_nll

    rows = [
        (1, "common common common common"),
        (2, "common rare1 rare2 rare3"),
        (3, ""),
        (4, "common common rare4 common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["nll"]) for r in unigram_nll(df).collect()}
    assert set(got) == {1, 2, 4}  # empty doc excluded
    assert got[1][0] == 4 and got[2][0] == 4
    assert got[1][1] < got[4][1] < got[2][1]
    again = {
        r["doc_id"]: (r["n_tokens"], r["nll"])
        for r in unigram_nll(df.repartition(5)).collect()
    }
    assert again == got


def test_bm25_ranking_semantics(spark):
    from imposm3_spark.datapipe.chunking import bm25_topk

    # doc 1 mentions the query term often and is short -> highest score;
    # doc 2 mentions it once in a long doc; doc 3 not at all.
    rows = [
        (1, "cat cat cat dog"),
        (2, "cat " + "filler " * 50),
        (3, "unrelated words only here"),
        (4, "cat cat bird"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["cat"], k=10).collect()
    got = [r.doc_id for r in out]
    assert 3 not in got  # no query term -> not retrieved
    assert got[0] in (1, 4) and set(got) == {1, 2, 4}
    scores = {r.doc_id: r.score for r in out}
    assert scores[1] > scores[2] and scores[4] > scores[2]


def test_bm25_multi_term_sum(spark):
    from imposm3_spark.datapipe.chunking import bm25_topk

    rows = [
        (1, "alpha beta"),
        (2, "alpha alpha"),
        (3, "beta beta"),
        (4, "gamma gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score for r in bm25_topk(df, ["alpha", "beta"], k=10).collect()}
    # doc 1 matches both terms; idf symmetric (df=2 each), dl equal
    # across docs -> doc1 score is strictly highest
    assert set(out) == {1, 2, 3}
    assert out[1] > out[2] and abs(out[2] - out[3]) < 1e-9
