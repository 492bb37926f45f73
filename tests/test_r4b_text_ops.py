"""Round-4 batch 16 operators: LLR collocations, Zipf fit, TextRank,
mutual information."""

from __future__ import annotations

import math


def _llr(k11, k12, k21, k22):
    n = k11 + k12 + k21 + k22

    def term(k, r, c):
        return k * math.log(k * n / (r * c)) if k > 0 else 0.0

    r1, r2 = k11 + k12, k21 + k22
    c1, c2 = k11 + k21, k12 + k22
    return 2.0 * (
        term(k11, r1, c1) + term(k12, r1, c2) + term(k21, r2, c1) + term(k22, r2, c2)
    )


def test_llr_collocations_finds_phrase(spark):
    from imposm3_spark.datapipe.mining import llr_collocations

    # "new york" always adjacent; "the" frequent but unattached
    docs = [
        (1, "the new york times reports the story"),
        (2, "living in new york is expensive the rents rise"),
        (3, "new york new york the city"),
        (4, "the weather report for new york"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = llr_collocations(df, topn=5, min_count=2).collect()
    assert (got[0].w1, got[0].w2) == ("new", "york")
    # hand-check the LLR of the top pair against the same formula
    pairs = []
    for _, t in docs:
        w = t.split()
        pairs += list(zip(w, w[1:]))
    k11 = pairs.count(("new", "york"))
    c1 = sum(1 for a, _ in pairs if a == "new")
    c2 = sum(1 for _, b in pairs if b == "york")
    n = len(pairs)
    expect = _llr(k11, c1 - k11, c2 - k11, n - c1 - c2 + k11)
    assert got[0].llr == round(expect, 6)


def test_zipf_fit_exact_ols(spark):
    from imposm3_spark.datapipe.mining import zipf_fit

    # construct exact frequencies 8,4,2,1 for four words
    words = ["alpha"] * 8 + ["beta"] * 4 + ["gamma"] * 2 + ["delta"]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    row = zipf_fit(df, topk=10).collect()[0]
    assert row.n_terms == 4
    xs = [math.log(i) for i in (1, 2, 3, 4)]
    ys = [math.log(f) for f in (8, 4, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row.slope - slope) < 1e-6
    assert row.slope < -0.9  # geometric frequencies are steeply zipfian


def test_textrank_hub_word_wins(spark):
    from pyspark.sql import functions as F

    from imposm3_spark.datapipe import graph as gr
    from imposm3_spark.datapipe.text import tokens

    # 'hub' co-occurs with everything; satellites only with hub
    docs = [(i, f"hub w{i} hub w{i}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = df.select(tokens(F.lower(F.col("text"))).alias("tk"))
    seq = F.expr(
        "transform(sequence(1, size(tk) - 1),"
        " i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
    )
    pairs = toks.select(F.explode(seq).alias("p")).select("p.w1", "p.w2")
    directed = pairs.groupBy(F.col("w1").alias("src"), F.col("w2").alias("dst")).agg(
        F.count(F.lit(1)).alias("c")
    )
    edges = (
        directed.unionAll(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "c")
        )
        .groupBy("src", "dst")
        .agg(F.sum("c").alias("cnt"))
    )
    nodes = toks.select(F.explode("tk").alias("node")).distinct()
    got = gr.pagerank_fixed_point(edges, nodes, iterations=3).collect()
    best = max(got, key=lambda r: r.r)
    assert best.node == "hub"


def test_mutual_info_independence_and_dependence(spark):
    from imposm3_spark.datapipe.stats import mutual_information_by_group

    # independent: both groups uniform over both categories -> MI terms 0
    ind = [(g, c) for g in ("a", "b") for c in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(ind, "g string, c int")
    got = {r.g: r.mi_term for r in mutual_information_by_group(df, "g", "c", [0, 1]).collect()}
    assert got == {"a": 0.0, "b": 0.0}
    # perfect dependence: each group has its own category -> I = ln(2),
    # split equally between the groups
    dep = [("a", 0)] * 5 + [("b", 1)] * 5
    df2 = spark.createDataFrame(dep, "g string, c int")
    got2 = {r.g: r.mi_term for r in mutual_information_by_group(df2, "g", "c", [0, 1]).collect()}
    assert got2["a"] == got2["b"] == round(math.log(2) / 2, 6)
