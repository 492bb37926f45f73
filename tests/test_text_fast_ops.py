"""Round-8 text-op fast formulations pinned against the original
array/HOF formulations.

The rewrite (datapipe/text.py): token_count / avg_token_len /
punct_ratio / stopword_ratio / quality_score / langid / gopher
symbol_ratio now run as regexp_count passes (no token array, no
interpreted HOF, complement-class punct count). These tests evaluate
BOTH formulations over adversarial strings and require exact equality —
the DuckDB oracles pin the semantics engine-independently, so the Spark
side must not move at all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imposm3_spark.datapipe import text as tx

# adversarial corpus: whitespace runs, tabs/newlines/CR, leading/trailing
# space, punctuation-only, digits, adjacent stopwords, mixed case,
# stopword-as-substring (the boundary assertions must NOT count these),
# empty and single-char strings, unicode letters and punctuation
CASES = [
    "",
    " ",
    "a",
    "the",
    "the the the",
    "a a a a",
    "  leading and trailing  ",
    "tabs\tand\nnewlines\rhere",
    "the,comma attached",
    "xthe thex athe thea",
    "THE AND OF TO",
    "punct!!! ###$$$ %%%",
    "1234 5678 90",
    "word",
    "  \t \n ",
    "der die und das ist",
    "le la les et de",
    "el la los y de que",
    "mixed the der le el of und",
    "éclair naïve café the",
    "emoji 🙂 the 🙂🙂 and",
    "a.b.c the-end of_line",
    "x" * 500 + " the " + "y" * 500,
    "the  double  spaces  and",
]


def _old_token_count(text):
    return F.size(tx.tokens(text))


def _old_avg_token_len(text):
    toks = tx.tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def _old_punct_ratio(text):
    n = F.length(text)
    punct = F.size(F.regexp_extract_all(text, F.lit("[^a-zA-Z0-9\\s]"), 0))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def _old_stopword_ratio(text, lang="en"):
    toks = tx.tokens(F.lower(text))
    sw = tx.LANG_STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return F.when(
        F.size(toks) > 0, hits.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def _old_quality_score(text):
    toks = tx.tokens(F.lower(text))
    n_tok = F.size(toks)
    sw = tx.LANG_STOPWORDS["en"]
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    n_chars = F.length(text)
    nonws = F.length(F.regexp_replace(text, r"\s", ""))
    punct = F.size(F.regexp_extract_all(text, F.lit("[^a-zA-Z0-9\\s]"), 0))
    len_score = F.when((n_tok >= 10) & (n_tok <= 10000), F.lit(0.25)).otherwise(
        F.lit(0.0)
    )
    sw_score = F.when(
        F.when(n_tok > 0, hits.cast("double") / n_tok).otherwise(F.lit(0.0)) > 0.01,
        F.lit(0.25),
    ).otherwise(F.lit(0.0))
    punct_score = F.when(
        F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0))
        < 0.2,
        F.lit(0.25),
    ).otherwise(F.lit(0.0))
    atl = F.when(n_tok > 0, nonws.cast("double") / n_tok).otherwise(F.lit(0.0))
    atl_score = F.when((atl >= 2.0) & (atl <= 12.0), F.lit(0.25)).otherwise(
        F.lit(0.0)
    )
    return len_score + sw_score + punct_score + atl_score


def _old_langid(text):
    toks = tx.tokens(F.lower(text))
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for code in sorted(tx.LANG_STOPWORDS, reverse=True):
        sw = tx.LANG_STOPWORDS[code]
        hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
        take = (hits > 0) & (hits >= best_hits)
        best_lang = F.when(take, F.lit(code)).otherwise(best_lang)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return best_lang


PAIRS = [
    ("token_count", tx.token_count, _old_token_count),
    ("avg_token_len", tx.avg_token_len, _old_avg_token_len),
    ("punct_ratio", tx.punct_ratio, _old_punct_ratio),
    ("stopword_ratio", tx.stopword_ratio, _old_stopword_ratio),
    ("quality_score", tx.quality_score, _old_quality_score),
    ("langid", tx.langid, _old_langid),
]


@pytest.mark.parametrize("name,new,old", PAIRS, ids=[p[0] for p in PAIRS])
def test_fast_formulation_matches_original(spark, name, new, old):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i int, t string")
    rows = (
        df.select("i", "t", new(F.col("t")).alias("new"), old(F.col("t")).alias("old"))
        .orderBy("i")
        .collect()
    )
    bad = [(r["t"], r["new"], r["old"]) for r in rows if r["new"] != r["old"]]
    assert not bad, f"{name}: {bad[:5]}"


def test_stopword_hits_boundaries(spark):
    """Direct pin of the boundary-assertion pattern: substring stopwords
    must not count, adjacent single-space stopwords all count."""
    df = spark.createDataFrame(
        [
            ("the", 1),
            ("a a a", 3),
            ("xthe thex", 0),
            ("the the", 2),
            (" the ", 1),
            ("the\tand\nof", 3),
            ("", 0),
        ],
        "t string, want int",
    )
    got = df.select(
        "want",
        tx._stopword_hits(F.col("t"), tx.LANG_STOPWORDS["en"]).alias("hits"),
    ).collect()
    assert all(r["hits"] == r["want"] for r in got), got


# ---------------------------------------------------------------------------
# hypothesis sweep: random text incl. whitespace variants, stopwords,
# punctuation, unicode — batched into ONE Spark job per example set
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st_  # noqa: E402

_ALPHABET = "ab the\t\n .!é🙂of  and-1"


@given(
    texts=st_.lists(
        st_.text(alphabet=_ALPHABET, min_size=0, max_size=60),
        min_size=1,
        max_size=12,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fast_formulations_hypothesis(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    cols = []
    for name, new, old in PAIRS:
        cols.append(new(F.col("t")).alias(f"n_{name}"))
        cols.append(old(F.col("t")).alias(f"o_{name}"))
    rows = df.select("t", *cols).collect()
    for r in rows:
        for name, _, _ in PAIRS:
            assert r[f"n_{name}"] == r[f"o_{name}"], (
                name,
                repr(r["t"]),
                r[f"n_{name}"],
                r[f"o_{name}"],
            )


def test_stopword_alternation_escape_is_identity():
    """_stopword_hits regex-escapes each word when building the
    alternation (ADVICE r8). Current LANG_STOPWORDS entries are plain
    ASCII letters, so the escaped pattern must be byte-identical to the
    unescaped form — i.e. the change cannot alter any executed plan —
    and any future metacharacter-bearing word trips the ^[a-z]+$ pin."""
    import re

    from imposm3_spark.datapipe.text import LANG_STOPWORDS

    for lang, sw in LANG_STOPWORDS.items():
        assert "|".join(re.escape(w) for w in sw) == "|".join(sw), lang
        assert all(re.fullmatch(r"[a-z]+", w) for w in sw), lang
