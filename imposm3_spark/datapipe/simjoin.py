"""Exact similarity-join operators: prefix-filtered set-similarity join
(the AllPairs/PPJoin family) and exact duplicated-substring span
detection (the ExactSubstr step of modern training-data dedup).

Both are EXACT — unlike the MinHash/SimHash paths in dedup.py there is
no probabilistic recall: ppjoin_pairs returns precisely the pairs with
Jaccard >= threshold, and duplicated_substring_spans returns precisely
the maximal character spans covered by a gram that occurs >= min_count
times in the corpus.

Reference parity: the reference engine has no similarity joins at all —
these belong to the LLM-training-data surface this repo adds on top of
the imposm3 operator set (see docs/SCALE.md for the 100 TB argument).

Scale notes
-----------
ppjoin_pairs: the naive exact join is O(n^2) comparisons. The prefix
filter (Chaudhuri et al., "A Primitive Operator for Similarity Joins",
ICDE'06; Xiao et al. PPJoin, WWW'08) makes it an equi-join: order every
set by one global token order (ascending document frequency, so prefixes
hold the RAREST tokens), keep only the first |x| - ceil(t*|x|) + 1
tokens, and join on shared prefix tokens. If J(A,B) >= t the sorted
prefixes must intersect (pigeonhole on the suffix sizes), so recall is 1
by construction; an exact intersect verifies every candidate. All stages
are key-partitioned shuffles (token or doc_id) — no cross join anywhere,
and the frequency-ascending order keeps the hottest join buckets small.

duplicated_substring_spans: linear in corpus characters — every
character position emits one fixed-length gram (JVM-side substring, no
Python), one aggregation counts gram multiplicity, one semi-join marks
duplicated positions, and a per-document keyed window merges overlapping
or adjacent gram hits into maximal spans. The shuffle key is the gram
itself, so grouping is exact (no fingerprint collisions); the payload is
gram_len bytes per position — the same constant-factor blowup the
suffix-array construction in the ExactSubstr paper pays on disk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from imposm3_spark.datapipe.dedup import shingles
from imposm3_spark.datapipe.sampling import spread_small_input


def ppjoin_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard self-join over word ``k``-gram shingle sets via
    prefix filtering: all pairs (id_a < id_b) with
    ``|A ∩ B| / |A ∪ B| >= threshold``.

    Returns (id_a, id_b, inter, uni, jaccard) — the set sizes are exact
    integers; jaccard is their double ratio rounded to 6 decimals.
    """
    sets = (
        spread_small_input(docs).select(
            F.col(id_col).alias("doc"),
            F.array_distinct(shingles(F.col(text_col), k)).alias("sh"),
        )
        .withColumn("n", F.size("sh"))
        .where(F.col("n") > 0)
    )
    # Pin the tokenized shingle sets: four downstream branches (token
    # frequencies, prefixes, and both verify sides) read `sets`, and
    # Spark performs no cross-branch subplan reuse — without the pin the
    # regexp tokenization re-executes once per branch per action.
    sets = sets.localCheckpoint(eager=False)

    tok = sets.select("doc", "n", F.explode("sh").alias("t"))
    freq = tok.groupBy("t").agg(F.count("*").alias("f"))

    # One global total order on tokens: (document frequency asc, token
    # asc). Any total order preserves the prefix guarantee; frequency-
    # ascending is the standard choice that keeps prefix tokens rare.
    # `n` rides the aggregation (constant per doc, min = the value), so
    # the prefix projection needs NO join back to `sets` — one broadcast
    # exchange + join fewer per self-join side (round 11).
    ordered = (
        tok.join(freq, "t")
        .groupBy("doc")
        .agg(
            F.array_sort(F.collect_list(F.struct("f", "t"))).alias("ord"),
            F.min("n").alias("n"),
        )
    )

    # Prefix length p = n - ceil(t*n) + 1: if J(A,B) >= t then
    # |A ∩ B| >= t*max(|A|,|B|), and two sets sorted by the same total
    # order whose prefixes are disjoint can share at most
    # (|A|-p_A) + ... suffix tokens < the required overlap — so matching
    # pairs ALWAYS share a prefix token (recall 1).
    pref = (
        ordered.withColumn(
            "p",
            F.col("n")
            - F.ceil(F.lit(threshold) * F.col("n")).cast("int")
            + F.lit(1),
        )
        .select(
            "doc",
            "n",
            F.expr("slice(ord, 1, p)").alias("pref"),
        )
    )
    ex = pref.select(
        "doc", "n", F.posexplode(F.col("pref")).alias("pos0", "pt")
    ).select(
        "doc", "n", (F.col("pos0") + 1).alias("pos"), F.col("pt.t").alias("t")
    )
    # NOT pinned, deliberately: the physical plan does carry the prefix
    # pipeline (freq agg, collect_list sort, slice, posexplode) once per
    # self-join side, but the two copies run as INDEPENDENT parallel
    # stage trees off the pinned `sets`, so the duplicated work hides in
    # idle cores. A localCheckpoint here was A/B-measured (r10) at
    # doc_ppjoin 3.9 s -> 5.9 s and doc_lsh_pr 4.6 s -> 7.8 s noop-sink:
    # the pin serializes the two sides behind an RDD materialization
    # barrier and un-fuses the explode->shuffle codegen span — worse than
    # recomputing.

    # Positional filter (the "PP" in PPJoin): a shared prefix token at
    # 1-based positions (pA, pB) bounds the total overlap by
    # 1 + min(|A|-pA, |B|-pB); J >= t needs overlap
    # alpha = ceil(t/(1+t) * (|A|+|B|)), so candidates whose shared
    # token sits too deep in either prefix are pruned before the verify
    # join. A qualifying pair always qualifies through its FIRST shared
    # prefix token, so completeness is preserved.
    # the 1e-9 slack keeps double rounding from ever over-pruning (a
    # too-large alpha would lose true pairs; a too-small one only admits
    # candidates the exact verify rejects)
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.n") + F.col("b.n"))
        - F.lit(1e-9)
    )
    ubound = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
    )
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, "t")
        .where(
            (F.col("a.doc") < F.col("b.doc"))
            # Length filter: J >= t forces t*|A| <= |B| <= |A|/t.
            & (F.col("b.n") >= F.lit(threshold) * F.col("a.n"))
            & (F.col("a.n") >= F.lit(threshold) * F.col("b.n"))
            & (ubound >= alpha)
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )

    sa = sets.select(
        F.col("doc").alias("id_a"), F.col("sh").alias("sha"), F.col("n").alias("na")
    )
    sb = sets.select(
        F.col("doc").alias("id_b"), F.col("sh").alias("shb"), F.col("n").alias("nb")
    )
    inter = F.size(F.array_intersect("sha", "shb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", inter)
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        # Exact verification: small-integer double division is the same
        # IEEE value on every engine, so the threshold compare is exact.
        .where(F.col("inter").cast("double") / F.col("uni") >= F.lit(threshold))
        .select(
            "id_a",
            "id_b",
            "inter",
            "uni",
            F.round(F.col("inter").cast("double") / F.col("uni"), 6).alias(
                "jaccard"
            ),
        )
    )


def duplicated_substring_spans(
    docs: DataFrame,
    gram_len: int = 40,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated character spans: every position whose
    ``gram_len``-character gram occurs >= ``min_count`` times anywhere in
    the corpus is "covered"; overlapping or adjacent covered regions
    merge into one span per document.

    Returns (doc_id, span_start, span_len, n_grams): 1-based start, span
    length in characters, and the number of covered gram positions the
    span absorbed. All integers — exact on any engine.
    """
    npos = F.greatest(
        F.length(text_col) - F.lit(gram_len - 1), F.lit(0)
    )
    pos = spread_small_input(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(F.sequence(F.lit(1), npos)).alias("i"),
        F.expr(f"substring({text_col}, i, {gram_len})").alias("g"),
    ).select("doc", "i", "g")

    # ONE gram-keyed exchange: a count window over the gram marks
    # duplicated positions in place — vs the aggregate + semi-join
    # formulation, this halves the shuffles and scans the corpus once.
    hits = (
        pos.withColumn(
            "_cnt", F.count("*").over(Window.partitionBy("g"))
        )
        .where(F.col("_cnt") >= min_count)
        .select("doc", "i")
    )

    # Island detection per document: grams are all the same length, so
    # the running max end over earlier hits equals lag(i) + gram_len - 1;
    # a hit starts a new span iff it begins past that end + 1.
    w = Window.partitionBy("doc").orderBy("i")
    flagged = hits.withColumn(
        "_new",
        F.when(
            F.lag("i").over(w).isNull()
            | (F.col("i") > F.lag("i").over(w) + F.lit(gram_len)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_span",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return flagged.groupBy("doc", "_span").agg(
        F.min("i").alias("span_start"),
        (F.max("i") - F.min("i") + F.lit(gram_len)).alias("span_len"),
        F.count("*").alias("n_grams"),
    ).select(
        F.col("doc").alias(id_col), "span_start", "span_len", "n_grams"
    )


def cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ratio: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact bag-of-terms cosine similarity self-join: all pairs with
    ``dot(A,B) / sqrt(|A|^2 * |B|^2) >= threshold`` over term-count
    vectors, where a term is a word ``k``-gram shingle (``k=1`` = plain
    words).

    Exactness: dot products and squared norms are BIGINT sums of integer
    counts; the cosine is one fixed-order expression over their double
    casts — products of exact integers and a correctly-rounded IEEE
    sqrt, so the threshold compare is bit-identical on any engine.

    Scale: the candidate space is the inverted-index join (a pair is
    produced once per SHARED term, then aggregated) — a pair with
    cosine > 0 must share a term, so recall is 1 with no cross join.
    The join fanout is Σ_t f_t² over term document-frequencies, which is
    why the DEFAULT term is a k-gram shingle, not a word: unigrams make
    every stopword-class token a quadratic hot key (measured 30x
    wall-clock blowup on a narrow-vocabulary corpus), while shingle
    frequencies are tail-heavy. For corpora with hot shingles the
    standard next step is DAAT/term-bound pruning, which trades
    exactness — this operator stays exact and keys the fanout on the
    shingle distribution instead.
    """
    from imposm3_spark.datapipe.text import tokens

    terms = (
        shingles(F.col(text_col), k)
        if k > 1
        else tokens(F.lower(F.col(text_col)))
    )
    tc = (
        spread_small_input(docs)
        .select(F.col(id_col).alias("doc"), F.explode(terms).alias("t"))
        .groupBy("doc", "t")
        .agg(F.count("*").alias("c"))
    )
    norms = tc.groupBy("doc").agg(F.sum(F.col("c") * F.col("c")).alias("nrm"))
    # pin: both sides of the self-join read the term-count+norm frame —
    # unpinned, tokenization and the two aggregations run twice
    tcn = tc.join(norms, "doc").localCheckpoint(eager=False)

    a, b = tcn.alias("a"), tcn.alias("b")
    pairs = (
        a.join(b, "t")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).alias("dot"),
            F.first("a.nrm").alias("na"),
            F.first("b.nrm").alias("nb"),
        )
    )
    if threshold_ratio is not None:
        # Pure-integer threshold: dot/sqrt(na*nb) >= p/q  <=>
        # q^2 * dot^2 >= p^2 * na * nb (dot >= 0: counts are
        # non-negative). DECIMAL(38,0) keeps the quartic products exact
        # while q^2 * na * nb < 10^38 — i.e. per-doc squared norms below
        # ~10^18/q, which a document would only exceed past ~10^9/q
        # occurrences of one shingle (multi-GB single documents). Within
        # that bound: no float, no sqrt, no rounding — immune to
        # engine-version skew in round()/printf paths.
        p, q = threshold_ratio
        if p < 0 or q <= 0:
            raise ValueError(
                f"threshold_ratio must satisfy p >= 0, q > 0, got ({p}, {q})"
            )
        d38 = "decimal(38,0)"
        lhs = F.col("dot").cast(d38) * F.col("dot").cast(d38) * F.lit(q * q)
        rhs = F.col("na").cast(d38) * F.col("nb").cast(d38) * F.lit(p * p)
        return pairs.where(lhs >= rhs).select(
            "id_a",
            "id_b",
            "dot",
            F.col("na").alias("nrm_a"),
            F.col("nb").alias("nrm_b"),
        )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return pairs.where(cos >= F.lit(threshold)).select(
        "id_a", "id_b", "dot", F.round(cos, 6).alias("cosine")
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 20,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03 — the MOSS algorithm): hash every ``k``-char gram, slide a
    window of ``w`` consecutive hashes, select each window's minimum
    (ties -> leftmost position), and dedupe the selections.

    Guarantee: any shared substring of length >= k + w - 1 between two
    documents yields at least one shared fingerprint.

    Determinism: the gram hash is the first 15 hex digits of md5 as a
    BIGINT (reproducible on any engine); the per-window pick is the
    lexicographic struct-min (hash, position). One doc-keyed window over
    JVM expressions — no Python, no global sort.

    Returns (doc_id, fp, pos) — distinct selected fingerprints.
    """
    picked = _winnow_picks(docs, k, w, id_col, text_col)
    return (
        picked.select(
            "doc", F.col("_m.h").alias("fp"), F.col("_m.pos").alias("pos")
        )
        .distinct()
        .select(F.col("doc").alias(id_col), "fp", "pos")
    )


def _winnow_picks(
    docs: DataFrame, k: int, w: int, id_col: str, text_col: str
) -> DataFrame:
    """Per-position window picks BEFORE dedup: (doc, _m struct<h,pos>).
    Shared by winnow_fingerprints (distinct on (doc, fp, pos)) and
    winnow_pairs (distinct on (doc, fp) directly — one aggregation
    instead of two stacked distincts)."""
    npos = F.greatest(F.length(text_col) - F.lit(k - 1), F.lit(0))
    grams = spread_small_input(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(F.sequence(F.lit(1), npos)).alias("pos"),
        F.expr(f"substring({text_col}, pos, {k})").alias("g"),
    ).select(
        "doc",
        "pos",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    frame = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return grams.withColumn("_m", F.min(F.struct("h", "pos")).over(frame))


def winnow_pairs(
    docs: DataFrame,
    k: int = 20,
    w: int = 8,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Plagiarism-style candidate pairs: documents sharing >=
    ``min_shared`` distinct winnowing fingerprint VALUES. The join is an
    equi-join on the fingerprint (each doc's distinct fp set explodes
    once), aggregated to exact shared counts."""
    # distinct (doc, fp) DIRECTLY on the window picks: the former
    # winnow_fingerprints().select().distinct() stacked a (doc, fp, pos)
    # aggregation under a (doc, fp) one — identical set, one aggregation
    # fewer (round 11)
    picked = _winnow_picks(docs, k, w, id_col, text_col)
    # pin: both self-join sides read the fingerprint pipeline (per-
    # position char-gram explode + md5 + window) — unpinned it runs twice
    vals = (
        picked.select("doc", F.col("_m.h").alias("fp"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a, b = vals.alias("a"), vals.alias("b")
    return (
        a.join(b, "fp")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact DIRECTIONAL containment self-join over word ``k``-gram
    shingle sets: all ordered pairs (id_a != id_b) with
    ``|A ∩ B| / |A| >= threshold`` — A (near-)contained in B. Catches
    the sub-document duplication symmetric Jaccard misses: a paragraph
    pasted into a much larger page scores containment 1.0 but Jaccard
    |A|/|B| -> 0.

    Prefix filter, containment variant: under one global token order,
    if none of A's first ``|A| - ceil(t*|A|) + 1`` tokens appear in B,
    the overlap is at most ``ceil(t*|A|) - 1`` — below the requirement,
    so candidates joining A-prefix tokens against B's FULL token list
    have recall 1 by construction. Only the probe side shrinks to a
    prefix (the indexed side cannot be pruned — containment places no
    upper bound on |B|); the length filter keeps |B| >= t*|A|.

    Scale: the same key-partitioned shuffles as ppjoin_pairs (token then
    doc), no cross join; the B-side index is corpus-linear, the A-side
    prefix sub-linear, and the frequency-ascending order keeps hot join
    buckets small. Exact intersect verify on candidates only.
    """
    sets = (
        spread_small_input(docs).select(
            F.col(id_col).alias("doc"),
            F.array_distinct(shingles(F.col(text_col), k)).alias("sh"),
        )
        .withColumn("n", F.size("sh"))
        .where(F.col("n") > 0)
    )
    # pin: tokenization is read by the index, prefix, and verify branches
    # (no cross-branch subplan reuse in Spark — see ppjoin_pairs)
    sets = sets.localCheckpoint(eager=False)
    tok = sets.select("doc", "n", F.explode("sh").alias("t"))
    freq = tok.groupBy("t").agg(F.count("*").alias("f"))
    # `n` rides the aggregation (constant per doc) — no join back to
    # `sets` for the prefix projection (round 11, same move as ppjoin)
    ordered = (
        tok.join(freq, "t")
        .groupBy("doc")
        .agg(
            F.array_sort(F.collect_list(F.struct("f", "t"))).alias("ord"),
            F.min("n").alias("n"),
        )
    )
    pref = (
        ordered.withColumn(
            "p",
            F.col("n") - F.ceil(F.lit(threshold) * F.col("n")).cast("int") + F.lit(1),
        )
        .select("doc", "n", F.expr("slice(ord, 1, p)").alias("pref"))
    )
    probe = pref.select(
        F.col("doc").alias("id_a"),
        F.col("n").alias("na"),
        F.explode(F.transform("pref", lambda s: s["t"])).alias("t"),
    )
    index = tok.select(F.col("doc").alias("id_b"), F.col("n").alias("nb"), "t")
    cand = (
        probe.join(index, "t")
        .where(
            (F.col("id_a") != F.col("id_b"))
            & (F.col("nb").cast("double") >= F.lit(threshold) * F.col("na"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(F.col("doc").alias("id_a"), F.col("sh").alias("sha"), F.col("n").alias("na"))
    sb = sets.select(F.col("doc").alias("id_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", inter)
        .where(F.col("inter").cast("double") / F.col("na") >= F.lit(threshold))
        .select(
            "id_a",
            "id_b",
            "inter",
            "na",
            F.round(F.col("inter").cast("double") / F.col("na"), 6).alias("containment"),
        )
    )
