"""Span-level dedup, chunking, TF-IDF, and inverted-index operators.

Training-data preparation beyond document granularity:

* ``span_dedup`` — C4/MassiveText-style span-level deduplication: the
  corpus is cut into non-overlapping W-token windows ("spans"); every
  span that textually repeats anywhere in the corpus survives only at
  its first occurrence (min ``(doc_id, span_idx)``), and documents are
  reassembled from their surviving spans. (C4 dedups three-sentence
  spans; the synthetic corpus has no sentence boundaries, so the
  token-window form is the deterministic analog.)
* ``chunk_overlap`` — split each document into fixed token-budget
  chunks with overlap (stride < chunk size), the standard prep step for
  fixed-context training and retrieval indexing.
* ``tfidf_topk`` — top-k terms per document by tf·idf
  (idf = ln(N/df), raw-count tf).
* ``inverted_index`` — term -> sorted posting list of doc_ids (capped),
  the retrieval-side artifact of a corpus build.

Scale notes (100 TB):

* span_dedup shuffles SPAN HASHES + ids, never full text twice: the
  first-occurrence table is a map-side-combinable ``groupBy(hash)``
  ``agg(min(struct))`` (duplicate spans collapse inside each task before
  the exchange), and the join back to occurrences is on the same hash
  key — deliberately NOT a window ``row_number`` partitioned by span,
  which would funnel every copy of a hot span through one task's sort.
* chunk_overlap is a pure expression + posexplode — zero shuffle,
  runs at scan speed.
* tfidf_topk aggregates (doc, term) counts with map-side partial
  aggregation; document frequency reuses the same grouped result
  (one corpus text pass); the final top-k is a per-doc window over the
  (doc, term) table, which is bounded by tokens, not documents².
* inverted_index caps posting lists with ``slice`` AFTER ``sort_array``
  on the grouped set — the shuffle carries (term, doc_id) pairs once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from imposm3_spark.datapipe.text import tokens


def _spans(text: F.Column, width: int) -> F.Column:
    """Array of non-overlapping ``width``-token span strings (last may be
    short; empty text -> empty array)."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    n_spans = F.ceil(n / F.lit(float(width))).cast("int")
    idx = F.sequence(F.lit(0), n_spans - 1)
    return F.when(n > 0, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i * width + 1, width))
    )).otherwise(F.array().cast("array<string>"))


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 20,
) -> DataFrame:
    """Corpus-global span-level dedup (keep-first).

    Returns one row per non-empty input document:
    ``(id_col, n_spans, n_kept, dedup_text)`` where ``dedup_text`` is the
    document's surviving spans re-joined in original order (empty string
    when every span was seen earlier elsewhere). Documents with no
    tokens emit no spans and are omitted.

    First occurrence = lexicographic min ``(doc_id, span_idx)`` over all
    occurrences of the identical span string.
    """
    spans = docs.select(
        F.col(id_col),
        F.posexplode(_spans(F.col(text_col), width)).alias("span_idx", "span"),
    )
    # occurrences keyed by content hash: the exchange carries (hash, ids),
    # and duplicate spans combine map-side before the shuffle
    occ = spans.withColumn("h", F.md5("span"))
    first = occ.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("span_idx"))).alias("first")
    )
    kept = (
        occ.join(first, "h")
        .withColumn(
            "is_first",
            (F.col(f"first.{id_col}") == F.col(id_col))
            & (F.col("first.span_idx") == F.col("span_idx")),
        )
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("is_first").cast("long")).alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("is_first"), F.struct("span_idx", "span"))
                )
            ).alias("_kept"),
        )
        .select(
            id_col,
            "n_spans",
            "n_kept",
            F.concat_ws(" ", F.transform(F.col("_kept"), lambda s: s["span"])).alias(
                "dedup_text"
            ),
        )
    )


def chunk_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 40,
    stride: int = 30,
) -> DataFrame:
    """Split each document into overlapping token chunks.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)``;
    the chunk count is ``1 + ceil(max(n_tokens - chunk_size, 0) /
    stride)`` — exactly enough strides for the final chunk to reach the
    last token, never an empty tail chunk. Empty documents emit no
    chunks. Pure expression + posexplode: zero shuffle.

    Returns ``(id_col, chunk_id, n_chunk_tokens, chunk_text)``.
    """
    if stride <= 0 or stride > chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - chunk_size, 0) / stride)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - chunk_size, F.lit(0)) / F.lit(float(stride))).cast(
            "int"
        )
    )
    chunks = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_size)),
    )).otherwise(F.array().cast("array<string>"))
    out = docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return out.select(
        id_col,
        "chunk_id",
        F.size(F.split(F.col("chunk_text"), r"\s+")).alias("n_chunk_tokens"),
        "chunk_text",
    )


def doc_term_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, term, cnt) — one corpus text pass, map-side partial agg."""
    return (
        docs.select(
            F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("cnt"))
    )


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by tf·idf.

    tf = raw term count in the document; idf = ln(N / df) with df = number
    of documents containing the term and N = corpus size. Ties break by
    term ascending. Returns
    ``(id_col, term, cnt, df, tfidf)`` with tfidf rounded to 6 places.

    The (doc, term) counts table is computed once and reused for df
    (no second pass over the text); the ranking window partitions by
    document, whose group size is bounded by the document's distinct
    terms.
    """
    tc = doc_term_counts(docs, id_col, text_col)
    n_docs = docs.count()
    df_tbl = tc.groupBy("term").agg(F.count("*").alias("df"))
    scored = tc.join(df_tbl, "term").withColumn(
        "tfidf",
        F.round(F.col("cnt") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "cnt", "df", "tfidf")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_postings: int = 20,
) -> DataFrame:
    """Term -> sorted doc_id posting list (first ``max_postings`` ids).

    Returns ``(term, df, postings)`` where df counts distinct documents
    containing the term and ``postings`` is the ascending doc_id list
    truncated to ``max_postings``. One (term, doc_id) pair crosses the
    shuffle per distinct containment — text never shuffles.
    """
    pairs = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("term")
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.slice(F.sort_array(F.collect_list(id_col)), 1, max_postings).alias(
                "postings"
            ),
        )
        .filter(F.col("df") >= min_df)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval: top-`k` documents for a bag-of-words query.

    score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))
    with the Lucene idf = ln(1 + (N-df+0.5)/(df+0.5)) — always positive,
    avoiding the Robertson-form pathology where df > N/2 makes idf
    negative and ranks barely-matching documents highest.

    Exactness: every per-(doc,term) contribution is one deterministic
    float expression mirrored operation-for-operation in the oracle; the
    per-document sum folds contributions in TERM order (sort_array +
    aggregate == list ORDER BY term + list_reduce), so scores are
    bit-identical across engines.

    Scale design: the corpus collapses once to (doc, term, cnt) counts
    (map-side combine); the query-term table broadcasts (|q| rows); df
    and dl derive from the counts table — the TEXT never shuffles; the
    top-k is orderBy+limit = TakeOrdered (per-partition heaps + k-row
    driver merge), not a global sort.
    """
    spark = docs.sparkSession
    tc = doc_term_counts(docs, id_col, text_col)
    # tc feeds dl, df and the match join: materialize once so the text
    # pass runs a single time across the three consumers
    tc = tc.localCheckpoint(eager=True)
    n_docs = docs.count()
    total_tokens = tc.agg(F.sum("cnt")).collect()[0][0] or 0
    avgdl = float(total_tokens) / float(n_docs) if n_docs else 1.0

    qt = spark.createDataFrame(
        [(t,) for t in sorted(set(query_terms))], "term string"
    )
    dfq = (
        tc.join(F.broadcast(qt), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    m = (
        tc.join(F.broadcast(qt), "term")
        .join(
            tc.groupBy(id_col).agg(F.sum("cnt").alias("dl")), id_col
        )
        .join(F.broadcast(dfq), "term")
    )
    nd = F.lit(float(n_docs))
    dfd = F.col("df").cast("double")
    cntd = F.col("cnt").cast("double")
    dld = F.col("dl").cast("double")
    idf = F.log(F.lit(1.0) + (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))
    part = (cntd * F.lit(k1 + 1.0)) / (
        cntd
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dld / F.lit(avgdl)))
    )
    contrib = m.select(id_col, "term", (idf * part).alias("c"))
    g = contrib.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("term", "c"))).alias("cs")
    )
    scored = g.select(
        id_col,
        F.aggregate("cs", F.lit(0.0), lambda a, x: a + x["c"]).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("score"))
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 16,
    mask: int = 64,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC family): a chunk
    boundary opens after every position whose `gram`-char window hashes
    to 0 mod `mask`, so chunk edges follow CONTENT, not offsets — an
    insertion early in a document shifts only the chunk it lands in,
    and every identical region downstream re-aligns to identical chunks.
    That is the property offset-based shingling lacks and the reason CDC
    is the backbone of large-corpus delta dedup.

    Returns one row per (doc, chunk): chunk index, start (1-based), the
    chunk text and its md5 — ready for cross-doc chunk-level dedup.

    Exactness: the boundary predicate is a 60-bit slice of md5 of the
    JVM substring, reproducible verbatim in the oracle; chunk assembly
    is array algebra over the sorted boundary set.

    Scale: position explode is O(total chars) — the same linear-scan
    budget as duplicated_substring_spans; everything is JVM expressions
    (zero Python), and the per-doc regroup rides one doc-keyed exchange.

    Plan-shape note: the boundary array is staged through EXPLICIT
    projection steps so every higher-order function consumes a BOUND
    column, never an inlined expression tree. Higher-order lambdas are
    interpreted per element — if the `ends` expression inlined into the
    span lambda that references it, the whole md5 boundary pipeline
    would re-evaluate per array element (O(chars²) per doc; measured
    ~10x the whole-bench cost at sf0.1 before this split). Catalyst's
    CollapseProject keeps the stages separate exactly because the
    staged columns are referenced more than once downstream.
    """
    t = F.col(text_col)
    n = F.length(t)
    # positions 1..len-gram+1 whose gram-hash is 0 mod mask end a chunk at
    # pos+gram-1 (the window is INSIDE the chunk it closes).
    pos = F.sequence(F.lit(1), F.greatest(n - F.lit(gram - 1), F.lit(0)))
    cut = F.filter(
        pos,
        lambda i: F.conv(F.substring(F.md5(F.substring(t, i, gram)), 1, 15), 16, 10)
        .cast("bigint")
        % mask
        == 0,
    )
    # `_ends` is ascending by construction (cut positions ascend and n
    # bounds them above, with array_union dropping the duplicate when
    # the last cut lands on n).
    # spread: the boundary filter is an INTERPRETED higher-order lambda
    # running one md5 per character position — at scan parallelism a
    # sub-split corpus serializes the whole kernel onto one task
    from imposm3_spark.datapipe.sampling import spread_small_input

    staged = spread_small_input(df.filter(n > 0)).select(
        F.col(id_col),
        t.alias("_t"),
        F.array_union(
            F.transform(cut, lambda i: i + F.lit(gram - 1)), F.array(n.cast("int"))
        ).alias("_ends"),
    )
    ends = F.col("_ends")
    spans = F.filter(
        F.transform(
            ends,
            lambda e, i: F.struct(
                (F.coalesce(F.get(ends, i - 1), F.lit(0)) + 1).alias("start"),
                e.alias("end"),
            ),
        ),
        lambda s: s["end"] >= s["start"],
    )
    rows = staged.select(
        F.col(id_col), F.col("_t"), F.posexplode(spans).alias("idx", "sp")
    )
    chunk = F.substring(F.col("_t"), F.col("sp.start"), F.col("sp.end") - F.col("sp.start") + 1)
    return rows.select(
        id_col,
        (F.col("idx") + 1).alias("chunk_idx"),
        F.col("sp.start").alias("start"),
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_hash"),
    )


def cdc_shared_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 16,
    mask: int = 64,
) -> DataFrame:
    """Cross-document chunk-level dedup over content-defined chunks: for
    every chunk content seen in more than one document, the number of
    distinct docs, total occurrences, and the chunk length — the
    delta-dedup report that finds shared boilerplate CDC aligns across
    shifted copies. One map-side-combinable aggregation on chunk_hash."""
    ch = cdc_chunks(df, id_col, text_col, gram, mask)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.max("chunk_len").alias("chunk_len"),
        )
        .filter(F.col("n_docs") >= 2)
    )
