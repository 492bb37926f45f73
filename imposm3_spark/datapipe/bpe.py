"""Distributed BPE tokenizer induction (byte-pair-encoding merge
learning) over a document corpus.

The classic Sennrich et al. algorithm: spell every distinct word as a
space-separated symbol sequence, then repeatedly (a) count adjacent
symbol pairs weighted by word frequency, (b) merge the most frequent
pair everywhere. The artifact is the ordered merge list — the tokenizer.

Scale shape (the part that matters at 100 TB):
- the CORPUS is scanned exactly once, to build the word-frequency table
  (one map-side-combinable groupBy). Everything after runs on the vocab
  table — bounded by distinct-word count, not corpus size.
- each merge iteration is one distributed pair-count aggregate over the
  vocab plus a LIMIT-1 argmax (a single row crosses the driver per
  iteration — bounded by construction).
- the merge application is a literal string `replace` — a pure JVM
  expression; the vocab table is re-checkpointed every few iterations so
  lineage stays shallow.

Determinism: ties break (count desc, pair asc); the merge application
is classic BPE's left-to-right greedy sweep, realized as ONE plain
string replace over a DOUBLE-SPACE-separated spelling (see _spell /
_merge_pair) — bit-identical to the SQL oracle's `replace`.

Round-8 note: the previous single-space spelling used two replace
passes, and back-to-back occurrences sharing a boundary space made the
first pass SKIP the second occurrence of a run — an odd run of 5+
identical symbols segmented (xx)(x)(xx) instead of classic BPE's
(xx)(xx)(x) (hypothesis found 'bbbbb'; test_stats_properties pins the
pure-python classic reference). With double-space separators the
pattern ' l  r ' consumes only the inner halves of the two boundary
separators, so adjacent occurrences never overlap and one
left-to-right pass IS the classic greedy sweep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from imposm3_spark.datapipe.text import tokens


def _spell(word: Column) -> Column:
    """'  c  h  a  r  s  ' — DOUBLE-space padded and separated symbols.

    The double separator is what makes one plain `replace` equal to the
    classic greedy sweep: the merge pattern ' l  r ' (single space, l,
    double space, r, single space) consumes only the INNER half of each
    boundary separator, so the occurrence that starts right after shares
    no characters with it and matches in the same pass."""
    return F.concat(
        F.lit("  "),
        F.concat_ws("  ", F.regexp_extract_all(word, F.lit("."), 0)),
        F.lit("  "),
    )


def _merge_pair(spelled: Column, pair: str, merged: str) -> Column:
    """Merge every adjacent (left, right) into the merged symbol — one
    left-to-right non-overlapping replace == the classic BPE sweep (see
    _spell; `pair` is the single-space 'l r' form used in pair counts).
    Replacing ' l  r ' with ' lr ' restores the double-separator
    invariant: the two untouched outer half-spaces complete ' lr ' to
    '  lr  '."""
    left, right = pair.split(" ")
    return F.replace(
        spelled, F.lit(f" {left}  {right} "), F.lit(f" {merged} ")
    )


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the lowered whitespace tokens — the ONE corpus
    scan of BPE learning."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency."""
    sym = F.split(F.trim(F.col("spelled")), "  ")
    n = F.size(sym)
    pairs = F.zip_with(
        F.slice(sym, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(sym, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), F.col("cnt"))
        .groupBy("p")
        .agg(F.sum("cnt").alias("c"))
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn `num_merges` BPE merges; returns the ordered merge table
    (step, left, right, merged, pair_count) — step 0 is the first merge.

    Stops early if no adjacent pair remains (fully merged vocab)."""
    spark = df.sparkSession
    vocab = word_freqs(df, text_col).select(
        _spell(F.col("w")).alias("spelled"), "cnt"
    )
    vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(num_merges):
        best = _pair_counts(vocab).orderBy(F.desc("c"), F.asc("p")).limit(1).collect()
        if not best:
            break
        pair, cnt = best[0]["p"], int(best[0]["c"])
        left, right = pair.split(" ")
        merged = left + right
        merges.append((step, left, right, merged, cnt))
        vocab = vocab.withColumn(
            "spelled", _merge_pair(F.col("spelled"), pair, merged)
        )
        # shallow lineage: re-checkpoint periodically (each checkpoint is
        # one job over the vocab-sized table)
        if (step + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count bigint"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply an ordered merge list to a corpus: (id, n_tokens, n_pieces) —
    pieces = BPE symbols after all merges, applied per word in merge
    order. Pure expressions (replace chain over the spelled word), so the
    encode pass runs at scan speed with zero shuffle."""

    def encode_word(w: Column) -> Column:
        s = _spell(w)
        for left, right in merges:
            s = _merge_pair(s, f"{left} {right}", f"{left}{right}")
        return F.size(F.split(F.trim(s), "  "))

    toks = tokens(F.lower(F.col(text_col)))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            F.transform(toks, encode_word), F.lit(0), lambda acc, x: acc + x
        ).alias("n_pieces"),
    )
