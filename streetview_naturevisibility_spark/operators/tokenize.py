"""Distributed BPE tokenization.

Spark-first shape: the merge table is learned ONCE driver-side from a
BOUNDED sample's word-frequency table (the word counting itself is
distributed — Arrow-batched pre-tokenization, one word shuffle), then
broadcast to every executor; encoding is an Arrow-batched pandas UDF
with a per-batch distinct-word memo, so the hot path is O(distinct
words) merge loops per batch and ZERO shuffle — a map-only stage at
any corpus size. Replaces the whitespace/regex token-count heuristics
(`token_count_col`) wherever a real subword count is wanted (packing,
token budgets).

The reference has no tokenizer; the method is Sennrich et al. 2016
(see functions/bpe.py). Training is deliberately sample-bounded: the
published BPE regime learns merges from a corpus sample (the merge
table is a model artifact, not a per-corpus aggregate), so the
driver-side table is bounded by the sample's distinct-word count, not
the corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bpe import encode_text, encode_word, pretokenize, train_bpe


def corpus_word_freqs(
    docs: DataFrame, text_col: str = "text", sample_docs: int = 10_000
) -> DataFrame:
    """-> (word, freq) over a bounded doc sample. Pre-tokenization is
    the Python kernel (same regex the encoder uses — Java's ``\\w`` is
    ASCII-only, so a JVM regexp_extract_all twin would disagree on
    unicode words); each Arrow batch emits its partial Counter, then
    one word-keyed shuffle sums the partials (map-side combine on
    batch-local counts). ``sample_docs=0`` means the FULL corpus —
    only sensible when the distinct-word table is known to be small
    (tests); production training stays sample-bounded."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in it:
            c: Counter[str] = Counter()
            for t in pdf[text_col]:
                if t is not None:
                    c.update(pretokenize(t))
            if c:
                yield pd.DataFrame(
                    {"word": list(c.keys()), "freq": list(c.values())}
                )

    sample = docs.select(text_col).where(F.col(text_col).isNotNull())
    if sample_docs:
        sample = sample.limit(int(sample_docs))
    return (
        sample.mapInPandas(batches, "word string, freq long")
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
    )


def train_bpe_from_corpus(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_docs: int = 10_000,
) -> list[tuple[str, str]]:
    """Learn a merge list from a bounded corpus sample. The collect is
    the (sample-bounded) word-frequency table — the standard BPE
    training regime, not a corpus-wide driver pull."""
    freqs = {
        r.word: int(r.freq)
        for r in corpus_word_freqs(docs, text_col, sample_docs).collect()
    }
    return train_bpe(freqs, n_merges)


def _ranks_bc(spark: SparkSession, merges: list[tuple[str, str]]):
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    return spark.sparkContext.broadcast(ranks)


# r7: cross-task distinct-word memo (guide §4.5 "state that is
# expensive even per task"). Python workers are reused across tasks
# (spark.python.worker.reuse default), and this module is importable on
# executors, so a module-level cache survives between tasks and turns
# the per-task re-encode of the hot vocabulary into dict hits. Keyed by
# a fingerprint of the merge list (a new tokenizer invalidates the
# cache); bounded — adversarial corpora with unbounded distinct words
# (e.g. random-digit junk) would otherwise grow it without limit.
_COUNT_CACHE: dict = {}
_COUNT_CACHE_KEY: object = None
_COUNT_CACHE_CAP = 2_000_000


def _count_cache_for(key) -> dict:
    global _COUNT_CACHE_KEY
    if _COUNT_CACHE_KEY != key or len(_COUNT_CACHE) > _COUNT_CACHE_CAP:
        _COUNT_CACHE.clear()
        _COUNT_CACHE_KEY = key
    return _COUNT_CACHE


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, tokens array<string>). Broadcast ranks, Arrow-batched
    encode with a per-batch distinct-word memo; no shuffle."""
    bc = _ranks_bc(df.sparkSession, merges)

    @F.pandas_udf("array<string>")
    def enc(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = bc.value
        cache: dict[str, tuple[str, ...]] = {}  # per task (iterator form)
        for batch in texts:
            yield batch.map(
                lambda t: None if t is None else encode_text(t, ranks, cache)
            )

    return df.select(F.col(id_col), enc(F.col(text_col)).alias("tokens"))


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_tokens_bpe",
) -> DataFrame:
    """Append a real subword count (packing/budget input). Same kernel
    as ``bpe_encode`` but only the length crosses Arrow back."""
    bc = _ranks_bc(df.sparkSession, merges)
    key = hash(tuple(merges))

    @F.pandas_udf("long")
    def cnt(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # iterator form: the (broadcast deref + memo fetch) happens
        # once per task, and the cross-task module memo keeps the hot
        # vocabulary's subword counts across reused workers (§4.5)
        ranks = bc.value
        cache = _count_cache_for(key)

        def n_tok(t):
            if t is None:
                return 0
            total = 0
            for w in pretokenize(t):
                c = cache.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    cache[w] = c
                total += c
            return total

        for batch in texts:
            yield batch.map(n_tok)

    return df.withColumn(out_col, cnt(F.col(text_col)))


def save_merges(
    spark: SparkSession, merges: list[tuple[str, str]], path: str
) -> None:
    """Persist the learned merge list as parquet (rank, left, right) —
    the tokenizer is a model artifact; training once and reusing it
    across corpus versions is the published regime."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r.left, r.right) for r in rows]


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic symbol->id table: byte-order-sorted single
    characters and ``c</w>`` forms reachable from the merges' symbol
    inventory first, then each merge's output symbol in rank order
    (the standard BPE vocab construction: base alphabet + one new
    symbol per merge). Unknown base characters at encode time map to
    ``unk_id = len(vocab)``."""
    from ..functions.bpe import EOW

    base: set[str] = set()
    for a, b in merges:
        for s in (a, b):
            stripped = s[:-len(EOW)] if s.endswith(EOW) else s
            for ch in stripped:
                base.add(ch)
                base.add(ch + EOW)
    vocab: dict[str, int] = {}
    for s in sorted(base):
        vocab[s] = len(vocab)
    for a, b in merges:
        m = a + b
        if m not in vocab:
            vocab[m] = len(vocab)
    return vocab


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, token_ids array<int>) — the shape a training pipeline
    consumes (feed to ``pack_assignments`` via ``F.size`` for exact
    packed budgets). Symbols outside the vocab (characters the sample
    never saw) map to the single reserved unk id = len(vocab). Same
    broadcast + Arrow-batched plumbing as ``bpe_encode``."""
    vocab = bpe_vocab(merges)
    unk = len(vocab)
    spark = df.sparkSession
    bc_r = _ranks_bc(spark, merges)
    bc_v = spark.sparkContext.broadcast(vocab)

    @F.pandas_udf("array<int>")
    def enc(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = bc_r.value
        v = bc_v.value
        cache: dict[str, tuple[str, ...]] = {}  # per task (iterator form)
        for batch in texts:
            yield batch.map(
                lambda t: None
                if t is None
                else [v.get(s, unk) for s in encode_text(t, ranks, cache)]
            )

    return df.select(F.col(id_col), enc(F.col(text_col)).alias("token_ids"))
