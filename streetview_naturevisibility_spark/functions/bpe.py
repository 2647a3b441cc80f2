"""Byte-pair-encoding kernels (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
public BPE algorithm). Pure Python, no Spark imports: the trainer runs
driver-side on a bounded word-frequency table, the encoder runs inside
Arrow-batched pandas UDFs with the merge table broadcast
(operators/tokenize.py owns the Spark plumbing).

Determinism: every tie in the trainer breaks lexicographically on the
pair, so the same word-frequency table always yields the same merge
list regardless of dict iteration order; the encoder is the standard
lowest-rank-first greedy loop, which is deterministic by construction.

The pre-tokenizer is a fixed regex (runs of alphanumerics, or a single
non-space symbol) shared by trainer and encoder; whitespace never
enters the vocabulary. The end-of-word sentinel is the paper's
``</w>`` appended to the final character.
"""

from __future__ import annotations

import re
from collections import Counter

EOW = "</w>"

# runs of unicode word chars (no underscore special-casing needed for
# the corpus) OR one non-word non-space symbol. re.UNICODE semantics.
_PRETOKEN = re.compile(r"\w+|[^\w\s]")


def pretokenize(text: str) -> list[str]:
    """text -> list of words/symbols (whitespace discarded)."""
    if not text:
        return []
    return _PRETOKEN.findall(text)


def word_to_symbols(word: str) -> tuple[str, ...]:
    """'low' -> ('l', 'o', 'w</w>')."""
    return tuple(word[:-1]) + (word[-1] + EOW,)


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a word->frequency table.

    Classic algorithm: repeatedly merge the most frequent adjacent
    symbol pair (ties -> lexicographically smallest pair). Stops early
    when no pair occurs at least twice — merging a unique pair can
    never help compression and would make the merge list depend on
    noise words.

    Incremental bookkeeping (subword-nmt's optimization; behaviour-
    identical to a naive full-rescan — pytest pins the paper example
    and a rescan-parity case): a pair->words inverted index means each
    merge re-counts only the words CONTAINING the winning pair —
    O(affected words) per merge instead of O(vocab).

    r7: best-pair selection via a lazy-deletion heap ordered by
    (-count, pair) instead of a full scan of the pair table per merge
    — popped entries are verified against the live count and re-pushed
    when stale, so the selected pair (and its lexicographic tie-break)
    is IDENTICAL to the min-scan; the 100-merge / ~100k-pair driver
    training measured ~1.9 s of which the per-merge scans were most.
    """
    import heapq

    words: list[tuple[str, ...]] = []
    freqs: list[int] = []
    for w, f in word_freqs.items():
        if w:
            words.append(word_to_symbols(w))
            freqs.append(f)

    pairs: Counter[tuple[str, str]] = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += f
            where.setdefault((a, b), set()).add(wi)

    heap = [(-c, p) for p, c in pairs.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            cur = pairs.get(p)
            if cur is None:
                continue
            if cur != -negc:
                heapq.heappush(heap, (-cur, p))
                continue
            best = (p, cur)
            break
        if best is None or best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        touched: set[tuple[str, str]] = set()
        for wi in list(where.get(pair, ())):
            syms = words[wi]
            f = freqs[wi]
            # retract the word's old pair contributions, apply the
            # merge, then add the new ones back — net effect on the
            # global counter is exactly the full-rescan delta
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] -= f
                touched.add((a, b))
                if pairs[(a, b)] <= 0:
                    del pairs[(a, b)]
                s = where.get((a, b))
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del where[(a, b)]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            words[wi] = new_syms
            for a, b in zip(new_syms, new_syms[1:]):
                pairs[(a, b)] += f
                touched.add((a, b))
                where.setdefault((a, b), set()).add(wi)
        # ONE heap push per net-changed pair per merge (per-word pushes
        # measured 3.5x slower than the min-scan they replaced — the
        # retract/re-add churn pushed every unchanged pair too); stale
        # entries are filtered by the verify-on-pop above
        for p in touched:
            c = pairs.get(p)
            if c is not None:
                heapq.heappush(heap, (-c, p))
    return merges


def train_bpe_rescan(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Naive full-rescan reference trainer (the textbook algorithm).
    Kept as the parity oracle for the incremental ``train_bpe`` —
    O(vocab) per merge, so tests only."""
    vocab: dict[tuple[str, ...], int] = {
        word_to_symbols(w): f for w, f in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Apply merges to one word: repeatedly merge the present pair
    with the LOWEST rank until none of the word's pairs is in the
    merge table. Standard greedy BPE apply."""
    syms = list(word_to_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def encode_text(
    text: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Pre-tokenize then encode each word; ``cache`` memoizes per
    distinct word (web text repeats words heavily — inside an Arrow
    batch the cache turns O(tokens) merge loops into O(distinct
    words))."""
    out: list[str] = []
    for w in pretokenize(text):
        if cache is not None:
            enc = cache.get(w)
            if enc is None:
                enc = encode_word(w, ranks)
                cache[w] = enc
        else:
            enc = encode_word(w, ranks)
        out.extend(enc)
    return out
