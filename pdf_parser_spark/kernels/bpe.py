"""Exact BPE (byte-pair-encoding) token counting — pure Python/pandas, no
Spark imports (kernel rule, SURVEY.md §7.1).

r04 verdict task #5: the ~4-chars-per-token estimate in
``subword_token_stats`` budgets, but a training pipeline PACKS by exact
tokenizer counts. This kernel runs the classic BPE merge loop (Sennrich et
al. 2016; the GPT-2 tokenizer's core) against a DETERMINISTIC merge table
trained at import time from an embedded word-frequency list — a committed
fixture that is a pure function of this file, so both harnesses (single-node
golden runner and the Spark mapInPandas wrapper) agree byte-for-byte and the
table ships inside the package zip (``ship_package`` zips only ``.py``).

Counting rules (documented simplifications of a production tokenizer):
- letter runs ``[A-Za-z]+``: lowercased, then the BPE merge loop; token
  count = surviving symbol count. Case-insensitive merging keeps the table
  small; a real deployment swaps in its tokenizer's merge file unchanged.
- digit runs ``[0-9]+``: ceil(len/3) (the 3-digit chunking modern
  tokenizers converge to).
- other non-space runs: one token per character (punctuation is almost
  always a single token each).
- whitespace: delimiter only, never counted (no GPT-2 leading-space glue).
"""
from __future__ import annotations

import re
from collections.abc import Iterable

__all__ = ["train_merges", "default_ranks", "bpe_token_count", "count_batch"]

_RUN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")

# Embedded training fixture: ~120 high-frequency English words with Zipf-ish
# weights (public-knowledge frequency ordering). The merge table derived
# from it compresses common English well (the/and/ing/tion/...) and leaves
# rare words at near-character granularity — the qualitative shape of a
# real BPE vocabulary, at fixture scale.
_TRAIN_WORDS: list[tuple[str, int]] = [
    ("the", 330), ("of", 200), ("and", 190), ("to", 180), ("in", 170),
    ("is", 110), ("that", 100), ("was", 90), ("for", 88), ("with", 82),
    ("his", 60), ("they", 58), ("this", 56), ("have", 54), ("from", 52),
    ("word", 50), ("their", 48), ("what", 46), ("were", 44), ("when", 42),
    ("your", 40), ("said", 38), ("there", 36), ("each", 34), ("which", 32),
    ("will", 30), ("other", 29), ("about", 28), ("many", 27), ("then", 26),
    ("them", 25), ("these", 24), ("would", 23), ("write", 22), ("like", 21),
    ("time", 20), ("could", 19), ("people", 18), ("water", 17), ("first", 16),
    ("been", 15), ("called", 15), ("more", 14), ("find", 14), ("long", 13),
    ("down", 13), ("come", 12), ("made", 12), ("part", 12), ("over", 11),
    ("sound", 11), ("place", 11), ("years", 10), ("thing", 10), ("under",
    10), ("story", 9), ("never", 9), ("being", 9), ("every", 9), ("great",
    8), ("where", 8), ("through", 8), ("little", 8), ("world", 8),
    ("should", 7), ("because", 7), ("before", 7), ("between", 7),
    ("another", 7), ("working", 6), ("running", 6), ("nothing", 6),
    ("morning", 6), ("station", 6), ("nation", 6), ("action", 6),
    ("question", 5), ("position", 5), ("condition", 5), ("direction", 5),
    ("attention", 5), ("different", 5), ("important", 5), ("following", 5),
    ("together", 5), ("children", 5), ("mountain", 4), ("sentence", 4),
    ("thought", 4), ("example", 4), ("paper", 4), ("group", 4), ("music",
    4), ("study", 4), ("learn", 4), ("plant", 4), ("cover", 4), ("food",
    4), ("earth", 4), ("light", 4), ("enough", 3), ("almost", 3),
    ("above", 3), ("sometimes", 3), ("young", 3), ("picture", 3),
    ("really", 3), ("letter", 3), ("number", 3), ("system", 3),
    ("testing", 3), ("reading", 3), ("ending", 3), ("started", 3),
    ("players", 3), ("quickly", 2), ("strange", 2), ("project", 2),
    ("extract", 2), ("content", 2), ("document", 2),
]

_N_MERGES = 320


def train_merges(
    words: Iterable[tuple[str, int]] = tuple(_TRAIN_WORDS),
    n_merges: int = _N_MERGES,
) -> list[tuple[str, str]]:
    """Classic BPE training: start at character granularity, repeatedly
    merge the most frequent adjacent symbol pair (frequency weighted by
    word count; ties broken lexicographically, so the result is a pure
    function of the input list)."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in words
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


_DEFAULT_RANKS: dict[tuple[str, str], int] | None = None


def default_ranks() -> dict[tuple[str, str], int]:
    """The committed merge table as {pair: rank} (rank = merge priority)."""
    global _DEFAULT_RANKS
    if _DEFAULT_RANKS is None:
        _DEFAULT_RANKS = {p: i for i, p in enumerate(train_merges())}
    return _DEFAULT_RANKS


def _bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one lowercase letter run under the merge table:
    repeatedly apply the LOWEST-rank applicable merge (the GPT-2 encode
    loop), return the surviving symbol count."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_token_count(
    text: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, int] | None = None,
) -> int:
    """Exact token count of ``text`` under the counting rules above.
    ``cache`` memoizes per-word results across a batch (word-salad corpora
    repeat words heavily; the hit rate makes the kernel ~dictionary-bound)."""
    if not text:
        return 0
    if cache is None:
        cache = {}
    n = 0
    for m in _RUN_RE.finditer(text):
        run = m.group(0)
        c = run[0]
        if c.isdigit():
            n += (len(run) + 2) // 3
        elif c.isalpha():
            w = run.lower()
            hit = cache.get(w)
            if hit is None:
                hit = _bpe_word(w, ranks)
                cache[w] = hit
            n += hit
        else:
            n += len(run)
    return n


def count_batch(texts, ranks: dict[tuple[str, str], int] | None = None) -> list[int]:
    """Vectorized-batch counting (one shared word cache per batch)."""
    if ranks is None:
        ranks = default_ranks()
    cache: dict[str, int] = {}
    return [
        bpe_token_count(t if isinstance(t, str) else "", ranks, cache)
        for t in texts
    ]
