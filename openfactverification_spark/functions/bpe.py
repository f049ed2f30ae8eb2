"""Deterministic mini-BPE tokenizer — the real-subword upgrade of the P7
token-counting gap (reference meters tiktoken BPE tokens,
/root/reference/factcheck/__init__.py:38; tiktoken isn't installable here, so
the merges table is trained offline by the classic Sennrich procedure on a
LITERAL seed word-frequency table and embedded as constants).

Encoding scheme (the spec both engines implement identically): a word becomes
its characters joined by '|' ("hello" -> "h|e|l|l|o"); merges are applied IN
RANK ORDER, each replacing every non-overlapping occurrence left-to-right
("l|l" -> "ll") — exactly the semantics of SQL replace(), which is what makes
the tokenizer expressible as a pure JVM-side fold on Spark (aggregate over a
literal merges array — loop-form per the 64KB codegen rule) and a recursive
CTE on DuckDB. Token count = separators + 1. The pre-tokenizer is the BPE-ish
regex [a-z0-9]+ over lowercased text, so token alphabet and '|' never
collide.

Training is deterministic: most-frequent pair wins, ties break to the
lexicographically smallest pair; pure Python over literal counts, so the
MERGES constant is identical on every import, machine, and engine.
"""

from __future__ import annotations

from collections import Counter

# Literal seed word-frequency table: the synthetic corpus vocabulary (top
# terms of the documents fixture, counts from sf0.001) plus common English
# function words so the merges generalize beyond the fixture.
SEED_COUNTS: dict[str, int] = {
    "scan": 984, "column": 978, "window": 976, "order": 975, "sort": 974,
    "part": 963, "agg": 953, "value": 950, "line": 946, "key": 945,
    "join": 936, "merge": 935, "query": 934, "group": 934, "a": 931,
    "vector": 931, "hash": 923, "slow": 921, "stream": 919, "filter": 917,
    "fast": 913, "the": 910, "spark": 910, "batch": 910, "table": 903,
    "row": 890, "data": 885, "small": 880, "big": 875, "dup": 860,
    "customer": 850, "and": 600, "of": 580, "to": 560, "in": 540,
    "is": 520, "that": 500, "for": 480, "with": 460, "on": 440,
}

N_MERGES = 48


def train_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE learning: repeatedly merge the most frequent adjacent
    symbol pair (count-weighted by word frequency). Deterministic tie-break:
    lexicographically smallest pair."""
    vocab = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, cnt in word_counts.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


MERGES: list[tuple[str, str]] = train_bpe(SEED_COUNTS, N_MERGES)


def bpe_encode(word: str, merges: list[tuple[str, str]] | None = None) -> list[str]:
    """Pure-Python reference encoder (tests pin both engines against it).
    Applies merges in rank order via str.replace — the same non-overlapping
    left-to-right semantics as SQL replace()."""
    merges = MERGES if merges is None else merges
    if not word:
        return []
    s = "|".join(word)
    for a, b in merges:
        s = s.replace(f"{a}|{b}", a + b)
    return s.split("|")


def bpe_token_count_expr(text_col: str, dialect: str) -> str:
    """SQL expression: total mini-BPE token count of `text_col` (BIGINT).

    Pure projection in both engines — no explode, no join, no UDF: the word
    list comes from regexp_extract_all, each word is folded through the
    literal merges in rank order, and the per-word counts are summed by a
    lambda fold. Spark folds with aggregate() over an array<array<string>>
    merges literal; DuckDB lacks an init-value reduce, so the word's token
    string is PREPENDED as list_reduce's seed element and merges ride along
    as 'pat:repl' strings (':' can't occur in the [a-z0-9|] token alphabet).
    left(raw, 2*len(w)-1) drops the trailing '|' the char-split leaves."""
    if dialect == "spark":
        marr = ", ".join(f"array('{a}|{b}', '{a}{b}')" for a, b in MERGES)
        return (
            f"aggregate(transform(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0), "
            f"w -> cast(size(split(aggregate(array({marr}), "
            "left(regexp_replace(w, '(.)', '$1|'), length(w) * 2 - 1), "
            "(acc, m) -> replace(acc, element_at(m, 1), element_at(m, 2))), "
            "'[|]')) as bigint)), cast(0 as bigint), (acc, x) -> acc + x)"
        )
    melems = ", ".join(f"'{a}|{b}:{a}{b}'" for a, b in MERGES)
    return (
        f"coalesce(list_sum(list_transform(regexp_extract_all(lower({text_col}), '[a-z0-9]+'), "
        "w -> len(string_split(list_reduce(list_prepend("
        r"left(regexp_replace(w, '(.)', '\1|', 'g'), length(w) * 2 - 1), "
        f"[{melems}]), "
        "(acc, x) -> replace(acc, split_part(x, ':', 1), split_part(x, ':', 2))), "
        "'|')))), 0)"
    )
