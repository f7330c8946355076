"""Text-analysis column functions: tokenization, shingles, MinHash,
SimHash, quality stats (SURVEY.md §7 step 7 / training-data extensions).

Everything stays JVM-side (built-in higher-order functions — transform /
filter / aggregate over arrays), so the hot path is codegen'd and
shuffle payloads are the derived values, never raw Python objects.

Hash design note: signatures are built from md5 hex strings (seeded by
concatenation) rather than xxhash64, so the DuckDB oracle can compute
bit-identical values — md5 is deterministic and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small English stopword list (public, ubiquitous). Used for quality
# ratios and the language-ID heuristic.
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")


def tokens(col: Column) -> Column:
    """Lowercase whitespace tokens, empties dropped (T10/T12)."""
    return F.filter(
        F.split(F.trim(F.lower(col)), r"\s+"), lambda t: F.length(t) > 0
    )


def clean_tokens(col: Column) -> Column:
    """Tokens with non-alphanumerics stripped (T11), empties dropped."""
    return F.filter(
        F.transform(tokens(col), lambda t: F.regexp_replace(t, "[^a-z0-9]", "")),
        lambda t: F.length(t) > 0,
    )


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-token shingles as strings (word n-grams).

    ``transform(sequence(1, size-n+1), i -> concat_ws(' ', slice))`` —
    all built-in array ops, 1-indexed to mirror the DuckDB oracle.
    """
    # Guard: Spark's sequence(1, stop) counts *down* when stop < 1, so
    # short docs must short-circuit to an empty array explicitly.
    # array_join(slice(...)) is one array op per gram instead of n
    # element_at lookups — these higher-order lambdas run interpreted,
    # so per-gram expression-node count is the real cost (3.5x measured
    # on the window-hash twin of this pattern at sf1).
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.array_join(F.slice(tok, i, n), " "),
    )
    return F.when(F.size(tok) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_sig(shingle_col: Column, seed: int) -> Column:
    """One MinHash component: lexicographic min of seeded md5 over the
    shingle set. Null-safe: empty shingle set → null.
    """
    return F.array_min(
        F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


def stopword_ratio(tok: Column) -> Column:
    """Fraction of tokens that are stopwords; 0.0 for empty docs."""
    stop = F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(tok) > 0, stop / F.size(tok)).otherwise(F.lit(0.0))


def avg_token_len(tok: Column) -> Column:
    total = F.aggregate(
        F.transform(tok, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(F.size(tok) > 0, total / F.size(tok)).otherwise(F.lit(0.0))


def simhash16(tok: Column) -> Column:
    """16-bit SimHash as a '0'/'1' string of length 16.

    Bit i is the sign of sum over tokens of ±1, where the vote of a
    token at position i is +1 iff hex digit i of md5(token) >= '8'
    (i.e. the high bit of that nibble). String/md5-based so the DuckDB
    oracle reproduces it exactly.

    Single-pass formulation: one md5 per token (inner transform), one
    fold accumulating all 16 vote counters as an int array — not 16
    separate aggregates, which would re-tokenize and re-hash 16× once
    Catalyst collapses the projections.
    """
    hashes = F.transform(tok, lambda t: F.md5(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 16),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: F.when(F.substr(h, i, F.lit(1)) >= "8", 1).otherwise(-1),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.array_join(
        F.transform(votes, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0"))),
        "",
    )


def window_hashes(tok: Column, w: int = 10) -> Column:
    """Positional w-token window hashes (NOT distinct — every offset).

    The primitive behind exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): two
    docs sharing any w-token window share a verbatim span. md5 of the
    joined window so the DuckDB oracle is bit-identical.
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (w - 1)),
        lambda i: F.md5(F.array_join(F.slice(tok, i, w), " ")),
    )
    return F.when(F.size(tok) >= w, grams).otherwise(
        F.array().cast("array<string>")
    )
