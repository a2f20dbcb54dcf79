"""Text-analysis column functions for LLM-data pipelines.

All pure Column expressions (split/size/filter/transform/md5 — JVM-side,
codegen'd); no UDFs, so a 100 TB documents table is processed at scan
speed. These extend the reference's string surface (SURVEY.md §2.6 —
split/explode only) to the BASELINE.json north-star set: language ID,
quality scoring, token counting, fingerprinting, shingling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "regex_token_count",
    "avg_token_length",
    "stopword_ratio",
    "lang_id",
    "quality_score",
    "fingerprint",
    "rolling_fingerprint",
    "shingles",
    "bigrams",
    "bigrams_of",
    "dup_ratio_of",
    "dup_token_ratio",
    "dup_bigram_ratio",
    "term_pattern",
    "term_match_count",
    "scrub_terms",
    "EN_STOPWORDS",
]

#: Karp–Rabin rolling-hash parameters. acc < MOD and token hashes are
#: reduced mod MOD before the fold, so acc*BASE + x < 2^38 — no int64
#: overflow in Spark (long) or DuckDB (BIGINT); both engines reproduce
#: the hash bit-for-bit.
ROLL_BASE = 257
ROLL_MOD = 1_000_000_007

#: Small English stopword list for the n-gram/stopword language heuristic.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
)

#: BPE-ish tokenizer regex: word pieces, numbers, or single non-space
#: punctuation — a deterministic stand-in for a real BPE vocab.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column, pattern: str = " ") -> Column:
    """Whitespace tokens, empties removed (so ``split``'s trailing-empty
    behavior can't skew counts)."""
    return F.filter(F.split(text, pattern), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex (letters/digits/punct pieces)."""
    return F.size(
        F.filter(
            F.regexp_extract_all(text, F.lit(f"({BPE_ISH_PATTERN})"), 1),
            lambda t: t != F.lit(""),
        )
    )


def avg_token_length(text: Column) -> Column:
    toks = tokens(text)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
        )
        / F.size(toks),
    )


def stopword_ratio(
    text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS
) -> Column:
    toks = tokens(F.lower(text))
    stops = F.filter(
        toks, lambda t: t.isin(*[F.lit(s) for s in stopwords])
    )
    return F.when(F.size(toks) > 0, F.size(stops) / F.size(toks))


def lang_id(
    text: Column,
    threshold: float = 0.05,
    stopwords: tuple[str, ...] = EN_STOPWORDS,
) -> Column:
    """Heuristic language ID: English if the stopword ratio clears the
    threshold, ASCII-latin otherwise 'und'. (A real pipeline swaps in a
    fastText model behind the same column signature via pandas_udf.)"""
    ratio = stopword_ratio(text, stopwords)
    is_ascii = text.rlike(r"^[\x00-\x7F]*$")
    return (
        F.when(ratio >= threshold, F.lit("en"))
        .when(is_ascii, F.lit("latin-und"))
        .otherwise(F.lit("und"))
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] document-quality score: length, word-length sanity,
    stopword presence, alpha ratio. Deterministic, heuristic — the shape
    (not the constants) is the contract."""
    n_chars = F.length(text)
    n_toks = token_count(text)
    awl = F.coalesce(avg_token_length(text), F.lit(0.0))
    stop = F.coalesce(stopword_ratio(text), F.lit(0.0))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 100000), 1.0).otherwise(0.0)
    awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.when(stop >= 0.01, 1.0).otherwise(0.0)
    toks_ok = F.when(n_toks >= 10, 1.0).otherwise(0.0)
    return (len_ok + awl_ok + stop_ok + toks_ok) / F.lit(4.0)


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text. Equal fingerprints = exact near-duplicate
    modulo case/whitespace; usable as a dedup key at any scale."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)


def rolling_fingerprint(text: Column) -> Column:
    """Karp–Rabin polynomial rolling hash over the token stream:
    ``h = fold(tokens, 0, (acc, t) -> (acc*BASE + hash(t)) mod MOD)``.

    Order-sensitive (unlike the md5 set :func:`fingerprint`): documents
    with the same words in a different order hash differently. The
    per-token base hash is the portable md5-prefix integer (same trick
    as MinHash), so a SQL oracle reproduces the fold exactly. Pure
    Column fold — scan-speed, no shuffle, no UDF.
    """
    tok_hashes = F.transform(
        tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % ROLL_MOD,
    )
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_BASE + x) % ROLL_MOD,
    )


def bigrams_of(toks: Column) -> Column:
    """Word 2-grams from an already-projected token-array column,
    duplicates KEPT. Implementation is ``zip_with`` over two slices of
    the SAME column reference — each array is evaluated once per row.
    (The previous ``element_at(toks, i)`` inside a ``transform`` lambda
    re-evaluated the token expression per element: O(n²) re-splits per
    document when fed a raw ``split()`` expression, measured as the
    second-slowest query at sf1.) Pass a projected COLUMN, not a raw
    ``tokens(text)`` expression, in hot paths."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigrams(text: Column) -> Column:
    """All word 2-grams of the document, duplicates KEPT (unlike
    :func:`shingles`, whose distinct sets feed MinHash). The multiset is
    what repetition metrics need: a boilerplate page that repeats one
    phrase 100 times must count 100, not 1. Documents under 2 words
    yield an empty array."""
    return bigrams_of(tokens(text))


def dup_ratio_of(arr: Column) -> Column:
    """``1 - distinct/total`` over an already-projected array column
    (NULL-safe on empty arrays). Reference the projected column, not a
    re-derivable expression, so the array is built once per row."""
    return F.when(
        F.size(arr) > 0,
        1.0 - F.size(F.array_distinct(arr)) / F.size(arr),
    )


def dup_token_ratio(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of token occurrences that
    are repeats of an earlier token, ``1 - distinct/total``. 0 = every
    word unique; →1 = the page is one word over and over. Pure Column
    expression (split + array_distinct) — scan-speed."""
    return dup_ratio_of(tokens(text))


def dup_bigram_ratio(text: Column) -> Column:
    """Duplicate-2-gram fraction — catches repeated *phrases* that
    unigram repetition misses (boilerplate headers, templated spam)."""
    return dup_ratio_of(bigrams(text))


def term_pattern(terms: tuple[str, ...]) -> str:
    """Word-boundary alternation regex for a denylist of literal terms.
    ``\\b`` and plain alternation behave identically in Java regex
    (Spark) and RE2 (DuckDB), so oracles can reuse the string."""
    import re as _re

    return r"\b(" + "|".join(_re.escape(t) for t in terms) + r")\b"


def term_match_count(text: Column, terms: tuple[str, ...]) -> Column:
    """How many denylist-term occurrences the document contains."""
    return F.size(
        F.regexp_extract_all(text, F.lit(term_pattern(terms)), 0)
    )


def scrub_terms(
    text: Column, terms: tuple[str, ...], replacement: str = "[REDACTED]"
) -> Column:
    """Benchmark-decontamination scrub: replace every whole-word
    occurrence of the denylist terms (eval-set strings, PII literals,
    canary tokens) with a marker. One vectorized ``regexp_replace`` —
    no UDF, applies at scan speed to a 100 TB corpus."""
    return F.regexp_replace(text, term_pattern(terms), replacement)


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an already-projected
    token-array column. Built as n slices of the SAME reference zipped
    pairwise — the array expression is evaluated a CONSTANT number of
    times per row. (The previous ``slice(toks, i, n)`` inside a
    ``transform`` lambda re-evaluated the token expression per window
    position: O(n²) re-splits per document when fed a raw ``split()``,
    in the MinHash hot path.) Prefer passing a projected column."""
    length = F.size(toks) - (n - 1)
    zipped = F.slice(toks, 1, length)
    for i in range(1, n):
        zipped = F.zip_with(
            zipped,
            F.slice(toks, i + 1, length),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    grams = F.when(F.size(toks) >= n, zipped).otherwise(
        F.array(F.concat_ws(" ", toks))
    )
    return F.array_distinct(grams)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>), the unit set for
    Jaccard / MinHash dedup. Documents shorter than n words yield their
    whole text as a single shingle so they still participate."""
    return shingles_of(tokens(text), n)


#: Winnowing parameters (Schleimer, Wilkerson, Aiken — "Winnowing:
#: Local Algorithms for Document Fingerprinting", SIGMOD 2003). k-gram
#: size and window width; guarantee: any shared run of
#: k + w - 1 = 6 tokens contributes at least one shared fingerprint.
WINNOW_K = 3
WINNOW_W = 4
#: Pair encoding base: position * 2^31 + hash (hash < ROLL_MOD < 2^31),
#: so a (position, hash) pick packs losslessly into one int64.
WINNOW_PAIR_BASE = 2_147_483_648


def gram_hashes(toks: Column, k: int = WINNOW_K) -> Column:
    """Positional k-gram md5-prefix hashes (duplicates kept, document
    order) over an already-projected token array. One md5 per gram."""
    if k != 3:
        raise ValueError("gram_hashes builds positional 3-grams; k=3 only")
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.zip_with(
            F.slice(toks, 1, n - (k - 1)),
            F.zip_with(
                F.slice(toks, 2, n - (k - 1)),
                F.slice(toks, 3, n - (k - 1)),
                lambda b, c: F.concat_ws(" ", b, c),
            ),
            lambda a, bc: F.concat_ws(" ", a, bc),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast(
            "long"
        )
        % ROLL_MOD,
    )


def winnow_picks(hashes: Column, w: int = WINNOW_W) -> Column:
    """Winnowing fingerprint picks over an ALREADY-PROJECTED k-gram
    hash-array column (:func:`gram_hashes`): per-window
    RIGHTMOST-minimum selection → distinct (position, hash) picks,
    each packed into an int64 (``pos * 2^31 + hash``).

    The MOSS selection scheme: instead of keeping every k-gram hash
    (too many) or every 0-mod-p hash (no coverage guarantee), keep the
    rightmost minimum of each sliding window of ``w`` consecutive
    hashes — O(n/w) fingerprints with a positional coverage guarantee.

    ``hashes`` MUST be a projected column, not an inline
    :func:`gram_hashes` expression: the windows reference the array
    ``w`` times (once per shifted slice), and expression inlining would
    re-run the md5-per-gram build per reference — the O(n²)-rehash
    trap documented at :func:`bigrams_of` (measured 107 s at sf1 for
    the registered query when inlined). Fewer than ``w`` hashes yield
    an empty pick array.

    Implementation: ``arrays_zip`` of ``w`` shifted slices + ONE
    transform — each window is a struct of its ``w`` members, touched
    once, with no per-window slice/reverse allocations (higher-order
    functions run interpreted, so per-window array churn dominates; the
    zipped form measured ~3x faster than slice-per-window at sf1).
    Rightmost-minimum tie-break = test the struct fields from the
    right.
    """
    n_w = F.size(hashes) - (w - 1)
    z = F.arrays_zip(
        *[F.slice(hashes, i + 1, n_w).alias(f"s{i}") for i in range(w)]
    )

    def pick(e, i):
        m = F.least(*[e[f"s{j}"] for j in range(w)])
        # rightmost slot holding the minimum; i is the 0-based window
        # start, slot j covers hash position i + j + 1 (1-based)
        rp = F.lit(None).cast("long")
        for j in range(w - 1, -1, -1):
            rp = F.coalesce(rp, F.when(e[f"s{j}"] == m, i + j + 1))
        return rp * F.lit(WINNOW_PAIR_BASE) + m

    return F.when(
        F.size(hashes) >= w,
        F.array_distinct(F.transform(z, pick)),
    ).otherwise(F.array().cast("array<long>"))
