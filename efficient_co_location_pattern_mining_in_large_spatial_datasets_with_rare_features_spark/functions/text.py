"""Text-analysis column functions for training-data pipelines.

Every function here is built from deterministic integer/string primitives
(token counts, md5, fixed-priority argmax) so an ANSI-SQL oracle (DuckDB)
reproduces results bit-for-bit — the driver's correctness harness compares
value hashes, so even float outputs are derived from integers with an
identical operation order on both sides.

Ops: normalization, tokenization, token/char stats, language ID (stopword
heuristic), quality scoring, document fingerprinting, word n-grams.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language
#: heuristic; deliberately small so the SQL oracle stays readable.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
}
#: fixed priority for argmax ties (first maximal wins) — part of the spec.
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]

CJK_CLASS = "[一-鿿]"


def norm_text(col: Column) -> Column:
    """lower + trim + whitespace collapse (the normalization every other op
    builds on; its SQL twin is in __spark_entry__)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text; [] for empty docs."""
    return F.filter(F.split(norm_text(col), " "), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


#: BPE-ish pre-tokenization: letter runs | digit runs | single other
#: glyph (CJK and punctuation tokenize per character, like byte-level BPE
#: without merges).  ASCII classes only — Java regex and RE2 (DuckDB)
#: agree on these exactly, unlike \p{L} whose Unicode tables drift.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token-count estimate: regex pre-tokenize, then charge each
    letter/digit run ``ceil(len/4)`` subword pieces (the standard
    ~4-chars-per-token budget rule); single-glyph matches cost 1.  The
    estimate every training-data pipeline uses for token budgeting when
    running the real tokenizer over 100 TB is not worth it."""
    pieces = F.regexp_extract_all(norm_text(col), F.lit(BPE_PATTERN), 0)
    return F.aggregate(
        pieces,
        F.lit(0).cast("bigint"),
        lambda acc, m: acc
        + F.floor((F.length(m) + F.lit(3)) / F.lit(4)).cast("bigint"),
    )


def token_ngrams(tok_col: Column, n: int) -> Column:
    """Word n-grams (space-joined) from an ALREADY-MATERIALIZED token
    array column — the single home of two known traps:

    - Spark's ``sequence(1, 0)`` *descends* ([1, 0]) instead of being
      empty, so inputs shorter than n get an explicit empty array;
    - callers must project the token array FIRST (interpreted
      higher-order exprs get no CSE: composing ``tokens(col)`` inline
      re-runs the tokenizer once per gram — measured ~10x; see
      dedup._shingles).
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tok_col, i, n)),
    )
    return F.when(F.size(tok_col) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of raw text (shingles for dedup).  Convenience form —
    inside per-row pipelines prefer ``token_ngrams`` over a projected
    token column (see its docstring)."""
    return token_ngrams(tokens(col), n)


def token_ngrams_vec(n: int, distinct: bool = False):
    """Arrow-vectorized twin of ``token_ngrams``: a pandas UDF over an
    ALREADY-MATERIALIZED token array column.

    The expression form pays the interpreted-HOF tax per token copied —
    fine for bigrams, ~5x worse at n=13 where every gram slices and
    joins 13 tokens (measured 11 s for 200k 13-gram shingles at sf0.1;
    this UDF does the same in one Arrow batch pass).  Tokenization stays
    JVM-side, so engine/oracle parity remains purely structural: the
    Python here only slices and joins the strings Spark produced.
    ``distinct=True`` dedups per row preserving first-seen order.
    """
    # pandas is a lazy dependency: the pure-expression functions in this
    # module must import without it.  `from __future__ import annotations`
    # stringifies hints module-wide, and pandas_udf resolves them against
    # module globals — so attach REAL type objects via __annotations__
    # instead of inline hints, keeping the import local to this factory.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def grams(tok):
        def one(t):
            if t is None or len(t) < n:
                return []
            g = [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
            return list(dict.fromkeys(g)) if distinct else g

        return tok.map(one)

    grams.__annotations__ = {"tok": pd.Series, "return": pd.Series}
    # asNondeterministic is an optimizer fence, not a semantics change
    # (the function is pure): without it, every consumer that explodes
    # the gram array pays the InferFiltersFromGenerate trap — Catalyst
    # infers ``size(sh) > 0`` under the Generate and pushes it into a
    # SECOND ArrowEvalPython, re-running the whole 13-gram build per row
    # (round-9 plan audit: shingle_contamination evaluated this UDF
    # twice on both the 1M corpus side and the benchmark side).  Callers
    # filter/semi-join BEFORE applying the UDF throughout this package,
    # so no beneficial pushdown is lost.
    return pandas_udf(grams, "array<string>").asNondeterministic()


def stopword_hits(col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(words)))


def cjk_chars(col: Column) -> Column:
    return F.length(F.regexp_replace(col, f"[^{CJK_CLASS[1:-1]}]", ""))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: stopword-hit counts per language + CJK char
    count for zh; first maximal score in LANG_PRIORITY order wins."""
    scores = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    scores["zh"] = cjk_chars(col)
    # "first maximal in priority order": lang wins iff score > 0, >= every
    # later language and > every earlier one (earlier would have won a tie).
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        ge_all_later = F.lit(True)
        for later in LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]:
            ge_all_later = ge_all_later & (scores[lang] >= scores[later])
        gt_all_earlier = F.lit(True)
        for earlier in LANG_PRIORITY[: LANG_PRIORITY.index(lang)]:
            gt_all_earlier = gt_all_earlier & (scores[lang] > scores[earlier])
        expr = F.when(
            (scores[lang] > 0) & ge_all_later & gt_all_earlier, F.lit(lang)
        ).otherwise(expr)
    return expr


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[\.,;:!\?]", ""))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic from integer stats:

        0.5 * min(1, tokens/100) + 0.3 * (1 - min(1, 5*punct/len))
        + 0.2 * min(1, (len/tokens)/8)

    Empty docs score 0.  All inputs are integers; both engines perform the
    same double arithmetic in the same order.
    """
    nt = token_count(col).cast("double")
    ln = F.length(norm_text(col)).cast("double")
    pc = punct_count(col).cast("double")
    score = (
        F.lit(0.5) * F.least(F.lit(1.0), nt / F.lit(100.0))
        + F.lit(0.3)
        * (F.lit(1.0) - F.least(F.lit(1.0), F.lit(5.0) * pc / F.greatest(ln, F.lit(1.0))))
        + F.lit(0.2) * F.least(F.lit(1.0), (ln / F.greatest(nt, F.lit(1.0))) / F.lit(8.0))
    )
    return F.when(nt > 0, score).otherwise(F.lit(0.0))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized token stream (an
    order-sensitive rolling digest both engines share natively)."""
    return F.md5(F.concat_ws(" ", tokens(col)))


# ---------------------------------------------------------------- PII scrub
# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# lookaround, no backrefs) so a DuckDB oracle can replay them verbatim.
# Order matters where shapes could nest: SSN (3-2-4) before phone (3-3-4)
# is safe because the groupings are disjoint, but IPv4 must be scrubbed
# before phone-like digit runs ever could be (they cannot overlap here —
# kept alphabetical for determinism of the output contract).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of ``kind`` PII matches in the raw text (bigint)."""
    return F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), 0)).cast(
        "long"
    )


def scrub_pii(col: Column, replacement: str = "[PII]") -> Column:
    """Text with every PII match replaced — a pure codegen expression
    chain (one regexp_replace per category, insertion-ordered), so the
    scrub runs JVM-side at full scan speed with no shuffle and no UDF."""
    out = col
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, replacement)
    return out


# --------------------------------------------------- line-level quality
# Gopher-family line rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", App. A1.1 quality
# heuristics): documents dominated by bullet lists (> 90% of lines
# bullet-started), ellipsis-truncated lines (> 30% ending "..."), or
# symbol noise ('#' / "..." to word ratio > 0.1) are boilerplate.  The
# thresholds are the caller's policy; these functions emit the signals.
# All pure codegen expressions — full scan speed, no shuffle, no UDF —
# and ASCII-only markers so Java-regex and RE2/DuckDB agree exactly.
# Line = '\n'-separated segment of the RAW text ("" has one empty line);
# every fraction divides two engine-identical integers once, so the
# doubles hash bit-identically across engines.

_BULLET_PREFIXES = ("- ", "* ")


def doc_lines(col: Column) -> Column:
    """Raw '\\n'-split lines (trailing empties kept on both engines)."""
    return F.split(col, "\n")


def n_lines(col: Column) -> Column:
    return F.size(doc_lines(col)).cast("long")


def mean_line_len(col: Column) -> Column:
    """Mean raw character length per line (chars, not bytes)."""
    ls = doc_lines(col)
    total = F.aggregate(
        ls, F.lit(0).cast("bigint"), lambda a, l: a + F.length(l).cast("bigint")
    )
    return total.cast("double") / F.size(ls).cast("double")


def _line_frac(col: Column, pred) -> Column:
    ls = doc_lines(col)
    return (
        F.size(F.filter(ls, pred)).cast("double") / F.size(ls).cast("double")
    )


def bullet_line_frac(col: Column) -> Column:
    """Fraction of lines whose ltrimmed text starts with '- ' or '* '."""
    return _line_frac(
        col,
        lambda l: F.ltrim(l).startswith(_BULLET_PREFIXES[0])
        | F.ltrim(l).startswith(_BULLET_PREFIXES[1]),
    )


def ellipsis_line_frac(col: Column) -> Column:
    """Fraction of lines whose rtrimmed text ends with '...'."""
    return _line_frac(col, lambda l: F.rtrim(l).endswith("..."))


def symbol_word_ratio(col: Column) -> Column:
    """('#' characters + non-overlapping '...' runs) per word, words from
    the shared whitespace tokenizer; empty docs divide by 1."""
    hashes = F.length(col) - F.length(F.regexp_replace(col, "#", ""))
    ellipses = F.size(F.regexp_extract_all(col, F.lit(r"\.\.\."), 0))
    return (hashes + ellipses).cast("double") / F.greatest(
        token_count(col), F.lit(1)
    ).cast("double")


# --- C4 heuristic cleaning rules (Raffel et al. 2020, §2.2) --------------
# The C4 corpus filter: keep a line iff it ends in a terminal punctuation
# mark, has >= C4_MIN_LINE_WORDS words, and does not mention
# "javascript"; keep a page iff its kept text has >= C4_MIN_SENTENCES
# sentence terminators, no "lorem ipsum", and no curly brace.  All pure
# codegen over the shared '\n' line split — no UDF, no shuffle — and the
# markers are ASCII so Java regex and RE2/DuckDB agree exactly.  The
# original also drops pages matching a public blocklist; that list is a
# caller-supplied policy input, not a rule shape, so it is out of scope
# here (compose with F.col filters).

#: C4 keeps lines ending '.', '!', '?' or the closing double quote.
_C4_TERMINALS = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 3
C4_MIN_SENTENCES = 5


def _line_words(l: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(l), " "), lambda t: t != ""))


def c4_line_keep(l: Column) -> Column:
    """Per-line C4 keep predicate (terminal punctuation + word floor +
    no 'javascript')."""
    r = F.rtrim(l)
    ends = F.lit(False)
    for t in _C4_TERMINALS:
        ends = ends | r.endswith(t)
    return (
        ends
        & (_line_words(l) >= C4_MIN_LINE_WORDS)
        & ~F.lower(l).contains("javascript")
    )


def c4_kept_lines(col: Column) -> Column:
    return F.filter(doc_lines(col), c4_line_keep)


def c4_kept_text(col: Column) -> Column:
    """The document after line filtering ('\\n'-rejoined kept lines)."""
    return F.array_join(c4_kept_lines(col), "\n")


def sentence_count(col: Column) -> Column:
    """Sentence terminators ('.', '!', '?') in the text — the C4 sentence
    proxy, counted identically on both engines via regexp removal."""
    return (
        F.length(col) - F.length(F.regexp_replace(col, r"[.!?]", ""))
    ).cast("long")


def c4_page_keep(col: Column) -> Column:
    """Page-level C4 keep: sentence floor on the KEPT text, no
    'lorem ipsum', no curly brace (both checked on the raw text)."""
    low = F.lower(col)
    return (
        (sentence_count(c4_kept_text(col)) >= C4_MIN_SENTENCES)
        & ~low.contains("lorem ipsum")
        & ~low.contains("{")
    )
