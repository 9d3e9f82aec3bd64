"""Text-analysis operators over document tables (north-star extension,
SURVEY §7.5): token counting, quality scoring, language-ID heuristic,
content fingerprinting.

All metrics are pure Column expressions (regex + arithmetic) — narrow,
codegen'd, shuffle-free per document; at 100 TB these run at scan speed.
Patterns stick to the regex subset with identical semantics in Java
regex and RE2-style engines so SQL oracles reproduce them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multi-language stopword table — config, not data; used by the
# language-ID heuristic.  Deliberately small and deterministic.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")
WORD_RE = r"[A-Za-z0-9_]+"
PUNCT_RE = r"[^A-Za-z0-9_\s]"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count; empty/blank text → 0."""
    t = F.trim(_c(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_wordlike(text: Column | str) -> Column:
    """BPE-ish token count: word-character runs plus standalone
    punctuation marks (the classic ``\\w+|[^\\w\\s]`` pre-tokenizer).
    Expressed as two regexp match counts — portable to SQL oracles
    (``len(regexp_extract_all(...))``)."""
    t = _c(text)
    return F.regexp_count(t, F.lit(WORD_RE)) + F.regexp_count(t, F.lit(PUNCT_RE))


def char_count(text: Column | str) -> Column:
    return F.length(_c(text))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text).  Raw double —
    callers integerize for cross-engine output (floor(x*1e6)); engine
    round() tie-rules are not portable, exact division of ints is."""
    t = _c(text)
    n = F.length(t)
    p = F.length(F.regexp_replace(t, rf"(?:{WORD_RE}|\s)", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords."""
    toks = F.split(F.lower(F.trim(_c(text))), r"\s+")
    hits = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs,
    penalizes punctuation soup and stopword-free keyword mash.  The exact
    formula is arbitrary but deterministic and oracle-reproducible."""
    n_tok = token_count_ws(text)
    len_score = F.least(n_tok.cast("double") / 50.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5.0)
    stop_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return len_score * 0.5 + punct_pen * 0.3 + stop_score * 0.2


def predict_lang(text: Column | str) -> Column:
    """N-gram/stopword language heuristic: 'en' when English stopwords
    exceed 5% of tokens, else 'xx' (unknown).  A real system plugs in a
    proper n-gram profile table here; the operator shape (narrow scan-side
    classification) is what matters at scale."""
    return F.when(stopword_ratio(text) > 0.05, F.lit("en")).otherwise(F.lit("xx"))


def fingerprint(text: Column | str) -> Column:
    """Canonical content fingerprint: md5 of the lowercased,
    whitespace-collapsed text.  Engine-portable (md5), used for exact
    near-canonical dedup."""
    canon = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return F.md5(canon)


def fingerprint_bucket(text: Column | str, bits: int = 16) -> Column:
    """Leading fingerprint bits as an integer bucket — a shard key for
    distributing dedup work evenly (md5 is uniform)."""
    hexdigits = (bits + 3) // 4
    return F.conv(F.substring(fingerprint(text), 1, hexdigits), 16, 10).cast("bigint")
