"""Text-statistics expression builders — the composable forms behind
operators/textstats.py, usable on any string column (not just the
``documents`` fixture). All pure Catalyst expressions: they compose into
whole-stage codegen and never leave the JVM."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PUNCT_CHARS = ".,;:!?"


def _words(text: Column | str) -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(_words(text))


def bpe_token_estimate(text: Column | str) -> Column:
    """BPE-ish subword proxy: ~1 token per 4 chars, at least one per word."""
    t = F.col(text) if isinstance(text, str) else text
    return F.greatest(
        token_count(t),
        F.ceil(F.length(t).cast("double") / 4).cast("int"))


def type_token_ratio(text: Column | str) -> Column:
    """Lexical diversity: distinct tokens / tokens."""
    w = _words(text)
    return F.size(F.array_distinct(w)).cast("double") / F.size(w)


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (translate-based, no regex)."""
    t = F.col(text) if isinstance(text, str) else text
    return (F.length(t) - F.length(F.translate(t, PUNCT_CHARS, ""))) \
        .cast("double") / F.length(t)


def rolling_fingerprint(text: Column | str) -> Column:
    """Deterministic rolling polynomial hash mod 1e9+7 — incremental
    content fingerprint, engine-portable bit-for-bit (integer math only;
    the fold is sequential so any engine reproduces it exactly)."""
    t = F.col(text) if isinstance(text, str) else text
    chars = F.transform(F.sequence(F.lit(1), F.length(t)),
                        lambda i: F.ascii(F.substring(t, i, F.lit(1))))
    return F.aggregate(chars, F.lit(0).cast("bigint"),
                       lambda acc, c: (acc * 31 + c) % 1_000_000_007)
