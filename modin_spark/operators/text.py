"""Text-analysis operators for training-data pipelines (net-new vs the
reference): language ID, quality scoring, token counting, fingerprinting.

Everything is built-in Spark expressions — whole-stage codegen, no UDFs —
so these run at scan speed on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SDF
from pyspark.sql import functions as F

# tiny per-language stopword lists for n-gram-free heuristic language ID
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "una", "por", "con"],
}


def lang_id(text: Column) -> Column:
    """Heuristic language ID: stopword-occurrence counts per language, argmax.
    Returns 'und' when nothing matches.

    One compiled ``regexp_count`` pass per language (4 regex scans of the raw
    string) — an order of magnitude faster than the equivalent per-word
    higher-order array fold, which Catalyst interprets per element."""
    lower = F.lower(text)
    structs = []
    for lang, markers in _LANG_MARKERS.items():
        pat = r"\b(?:" + "|".join(markers) + r")\b"
        structs.append(F.struct(F.regexp_count(lower, F.lit(pat)).alias("s"), F.lit(lang).alias("l")))
    # struct-max: (score, lang) compared lexicographically. The (0, 'und')
    # sentinel wins exactly when every language scores 0 ('und' > any ISO
    # code), which keeps the whole thing ONE greatest() — a when(packed.s > 0)
    # wrapper would inline-duplicate all four regexp scans.
    structs.append(F.struct(F.lit(0).alias("s"), F.lit("und").alias("l")))
    return F.greatest(*structs)["l"]


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1] from cheap signals: length band,
    alpha ratio, stopword presence, punctuation-run penalty, mean word len."""
    n_chars = F.length(text)
    n_words = F.regexp_count(text, F.lit(r"\S+"))
    alpha_chars = F.regexp_count(text, F.lit(r"\p{L}"))
    alpha_ratio = alpha_chars / F.greatest(n_chars, F.lit(1))
    mean_word_len = n_chars / F.greatest(n_words, F.lit(1))
    punct_runs = F.regexp_count(text, F.lit(r"[!?.]{3,}"))
    en_pat = r"\b(?:" + "|".join(_LANG_MARKERS["en"]) + r")\b"
    has_stop = (F.regexp_count(F.lower(text), F.lit(en_pat)) > 0).cast("double")

    len_band = (
        F.when((n_words >= 10) & (n_words <= 10000), F.lit(1.0))
        .when(n_words >= 5, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    word_len_band = F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_pen = F.when(punct_runs > 0, F.lit(0.5)).otherwise(F.lit(1.0))
    raw = (0.3 * len_band + 0.25 * alpha_ratio + 0.2 * has_stop + 0.15 * word_len_band) * punct_pen + 0.1
    return F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token counting: 'whitespace' or 'bpe' (BPE-ish regex segmentation:
    letter-runs, digit-runs, punctuation singles — the GPT-2 pretokenizer
    shape, counted without a vocab)."""
    if mode == "whitespace":
        return F.regexp_count(text, F.lit(r"\S+"))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(text, F.lit(r"[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]"), 0))
    raise ValueError(mode)


def fingerprint(text: Column, bits: int = 64) -> Column:
    """Document fingerprint: order-sensitive 64-bit hash of the normalized
    word sequence — equal fingerprints <=> equal normalized content, for
    cheap exact-dup detection. One xxhash64 over the canonical space-joined
    form (whole-stage codegen; a per-word fold is ~10x slower interpreted)."""
    words = F.filter(F.split(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}\s]", " "), r"\s+"), lambda w: w != "")
    return F.xxhash64(F.concat_ws(" ", words))


# PII patterns — portable between Java regex (Spark) and RE2 (DuckDB oracle):
# no lookaround, no possessive quantifiers. Replacement order is part of the
# contract (phone before SSN would change SSN-shaped matches).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_scrub(df: SDF, text_col: str = "text", replacement: str = "[PII]") -> SDF:
    """Redact common PII shapes (emails, NANP phones, IPv4s, SSN-shaped ids)
    with chained ``regexp_replace`` — whole-stage codegen, scan speed at
    100 TB. Adds per-category pre-redaction ``{cat}_hits`` counts and the
    scrubbed text as ``{text_col}_scrubbed``."""
    t = F.col(text_col)
    out = df
    cleaned = t
    for cat, pat in PII_PATTERNS.items():
        out = out.withColumn(f"{cat}_hits", F.regexp_count(t, F.lit(pat)))
        cleaned = F.regexp_replace(cleaned, pat, replacement)
    return out.withColumn(f"{text_col}_scrubbed", cleaned)


def normalize_text(df: SDF, text_col: str = "text") -> SDF:
    """Corpus text normalization (the pre-tokenization cleanup every
    training pipeline runs): control-character strip (keeps \\n and \\t)
    and horizontal-whitespace collapse with trim. Pure codegen expressions
    (one regexp chain per row) — scan speed at 100 TB. Unicode NFC is NOT
    included: Spark has no JVM-side normalizer, and a per-row Python
    unicodedata pass would put the hot loop off the codegen path (declared
    scope cut — run it at ingest if the source needs it).
    Adds ``{text_col}_norm`` plus a ``changed`` flag for audit sampling."""
    t = F.col(text_col)
    norm = F.regexp_replace(t, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    norm = F.trim(F.regexp_replace(norm, r"[ \t]+", " "))
    out = df.withColumn(f"{text_col}_norm", norm)
    return out.withColumn("changed", (F.col(f"{text_col}_norm") != t).cast("int"))


def repetition_stats(df: SDF, text_col: str = "text") -> SDF:
    """Per-document repetition signals for corpus filtering: word count,
    unique-word ratio (low => boilerplate/spam), duplicate-line fraction.
    Pure array expressions — no UDF, no shuffle."""
    t = F.col(text_col)
    words = F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != "")
    n = F.size(words)
    uniq = F.size(F.array_distinct(words))
    lines = F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != F.lit(""))
    nl = F.size(lines)
    unl = F.size(F.array_distinct(lines))
    return df.withColumns(
        {
            "n_words": n,
            "unique_word_ratio": uniq / F.greatest(n, F.lit(1)),
            "dup_line_frac": (nl - unl) / F.greatest(nl, F.lit(1)),
        }
    )


def text_stats(df: SDF, text_col: str = "text") -> SDF:
    """All text metrics in one narrow pass."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "lang_pred": lang_id(t),
            "quality": quality_score(t),
            "n_tokens_ws": token_count(t, "whitespace"),
            "n_tokens_bpe": token_count(t, "bpe"),
            "fingerprint": fingerprint(t),
        }
    )
