"""Text analysis operators: quality stats, language ID, token counts,
document fingerprints (driver north star).

Everything is built-in-function Catalyst — at 100 TB these run inside
whole-stage codegen over the document scan with zero shuffles (they
are pure projections), which is exactly what a corpus-wide quality
filter pass needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators.dedup import normalize_text

# Word + single-punctuation tokens — a BPE-ish pre-tokenizer split.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword profiles for the n-gram/stopword language
# heuristic.  Deliberately small + hard-coded: the operator's job is
# the *mechanics* (vectorized per-language scoring + argmax), profiles
# are pluggable.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
}


def words(col: Column) -> Column:
    """Alphanumeric word list (regexp-extracted, case-folded)."""
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), 0)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality statistics + a composite quality score.

    All ratios are double divisions of deterministic ints — safe for
    exact cross-engine comparison.
    """
    t = F.col(text_col)
    w = words(t)
    n_chars = F.length(t)
    n_words = F.size(w)
    n_alnum = F.length(F.regexp_replace(t, "[^A-Za-z0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS["en"])))
    avg_word_len = F.when(n_words > 0, n_alnum.cast("double") / n_words).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0)
    # Heuristic quality score in [0,1]: wordy, low-punct, some stopwords.
    score = (
        F.when(avg_word_len >= 3, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-word and BPE-ish token counts per document.

    Empty / whitespace-only documents count 0 whitespace tokens —
    split('') returns [''] (size 1) in every engine, which would make
    empty-doc filters keyed on the count silently miss them.
    """
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    return df.select(
        F.col(id_col),
        n_ws.alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), 0)).alias("n_bpe_tokens"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID with deterministic argmax.

    Scores each language by stopword hits (with repeats) over the word
    list; ties break by language-code order; all-zero scores → 'und'.
    """
    w = words(F.col(text_col))
    langs = sorted(STOPWORDS)
    scores = {
        lang: F.size(F.filter(w, lambda x: x.isin(*STOPWORDS[lang]))) for lang in langs
    }
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply in reverse
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    out = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content-addressable document fingerprints.

    - ``md5_raw``: digest of the raw bytes (exact-dup key);
    - ``md5_norm``: digest of the normal form (near-exact-dup key).
    """
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.md5(t).alias("md5_raw"),
        F.md5(normalize_text(t)).alias("md5_norm"),
    )


def winnowing_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, window: int = 4,
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprint set per document
    (Schleimer et al., SIGMOD'03 — the standard local fingerprinting
    scheme for plagiarism/near-dup detection).

    Character k-gram hashes are the first 16 hex chars of md5(gram) —
    fixed-width lowercase hex, so lexicographic min == numeric min and
    the whole scheme is reproducible on any engine with md5 (the
    DuckDB oracle recomputes it verbatim; xxhash64 would be faster but
    engine-private).  Window-minimum selection via higher-order
    functions — no UDF.  Output is the distinct fingerprint multiset
    size + a stable digest of the sorted fingerprints (arrays are kept
    internal so downstream comparisons don't depend on array order).

    Staged projections (norm → grams → window-mins): lambdas run
    interpreted with no CSE, so the normalization / gram array must be
    bound column references inside the transforms, not inlined
    expressions — otherwise the regex normalization re-runs per gram
    and the gram array is rebuilt per window position (quadratic).

    The per-doc gram/min work is the most CPU-dense projection in the
    repo (~n_chars md5 calls + n_chars window mins per doc), so the
    input fans out first — a no-op at scale where scan splits exceed
    cores, a 1-task → all-cores fix on few-split local inputs (see
    sources.io.fan_out).
    """
    from flink_s3_read_write_spark.sources.io import fan_out

    normed = fan_out(df).select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("_norm")
    )
    n = F.length(F.col("_norm"))
    grammed = normed.select(
        F.col(id_col),
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.substring(F.md5(F.col("_norm").substr(i, F.lit(k))), 1, 16),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("_grams"),
    )
    g = F.col("_grams")
    mins = F.when(
        F.size(g) >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(g) - window),
                lambda i: F.array_min(F.slice(g, i + 1, window)),
            )
        ),
    ).otherwise(F.array_distinct(g))
    fingered = grammed.select(F.col(id_col), F.array_sort(mins).alias("_fp"))
    return fingered.select(
        F.col(id_col),
        F.size(F.col("_fp")).alias("n_fingerprints"),
        F.md5(F.concat_ws(",", F.col("_fp"))).alias("fingerprint_digest"),
    )


def hash_split(
    df: DataFrame, key: str, test_frac: float = 0.1, salt: str = "split-v1"
) -> DataFrame:
    """Deterministic train/test assignment by content hash — the
    scale-correct alternative to random splits: reproducible across
    runs/engines/cluster sizes, no RNG state, stable when the dataset
    grows (an id keeps its split forever), and join-free.

    Mechanics: first 8 hex chars of md5(salt || key) compared against
    the fraction threshold — fixed-width lowercase hex compares in
    numeric order, so the predicate is a plain string comparison any
    engine evaluates identically.
    """
    # Clamp to the 8-hex-digit domain: an unclamped frac=1.0 would
    # format to the 9-char '100000000', which every 8-char digest
    # compares GREATER than lexicographically — inverting the split.
    threshold = format(min(max(int(test_frac * (1 << 32)), 0), (1 << 32) - 1), "08x")
    digest8 = F.substring(F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 8)
    pred = digest8 < F.lit(threshold) if test_frac < 1.0 else F.lit(True)
    return df.withColumn(
        "split", F.when(pred, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Stratified sampling (``sampleBy``): per-stratum fractions for
    dataset balancing — downsampling over-represented languages/sources
    is a standard corpus-curation step.  Seeded → reproducible for a
    fixed partitioning; for split assignments that must survive
    arbitrary repartitioning use ``hash_split`` instead (documented
    trade-off: sampleBy is one pass with no hashing cost, hash_split
    is partitioning-independent).
    """
    return df.sampleBy(strata_col, fractions, seed)


# --- PII redaction -------------------------------------------------------

# Order matters: longer/more-specific patterns first so e.g. an email
# is not half-eaten by the phone pattern. All JVM-side regexp_replace
# (codegen'd, no UDF) — at 100 TB this is a zero-shuffle projection.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"(\+?\d{1,2}[\s.-]?)?(\(\d{3}\)|\d{3})[\s.-]?\d{3}[\s.-]?\d{4}\b"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Mask common PII shapes (emails, SSNs, phone numbers, IPv4) with
    ``[<KIND>]`` tokens and count the redactions per row.

    The standard pre-training scrub pass.  Counting uses the pre/post
    length delta of each stage divided by match length — avoided here
    in favor of ``regexp_count`` (exact, same scan).  Patterns are
    deliberately conservative (high precision); recall-heavy PII
    (names, addresses) needs NER models out of scope for an engine.
    """
    out = out_col or text_col
    cur = F.col(text_col)
    n_total = F.lit(0).cast("bigint")
    for kind, pat in PII_PATTERNS:
        n_total = n_total + F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, f"[{kind.upper()}]")
    # One withColumns call: both expressions must resolve against the
    # ORIGINAL frame — chained withColumn would bind n_total's column
    # references to the already-redacted text and count zero.
    return df.withColumns({out: cur, "n_redactions": n_total})


def skipgram_pairs(tok_array, window: int = 2):
    """Skip-gram (center, context, adj) pair array from a materialized
    token-array column — the word2vec/GloVe training-pair generator
    shared by batch q202 and the streaming co-occurrence job.

    Pure higher-order functions: per position i, contexts at i±1..±w
    inside bounds, empty tokens dropped, ``adj`` = 1 for |offset| = 1
    (the integer-exact stand-in for 1/distance weighting).  The
    caller explodes + counts; no self-join of exploded positions ever
    shuffles the corpus.  ``tok_array`` must be a bound column
    reference (HOF lambdas evaluate interpreted, no CSE).
    """
    n = F.size(tok_array)
    offs = F.array(
        *[F.lit(o) for o in range(-window, window + 1) if o != 0]
    )
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.filter(
                F.transform(
                    offs,
                    lambda o: F.struct(
                        F.element_at(tok_array, i).alias("center"),
                        F.when(
                            (i + o >= 1) & (i + o <= n),
                            F.element_at(tok_array, i + o),
                        ).alias("context"),
                        F.when(F.abs(o) == 1, F.lit(1))
                        .otherwise(F.lit(0))
                        .alias("adj"),
                    ),
                ),
                lambda s: s["context"].isNotNull()
                & (s["context"] != "")
                & (s["center"] != ""),
            ),
        )
    )
