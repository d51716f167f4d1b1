"""Text-analysis operators for a large-scale training-data pipeline
(documents table): token counting, quality scoring, language ID,
fingerprinting. All native Spark SQL expressions (JVM codegen) — no
Python in the hot path. The reference's nearest analog is its text
index layer (core/index/.../text/TextIndexStrategy.java — n-gram
keying for contains/begins-with search); everything beyond that is the
engine's training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny embedded stopword lists (public-knowledge function words)
STOP_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]
STOP_ES = ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"]
STOP_FR = ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"]
STOP_DE = ["der", "die", "das", "und", "ist", "von", "ein", "mit", "zu", "auf"]

LANGS = [("en", STOP_EN), ("es", STOP_ES), ("fr", STOP_FR), ("de", STOP_DE)]


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count (exact; matches the SQL oracle formula
    ``length(t) - length(replace(t,' ','')) + 1`` on single-spaced text)."""
    return df.withColumn("n_tokens", F.size(tokens_col(F.col(text_col))))


def _stop_hits(text_col: Column, words: list[str]) -> Column:
    toks = tokens_col(text_col)
    in_list = " OR ".join([f"x = '{w}'" for w in words])
    return F.size(F.filter(toks, lambda x: x.isin(words)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality features (exact → oracle-matchable): char count,
    token count, stopword hits, mean token length ×100 (int)."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        n_tok.alias("n_tokens"),
        _stop_hits(F.col(text_col), STOP_EN).alias("n_stop_en"),
        F.call_function(
            "div", (n_chars - n_tok + 1) * 100, F.greatest(n_tok, F.lit(1))
        ).alias("mean_tok_len_x100"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits, ties
    broken by list order (en > es > fr > de), 'und' when all zero."""
    hit_cols = [
        _stop_hits(F.col(text_col), words).alias(f"h_{code}") for code, words in LANGS
    ]
    tmp = df.select("doc_id", *hit_cols)
    best = F.greatest(*[F.col(f"h_{c}") for c, _ in LANGS])
    pred = F.when(best == 0, F.lit("und"))
    for code, _ in LANGS:
        pred = pred.when(F.col(f"h_{code}") == best, F.lit(code))
    return tmp.select("doc_id", pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint (md5 — portable across Spark
    and the DuckDB oracle) + a normalized variant (lowercase, collapsed
    whitespace) for normalization-level dedup."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return df.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fp"),
        F.md5(norm).alias("fp_norm"),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals for web-scale corpus filtering
    (the duplicate-token and top-n-gram coverage filters of published
    LLM data pipelines, e.g. Rae et al. 2021 §A1.1): per document,

    - ``n_tokens`` / ``n_distinct_tokens`` — the duplicate-token
      fraction's exact integer numerator/denominator (per-row native
      array ops, zero shuffle);
    - ``top_bigram_n`` — occurrences of the document's most frequent
      bigram (explode → two map-side-combined groupBys keyed by doc_id;
      no driver state, scales with the corpus).

    All-integer output so the DuckDB oracle hash-matches exactly. The
    bigram array is built from a BOUND column reference (``_w``) — an
    inline split() expression inside the transform lambda would
    re-evaluate per element (O(n²) chars per row).
    """
    base = (
        df.select("doc_id", F.split(F.col(text_col), " ").alias("_w"))
        .select(
            "doc_id",
            "_w",
            F.size("_w").alias("n_tokens"),
            F.size(F.array_distinct("_w")).alias("n_distinct_tokens"),
        )
    )
    bigrams = F.transform(
        F.slice(F.col("_w"), 1, F.size("_w") - 1),
        lambda w, i: F.concat_ws(" ", w, F.element_at(F.col("_w"), i + F.lit(2))),
    )
    bg = base.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        F.explode_outer(bigrams).alias("_bg"),
    )
    counts = bg.groupBy("doc_id", "n_tokens", "n_distinct_tokens", "_bg").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return counts.groupBy("doc_id", "n_tokens", "n_distinct_tokens").agg(
        F.max(
            F.when(F.col("_bg").isNotNull(), F.col("_c")).otherwise(F.lit(0))
        ).alias("top_bigram_n")
    )


# --------------------------------------------------------- PII scanning

# Patterns chosen for identical semantics in Java regex (Spark) and
# the planted fixture's analytic truth: no lookaround, no bounded
# repetition ambiguity, anchored by non-word context.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (email / phone / IPv4) — the scrub
    gate a training pipeline applies before text leaves the corpus.
    All-native ``regexp_count`` per pattern: one codegen projection,
    no shuffle, no Python. Returns doc_id + n_<kind> counts +
    ``has_pii``."""
    cols = [F.col("doc_id")]
    total = F.lit(0)
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        cols.append(c.alias(f"n_{kind}"))
        total = total + c
    return df.select(*cols, (total > 0).alias("has_pii"))


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with a typed placeholder token
    (``<EMAIL>``/``<PHONE>``/``<IPV4>``) — chained native
    ``regexp_replace``, still one codegen projection. Order matters:
    emails first so their host parts cannot be re-matched as bare
    patterns by later rules."""
    out = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return df.withColumn(text_col, out)


def chunk_tokens(
    df: DataFrame,
    window: int = 40,
    stride: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-window document chunking: split every document into
    overlapping fixed-size training windows (``window`` tokens,
    advancing ``stride`` — overlap = window - stride), the standard
    pre-tokenization chunking step of an LLM data pipeline. Returns
    one row per (doc, chunk): ``chunk_id``, ``tok_start``,
    ``tok_len``; the final chunk may run short so coverage is exact
    (the last chunk always ends at n_tokens).

    Scale shape: a single narrow codegen projection + ``explode`` of a
    per-row ``sequence`` — no shuffle, no Python, linear in output
    chunks; Catalyst pushes any downstream chunk filter into the
    generate. Chunk COUNT is closed-form (ceil((n-W)/S)+1), so the
    explode never materializes token arrays — only chunk offsets.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError(f"need 0 < stride <= window, got {window=} {stride=}")
    n = F.size(tokens_col(F.col(text_col)))
    base = df.select(F.col(id_col), n.alias("_n"))
    n_chunks = F.when(F.col("_n") <= window, F.lit(1)).otherwise(
        F.floor((F.col("_n") - window + stride - 1) / stride).cast("int") + 1
    )
    out = base.withColumn("_nc", n_chunks).select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        "_n",
    )
    tok_start = F.col("chunk_id") * stride
    return out.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        tok_start.cast("int").alias("tok_start"),
        F.least(F.lit(window), F.col("_n") - tok_start).cast("int").alias("tok_len"),
    )


def chunk_tokens_sql(
    table: str, window: int = 40, stride: int = 30, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of ``chunk_tokens`` (same whitespace tokenization as
    the doc_tokens oracle, same integer chunk arithmetic)."""
    return (
        f"WITH d AS (SELECT {id_col}, len(string_split(text,' ')) AS n FROM {table}), "
        f"c AS (SELECT {id_col}, n, CASE WHEN n <= {window} THEN 1 "
        f"ELSE (n - {window} + {stride - 1}) // {stride} + 1 END AS nc FROM d), "
        f"e AS (SELECT {id_col}, n, unnest(generate_series(0, nc-1)) AS gs FROM c) "
        f"SELECT {id_col}, CAST(gs AS INT) AS chunk_id, "
        f"CAST(gs*{stride} AS INT) AS tok_start, "
        f"CAST(LEAST({window}, n - gs*{stride}) AS INT) AS tok_len FROM e"
    )


# BPE-style pre-tokenizer split (public GPT-2-family construction,
# simplified to the RE2∩Java-regex common subset: no lookahead, so
# runs of whitespace between words count as one token instead of
# attaching to the following word — a documented, deterministic
# deviation that keeps Spark (Java regex) and DuckDB (RE2) counting
# identically). Contractions split off; letters/digits/punctuation
# runs each form a token with an optional leading space.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count under the BPE-ish pre-tokenizer regex — the
    pre-tokenization granularity an LLM pipeline budgets by (training
    cost, packing capacity), vs the coarser whitespace count. One
    native ``regexp_count`` — codegen projection, no shuffle, no
    Python, no token materialization."""
    return df.withColumn(
        "n_tokens_bpe", F.regexp_count(F.col(text_col), F.lit(BPE_SPLIT_PATTERN))
    )


def quality_filter(
    df: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_tok_len_x100: int = 250,
    max_mean_tok_len_x100: int = 1200,
    min_stop_ratio_x1000: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Composite rule-based quality gate (the C4/Gopher-style document
    filter): classify every document with the FIRST failing rule —

    - ``too_short`` / ``too_long`` — whitespace token count bounds;
    - ``bad_tok_len`` — mean token length ×100 outside
      [min, max] (gibberish / no-space blobs / char soup);
    - ``low_stopword`` — English stopword hits below
      ``min_stop_ratio_x1000``/1000 of tokens (non-linguistic text);
    - ``ok``.

    Every feature is the exact integer from quality_features, and the
    ratio rules cross-multiply instead of dividing, so the verdict is
    integer-exact and oracle-reproducible. One codegen projection over
    the feature columns — no shuffle; downstream ``WHERE ok`` is a
    narrow pushable predicate (at 100 TB this gate rides the same
    ingest pass as pii_scan/validate_images)."""
    feats = quality_features(df, text_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(
            (F.col("mean_tok_len_x100") < min_mean_tok_len_x100)
            | (F.col("mean_tok_len_x100") > max_mean_tok_len_x100),
            F.lit("bad_tok_len"),
        )
        .when(
            F.col("n_stop_en") * 1000 < min_stop_ratio_x1000 * F.col("n_tokens"),
            F.lit("low_stopword"),
        )
        .otherwise(F.lit("ok"))
    )
    return feats.select(
        "doc_id", reason.alias("reason"), (reason == "ok").alias("ok")
    )
