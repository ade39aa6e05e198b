"""Text analysis operators: language ID, quality scoring, token counting,
fingerprinting. All built-in Spark expressions — no Python in the row path.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Small, fixed marker-word lists per language (n-gram/stopword heuristic).
LANG_MARKERS: Dict[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los", "una"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "une", "est"),
    "it": ("il", "la", "di", "che", "e", "per", "una"),
}


def _tokens(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(
        id_col,
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def bpe_ish_token_count(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sub-word-ish token estimate: splits on whitespace AND punctuation
    boundaries and counts ~4-char chunks of long words (a cheap, vocabulary-
    free proxy for BPE token counts)."""
    pieces = F.split(
        F.regexp_replace(F.col(text_col), r"([^\w\s])", r" $1 "), r"\s+"
    )
    est = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.when(F.length(w) == 0, 0).otherwise(
            F.floor((F.length(w) + 3) / 4).cast("long")
        ),
    )
    return df.select(id_col, est.alias("est_bpe_tokens"))


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    n_distinct = F.size(F.array_distinct(toks))
    avg_token_len = F.length(F.regexp_replace(text_col, " ", "")).cast("double") / n_tokens
    stopword_ratio = n_stop.cast("double") / n_tokens
    distinct_ratio = n_distinct.cast("double") / n_tokens
    # composite: reasonable length + healthy stopword rate + lexical variety
    score = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.least(stopword_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + distinct_ratio * 0.4
    )
    return df.select(
        id_col,
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        avg_token_len.alias("avg_token_len"),
        stopword_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality_score"),
    )


#: Hashed-feature space + weight constants for the linear quality
#: classifier: fixed so scores are reproducible across engines.
CLASSIFIER_BUCKETS = 1024
_W_MULT = 2654435761  # Knuth multiplicative constant
_W_MOD = 1000003  # prime; weights are k/_W_MOD - 0.5 in [-0.5, 0.5)


def quality_classifier_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = CLASSIFIER_BUCKETS,
    bias: float = 0.0,
    threshold: float = 0.5,
    weights: "Dict[int, float] | None" = None,
) -> DataFrame:
    """Learned-classifier quality gate (the fastText/DCLM pattern): a
    linear model over hashed token uni+bigram features, completing the
    standard curation trio — rules (:func:`gopher_quality_filter`),
    corpus LM (:func:`char_lm_score`), classifier (this).

    score = sigmoid(bias + mean(w[h(feature) mod B])) over the document's
    token unigrams and bigrams; ``keep`` is ``score >= threshold``. The
    weight table is what training would produce; here the default is a
    deterministic pseudo-trained table w[b] = (b*K mod M)/M - 0.5 (K, M
    fixed primes), so results are reproducible and engine-portable — pass
    ``weights`` (bucket -> weight) to use a real trained table.

    Scale (100 TB): pure column expressions — tokenize, hash, fold — with
    ZERO shuffles and no Python in the row path; the weight table is
    either an inline arithmetic expression (default) or a ~KB map literal
    (custom ``weights``), never a join. With the default table the fold
    accumulates exact 64-bit integers (one float division at the end), so
    scores are bit-reproducible regardless of partitioning or order.
    """
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "), " "),
        lambda t: t != F.lit(""),
    )
    d = df.select(F.col(id_col), toks.alias("_t"))
    bigrams = F.when(
        F.size("_t") >= 2,
        F.zip_with(
            F.slice("_t", 1, F.size("_t") - 1),
            F.slice("_t", 2, F.size("_t") - 1),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(F.col("_t"), bigrams)

    def bucket(t):
        # portable 60-bit hash (md5 hex -> int), same idiom as simhash_md5
        h = F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        return F.pmod(h, F.lit(n_buckets))

    n = F.size(feats)
    if weights is None:
        # integer fold: sum of (bucket*K mod M) is exact in 64-bit
        acc = F.aggregate(
            feats,
            F.lit(0).cast("long"),
            lambda a, t: a + F.pmod(bucket(t) * F.lit(_W_MULT), F.lit(_W_MOD)),
        )
        mean_w = acc.cast("double") / (n.cast("double") * F.lit(float(_W_MOD))) - F.lit(0.5)
    else:
        wmap = F.create_map(
            *[x for b, w in sorted(weights.items()) for x in (F.lit(int(b)), F.lit(float(w)))]
        )
        acc = F.aggregate(
            feats,
            F.lit(0.0),
            lambda a, t: a + F.coalesce(F.element_at(wmap, bucket(t)), F.lit(0.0)),
        )
        mean_w = acc / n.cast("double")
    logit = F.lit(float(bias)) + F.when(n > 0, mean_w).otherwise(F.lit(0.0))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return d.select(
        id_col,
        n.cast("long").alias("n_features"),
        F.round(score, 6).alias("quality_score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


#: Stopwords whose presence Gopher requires (>= 2 distinct) — the
#: "contains common English words" repetition-free sanity rule.
GOPHER_REQUIRED_STOPWORDS: Sequence[str] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """Gopher/C4-style rule filter (Rae et al. 2021 §A1.1, Raffel et al.
    2020 C4): the standard pre-training document gate, as pure column
    expressions — per-document rule measurements plus the composite
    ``keep`` verdict, so a pipeline can audit WHICH rule rejected a
    document, not just that one did.

    Rules (all exactly SQL-reproducible, no approximations):
    word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; hash/ellipsis symbol-to-word
    ratio <= max_symbol_ratio; bullet-started line fraction <=
    max_bullet_line_frac; ellipsis-ended line fraction <=
    max_ellipsis_line_frac; fraction of words containing an alphabetic
    character >= min_alpha_word_frac; >= min_required_stopwords distinct
    required stopwords present.

    Scale: zero shuffles, zero Python — one whole-stage-codegen projection
    over the corpus; every measurement shares the single tokenization."""
    toks = _tokens(text_col)
    n_words = F.size(toks)
    # lines split on the raw (untrimmed/unlowered... lowered is fine for
    # bullet/ellipsis shape checks) text: use trimmed original case text
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    mean_word_len = (
        F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
        .cast("double")
        / n_words
    )
    n_symbols = F.regexp_count(F.col(text_col), F.lit("#")) + F.regexp_count(
        F.col(text_col), F.lit(r"\.\.\.")
    )
    symbol_ratio = n_symbols.cast("double") / n_words
    n_bullet = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^\s*[-*•]"))
    )
    bullet_frac = n_bullet.cast("double") / n_lines
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))
    )
    ellipsis_frac = n_ellipsis.cast("double") / n_lines
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    alpha_frac = n_alpha.cast("double") / n_words
    stop = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])
    n_req_stop = F.size(
        F.filter(F.array_distinct(toks), lambda w: F.array_contains(stop, w))
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_line_frac)
        & (ellipsis_frac <= max_ellipsis_line_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (n_req_stop >= min_required_stopwords)
    )
    return df.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_req_stop.cast("long").alias("n_required_stopwords"),
        keep.alias("keep"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: per language, count marker-word hits in
    the token array; pick the argmax (ties broken by language code order,
    'unknown' when no marker hits)."""
    toks = _tokens(text_col)
    langs = sorted(LANG_MARKERS)

    def marker_count(markers):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    counts = {lang: marker_count(LANG_MARKERS[lang]) for lang in langs}
    best = F.greatest(*[counts[lang] for lang in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):  # earlier languages win ties
        pred = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(pred)
    out = df.select(
        id_col,
        *[counts[lang].cast("long").alias(f"votes_{lang}") for lang in langs],
        pred.alias("lang_pred"),
    )
    return out


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition ratios — the Gopher-style quality rules
    that catch templated/spammy text: fraction of duplicate words and
    duplicate word-bigrams per document.

    (id, n_words, dup_word_frac, dup_bigram_frac); documents with fewer
    than 2 tokens are dropped (no bigram is defined).  Pure column
    expressions over one projected token array — zero shuffles, zero
    Python; the token array is projected as a real column so Catalyst
    evaluates the split once, not once per derived expression."""
    base = df.select(F.col(id_col), _tokens(text_col).alias("t"))
    n = F.size("t")
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.try_element_at("t", i), F.try_element_at("t", i + 1)),
    )
    return (
        base.filter(n >= 2)
        .select(
            id_col,
            n.cast("long").alias("n_words"),
            (F.lit(1.0) - F.size(F.array_distinct("t")).cast("double") / n).alias(
                "dup_word_frac"
            ),
            (
                F.lit(1.0)
                - F.size(F.array_distinct(bigrams)).cast("double") / (n - 1)
            ).alias("dup_bigram_frac"),
        )
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized md5 fingerprint + a 64-bit rolling-style content hash."""
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(
        id_col,
        F.md5(normalized).alias("fingerprint"),
        F.xxhash64(normalized).alias("content_hash64"),
    )


# Engine-portable PII patterns: RE2-compatible (no lookaround/backrefs) so
# the same pattern strings run in Spark (Java regex) and DuckDB/Trino (RE2)
# byte-for-byte — the catalog oracle relies on this. Order matters: longer/
# more specific patterns first so e.g. an email is not half-eaten by the
# phone pattern.
PII_PATTERNS: "Dict[str, str]" = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # word boundary only on the bare-digit alternative: \b cannot assert
    # before "(" (no word char on either side), which would silently skip
    # every "(ddd) ddd-dddd" form
    "phone": r"(?:\+[0-9]{1,2}[ .-]?)?(?:\([0-9]{3}\)|\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\b",
}


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: "Dict[str, str]" = None,
) -> DataFrame:
    """Redact PII spans in place and count them per kind: every production
    training-data pipeline scrubs emails/phones/IPs/SSNs before the corpus
    ships. Returns (id, redacted text, n_<kind> counts, n_pii_total).

    Each span is replaced by an angle-bracket placeholder (``<EMAIL>`` ...)
    so downstream tokenization sees one stable token instead of the raw
    value. Counts are taken BEFORE redaction of the same kind but AFTER
    redaction of earlier kinds, mirroring the sequential rewrite.

    Scale: a chain of ``regexp_count``/``regexp_replace`` column
    expressions — zero shuffles, whole-stage codegen, runs at scan speed;
    the regex set is fixed per query so the JVM compiles each pattern once
    per task."""
    patterns = patterns or PII_PATTERNS
    out_cols = [F.col(id_col)]
    text = F.col(text_col)
    total = F.lit(0).cast("long")
    count_cols = []
    for kind, pat in patterns.items():
        n = F.regexp_count(text, F.lit(pat)).cast("long")
        count_cols.append(n.alias(f"n_{kind}"))
        total = total + n
        text = F.regexp_replace(text, pat, f"<{kind.upper()}>")
    return df.select(
        *out_cols,
        text.alias(text_col),
        *count_cols,
        total.alias("n_pii_total"),
    )


def url_domains(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Extract every http(s) URL's registrable host per document:
    (id, domain) one row per URL occurrence. Domain-level statistics drive
    source weighting and blocklist filtering in corpus curation.

    Scale: regexp_extract_all projects an array per doc, one explode —
    no shuffle; the downstream domain histogram is a map-side-combined
    groupBy on a low-cardinality key."""
    # RE2-safe: capture the host of an http(s) URL
    url_host = r"https?://([A-Za-z0-9.-]+)"
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(url_host), F.lit(1))
            ).alias("domain"),
        )
        .withColumn("domain", F.lower(F.col("domain")))
    )


def domain_histogram(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-domain URL mention counts over the corpus:
    (domain, n_mentions, n_docs). The curation signal behind
    blocklists and per-source mixing weights."""
    doms = url_domains(df, id_col, text_col)
    return doms.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Append a canonical form of a URL column — the key for URL-level
    dedup and per-page frequency counting in web-corpus curation, where
    the same page arrives as ``HTTP://Host.COM:80/p/?utm_source=x#top``
    and ``http://host.com/p``.

    Canonicalization rules (pure chained regexp — RE2-safe, no
    lookaround, so Spark (Java regex) and the DuckDB oracle agree):
    lowercase scheme+host, drop default ports (:80 http / :443 https),
    drop the fragment, strip tracking parameters (utm_*, fbclid, gclid)
    with separator repair, collapse the path-final slash before a query
    string, strip trailing slashes. A value with no ``scheme://host``
    prefix is passed through unchanged.

    Scale: zero shuffles, one whole-stage-codegen projection."""
    prefix_pat = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    url = F.col(url_col)
    prefix = F.lower(F.regexp_extract(url, prefix_pat, 0))
    prefix = F.regexp_replace(prefix, r"^(http://[^/:]*):80$", "$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/:]*):443$", "$1")
    rest = F.regexp_replace(url, prefix_pat, "")
    rest = F.regexp_replace(rest, r"#.*", "")
    rest = F.regexp_replace(
        rest, r"(utm_[a-zA-Z0-9_]+|fbclid|gclid)=[^&#]*", ""
    )
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+\?", "?")
    rest = F.regexp_replace(rest, r"/+$", "")
    canonical = F.when(
        F.regexp_extract(url, prefix_pat, 0) == "", url
    ).otherwise(F.concat(prefix, rest))
    return df.withColumn(out_col, canonical)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
) -> DataFrame:
    """Split documents into fixed-size sliding token windows with overlap —
    the standard pre-pass for embedding/RAG indexing and long-context
    training-example construction. Returns one row per chunk:
    (id, chunk_id, chunk text, n_tokens), chunk_id 0-based; the final
    chunk may be shorter; a document always yields >= 1 chunk.

    Tokens are whitespace-split (case preserved — chunking must not alter
    content). Chunk starts step by ``chunk_tokens - overlap_tokens``.

    Scale: the whole expansion is a per-row column expression (token
    array -> sequence of starts -> slice per start) followed by ONE
    posexplode — no shuffle, no Python; output rows carry only their own
    chunk's text, so the blow-up factor is bounded by
    1/(1 - overlap/chunk) times the corpus token count."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # ceil((n - overlap) / stride) chunks, minimum 1 — derived from the
    # same `toks` Column as the slices (a re-spelled SQL string here could
    # drift from the tokenizer and breaks for column names needing
    # backticks); integer-exact after the >=1 clamp, so the oracle can
    # reproduce it
    n_chunks = F.greatest(
        F.floor((n - F.lit(overlap_tokens) + F.lit(stride - 1)) / F.lit(stride))
        .cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_id", "_chunk"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join("_chunk", " ").alias(text_col),
            F.size("_chunk").cast("long").alias("n_tokens"),
        )
    )


def char_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 4000,
) -> DataFrame:
    """Perplexity-proxy quality scoring against a character-bigram language
    model trained on the corpus itself (the CCNet/KenLM filtering pattern:
    score each document by how typical it is of the corpus, then gate or
    bucket on the score). Returns (id, n_bigrams, bits_per_char), where
    ``bits_per_char`` is the add-one-smoothed cross-entropy of the
    document's character transitions under the corpus model — low = fluent
    / typical, high = gibberish, wrong-language, or boilerplate-encoded
    outliers. Deterministic: no training randomness, fixed smoothing.

    Model: P(c2|c1) = (count(c1c2) + 1) / (count(c1·) + V), with V the
    number of distinct successor characters corpus-wide; scores are mean
    negative log2-probability over the document's (capped) bigrams.

    Scale (100 TB): the only wide stage is the char-bigram explode, which
    collapses immediately into per-doc bigram TYPE counts via a map-side
    combined groupBy — the shuffle carries (id, bigram, count), bounded by
    per-doc distinct bigrams, not corpus characters. That intermediate is
    cached and reused by both consumers (model estimation and scoring), so
    the explode runs once. The model itself is at most |charset|^2 rows —
    kilobytes even for full Unicode text — and is broadcast to the scoring
    join; the per-doc cap (``max_chars``) bounds row width regardless of
    document length.
    """
    import math

    t = F.lower(F.substring(F.col(text_col), 1, max_chars))
    # The bigram build amplifies each row ~|chars|-fold; callers feeding a
    # narrow raw scan should pre-spread it (operators/partitioning.
    # spread_input) at the scan, where the partition introspection is cheap.
    docs = df.select(F.col(id_col), t.alias("_t")).filter(F.length("_t") >= 2)
    bigrams = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("_t") - 1),
                lambda i: F.col("_t").substr(i, F.lit(2)),
            )
        ).alias("bg"),
    )
    doc_bg = bigrams.groupBy(id_col, "bg").agg(F.count("*").alias("cnt")).cache()
    model_bg = doc_bg.groupBy("bg").agg(F.sum("cnt").alias("c_bg"))
    prefix = model_bg.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("c_bg").alias("c_prefix")
    )
    vocab = model_bg.agg(
        F.countDistinct(F.substring("bg", 2, 1)).alias("v")
    )
    model = (
        model_bg.withColumn("c1", F.substring("bg", 1, 1))
        .join(prefix, "c1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.log(
                (F.col("c_bg") + F.lit(1.0)) / (F.col("c_prefix") + F.col("v"))
            ).alias("logp"),
        )
    )
    return (
        doc_bg.join(F.broadcast(model), "bg")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("cnt") * F.col("logp"))
                / F.sum("cnt")
                / F.lit(math.log(2.0)),
                4,
            ).alias("bits_per_char"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed bag of query
    terms: (id, bm25). Only documents containing at least one query term
    appear (everything else scores 0 and is omitted — at corpus scale the
    zero rows are the whole corpus). The standard lexical ranking function
    for retrieval-style corpus curation: pull documents "about" a topic,
    or build a relevance-ordered candidate pool for a downstream judge.

    score(d) = sum over query terms t of
        ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
        * tf_td * (k1+1) / (tf_td + k1 * (1 - b + b * |d|/avgdl))

    Scale (100 TB): one tokenize+explode pass feeds both the per-doc
    length aggregate and the query-term frequencies; both collapse
    map-side on (id[, token]). The per-term document frequencies and the
    corpus (N, avgdl) scalars are <= |query| rows — broadcast, never
    shuffled against the corpus. The scoring join keys on the doc id; no
    shuffle carries text. Reference parity: the reference has no ranking
    function — this extends the engine for retrieval-based curation.
    """
    toks = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = sorted({t.lower() for t in query_terms})
    tf = (
        toks.where(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 4).alias("bm25"))
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    prefix_chars: int = 1000,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-char gram, then keep the minimum hash of
    each sliding window of ``w`` consecutive grams. Guarantees any
    substring of length >= k + w - 1 shared between two documents
    contributes at least one shared fingerprint, while storing ~2/(w+1) of
    the gram hashes. Returns per-doc audit rows
    (id, n_grams, n_fingerprints, min_fingerprint) — the selected set's
    size and an exemplar, the shape a fingerprint-index builder verifies
    before persisting the (fingerprint -> doc) inverted index.

    Hashes are the first 15 hex chars of md5 as a 60-bit integer —
    portable across engines (reproducible oracle) and 4x lighter on the
    shuffle than the hex string.

    Scale (100 TB): the gram explode amplifies ~prefix_chars-fold, but
    only (id, pos, 8-byte hash) rows ever shuffle — once, on the doc id,
    for the per-doc ordered window; the follow-up per-doc aggregate reuses
    that partitioning (no second exchange). ``prefix_chars`` bounds the
    amplification per document regardless of raw length. Callers feeding
    a narrow raw scan should spread it first (operators/partitioning.
    spread_input).
    """
    from pyspark.sql import Window

    s = F.substring(F.lower(F.col(text_col)), 1, prefix_chars)
    docs = df.select(F.col(id_col), s.alias("_s")).where(
        F.length("_s") >= k + w - 1
    )
    grams = docs.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), F.length("_s") - (k - 1))).alias("i"),
        (F.length("_s") - (k - 1)).cast("long").alias("n_grams"),
        F.col("_s"),
    ).select(
        id_col,
        "i",
        "n_grams",
        F.conv(
            F.substring(F.md5(F.col("_s").substr(F.col("i"), F.lit(k))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    win = Window.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    fps = grams.withColumn("fp", F.min("h").over(win)).where(
        F.col("i") <= F.col("n_grams") - (w - 1)
    )
    return fps.groupBy(id_col).agg(
        F.max("n_grams").alias("n_grams"),
        F.countDistinct("fp").cast("long").alias("n_fingerprints"),
        F.min("fp").alias("min_fingerprint"),
    )


def readability_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document from three regex counts — words
    (\\S+ runs), sentences ([.!?]+ runs, floored at 1), and syllables
    (vowel-group runs [aeiouy]+ in the lowercased text, the standard
    cheap approximation, floored at the word count so no word counts
    zero). FRE = 206.835 - 1.015 * words/sentence - 84.6 * syllables/word.

    The readability axis of the curation gate family (quality_score /
    gopher_quality_filter / char_lm_score): a grade-level-ish signal for
    curriculum ordering and audience filters. Pure column expressions —
    three regexp_extract_all counts inside one codegen'd projection, zero
    shuffles, and the regexes have identical semantics in DuckDB, so the
    score is oracle-exact."""
    t = F.col(text_col)
    words = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), F.lit(0)))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    syllables = F.greatest(
        F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[aeiouy]+"), F.lit(0))),
        words,
    )
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * words / sentences
        - F.lit(84.6) * syllables / words
    )
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        F.when(words > 0, fre).otherwise(F.lit(None).cast("double")).alias(
            "flesch_reading_ease"
        ),
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-coverage audit: build the corpus's top-``vocab_size``
    token vocabulary (by document frequency, token text as the
    deterministic tiebreak) and score every document's out-of-vocabulary
    token share — the proxy for "how much of this document will a fixed
    tokenizer shatter into bytes". High OOV flags boilerplate-free noise,
    wrong-language leakage, and encoding damage; the per-source OOV
    profile is a standard pre-training corpus report.

    Returns (id, n_tokens, n_oov, oov_rate) counting token OCCURRENCES
    (not distinct types); tokens are lowercased [a-z0-9]+ runs so both
    engines tokenize identically. Empty/tokenless documents report
    0 tokens and NULL rate.

    Scale (100 TB): document frequency aggregates map-side over (token,
    doc) pairs; the top-k vocabulary is a TakeOrderedAndProject (never a
    global sort) whose k rows broadcast into the scoring join — the
    corpus-side explode joins a KB-scale build side, then re-aggregates
    per document on the id it is already exploded from. No shuffle
    carries text except the (token, id) pairs themselves."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
    )
    exploded = df.select(
        F.col(id_col), F.explode_outer(toks).alias("token")
    )
    docfreq = (
        exploded.where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.countDistinct(id_col).alias("df"))
    )
    vocab = docfreq.orderBy(F.desc("df"), F.col("token")).limit(vocab_size)
    scored = exploded.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("_in_vocab"))),
        "token",
        "left",
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.col("token")).cast("long").alias("n_tokens"),
        F.sum(
            (F.col("token").isNotNull() & F.col("_in_vocab").isNull()).cast("long")
        )
        .cast("long")
        .alias("n_oov"),
    )
    rate = F.when(
        F.col("n_tokens") > 0,
        F.round(F.col("n_oov") / F.col("n_tokens"), 6),
    )
    return agg.select(id_col, "n_tokens", "n_oov", rate.alias("oov_rate"))


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    information-density score that separates natural prose (high
    entropy, many distinct tokens at moderate frequency) from
    keyword-stuffed / template / repeated-boilerplate text (low entropy)
    in a pre-training quality gate. Complements repetition_stats: that
    catches verbatim runs, entropy catches skewed-but-shuffled token
    mixes.

    H = log2(N) - (sum_t c_t*log2(c_t)) / N over token counts c_t, plus
    the type count and type/token ratio. Tokens are lowercased
    [a-z0-9]+ runs (the oov_rate tokenizer). Returns (id, n_tokens,
    n_types, entropy, norm_entropy) where norm_entropy = H / log2(types)
    in [0, 1] (NULL for <=1 type).

    Scale (100 TB): explode -> (id, token) count -> per-id fold. Both
    aggregations combine map-side and are keyed by (id, token) then id,
    so partials stay distributed with the documents; no window, no join,
    no driver state. The explode multiplies rows by tokens/doc — run it
    on the spread input like the other shingling consumers.
    """
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
    )
    counts = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = counts.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).alias("_s"),
    )
    h = F.log2(F.col("n_tokens").cast("double")) - F.col("_s") / F.col("n_tokens")
    return agg.select(
        F.col(id_col),
        "n_tokens",
        "n_types",
        F.round(h, 6).alias("entropy"),
        F.when(
            F.col("n_types") > 1, F.round(h / F.log2(F.col("n_types").cast("double")), 6)
        ).alias("norm_entropy"),
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """The distributed core of BPE vocabulary training: the
    frequency-ranked adjacent-character-pair candidates for the FIRST
    merge, weighted by word frequency. Iterating (apply merge ->
    recount) is tokenizer training; this operator is one round's count
    step, the part that must scale to the corpus.

    Returns (pair, weight): top-``top_n`` two-char pairs by total
    occurrence count across all word instances (pair text as the
    deterministic tiebreak).

    Scale (100 TB): the Zipf trick — the corpus collapses to the
    DISTINCT-WORD vocabulary with counts first (the only stage that
    sees corpus volume, one map-side-combined aggregation); pair
    explosion then runs over the VOCABULARY (millions of rows, not
    trillions) with each pair weighted by its word's count. Top-N is a
    TakeOrderedAndProject, never a global sort.
    """
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
    )
    vocab = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.length("w") >= 2)
    )
    pairs = vocab.select(
        "c",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("pair"))
        .limit(top_n)
    )


def zipf_slope(
    df: DataFrame, text_col: str = "text", top_k: int = 500
) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS of
    ln(frequency) on ln(rank) over the top-``top_k`` tokens. Natural
    corpora sit near slope -1; a flat slope flags synthetic /
    template-heavy text, a cliff flags boilerplate domination — a
    one-row corpus-health metric next to token_entropy's per-document
    one.

    Returns (n_tokens_fit, slope, intercept, r2) rounded to 6.

    Scale: token counts aggregate map-side (the only corpus-volume
    stage); top-k is a TakeOrderedAndProject; the rank window and OLS
    run over the K-row table (bounded by the parameter, not the
    corpus)."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
    )
    freq = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("c"), F.asc("token"))
    xy = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    t = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens_fit"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_tokens_fit").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    # try_divide: a degenerate corpus (all counts equal) has zero y
    # variance — report NULL r2 instead of an ANSI divide-by-zero
    return t.select(
        "n_tokens_fit",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
        F.round(F.try_divide(cov * cov, varx * vary), 6).alias("r2"),
    )


def posting_lists(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_postings: int = 1000,
) -> DataFrame:
    """Inverted-index construction: per token, its document frequency
    and the sorted posting list of document ids — the build step behind
    BM25 retrieval (bm25_scores consumes exactly this shape) and
    decontamination lookups.

    Per-document tokens deduplicate INSIDE the row (array_distinct —
    no shuffle) before the single token-keyed aggregation; ``min_df``
    prunes hapax noise and ``max_postings`` caps each list at the
    ``max_postings`` SMALLEST doc ids (deterministic truncation), so a
    stopword's posting list cannot blow past executor memory — at real
    index scale stopwords are exactly the keys that would otherwise
    hold gigabyte lists in one reducer.

    Scale: the explode carries distinct (token, doc) pairs only; the
    aggregation combines map-side. Posting lists shard naturally by
    token — the layout a distributed index wants.
    """
    toks = F.array_distinct(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )
    pairs = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.explode(toks).alias("token"), F.col(id_col).alias("_id"))
        .where(F.col("token") != "")
    )
    return (
        pairs.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
            F.slice(
                F.sort_array(F.collect_list("_id")), 1, max_postings
            ).alias("postings"),
        )
        .where(F.col("doc_freq") >= min_df)
    )


def token_burstiness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
) -> DataFrame:
    """Token burstiness (Fano factor of within-document frequency):
    for each token appearing in >= min_df documents, the variance-to-
    mean ratio of its per-document count ACROSS the documents that
    contain it. Function words repeat steadily (factor near its
    Poisson baseline); topical words burst (one doc mentions them ten
    times, most never) — the signal behind stopword lists, keyword
    extraction, and tf saturation constants like BM25's k1.

    Counts per (doc, token) come from one explode + aggregation (the
    only corpus-volume stage); the per-token moments then reduce the
    (doc, token, tf) table with DECIMAL Σtf and Σtf² (tf² as products)
    so mean and variance are reduce-order independent. Population
    variance (the docs containing the token ARE the population).

    Returns (token, doc_freq, mean_tf, burstiness), rounds 6.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tf = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("_id"), F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum(dec(F.col("_tf"))).cast("double").alias("_s1"),
        F.sum(dec(F.col("_tf") * F.col("_tf"))).cast("double").alias("_s2"),
    )
    n = F.col("doc_freq").cast("double")
    mean = F.col("_s1") / n
    var = F.col("_s2") / n - mean * mean
    return g.where(F.col("doc_freq") >= min_df).select(
        "token",
        "doc_freq",
        F.round(mean, 6).alias("mean_tf"),
        F.round(F.try_divide(var, mean), 6).alias("burstiness"),
    )


def token_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-fertility profile per group (typically language):
    characters per whitespace token — the first number a tokenizer
    evaluation reports, because a language whose words cost 3× the
    characters gets 3× fewer words into the same context window and
    trains underweighted unless the mixture corrects for it.

    Exact integer sums of characters and tokens per group (map-side
    combined, one pass), one division per group row.

    Returns (group, n_docs, n_chars, n_tokens, chars_per_token),
    round 6.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(group_col).alias("grp"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        F.size(toks).cast("long").alias("_toks"),
    )
    g = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_chars").cast("long").alias("n_chars"),
        F.sum("_toks").cast("long").alias("n_tokens"),
    )
    return g.select(
        "grp",
        "n_docs",
        "n_chars",
        "n_tokens",
        F.round(
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("chars_per_token"),
    )


def pii_rate(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    patterns: "Dict[str, str]" = None,
) -> DataFrame:
    """Per-group PII exposure report: for each group (source, domain,
    shard), the fraction of documents containing at least one match of
    each PII kind plus total span counts — the audit that decides which
    SOURCES need scrubbing before redact_pii burns a full rewrite pass
    over 100 TB.

    One scan: regexp_count per kind as pure column expressions
    (RE2-safe, whole-stage codegen), one group-keyed map-side-combined
    aggregation. Returns per group: n_docs, and per kind
    (docs_<kind>, spans_<kind>, rate_<kind> round 6).
    """
    patterns = patterns or PII_PATTERNS
    text = F.col(text_col)
    proj = [F.col(group_col).alias("grp")]
    for kind, pat in patterns.items():
        proj.append(
            F.regexp_count(text, F.lit(pat)).cast("long").alias(f"_n_{kind}")
        )
    base = df.select(*proj)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for kind in patterns:
        aggs.append(
            F.sum((F.col(f"_n_{kind}") > 0).cast("int"))
            .cast("long")
            .alias(f"docs_{kind}")
        )
        aggs.append(
            F.sum(F.col(f"_n_{kind}")).cast("long").alias(f"spans_{kind}")
        )
    g = base.groupBy("grp").agg(*aggs)
    rates = [
        F.round(
            F.col(f"docs_{kind}").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias(f"rate_{kind}")
        for kind in patterns
    ]
    return g.select("grp", "n_docs", *[c for k in patterns for c in
                    (F.col(f"docs_{k}"), F.col(f"spans_{k}"))], *rates)


def term_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_expr=None,
    min_df: int = 5,
) -> DataFrame:
    """Emerging/fading terms between two corpus halves: per token, the
    document frequency in each half and the smoothed log-odds growth
    ln((df₂+1)/(n₂+2)) − ln((df₁+1)/(n₁+2)) — the trend-mining readout
    behind "what are people suddenly writing about" dashboards and
    drift-aware vocabulary refreshes. Add-one smoothing keeps tokens
    absent from one half finite instead of infinitely trending.

    ``split_expr`` is any boolean column (False = half 1 / True =
    half 2); the deterministic default is doc_id parity. Distinct
    (token, doc) pairs aggregate once per half inside the same pass
    (conditional counts), half sizes broadcast from a 1-row aggregate.

    Returns (token, df_1, df_2, growth) for tokens with combined
    df >= min_df, round 6.
    """
    split = (
        split_expr if split_expr is not None else (F.col(id_col) % 2 == 1)
    )
    toks = F.array_distinct(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )
    pairs = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(
            F.explode(toks).alias("token"),
            split.cast("int").alias("_h"),
            F.col(id_col).alias("_id"),
        )
        .where(F.col("token") != "")
    )
    sizes = (
        df.where(F.trim(F.col(text_col)) != "")
        .agg(
            F.sum((~split).cast("int")).cast("long").alias("_n1"),
            F.sum(split.cast("int")).cast("long").alias("_n2"),
        )
    )
    g = pairs.groupBy("token").agg(
        F.sum(F.lit(1) - F.col("_h")).cast("long").alias("df_1"),
        F.sum("_h").cast("long").alias("df_2"),
    )
    j = g.crossJoin(F.broadcast(sizes))
    growth = F.log(
        (F.col("df_2").cast("double") + F.lit(1.0))
        / (F.col("_n2").cast("double") + F.lit(2.0))
    ) - F.log(
        (F.col("df_1").cast("double") + F.lit(1.0))
        / (F.col("_n1").cast("double") + F.lit(2.0))
    )
    return j.where(F.col("df_1") + F.col("df_2") >= min_df).select(
        "token", "df_1", "df_2", F.round(growth, 6).alias("growth")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_docfreq: int = 50,
    min_sim: float = 0.3,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity pairs — the classic lexical
    retrieval/near-dup signal between the set-based Jaccard family and
    the dense embedding cosine: weighting by inverse document frequency
    makes two documents similar for sharing RARE vocabulary, not
    boilerplate.

    Vectors live over the capped vocabulary only (tokens appearing in
    <= ``max_token_docfreq`` documents): idf = ln((N+1)/(df+1)), weight
    = tf * idf, L2-normalized per document WITHIN that space; pairs come
    from a co-keyed join on shared tokens and the cosine is the sum of
    matched weight products. The cap is simultaneously the relevance
    filter (common tokens carry ~zero idf) and the scale guard: a
    token's pair fan-out is bounded by cap^2, so no stop-word ever
    explodes the join — the max_shingle_freq discipline applied to the
    weighted-vocabulary space, and the documented recall envelope
    (similarity carried ONLY by ubiquitous tokens is invisible).

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine >= min_sim,
    rounds 6. The per-pair sum adds <= |shared tokens| doubles bounded
    by 1 — reduce-order ulps sit ~1e-10 below the rounding grain.

    Scale: two aggregations (tf, df) + one co-keyed self-join on token;
    everything shuffles on token or pair keys, never all-pairs."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n_docs"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w = (
        tf.join(dfreq.where(F.col("df") <= max_token_docfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "tok",
            (
                F.col("tf").cast("double")
                * F.ln(
                    (F.col("n_docs") + F.lit(1)).cast("double")
                    / (F.col("df") + F.lit(1)).cast("double")
                )
            ).alias("w"),
        )
    )
    norm = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("_nrm"))
    unit = w.join(norm, "id").select(
        "id", "tok", (F.col("w") / F.col("_nrm")).alias("u")
    )
    a = unit.select(F.col("id").alias("id_a"), "tok", F.col("u").alias("u_a"))
    b = unit.select(F.col("id").alias("id_b"), "tok", F.col("u").alias("u_b"))
    pairs = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("u_a") * F.col("u_b")).alias("_cos"))
    )
    return pairs.where(F.col("_cos") >= min_sim).select(
        "id_a", "id_b", F.round("_cos", 6).alias("cosine")
    )


# ---------------------------------------------------------------------------
# Exact BPE tokenizer apply (reference parity: pramen-py has no tokenizer —
# this extends the training-data brief's corpus pipeline; the trainer's
# count step is bpe_merge_candidates above).
#
# Token sequences are represented as a single string with every token
# boundary encoded as a DOUBLE \x1f separator:  ``FF t1 FF t2 FF`` (F =
# \x1f, never present in [a-z0-9]+ words).  Applying one merge rule
# (a, b) -> ab is then ONE literal string replace of ``F a FF b F`` with
# ``F ab F``: the pattern consumes one F from each outer boundary and the
# replacement restores it, so the double-separator invariant is preserved
# and back-to-back occurrences stay matchable, while left-to-right
# non-overlapping replace semantics (identical in Python str.replace,
# Spark's replace(), and DuckDB's replace()) give exactly BPE's
# leftmost-first merge of token runs ("aaaa" -> "aa","aa"; "aaa" ->
# "aa","a").  Because a BPE merge learned at step r can only create
# tokens that participate in LATER-learned rules, applying the rules
# once each in ascending rank order is equivalent to the classical
# greedy lowest-rank-adjacent-pair encode loop.
# ---------------------------------------------------------------------------

BPE_SEP = "\x1f"
_BPE_SEP2 = BPE_SEP * 2


def _bpe_ff_encode(word: str) -> str:
    return _BPE_SEP2 + _BPE_SEP2.join(word) + _BPE_SEP2


def bpe_train_merges(
    head: Sequence[tuple], num_merges: int = 40
) -> list:
    """Learn an ordered BPE merge list from a (word, count) head
    vocabulary — the pure-Python trainer run driver-side on the bounded
    top-K head that ``learn_bpe_merges`` collects.

    Deterministic: each step counts every adjacent token position
    weighted by word count and picks (max weight, then (a, b)
    lexicographic) — the same argmax the DuckDB oracle replays.
    """
    vocab = [[_bpe_ff_encode(w), int(c)] for w, c in head if len(w) >= 2]
    merges: list = []
    for _ in range(num_merges):
        counts: Dict[tuple, int] = {}
        for s, c in vocab:
            ts = s.split(_BPE_SEP2)[1:-1]
            for pair in zip(ts, ts[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        (a, b) = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b))
        pat = BPE_SEP + a + _BPE_SEP2 + b + BPE_SEP
        rep = BPE_SEP + a + b + BPE_SEP
        for row in vocab:
            row[0] = row[0].replace(pat, rep)
    return merges


def _bpe_merge_tokens(ts: list, a: str, b: str) -> list:
    """Apply one merge (a, b) -> ab to a token list, leftmost-first
    non-overlapping — the exact semantics of the replace-chain pattern
    (Python/Spark/DuckDB ``replace``)."""
    out, i, n = [], 0, len(ts)
    ab = a + b
    while i < n:
        if i + 1 < n and ts[i] == a and ts[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(ts[i])
            i += 1
    return out


def bpe_train_merges_fast(
    vocab: Sequence[tuple], num_merges: int = 40
) -> list:
    """Incremental BPE trainer over the FULL weighted distinct-word
    vocabulary — bit-identical merges to :func:`bpe_train_merges` (same
    (max weight, then lexicographic pair) argmax, pytest-asserted equal
    on random corpora), but each step touches only the words that
    contain the chosen pair instead of recounting the whole vocabulary:
    a pair -> weight map plus a pair -> {word index} inverted index are
    maintained by delta (subtract a changed word's old pair positions,
    re-add its new ones). This is the SentencePiece-standard trainer
    shape: O(vocab) setup, then per-merge cost proportional to the
    affected words only — driver-side training over a 1M-word weighted
    vocab (tens of MB, the Zipf-collapsed footprint of a 100 TB corpus)
    stays tractable where the reference trainer's full recount per step
    would not."""
    import heapq

    words = [
        [list(w), int(c)] for w, c in vocab if len(w) >= 2 and int(c) > 0
    ]
    pair_w: Dict[tuple, int] = {}
    pair_ix: Dict[tuple, set] = {}
    for i, (ts, c) in enumerate(words):
        for p in zip(ts, ts[1:]):
            pair_w[p] = pair_w.get(p, 0) + c
            pair_ix.setdefault(p, set()).add(i)
    # lazy-deletion heap for the argmax: every count CHANGE pushes the
    # new (-count, pair) entry, so the live value of every pair is
    # always present; stale entries are discarded on pop by comparing
    # against pair_w. Keeps the per-merge argmax at O(log P) amortized
    # instead of a full O(P) scan — the difference between minutes and
    # hours at a 1M-word vocab / 50k merges.
    heap = [(-w, p) for p, w in pair_w.items()]
    heapq.heapify(heap)
    merges: list = []
    for _ in range(num_merges):
        a = b = None
        while heap:
            neg, p = heapq.heappop(heap)
            if pair_w.get(p) == -neg:
                (a, b) = p
                break
        if a is None:
            break
        merges.append((a, b))
        for i in sorted(pair_ix.get((a, b), ())):
            ts, c = words[i]
            old: Dict[tuple, int] = {}
            for p in zip(ts, ts[1:]):
                old[p] = old.get(p, 0) + 1
            for p, mult in old.items():
                left = pair_w[p] - c * mult
                if left:
                    pair_w[p] = left
                    heapq.heappush(heap, (-left, p))
                else:
                    del pair_w[p]
                s = pair_ix[p]
                s.discard(i)
                if not s:
                    del pair_ix[p]
            ts = _bpe_merge_tokens(ts, a, b)
            words[i][0] = ts
            for p in zip(ts, ts[1:]):
                w = pair_w.get(p, 0) + c
                pair_w[p] = w
                heapq.heappush(heap, (-w, p))
                pair_ix.setdefault(p, set()).add(i)
    return merges


_VOCAB_LIMIT_UNSET = object()  # distinct sentinel: callers may pass None


def _check_pos_int(name: str, value, allow_none: bool) -> None:
    """Positive-int parameter guard. ``bool`` is rejected explicitly —
    it subclasses ``int``, so ``True`` would otherwise pass as 1."""
    if value is None and allow_none:
        return
    if not isinstance(value, int) or isinstance(value, bool) or value < 1:
        suffix = " or None" if allow_none else ""
        raise ValueError(f"{name} must be a positive int{suffix}")


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 40,
    head_k: Optional[int] = 512,
    vocab_limit: Optional[int] = _VOCAB_LIMIT_UNSET,
    min_count: int = 1,
    max_vocab: Optional[int] = 2_000_000,
) -> list:
    """Learn BPE merges from a corpus: distinct-word counts (the only
    corpus-volume stage, one map-side-combined aggregation), then
    driver-side training on the weighted vocabulary.

    ``vocab_limit`` (canonical name; ``head_k`` kept as the historical
    alias, overridden when ``vocab_limit`` is passed) bounds the
    training vocabulary to the top-K head by (count desc, word asc) — a
    TakeOrderedAndProject. ``vocab_limit=None`` trains on the FULL
    weighted distinct-word vocabulary, the shape a production tokenizer
    uses (~50k merges over every distinct word), via the incremental
    trainer (:func:`bpe_train_merges_fast`). Both trainers produce
    identical merge lists on identical vocabularies; the head-bounded
    form remains for the SQL oracle replay, whose unrolled training
    stages need a small head.

    Driver-memory contract for the full-vocabulary path (the one
    ``.collect()`` in the engine whose size is data-dependent): 100 TB
    of noisy web text can hold hundreds of millions of distinct
    ``[a-z0-9]+`` strings (hashes, URL fragments), so the collect is
    bounded by DESIGN, not data luck —

    - ``min_count`` (the standard tokenizer-training frequency floor —
      subword-nmt's ``--min-frequency``, fastText/word2vec's
      ``minCount``) filters the vocabulary BEFORE the collect,
      executor-side. Hapax noise cannot win a merge against real
      vocabulary, so floors like 2-5 change nothing on clean corpora
      while collapsing the noise tail.
    - ``max_vocab`` is a hard cap: the plan collects at most
      ``max_vocab + 1`` rows (a ``limit`` above the collect, so the
      excess never reaches the driver) and raises with a clear message
      asking for a higher ``min_count`` when the floored vocabulary
      still exceeds it. The 2M default is ~100 MB driver-side worst
      case. ``max_vocab=None`` removes the cap explicitly."""
    if vocab_limit is _VOCAB_LIMIT_UNSET:
        vocab_limit = head_k
    if vocab_limit is not None and (
        not isinstance(vocab_limit, int)
        or isinstance(vocab_limit, bool)
        or vocab_limit < 1
    ):
        raise ValueError(
            "vocab_limit must be a positive int or None (full vocabulary)"
        )
    _check_pos_int("min_count", min_count, allow_none=False)
    _check_pos_int("max_vocab", max_vocab, allow_none=True)
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
    )
    vocab = (
        df.select(F.explode(toks).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if vocab_limit is not None:
        head = (
            vocab.orderBy(F.desc("c"), F.asc("w")).limit(vocab_limit).collect()
        )
        return bpe_train_merges([(r.w, r.c) for r in head], num_merges)
    if min_count > 1:
        vocab = vocab.where(F.col("c") >= min_count)
    if max_vocab is not None:
        rows = vocab.limit(max_vocab + 1).collect()
        if len(rows) > max_vocab:
            raise ValueError(
                f"full-vocabulary BPE training: floored vocabulary exceeds "
                f"max_vocab={max_vocab} (min_count={min_count}); raise "
                f"min_count to collapse the noise tail, or raise/disable "
                f"max_vocab if the driver has the memory"
            )
    else:
        rows = vocab.collect()
    return bpe_train_merges_fast([(r.w, r.c) for r in rows], num_merges)


def synthetic_bpe_rules() -> list:
    """Deterministic, data-independent, creation-ordered merge table
    with 582 rules — past the 512-head / 256-engine-auto thresholds, so
    it exercises the Arrow greedy kernel on a production-SIZED table
    while staying exactly replayable by a SQL replace chain (the
    ``bpe_encode_large_ruleset`` oracle): run rules (c,c) and (cc,c)
    and (ccc,c) over [a-z0-9], the 18x17 frequent-letter bigram grid,
    and (bigram, e|s|a) trigram rules over the 8 most frequent letters.
    Every side is a single character or the product of an earlier rule,
    so :func:`bpe_encode_vocab`'s creation-order validation passes and
    the two engines are provably equivalent under it."""
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    rules = []
    for d in (1, 2, 3):
        for c in chars:
            rules.append((c * d, c))
    sub = "etaoinshrdlucmfwyp"
    for c1 in sub:
        for c2 in sub:
            if c1 != c2:
                rules.append((c1, c2))
    for c1 in "etaoinsh":
        for c2 in "etaoinsh":
            if c1 != c2:
                for c3 in "esa":
                    rules.append((c1 + c2, c3))
    return rules


def bpe_encode_word(word: str, ranks: Dict[tuple, int]) -> list:
    """Classical greedy BPE encode of one word against a rank table:
    repeatedly merge the lowest-rank adjacent pair (all occurrences,
    leftmost-first). The Arrow engine's per-word kernel — provably
    equivalent to the replace-chain engine (rules can only create tokens
    consumed by later rules), which pytest asserts on random corpora."""
    toks = list(word)
    while len(toks) > 1:
        best_rank = None
        best = None
        for pair in zip(toks, toks[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        a, b = best
        out, i, n = [], 0, len(toks)
        while i < n:
            if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def bpe_encode_vocab(
    words: DataFrame,
    merges: Sequence[tuple],
    word_col: str = "w",
    engine: str = "auto",
) -> DataFrame:
    """Exactly BPE-encode a distinct-word vocabulary against an ordered
    merge list: adds ``tokens`` (array<string>) and ``n_tokens`` (long).

    The merge list must be in CREATION order (every rule's sides are
    single characters or products of earlier rules) — the shape every
    BPE trainer emits, and the precondition under which the two engines
    below are provably equivalent (the replace chain applies each rule
    once in rank order; the greedy kernel re-scans — they diverge on a
    reordered table where an early rule consumes a later rule's
    product). Malformed tables raise ``ValueError`` up front instead of
    silently tokenizing differently per engine.

    Two engines, identical results (pytest-asserted equal on random
    corpora), picked by ``engine='auto'`` on the merge-table size:

    - ``'replace'`` (small merge lists, <= 256): ONE JVM-side projection
      — a chain of len(merges) literal string replaces over the
      double-separator representation (see module comment). No UDF, no
      shuffle, whole-stage codegen.
    - ``'arrow'`` (production-size tables — a real tokenizer ships ~50k
      merges, far past what a codegen'd expression chain tolerates):
      Arrow-batched ``mapInPandas`` running the classical greedy encode
      per word against a rank dict built once per task. Still
      zero-shuffle, and still bounded by the VOCABULARY (the Zipf trick
      in :func:`bpe_encode`), never the corpus.
    """
    made: set = set()
    for i, (a, b) in enumerate(merges):
        if (len(a) > 1 and a not in made) or (len(b) > 1 and b not in made):
            raise ValueError(
                f"merge rule {i} ({a!r}, {b!r}) is not in creation order: "
                "its sides are neither single characters nor products of "
                "earlier rules — reordered/curated tables tokenize "
                "ambiguously"
            )
        made.add(a + b)
    if engine == "auto":
        engine = "replace" if len(merges) <= 256 else "arrow"
    if engine == "replace":
        col = F.concat(
            F.lit(_BPE_SEP2),
            F.regexp_replace(F.col(word_col), "(.)", "$1" + _BPE_SEP2),
        )
        for a, b in merges:
            col = F.replace(
                col,
                F.lit(BPE_SEP + a + _BPE_SEP2 + b + BPE_SEP),
                F.lit(BPE_SEP + a + b + BPE_SEP),
            )
        out = words.withColumn("_s", col)
        toks = F.expr(f"filter(split(_s, '{BPE_SEP}{BPE_SEP}'), x -> x != '')")
        return out.select(
            "*", toks.alias("tokens")
        ).select(
            *[c for c in words.columns],
            "tokens",
            F.size("tokens").cast("long").alias("n_tokens"),
        )
    if engine != "arrow":
        raise ValueError(f"unknown bpe engine {engine!r}")

    from pyspark.sql import types as T

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    in_cols = list(words.columns)
    schema = T.StructType(
        list(words.schema.fields)
        + [
            T.StructField("tokens", T.ArrayType(T.StringType()), True),
            T.StructField("n_tokens", T.LongType(), True),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            encoded = [bpe_encode_word(w, ranks) for w in pdf[word_col]]
            out = pdf[in_cols].copy()
            out["tokens"] = encoded
            out["n_tokens"] = pd.array(
                [len(t) for t in encoded], dtype="Int64"
            )
            yield out

    return words.mapInPandas(run, schema)


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
    engine: str = "auto",
) -> DataFrame:
    """Exact per-document BPE token counts for a given merge list:
    (id, n_words, n_bpe_tokens), n_bpe_tokens = 0 for wordless docs.

    Scale (100 TB): the Zipf trick — the corpus collapses to the
    DISTINCT-WORD vocabulary first, the encode chain runs once per
    distinct word (bpe_encode_vocab, zero-shuffle projection), and the
    exact counts join back to document word instances on the word key
    (vocabulary-sized build side — AQE broadcasts it while it fits,
    tens of MB for a 1M-word vocab). Corpus volume touches only the
    two map-side-combined aggregations and the join probe side."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
    )
    words = df.select(F.col(id_col), F.explode(toks).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("_vc"))
    encoded = bpe_encode_vocab(vocab, merges, engine=engine).select(
        "w", "n_tokens"
    )
    per_doc = (
        words.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )
