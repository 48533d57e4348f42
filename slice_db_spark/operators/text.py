"""Text-analysis operators for training-data pipelines.

All pure built-in column expressions (whole-stage codegen; no UDFs):
tokenization, token counting, quality scoring, n-gram language ID, and
winnowing-style document fingerprints.  Each operator is deterministic and
has an exact DuckDB-SQL oracle (see ``__spark_entry__.oracle_sql``).

Scale notes: every operator is a narrow per-row map over ``text`` —
embarrassingly parallel, no shuffle; fingerprints explode to ~1 row per
k-gram window, which is bounded by document length and partitions with the
input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .hashing import hash64, hash64_spark_sql

# Tiny stopword inventories for the n-gram/stopword language heuristic.
# Deliberately small + frozen so oracles can inline them.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "los", "las", "y", "es", "una", "en", "por", "con", "para"],
}


def normalize(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, squeeze whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " +", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize(col), " ")


def token_count(col: Column | str) -> Column:
    n = normalize(col)
    return F.when(n == "", F.lit(0)).otherwise(F.size(F.split(n, " ")))


#: BPE-ish pre-tokenizer pattern (the public GPT-2 shape, restricted to
#: constructs Java regex and DuckDB's RE2 evaluate identically: no
#: lookarounds, ASCII classes): contraction suffixes, letter runs, single
#: digits, punctuation runs, whitespace collapsed by splitting.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column | str) -> Column:
    """Approximate BPE token count: matches of :data:`BPE_PATTERN` — the
    standard pre-tokenization granularity, an upper-bound proxy for a real
    BPE vocab's token count (each pre-token splits into ≥1 BPE tokens,
    most common words are single tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0)))


def bpe_token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_bpe_tokens, chars_per_token): the compression-ratio signal
    training pipelines use for quality/cost estimates."""
    n = bpe_token_count(text_col)
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_bpe_tokens"),
        F.round(F.length(text_col) / F.greatest(n, F.lit(1)), 4).alias("chars_per_token"),
    )


def word_token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: counts, distinct counts, mean word
    length — the 'token counting' operator."""
    t = tokens(text_col)
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.round(
            F.length(F.regexp_replace(normalize(text_col), " ", ""))
            / F.greatest(token_count(text_col), F.lit(1)),
            4,
        ).alias("mean_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality features + composite score in [0, 1]:

    * length score   — saturating chars/500
    * alpha ratio    — alphabetic chars / all chars
    * stopword ratio — English stopword tokens / tokens (fluency proxy)
    * repetition     — distinct tokens / tokens (degenerate-text detector)

    Composite = mean of the four; the exact formula is pinned by the oracle.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    toks = tokens(text_col)
    n_tok = token_count(text_col)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_sw = F.size(F.array_intersect(toks, sw))  # distinct stopwords present
    # ratio uses per-token membership, not distinct intersection:
    n_sw_tokens = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1))
    sw_ratio = n_sw_tokens / F.greatest(n_tok, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        F.round(length_score, 4).alias("length_score"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(
            (length_score + alpha_ratio + sw_ratio + distinct_ratio) / F.lit(4.0), 4
        ).alias("quality_score"),
        n_sw.alias("n_stopwords_present"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language ID: score each language by the fraction of
    its stopword list present in the document's token set; argmax wins
    (deterministic tie-break by language code)."""
    toks = F.array_distinct(tokens(text_col))
    scores = [
        F.struct(
            (F.size(F.array_intersect(toks, F.array([F.lit(w) for w in ws]))) / F.lit(len(ws)))
            .alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(STOPWORDS.items())
    ]
    # array_max compares struct fields in order (score, then lang): ties
    # resolve to the alphabetically-last language — documented; the oracle
    # mirrors the same (score, lang) max.
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        best["lang"].alias("pred_lang"),
        F.round(best["score"], 4).alias("lang_score"),
    )


def token_rarity(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-statistics-driven rarity scoring: how common are a
    document's tokens across the corpus?  Documents made of rare tokens
    are OOV-heavy/noisy; documents of only ubiquitous tokens carry little
    signal — both ends are filter targets in a training-data run.

    Two-stage shape (the pattern for any corpus-level statistic feeding a
    per-row score): (1) distinct (doc, token-hash) pairs → token document
    frequency via one hash aggregation; (2) join the df back to the pairs
    and aggregate per document.  All keys are 8-byte hashes; both
    shuffles are narrow (no text moves past the explode).

    Output per document: ``n_distinct_tokens``, ``mean_token_df`` (mean
    document frequency of its distinct tokens — an integer ratio, so
    engines agree exactly), ``min_token_df`` (its rarest token), and
    ``n_hapax`` (tokens appearing in no other document).
    """
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("__t")
    ).select(F.col(id_col), hash64(F.col("__t")).alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        tok.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.round(F.sum("df") / F.count(F.lit(1)), 4).alias("mean_token_df"),
            F.min("df").alias("min_token_df"),
            F.sum(F.when(F.col("df") == 1, F.lit(1)).otherwise(F.lit(0))).alias("n_hapax"),
        )
        .select(
            F.col(id_col),
            F.col("n_distinct_tokens").cast("bigint").alias("n_distinct_tokens"),
            "mean_token_df",
            F.col("min_token_df").cast("bigint").alias("min_token_df"),
            F.col("n_hapax").cast("bigint").alias("n_hapax"),
        )
    )


def fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken MOSS
    scheme): hash every k-gram of word tokens, slide a ``window`` over the
    hash sequence, keep each window's minimum — the classic near-dup /
    provenance fingerprint set.  Output: (id, fingerprint) distinct pairs.

    Built entirely from array expressions: sequence → transform(get-based
    k-gram) → min-per-window → explode.  Hash = md5-derived :mod:`hashing`
    so the DuckDB oracle matches bit-for-bit.  Both per-position lambdas
    use O(1) ``get`` lookups, not ``slice`` — HOFs evaluate interpreted,
    and a slice allocates a fresh k-element array per position
    (:func:`slice_db_spark.operators.dedup._shingle_expr` rationale);
    ``get`` is NULL past the end, which ``concat_ws`` drops and ``least``
    skips, reproducing the short-tail slice semantics exactly.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    # 1-based position i → 0-based get offsets i-1 .. i+k-2
    kgram = "concat_ws(' ', " + ", ".join(f"get(__toks, i + {j - 1})" for j in range(k)) + ")"
    hashes = F.expr(
        f"transform(sequence(1, greatest(size(__toks) - {k} + 1, 1)), i -> "
        f"{hash64_spark_sql(kgram)})"
    )
    win_min = "least(" + ", ".join(f"get(__hashes, i + {j - 1})" for j in range(window)) + ")"
    mins = F.expr(
        f"transform(sequence(1, greatest(size(__hashes) - {window} + 1, 1)), i -> "
        f"{win_min})"
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .where(n > 0)
        .withColumn("__hashes", hashes)
        .select(F.col(id_col), F.explode(F.array_distinct(mins)).alias("fingerprint"))
        .distinct()
    )


def length_quantiles(
    df: DataFrame,
    by_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    probs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-stratum document-length percentiles — the numbers a curation
    pass reads to SET its thresholds (p50/p90/p99 of characters).

    Uses EXACT ``percentile`` (sorted-group interpolation) so the DuckDB
    ``quantile_cont`` oracle computes the identical statistic; outputs
    round to 4 decimals because the two engines may interpolate with
    differently-associated (equal-value, different-rounding) float
    expressions.  At 100 TB swap in ``approx_percentile`` (t-digest,
    partial-aggregating, no per-group sort) — the exact form is the
    cross-engine-verifiable contract, the approx form is the scale path
    with the same schema.
    """
    aggs = [
        F.round(F.percentile(F.length(text_col), F.lit(p)), 4).alias(
            f"p{int(p * 100)}_chars"
        )
        for p in probs
    ]
    return (
        df.groupBy(by_col)
        .agg(F.count(F.lit(1)).alias("n_docs"), *aggs)
    )


def token_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Sliding token-window chunking — the retrieval/context-packing
    granularity (RAG passage splitting, long-doc embedding prep): each
    document yields overlapping ``window``-token chunks advancing by
    ``stride`` (overlap = window − stride), the last window keeping the
    remainder.  ``n_chunks = 1 + ceil((ntok − window)/stride)`` for
    non-empty docs, all in exact integral arithmetic (``div``, never
    float division — bucket boundaries must agree cross-engine).

    Scale shape: tokens materialize ONCE per row (an interpreted HOF
    re-evaluates its argument subtree per element), the window starts are
    a generated ``sequence`` + explode — pure codegen row expansion, no
    UDF and NO shuffle: chunking is embarrassingly parallel per document,
    so the plan is a single mapper stage at any corpus size.  Output:
    (id, chunk_idx, n_tokens, chunk_hash) — the hash is the dedup /
    join key downstream so raw chunk text never needs to move again."""
    from .hashing import hash64

    w, s = int(window), int(stride)
    # exact ceil((ntok-w)/s) via integral div: (x + s - 1) div s.
    # Empty docs produce ZERO chunks — filter on the normalized text, not
    # the token array (split('', ' ') is [''], size 1, not empty).
    t = (
        df.select(F.col(id_col), normalize(text_col).alias("__n"))
        .where(F.col("__n") != "")
        .select(F.col(id_col), F.split("__n", " ").alias("__t"))
    )
    t = t.withColumn(
        "__nw", F.expr(f"1 + ((greatest(size(__t) - {w}, 0) + {s - 1}) div {s})")
    )
    chunk = F.expr(f"slice(__t, chunk_idx * {s} + 1, {w})")
    return (
        t.select(
            F.col(id_col),
            F.col("__t"),
            F.explode(F.expr("sequence(0, __nw - 1)")).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            chunk.alias("__c"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.size("__c").cast("bigint").alias("n_tokens"),
            hash64(F.array_join(F.col("__c"), " ")).alias("chunk_hash"),
            *([F.array_join(F.col("__c"), " ").alias("chunk_text")] if keep_text else []),
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    by_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language tokenizer fertility: BPE pre-tokens per word and
    characters per BPE token — the signal for how (in)efficiently a
    tokenizer spends sequence budget on each language, which drives both
    mixture upweighting and vocab decisions in multilingual training.

    One scan, one |languages|-sized partial-aggregated groupBy.  All
    sums are int64; the fertility ratios divide two exact longs in
    double, so both engines produce identical bits."""
    per_doc = df.select(
        F.col(by_col),
        token_count(text_col).alias("__w"),
        bpe_token_count(text_col).alias("__b"),
        F.length(text_col).alias("__c"),
    )
    g = per_doc.groupBy(by_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").alias("n_words"),
        F.sum("__b").alias("n_bpe"),
        F.sum("__c").alias("n_chars"),
    )
    return g.select(
        by_col,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_bpe").cast("bigint").alias("n_bpe"),
        (F.col("n_bpe").cast("double") / F.greatest("n_words", F.lit(1))).alias("fertility"),
        (F.col("n_chars").cast("double") / F.greatest("n_bpe", F.lit(1))).alias("chars_per_bpe"),
    )


def bigram_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) per word-bigram OCCURRENCE of the normalized text.

    Token array is materialized in a projection first and bigrams are
    built from O(1) ``get`` lookups (see `..dedup._shingle_expr` for the
    interpreted-HOF trap this avoids).  Documents with fewer than two
    tokens produce no rows.  Purely narrow — partitions with the input."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks")).where(
        F.size("__toks") >= 2
    )
    return (
        toks.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - F.lit(2)),
                    lambda i: F.struct(
                        F.get("__toks", i).alias("w1"),
                        F.get("__toks", i + F.lit(1)).alias("w2"),
                    ),
                )
            ).alias("__bg"),
        )
        .select(F.col(id_col), F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


def lm_bigram_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained bigram language-model quality score per document —
    the CCNet/Gopher-style "perplexity filter" reduced to exact integer
    arithmetic so the DuckDB oracle hash-matches bit-for-bit.

    Model: add-one-smoothed bigram MLE trained on the corpus itself.
    Per bigram occurrence the conditional probability is
    ``(c12 + 1) / (c1 + V)`` (c12 = corpus count of the bigram, c1 =
    corpus count of bigrams starting with w1, V = corpus vocabulary
    size); the per-document score is the mean of
    ``floor(1e6 * p)`` over its bigram occurrences — a micro-probability
    mean that orders documents identically to mean-probability while
    avoiding transcendentals (ln/exp carry last-ulp cross-engine risk;
    fixed-point floors are exact in both engines).

    Scale shape (the pattern for any corpus-statistic score): (1) one
    map-side-combinable groupBy collapses per-document repeats to
    ``(doc, h1, h12, n_occ)``; (2) two narrow hash aggregations build the
    count tables (8-byte keys only — no strings shuffle); (3) two
    equi-joins back and one final per-document aggregation.  Hot bigrams
    skew the ``h12`` join — AQE skew-join splits them; V is a broadcast
    1-row aggregate (metadata-sized) evaluated inside the query's own
    pipeline rather than as a blocking driver action.  Low score =
    improbable token sequences (boilerplate/garble), high = formulaic
    text.
    """
    occ = (
        bigram_table(df, text_col, id_col)
        .select(
            F.col(id_col),
            hash64(F.col("w1")).alias("h1"),
            hash64(F.concat_ws("\x01", "w1", "w2")).alias("h12"),
        )
        .groupBy(id_col, "h1", "h12")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    c12 = occ.groupBy("h12").agg(F.sum("n_occ").alias("c12"))
    c1 = occ.groupBy("h1").agg(F.sum("n_occ").alias("c1"))
    # V as a broadcast 1-row frame instead of an eager .first() — the
    # former blocked the driver on a full tokenize pass DURING plan
    # construction (a serial barrier per caller); as a lazy broadcast
    # cross join the vocabulary count runs inside the query's own job
    # pipeline, overlapped with the count-table aggregations.  Same V,
    # same floor arithmetic, identical scores.
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("__t"))
        .where(F.col("__t") != "")
        .agg(F.countDistinct("__t").cast("bigint").alias("__V"))
    )
    return (
        occ.join(c12, "h12")
        .join(c1, "h1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__fx",
            F.floor(F.lit(1e6) * (F.col("c12") + F.lit(1)) / (F.col("c1") + F.col("__V"))),
        )
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("__fx")).alias("__sfx"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.round(F.col("__sfx") / F.col("n_bigrams"), 4).alias("lm_score"),
        )
    )


def ngram_topk(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide top-k word n-grams by occurrence count — vocabulary
    induction / collocation mining over the whole corpus.

    One map-side-combinable hash aggregation over exploded grams, then a
    ``TakeOrdered`` top-k (every partition keeps its local k, the driver
    merges k×P rows — no global sort).  Ties break on the gram string so
    the result is deterministic cross-engine."""
    from .dedup import _shingle_expr

    toks = df.select(tokens(text_col).alias("__toks")).where(F.size("__toks") >= n)
    grams = toks.select(
        F.explode(_shingle_expr(F.col("__toks"), n, distinct=False)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.desc("n_occ"), F.asc("gram"))
        .limit(k)
    )


def corpus_report(
    df: DataFrame,
    by: tuple = ("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus *datasheet*: one row per (source, lang) stratum with
    document/char/token volume and mean quality — the summary table every
    curation run publishes next to its output.

    Mean quality goes through per-document fixed-point (``round(1e4·q)``
    as BIGINT) before summing: per-row doubles are bit-identical across
    engines, but a *sum* of doubles is association-order-dependent, so
    only integer accumulation keeps the stratum mean exact.  The mean
    itself is ``floor(sum/n)`` in micro-quality units (BIGINT,
    ``mean_quality_fx`` = 1e4 × quality): a ``round`` here would sit on
    the decimal .5 boundary where Spark (shortest-string HALF_UP) and
    DuckDB (binary-value) legitimately disagree — floor never does.  One
    map-side-combinable aggregation; token counts ride the same pass."""
    q = quality_score(df, text_col, id_col).select(
        F.col(id_col),
        F.round(F.col("quality_score") * F.lit(1e4)).cast("bigint").alias("__qfx"),
    )
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in by],
        F.length(text_col).alias("__chars"),
        token_count(text_col).alias("__ntok"),
        bpe_token_count(text_col).alias("__nbpe"),
    )
    return (
        base.join(q, id_col)
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__chars").cast("bigint").alias("total_chars"),
            F.sum("__ntok").cast("bigint").alias("total_tokens"),
            F.sum("__nbpe").cast("bigint").alias("total_bpe_tokens"),
            F.floor(F.sum("__qfx") / F.count(F.lit(1))).alias("mean_quality_fx"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical retrieval: BM25-shaped top-k scoring of the corpus against a
    query string — the workhorse for benchmark-contamination lookups and
    seed-document expansion in curation runs.

    Scoring is the standard BM25 term shape — tf saturation ``tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))`` times an idf weight — with ONE
    documented deviation: idf is the *rational* Robertson form
    ``(N − df + 0.5)/(df + 0.5)`` without the logarithm, because ln is the
    one BM25 ingredient two engines won't reproduce bit-for-bit (ranking
    changes only where log-idf would reorder terms of very different
    rarity within one document's sum).  Every per-term contribution is
    floored to integer micro-units before the per-document sum, so the
    DuckDB oracle hash-matches exactly.

    Scale shape: the query's term set is tiny and inlined as literals —
    the corpus scan filters to matching tokens BEFORE any shuffle; tf/df
    aggregate map-side; dl/avgdl ride a per-doc projection and one scalar.
    TakeOrdered top-k, ``(score desc, id)`` deterministic tie-break."""
    terms = sorted(set(t for t in query.lower().split() if t))
    if not terms:
        return (
            df.select(F.col(id_col)).where(F.lit(False)).select(
                F.col(id_col),
                F.lit(0).cast("bigint").alias("score_fx"),
                F.lit(0).cast("bigint").alias("n_terms"),
            )
        )
    # r11 (guide §1.2 "the distributed algorithm first"): the old shape
    # tokenized the corpus FOUR times per report (dl, the dl-stats job,
    # tf, and tf again under the df aggregate) across two serial actions.
    # The query's term set is tiny and literal, so ONE tokenize pass now
    # computes, per document, the length AND a conditional per-term tf
    # column; that per-doc frame (one narrow row per document) is
    # checkpointed, and N/avgdl/df fold in as broadcast 1-row aggregates
    # over it.  Per-term arithmetic, flooring, tie-breaks — and therefore
    # scores and ranks — are unchanged (same operand values and order).
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t")).where(
        F.col("__t") != ""
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("__t") == t, 1).otherwise(0)).alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    per_doc = per_doc.localCheckpoint(eager=True)  # stats + df + scoring
    scalars = per_doc.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("dl").alias("__dl_total"),
        *[
            F.sum(F.when(F.col(f"__tf_{i}") > 0, 1).otherwise(0)).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    # avgdl exactly as before: ONE double division of the two bigint
    # totals (the Python total/n), then dl/avgdl
    avgdl = (F.col("__dl_total") / F.col("__n_docs"))

    def term_contrib(i: int):
        tf = F.col(f"__tf_{i}")
        idf = (F.col("__n_docs") - F.col(f"__df_{i}") + F.lit(0.5)) / (
            F.col(f"__df_{i}") + F.lit(0.5)
        )
        c = F.floor(
            F.lit(1e6)
            * idf
            * (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
        )
        return F.when(tf > 0, c).otherwise(F.lit(0))

    score = term_contrib(0)
    n_terms = F.when(F.col("__tf_0") > 0, 1).otherwise(0)
    for i in range(1, len(terms)):
        score = score + term_contrib(i)
        n_terms = n_terms + F.when(F.col(f"__tf_{i}") > 0, 1).otherwise(0)
    any_hit = F.greatest(*[F.col(f"__tf_{i}") for i in range(len(terms))]) > 0 \
        if len(terms) > 1 else (F.col("__tf_0") > 0)
    return (
        per_doc.crossJoin(F.broadcast(scalars))
        .where(any_hit)
        .select(
            F.col(id_col),
            score.cast("bigint").alias("score_fx"),
            n_terms.cast("bigint").alias("n_terms"),
        )
        .orderBy(F.desc("score_fx"), id_col)
        .limit(k)
    )


def feature_hash_table(
    df: DataFrame, dim: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-hashing ("hashing trick") document vectors in LONG form:
    ``(id, dim_idx, weight)`` with each token's count routed to
    ``hash % dim`` and signed by the hash's next bit — the standard
    collision-unbiasing construction (Weinberger et al.).

    Long form rather than ``array<float>`` keeps the output exactly
    verifiable and shuffle-friendly (8-byte keys); ``F.array_agg`` over
    ``dim_idx`` pivots to dense vectors for the ANN operators when
    needed.  One explode + one map-side-combinable aggregation."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t")).where(
        F.col("__t") != ""
    )
    h = hash64(F.col("__t"))
    signed = F.when(F.shiftright(h, 32) % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
    return (
        toks.select(
            F.col(id_col),
            (h % F.lit(dim)).alias("dim_idx"),
            signed.alias("__s"),
        )
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("__s").alias("weight"))
        .select(
            F.col(id_col),
            F.col("dim_idx").cast("bigint").alias("dim_idx"),
            F.col("weight").cast("bigint").alias("weight"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` characteristic terms per document by exact-integer TF-IDF.

    Score = ``tf · floor(1e6·N/df)`` — term frequency times a rational
    inverse-document-frequency in fixed-point millionths (``ln`` idf
    would order identically but carries last-ulp cross-engine risk; the
    rational form is bit-exact and preserves the df ranking).  Ties break
    on the token string, so the per-document top-k is deterministic.

    Scale: one token explode feeds BOTH aggregations — (doc, token) tf
    counts (map-side combinable) and token df counts derived FROM the tf
    frame (already one row per doc-token, so df is a second narrow
    groupBy, never a re-scan).  N is a driver scalar (metadata).  The
    final window partitions by document — no global ordering anywhere."""
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.localCheckpoint(eager=True)  # two consumers: df counts + the join back
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # r11 (guide §5): N used to be a blocking distinct().count() job over
    # the full corpus — it joins the score projection as a broadcast 1-row
    # countDistinct aggregate now (identical value, one fewer full-corpus
    # serial job; the double arithmetic is unchanged: 1e6 * N first, / df).
    ndf = df.agg(F.countDistinct(F.col(id_col)).alias("__n_docs"))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(ndf))
        .select(
            F.col(id_col),
            "token",
            (F.col("tf") * F.floor(F.lit(1e6) * F.col("__n_docs") / F.col("df")))
            .cast("bigint")
            .alias("score"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def collocations(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` collocations (adjacent word pairs) by PMI-style lift.

    Lift = ``p(ab) / (p(a)·p(b))`` over bigram/unigram occurrence
    frequencies, emitted as ``floor`` parts-per-million.  The ratio is
    computed in DOUBLE but every input is an exact int64 count and the
    expression tree is mirrored verbatim in the oracle, so both engines
    round identically (a pure-integer form overflows int64 at corpus
    scale: ``1e6·n_ab·N²`` passes 2⁶³ near ~10⁹ tokens).  ``min_count``
    suppresses the unstable low-support tail — standard collocation
    practice and what keeps the ranked head meaningful.

    Scale: bigram and unigram counts are both map-side-combinable
    groupBys off one token pass; corpus totals are driver scalars; the
    two dictionary joins are on single-token keys (broadcastable — the
    pruned bigram frame is ≪ corpus size); TakeOrdered handles top-k with
    no global sort."""
    bg = (
        bigram_table(df, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    uni = (
        df.select(F.explode(tokens(text_col)).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    uni = uni.localCheckpoint(eager=True)  # three consumers: totals + two joins
    # r11 (guide §5): the unigram and bigram totals used to be two blocking
    # .first() jobs (the bigram one re-scanned the corpus serially) — they
    # ride as ONE broadcast 1-row cross join now: the corpus token-count
    # scan folds into the main job and two serial actions disappear.  The
    # double arithmetic is unchanged (same operand order, bigint operands
    # promote to the identical doubles the int literals did).
    totf = (
        uni.agg(F.sum("n").alias("__n_total"))
        .crossJoin(
            df.select(token_count(text_col).alias("c"))
            .agg(F.sum(F.greatest(F.col("c") - 1, F.lit(0))).alias("__b_total"))
        )
    )
    lift = F.floor(
        (F.lit(1e6) * F.col("n_ab") / F.col("__b_total"))
        * (F.col("__n_total") / F.col("n_a"))
        * (F.col("__n_total") / F.col("n_b"))
    )
    return (
        bg.join(F.broadcast(uni.select(F.col("t").alias("w1"), F.col("n").alias("n_a"))), "w1")
        .join(F.broadcast(uni.select(F.col("t").alias("w2"), F.col("n").alias("n_b"))), "w2")
        .crossJoin(F.broadcast(totf))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            lift.cast("bigint").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(k)
    )


def source_token_drift(
    df: DataFrame,
    top_v: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Per-source token-distribution drift vs the corpus — a χ²-style
    statistic over the top-``top_v`` corpus tokens (the data-drift /
    feed-skew monitor a production mix runs per ingest batch).

    For each (source, token) over the fixed vocabulary: observed count
    ``o`` vs expected ``e = corpus_count · source_tokens / corpus_tokens``;
    each cell contributes ``floor(1e6·(o−e)²/e)`` — the double arithmetic
    runs on exact int64 counts with a verbatim-mirrored expression (no
    logarithms — a KL/JS form would carry transcendental cross-engine
    risk) and is floored PER CELL before summation, because a double Σ
    accumulates in partition order and wouldn't be reproducible.

    Scale: ONE token explode feeds the corpus and per-source counts
    (map-side combinable); the top-V vocabulary (count-desc, token
    tie-break) is a TakeOrdered limit — never a global window — and
    broadcasts; totals are driver scalars.  Output:
    (source, n_tokens, chi2_ppm) — higher = further from the corpus
    profile."""
    tok = (
        df.select(F.col(stratum_col), F.explode(tokens(text_col)).alias("t"))
        .where(F.col("t") != "")
    )
    per_src_tok = tok.groupBy(stratum_col, "t").agg(F.count(F.lit(1)).alias("o"))
    per_src_tok = per_src_tok.localCheckpoint(eager=True)  # feeds corpus counts + join
    corpus = per_src_tok.groupBy("t").agg(F.sum("o").alias("c"))
    vocab = corpus.orderBy(F.desc("c"), "t").limit(top_v)
    totals = per_src_tok.groupBy(stratum_col).agg(F.sum("o").alias("n_tokens"))
    # r11 (guide §5): the corpus grand total used to be a blocking .first()
    # over the (checkpointed) per-source-token frame — it rides as a
    # broadcast 1-row aggregate now; cast-to-double of the same bigint is
    # the identical double the float literal was.
    ntf = totals.agg(F.sum("n_tokens").alias("__n_total"))
    cells = (
        per_src_tok.join(F.broadcast(vocab), "t")
        .join(F.broadcast(totals), stratum_col)
        .crossJoin(F.broadcast(ntf))
    )
    e = F.col("c").cast("double") * F.col("n_tokens") / F.col("__n_total").cast("double")
    cell_fx = F.floor(F.lit(1e6) * (F.col("o") - e) * (F.col("o") - e) / e)
    return (
        cells.groupBy(stratum_col, "n_tokens")
        .agg(F.sum(cell_fx).cast("bigint").alias("chi2_ppm"))
        .select(stratum_col, F.col("n_tokens").cast("bigint").alias("n_tokens"), "chi2_ppm")
    )


def bpe_train_merges(
    df: DataFrame,
    rounds: int = 8,
    text_col: str = "text",
    batch_merges: int = 1,
) -> DataFrame:
    """Learn byte-pair-encoding merges from the corpus — the tokenizer
    TRAINING pass (Sennrich et al. 2016), not just application.

    Distributed shape (how production BPE trainers scale): ONE corpus-wide
    tokenize + groupBy builds the word-frequency vocabulary — the only
    data-sized job — and every merge round then runs on the vocab table:
    adjacent symbol-pair counting weighted by word frequency, a
    deterministic argmax (count desc, then pair lexicographic), and a
    greedy left-to-right non-overlapping merge.  Per-round driver state is
    one (pair, count) row, Lloyd-style.

    Symbol strings use DOUBLE-space delimiters with single-space pair
    boundaries (``"  a  b  "`` matched as ``" a  b "``), which makes plain
    non-overlapping string ``replace`` EXACTLY the classic merge: adjacent
    occurrences keep one boundary space each, so ``a a a a`` merges to
    ``aa aa`` while ``a a a`` merges to ``aa a`` — bit-identical in Spark
    and DuckDB, hence oracle-exact.

    Output: (merge_round, sym_a, sym_b, pair_count), one row per learned
    merge in order.

    ``batch_merges`` > 1 learns up to that many SYMBOL-DISJOINT merges
    per driver round (ranked by count desc then pair, skip-greedy over
    the top candidates): disjointness makes every selected pair's count
    invariant under the others' application, so the batch applies as one
    chained replace and driver round-trips drop from O(merges) to
    O(merges / batch).  This is the standard batched-trainer
    approximation: it can diverge from the strictly serial learner when
    a merge CREATES a new symbol whose pairs would have outranked a
    later pick (e.g. Sennrich's ``es``+``t`` forms immediately after
    ``e``+``s`` and beats the next disjoint candidate) — production
    trainers accept this; callers needing the exact serial sequence use
    ``batch_merges=1`` (the default, bit-identical to the classic
    algorithm)."""
    merges, _ = _bpe_train(df, rounds, text_col, batch_merges=batch_merges)
    return merges


def bpe_segment_stats(
    df: DataFrame,
    rounds: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Train-then-APPLY: segment the vocabulary with the merges
    :func:`bpe_train_merges` learns and report the symbols-per-word
    distribution — the number a tokenizer team actually reads (how much
    sequence budget the first N merges buy).  Output per segment length:
    (n_symbols, n_words, n_occurrences); ``n_symbols`` counts the
    ``</w>`` terminator like the training rounds do."""
    _, vocab = _bpe_train(df, rounds, text_col)
    return segment_length_dist(vocab)


def segment_length_dist(vocab: DataFrame) -> DataFrame:
    """Symbols-per-word distribution of a segmented vocabulary frame
    (columns ``cnt``, ``s`` as produced by :func:`_bpe_train`) — ONE
    definition shared by the oracle-gated :func:`bpe_segment_stats` and
    the ``train-bpe`` CLI report, so the two can never drift."""
    t = vocab.select("cnt", F.split(F.trim(F.col("s")), "  ").alias("t"))
    return (
        t.groupBy(F.size("t").cast("bigint").alias("n_symbols"))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("cnt").cast("bigint").alias("n_occurrences"),
        )
    )


def _bpe_train(df: DataFrame, rounds: int, text_col: str, batch_merges: int = 1):
    """Shared BPE training core: returns (merges DataFrame, final vocab
    frame with columns (cnt, s)) — one definition for learn-only and
    learn+apply consumers.  Each driver round selects up to
    ``batch_merges`` symbol-disjoint pairs (skip-greedy down the
    count-desc/pair-asc ranking) and applies them as ONE chained
    replace; ``batch_merges=1`` is exactly the serial argmax."""
    sp = df.sparkSession
    w = df.select(F.explode(tokens(text_col)).alias("w")).where(F.col("w") != "")
    vocab = w.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    syms = F.concat(
        F.lit("  "),
        F.concat_ws(
            "  ",
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        ),
        F.lit("  </w>  "),
    )
    # checkpoint per round: the rewrite chain would otherwise grow the
    # plan geometrically (the iterative-loop lesson from dedup clustering)
    v = vocab.select("cnt", syms.alias("s")).localCheckpoint(eager=True)
    merges = []
    for r in range(1, rounds + 1):
        t = v.select("cnt", F.split(F.trim(F.col("s")), "  ").alias("t"))
        pairs = t.select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1),"
                    " (x, i) -> concat(x, ' ', element_at(t, i + 2)))"
                )
            ).alias("pair"),
        )
        k = max(1, batch_merges)
        # margin over k: skipped conflicting candidates consume ranks
        cand = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(4 * k + 4)
            .collect()
        )
        if not cand:
            break
        used: set[str] = set()
        picks: list[tuple[str, str, int]] = []
        for row in cand:
            a, b = row["pair"].split(" ", 1)  # symbols never contain spaces
            if a in used or b in used:
                continue  # conflicts with an earlier pick — next round
            picks.append((a, b, int(row["n"])))
            used.update((a, b))
            if len(picks) == k:
                break
        s_col = F.col("s")
        for a, b, n in picks:
            merges.append((len(merges) + 1, a, b, n))
            # disjoint symbols: the replaces commute and each pair's
            # occurrences are untouched by the others — one pass applies
            # the whole batch
            s_col = F.replace(s_col, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
        v = v.select("cnt", s_col.alias("s")).localCheckpoint(eager=True)
    return (
        sp.createDataFrame(
            merges,
            "merge_round bigint, sym_a string, sym_b string, pair_count bigint",
        ),
        v,
    )
