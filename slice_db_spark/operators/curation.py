"""Corpus-curation operators for training-data pipelines: PII scrubbing,
deterministic train/val splits, benchmark decontamination, Gopher-style
repetition statistics, and stratified source-mix sampling.

These extend the reference's scrubbing surface (`slice_db/transform.py` —
per-column pseudonymization for database slices) to the document-corpus
shapes an LLM data pipeline needs.  Everything is built-in column
expressions or broadcast/equi-joins — no Python UDFs, nothing driver-side.

Scale notes (100 TB):

* **PII scrub** — pure per-row regexp codegen, zero shuffle; patterns are
  restricted to constructs Java regex and RE2 evaluate identically (no
  lookarounds, ASCII classes) so the DuckDB oracles match bit-for-bit.
* **Split assignment** — one md5 per row, zero shuffle.  Hash-based
  bucketing (not ``rand()``) means membership is a pure function of the
  id: re-runs, backfills, and incremental ingests land rows in the same
  split without coordination — the property that makes the split safe to
  recompute on any subset of the corpus.
* **Decontamination** — the benchmark side is tiny relative to the corpus
  (thousands of eval documents vs billions of training docs), so its
  shingle set broadcasts and the corpus-side index never shuffles: one
  map-side hash join + one aggregation keyed by doc id.
* **Repetition stats** — one explode of non-distinct n-grams, then two
  aggregations keyed by (doc, gram) and (doc): partitions with the input,
  no hot keys beyond single-document size (bounded by max doc length).
* **Stratified sampling** — pure per-row hash + broadcast of the
  per-stratum fraction map, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import shingle_table
from .hashing import hash64
from .text import normalize

# ------------------------------------------------------------------ PII scrub

#: Detection patterns, applied in this order (order matters for redaction:
#: earlier redactions cannot create later matches because replacement
#: tokens contain no digits or ``@``).  Each pattern works identically in
#: Java regex (Spark) and RE2 (DuckDB): no lookarounds, no backrefs,
#: ASCII classes only.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
]


def pii_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Detect and redact PII in one projection (pure codegen, no shuffle).

    Output: (id, n_email, n_ssn, n_phone, n_ipv4, n_pii, redacted).
    Counts are computed on the ORIGINAL text; redaction applies the
    patterns in :data:`PII_PATTERNS` order, which is unambiguous because
    the replacement tokens can never complete a later pattern.
    """
    c = F.col(text_col)
    cols = [F.col(id_col)]
    total = F.lit(0).cast("bigint")
    for name, pat in PII_PATTERNS:
        cnt = F.regexp_count(c, F.lit(pat)).cast("bigint")
        cols.append(cnt.alias(f"n_{name}"))
        total = total + cnt
    cols.append(total.alias("n_pii"))
    redacted = c
    for name, pat in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    cols.append(redacted.alias("redacted"))
    return df.select(*cols)


# ------------------------------------------------------- deterministic splits

#: bucket space for split assignment; weights are expressed in 1/1000ths
SPLIT_BUCKETS = 1000


def split_bucket(id_col: Column | str, salt: str = "split") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS) from the row id — a pure
    function of (salt, id), so any engine or re-run reproduces it."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hash64(F.concat(F.lit(salt + ":"), c.cast("string"))) % SPLIT_BUCKETS


def split_assign(
    df: DataFrame,
    weights: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split by deterministic hash bucketing.

    ``weights`` maps split name → bucket width out of :data:`SPLIT_BUCKETS`
    (e.g. ``{"train": 980, "val": 10, "test": 10}``); widths must sum to
    ``SPLIT_BUCKETS`` so the assignment is total.  Output: (id, bucket,
    split).  Splits are disjoint, exhaustive, and stable under corpus
    growth — a document's split never changes when other documents are
    added or removed (the decontamination-safe property).
    """
    if sum(weights.values()) != SPLIT_BUCKETS:
        raise ValueError(f"split weights must sum to {SPLIT_BUCKETS}: {weights}")
    b = split_bucket(id_col, salt)
    expr = None
    lo = 0
    for name, width in weights.items():
        cond = b < F.lit(lo + width)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += width
    return df.select(
        F.col(id_col), b.cast("bigint").alias("bucket"), expr.alias("split")
    )


# ----------------------------------------------------------- decontamination


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Benchmark decontamination: find training documents sharing ≥
    ``min_overlap`` distinct word ``n``-grams with any benchmark document
    (the published eval-overlap rule: drop or flag training docs that
    contain eval n-grams; production pipelines use n≈13, the default here
    is lower because the test corpus has short documents).

    Output: (id, n_overlap) for corpus documents meeting the bar —
    the flag set a pipeline anti-joins against its training corpus.

    Scale shape: benchmark shingles deduplicate to a SMALL set (eval
    suites are thousands of documents), so the join broadcasts and the
    corpus index is consumed map-side — the corpus never shuffles until
    the final doc-keyed count, which is keyed by (id) with per-doc bounded
    cardinality.
    """
    corpus_st = shingle_table(corpus, text_col, id_col, n)
    bench_sh = (
        shingle_table(benchmark, text_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    if broadcast:
        # no eager size probe here — the caller knows its eval suite's
        # size; pass broadcast=False for abnormally large benchmark sets
        # (falls back to a shuffled hash join)
        bench_sh = F.broadcast(bench_sh)
    return (
        corpus_st.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )


# -------------------------------------------------------- repetition metrics


def gram_table(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram-hash) pairs over NON-distinct word n-grams — unlike
    :func:`..dedup.shingle_table`, every occurrence is kept, because
    repetition metrics need occurrence counts."""
    from .dedup import _shingle_expr

    toks = df.select(F.col(id_col), F.split(normalize(F.col(text_col)), " ").alias("__toks"))
    return toks.select(
        F.col(id_col),
        F.explode(_shingle_expr(F.col("__toks"), n, distinct=False)).alias("__s"),
    ).select(F.col(id_col), hash64(F.col("__s")).alias("gram"))


def repetition_stats(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition metrics over word
    ``n``-grams (Rae et al. 2021 repetition filters, the word-n-gram
    family): documents dominated by a few repeated n-grams are
    low-quality/degenerate text.

    Output per document:

    * ``n_grams``        — total n-gram occurrences
    * ``n_distinct_grams``
    * ``top_gram_frac``  — occurrences of the most frequent n-gram / total
    * ``dup_gram_frac``  — occurrences of n-grams appearing more than once
      / total

    Shape: explode → count per (doc, gram) → aggregate per doc.  Both
    shuffles are keyed by doc id (+ gram), so partitioning follows the
    corpus and the only cardinality amplification is document length.
    """
    gt = gram_table(df, n, text_col, id_col)
    per_gram = gt.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.max("c").alias("__top"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("__dup"),
        )
        .select(
            F.col(id_col),
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_distinct_grams").cast("bigint").alias("n_distinct_grams"),
            F.round(F.col("__top") / F.col("n_grams"), 4).alias("top_gram_frac"),
            F.round(F.col("__dup") / F.col("n_grams"), 4).alias("dup_gram_frac"),
        )
    )


# -------------------------------------------------------- sequence packing


def pack_offsets(
    df: DataFrame,
    budget: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence-packing offsets: concatenate each shard's documents in id
    order into one token stream and cut fixed-``budget`` training
    sequences — the standard pretraining packing (documents straddle
    sequence boundaries; nothing is padded or dropped).

    Output per document: (id, shard, n_tokens, start_offset, first_seq,
    last_seq, n_seqs) where ``first_seq``/``last_seq`` are the indices of
    the budget-sized sequences the document lands in within its shard.
    Zero-token documents report ``n_seqs = 0`` (they occupy no stream
    positions; first_seq = last_seq = the boundary they sit at).

    Scale shape: the running offset is a window sum PARTITIONED BY SHARD —
    each shard's cumsum is independent, so parallelism equals ``n_shards``
    (pick ≥ the cluster's core count; production packing shards by output
    file anyway).  A single global stream would serialize into one
    partition — the documented anti-pattern this operator avoids.
    Token counts use the whitespace tokenizer (:func:`..text.token_count`);
    swap in :func:`..text.bpe_token_count` for BPE-budget packing.
    """
    from pyspark.sql import Window

    from .text import token_count

    t = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        token_count(text_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    first = F.expr(f"start_offset div {budget}")
    last = F.expr(f"(start_offset + greatest(n_tokens, 1) - 1) div {budget}")
    return t.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        "start_offset",
        first.alias("first_seq"),
        last.alias("last_seq"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint"))
        .otherwise(last - first + 1)
        .alias("n_seqs"),
    )


# ------------------------------------------------------- stratified sampling

#: bucket space for stratified sampling fractions (1/10000 resolution)
MIX_BUCKETS = 10_000


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the 'domain mixing' step
    that reweights sources in a training corpus.

    ``fractions`` maps stratum value → keep fraction in [0, 1]; strata not
    listed are dropped.  A row is kept iff
    ``hash64(salt:stratum:id) % MIX_BUCKETS < fraction · MIX_BUCKETS`` — a
    pure row-local predicate (codegen, zero shuffle, no sampling state),
    reproducible on any engine and stable under corpus growth.  Salting
    the hash with the stratum decorrelates a row's fate across strata
    reconfigurations.

    Returns the kept rows of ``df`` (all original columns).
    """
    b = hash64(
        F.concat(
            F.lit(salt + ":"),
            F.col(strata_col).cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    ) % MIX_BUCKETS
    expr = None
    for value, frac in fractions.items():
        cond = (F.col(strata_col) == F.lit(value)) & (b < F.lit(int(round(frac * MIX_BUCKETS))))
        expr = cond if expr is None else expr | cond
    if expr is None:
        raise ValueError("fractions must not be empty")
    return df.where(expr)


def per_stratum_cap(
    df: DataFrame,
    cap: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Hard per-stratum cap: at most ``cap`` rows per stratum, selected
    deterministically by hash order — the 'no single source dominates'
    guard a mixing pass applies AFTER fractional sampling (fractions
    bound proportions; caps bound absolutes).

    Selection is ``row_number`` over ``(hash64(salt:id), id)`` within the
    stratum: a pure function of ids, so re-runs and incremental
    recomputes pick the same survivors while remaining an unbiased
    pseudo-random subset (hash order, not insertion order).  One shuffle
    keyed by the stratum; a stratum's partition holds only its own rows,
    so skew is bounded by the largest source — cap enforcement is
    exactly the operation that then shrinks it.
    """
    from pyspark.sql import Window

    h = hash64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def temperature_weights(
    df: DataFrame,
    alpha_sqrt: bool = True,
    budget: int = 1_000_000,
    strata_col: str = "source",
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum: ``wᵢ ∝ nᵢ^α`` with
    α = 0.5 (the multilingual-LM square-root temperature that upweights
    small sources without letting any dominate; α = 1 reproduces natural
    proportions).  The training-mix planning step: given per-source
    counts, emit each source's sampling weight and its document quota
    out of ``budget``.

    Exactness: ``sᵢ = floor(1e6·√nᵢ)`` is deterministic (IEEE sqrt is
    exactly rounded, floor kills the ulp), and every ratio after that is
    integer arithmetic — ``weight_ppm = (sᵢ·1e6) div Σs``, ``quota =
    (budget·sᵢ) div Σs`` — so engines agree bit-for-bit and quotas never
    oversubscribe (floor rounds down; Σ quota ≤ budget).

    Scale: one partial-aggregated count per stratum; the stratum frame is
    metadata-sized, so the Σs total folds to a driver scalar (the same
    regime as the TPC-H global-scalar queries) and the weight projection
    is a pure map over |strata| rows."""
    n = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    s = F.floor(F.lit(1_000_000.0) * F.sqrt(F.col("n_docs"))).cast("bigint") \
        if alpha_sqrt else (F.col("n_docs") * F.lit(1_000_000)).cast("bigint")
    n = n.withColumn("__s", s).localCheckpoint(eager=True)  # total + projection
    # r11 (guide §5): Σs joins the weight projection as a broadcast 1-row
    # aggregate over the checkpointed |strata|-row frame instead of a
    # blocking .first() — identical integer division, one fewer serial job.
    totf = n.agg(F.sum("__s").alias("__tot"))
    return n.crossJoin(F.broadcast(totf)).select(
        strata_col,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.expr("(__s * 1000000) div __tot").cast("bigint").alias("weight_ppm"),
        F.expr(f"({int(budget)} * __s) div __tot").cast("bigint").alias("quota_docs"),
    )


def curriculum_order(
    df: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "curriculum",
) -> DataFrame:
    """Curriculum bucketing: assign each document a difficulty bucket from
    its composite quality score (fixed thresholds — ``least(n−1,
    floor(score·n))`` — NOT a global ntile, which would force a
    full-corpus sort) and a deterministic hash-order position within the
    bucket.  A trainer streams buckets low→high (or the reverse) and
    reads documents in ``pos`` order: stable under re-runs, and adding
    documents never reorders existing ones ahead of the insertion point.

    Scale: quality scoring is a pure map; the only shuffle is the
    within-bucket window, keyed by bucket — ≤ ``n_buckets`` partitions'
    worth of skew, same bound as any per-stratum ranking.  Output:
    (id, bucket, pos)."""
    from . import text as textops

    scored = textops.quality_score(df, text_col=text_col, id_col=id_col).select(
        id_col, "quality_score"
    )
    b = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("quality_score") * F.lit(n_buckets)).cast("int"),
    )
    h = hash64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        scored.select(F.col(id_col), b.cast("int").alias("bucket"), h.alias("__h"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, "bucket", "pos")
    )


#: HTML entities the markup stripper decodes, in decode order.  ``&amp;``
#: MUST come last: decoding it first would turn ``&amp;lt;`` into ``&lt;``
#: and then a second pass into ``<`` — the classic double-decode bug (the
#: reverse order is exactly the escape order).
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def strip_markup(col: Column | str) -> Column:
    """Markup-to-text extraction (the trafilatura/jusText stage of a web
    curation pipeline, reduced to its deterministic core): drop
    ``<script>``/``<style>`` elements with their content, strip every
    remaining tag, decode the five standard entities (``&amp;`` last —
    see :data:`HTML_ENTITIES`), and squeeze whitespace.

    Pure codegen (three regexes + five replaces); the DuckDB oracle runs
    the identical RE2-safe patterns, so extraction fidelity is gated
    cross-engine, not just spot-checked."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    c = F.regexp_replace(c, "<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, "[ \\t\\r\\n]+", " "))


def markup_stats(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document extraction report over an HTML column: the extracted
    text, its length, and the tag count removed — the observability row a
    curation run keeps when it drops the raw markup."""
    tags = F.size(F.regexp_extract_all(F.col(html_col), F.lit("<[^>]*>"), F.lit(0)))
    extracted = strip_markup(html_col)
    return df.select(
        F.col(id_col),
        extracted.alias("extracted"),
        F.length(extracted).alias("extracted_chars"),
        tags.cast("bigint").alias("n_tags"),
    )


# --------------------------------------------------------------- URL curation
# The stage every crawl pipeline runs BEFORE text dedup: canonicalize the
# page URL (scheme/host case, default ports, tracking params, fragments,
# duplicate slashes) so per-URL dedup and per-domain aggregation key on
# stable identities.  Pure JVM codegen — `parse_url` + regexp + one
# higher-order filter over the split query string; no Python in the path.

#: query parameters that track campaigns/clicks, not content identity
URL_TRACKING_RE = "^(utm_[a-zA-Z0-9]+|fbclid|gclid|msclkid|ref|ref_src)="


def synth_url(df: DataFrame, id_col: str = "doc_id", source_col: str = "source") -> DataFrame:
    """Deterministic messy URL per document (the fixture corpus carries no
    URL column): mixed-case scheme/host, default AND non-default ports,
    duplicate path slashes, tracking params interleaved with real ones,
    fragments — everything :func:`canonicalize_url` must handle, all from
    ``doc_id`` arithmetic so an SQL oracle can construct the same strings."""
    k = F.col(id_col)
    s = F.col(source_col)
    proto = F.when(k % 3 == 0, "HTTPS").otherwise("http")
    tld = (
        F.when(k % 4 == 0, "COM")
        .when(k % 4 == 1, "org")
        .when(k % 4 == 2, "Net")
        .otherwise("io")
    )
    host = F.concat(F.lit("WWW."), F.upper(s), F.lit(".Site"), (k % 7).cast("string"),
                    F.lit("."), tld)
    port = (
        F.when(k % 3 == 0, F.when(k % 2 == 0, ":443").otherwise(""))
        .when(k % 5 == 0, ":80")
        .when(k % 17 == 0, ":8080")
        .otherwise("")
    )
    path = F.concat(
        F.when(k % 11 == 0, "//Articles//").otherwise("/Articles/"), k.cast("string")
    )
    query = (
        F.when(k % 13 == 0, "")
        .when(k % 2 == 0, F.concat(F.lit("?utm_source=feed&id="), k.cast("string"),
                                   F.lit("&gclid=abc")))
        .otherwise(F.concat(F.lit("?id="), k.cast("string"),
                            F.lit("&utm_campaign=Spring&page="), (k % 5).cast("string")))
    )
    frag = F.when(k % 3 == 1, F.concat(F.lit("#sec-"), (k % 4).cast("string"))).otherwise("")
    return df.withColumn("url", F.concat(proto, F.lit("://"), host, port, path, query, frag))


def canonicalize_url(df: DataFrame, url_col: str = "url", out_col: str = "canon_url") -> DataFrame:
    """Canonical form: lowercase scheme+host, strip default ports (keep
    non-default), collapse duplicate path slashes, drop the fragment, and
    remove tracking query params while preserving the order of the rest.
    Adds ``host`` and registrable ``domain`` columns alongside.

    Malformed URLs canonicalize to NULL (``try_parse_url`` — the plain
    ``parse_url`` RAISES under Spark 4's default ANSI mode, which would
    kill a whole crawl batch on its first junk URL); callers treat a NULL
    canonical form as "no stable identity" and pass the row through."""
    u = F.col(url_col)
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    # port anchored to the END of the authority — '[^/?#]*:(\d+)' alone
    # backtracks into userinfo passwords ('http://u:123abc@h/') and IPv6
    # literals ('http://[::1]/'), inventing ports the URL never had
    port = F.regexp_extract(
        u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:([0-9]+)(?=[/?#]|$)", 1
    )
    keep_port = (
        (port != "")
        & ~((proto == "http") & (port == "80"))
        & ~((proto == "https") & (port == "443"))
    )
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.when(path == "", "/").otherwise(path)
    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(URL_TRACKING_RE),
        ),
        "&",
    )
    canon = F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(""),
    )
    return (
        df.withColumn("host", host)
        .withColumn("domain", registrable_domain(host))
        .withColumn(out_col, canon)
    )


def registrable_domain(host_col) -> Column:
    """Last two host labels — the registrable-domain approximation a
    blocklist keys on.  (A production build swaps in the public-suffix
    list; the aggregation shape is identical.)"""
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    return F.regexp_extract(c, "([^.]+[.][^.]+)$", 1)
