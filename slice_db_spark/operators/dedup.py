"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB:

* **Exact** — one hash-shuffle on a 60-bit content hash; winner = min id per
  group (deterministic).  Map-side partial aggregation applies; no row data
  moves, only (hash, id).
* **n-gram Jaccard** — exact pairwise similarity via an inverted index
  (explode shingles → self-join on shingle → count shared).  Cost is
  bounded by shingle posting-list sizes, which explode on frequent
  shingles; at scale, run it only on MinHash-LSH candidates (``verify`` in
  :func:`minhash_lsh_pairs` does exactly that).
* **MinHash + LSH** — the scale path: k hash functions over shingles give a
  fixed-width signature per doc (narrow!), banding buckets candidates, one
  shuffle per stage, and only candidate pairs are verified exactly.
* **SimHash** — 60-bit weighted-majority signature; near-dups share bands
  of bits.  Signature computation is a pure map (no shuffle).
* **Embedding cosine** — see :mod:`.similarity`; near-dup = pairs above a
  cosine threshold among LSH-bucketed candidates.

All hashes are md5-derived (:mod:`.hashing`) so DuckDB oracles reproduce
results exactly.  No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import hash64, hash64_spark_sql
from .text import normalize


# ------------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (min id wins — deterministic).

    Returns (id, content_hash, dup_count): survivors with their group size.
    A 100 TB-friendly shape: only (hash, id) shuffles, full rows are
    recovered by a later semi-join on the id.
    """
    content = F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols])
    return (
        df.select(F.col(id_col), hash64(content).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "content_hash", "dup_count")
    )


# ---------------------------------------------------------------- shingles


def shingles(col, n: int = 3):
    """Distinct word n-gram shingles of the normalized text (array<string>).

    ``transform(sequence(...))`` over the token array — no explode until the
    caller asks for the inverted index."""
    toks = F.split(normalize(col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def shingle_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Inverted index: (id, shingle) distinct pairs."""
    return df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    ).distinct()


# ---------------------------------------------------------- n-gram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard similarity ≥ threshold.

    (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6 places.
    Inverted-index join: pairs sharing ≥1 shingle are the only candidates.
    """
    st = shingle_table(df, text_col, id_col, n)
    shared = (
        st.select(F.col(id_col).alias("id_a"), "shingle")
        .join(st.select(F.col(id_col).alias("id_b"), "shingle"), "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return _jaccard_filter(shared, st, id_col, threshold)


def _jaccard_filter(shared: DataFrame, st: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """(id_a, id_b, shared-count) + inverted index → exact Jaccard ≥ t."""
    sizes = st.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("nb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard", F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------- minhash


def minhash_signatures(
    df: DataFrame,
    k: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """k-permutation MinHash signature per document.

    minhash_j = min over shingles of hash64(j || ':' || shingle) — the
    standard "k independent hash functions" construction with salted md5.
    Output: (id, sig array<bigint> of length k).  Pure map, no shuffle.
    """
    mh_exprs = [
        F.expr(
            f"array_min(transform(__shingles, s -> {hash64_spark_sql(f'''concat('{j}:', s)''')}))"
        ).alias(f"mh{j}")
        for j in range(k)
    ]
    return (
        df.select(F.col(id_col), shingles(F.col(text_col), n).alias("__shingles"))
        .where(F.size("__shingles") > 0)
        .select(F.col(id_col), F.array(*mh_exprs).alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    verify: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact verification.

    Signatures are split into ``bands`` bands of ``k/bands`` rows; docs
    agreeing on any full band are candidates (one shuffle on band hash).
    With ``verify`` the candidates' true n-gram Jaccard is computed and
    filtered at ``threshold`` — output (id_a, id_b, jaccard); without, the
    raw candidate pairs (id_a, id_b).

    At 100 TB: candidates ≪ all-pairs; the exact verification join touches
    only candidate ids (broadcast when small).
    """
    assert k % bands == 0, "k must divide into equal bands"
    r = k // bands
    sigs = minhash_signatures(df, k, text_col, id_col, n)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws(",", *[F.col("sig")[b * r + i].cast("string") for i in range(r)]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = banded.select(F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_a"))
    right = banded.select(F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_b"))
    cands = (
        left.join(right, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if not verify:
        return cands
    st = shingle_table(df, text_col, id_col, n)
    shared = (
        cands.join(st.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
        .join(
            st.select(F.col(id_col).alias("id_b"), F.col("shingle").alias("shingle_b")), "id_b"
        )
        .where(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return _jaccard_filter(shared, st, id_col, threshold)


# ------------------------------------------------------------------ simhash


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bits: int = 32,
) -> DataFrame:
    """SimHash: per-bit weighted majority over shingle hashes.

    bit_b(doc) = 1 if sum over shingles of (+1 if bit b of hash64(shingle)
    set else -1) > 0.  Output (id, simhash BIGINT).  Pure map +
    aggregate-free (array reduce per row) — no shuffle.
    """
    hashes = F.expr(
        f"transform(__shingles, s -> {hash64_spark_sql('s')})"
    )
    bit_terms = [
        F.expr(
            "aggregate(__hashes, 0L, (acc, h) -> acc + "
            f"CASE WHEN (h div {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        )
        for b in range(bits)
    ]
    sim = None
    for b, term in enumerate(bit_terms):
        contrib = F.when(term > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sim = contrib if sim is None else sim + contrib
    return (
        df.select(F.col(id_col), shingles(F.col(text_col), n).alias("__shingles"))
        .where(F.size("__shingles") > 0)
        .withColumn("__hashes", hashes)
        .select(F.col(id_col), sim.alias("simhash"))
    )


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bits: int = 32,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate blocking: split the ``bits``-bit signature into ``bands``
    contiguous chunks; by pigeonhole any pair within distance < bands shares
    at least one exact chunk — join on (chunk index, chunk value), then
    verify the true Hamming distance via ``bit_count(xor)``.
    """
    sigs = simhash_signatures(df, text_col, id_col, n, bits)
    chunk = bits // bands
    mask = (1 << chunk) - 1
    banded = sigs.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(*[(F.col("simhash").bitwiseOR(0) / F.lit(1 << (b * chunk))).cast("bigint") % F.lit(mask + 1) for b in range(bands)])
        ).alias("band", "chunk"),
    )
    left = banded.select("band", "chunk", F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"))
    right = banded.select("band", "chunk", F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"))
    return (
        left.join(right, ["band", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
