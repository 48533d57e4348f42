"""Text-operator contracts on crafted inputs (the oracle gate covers the
full corpus; these pin the semantics readers reason about)."""

from __future__ import annotations

from slice_db_spark.operators import text as textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_token_rarity_hapax_and_shared(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma"),   # alpha shared with 2; beta/gamma hapax
            (2, "alpha delta"),        # delta hapax
            (3, "unique words only"),  # all hapax
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in textops.token_rarity(df).collect()}
    assert out[1]["n_distinct_tokens"] == 3 and out[1]["n_hapax"] == 2
    assert out[1]["min_token_df"] == 1
    # doc 1: dfs are alpha=2, beta=1, gamma=1 -> mean 4/3
    assert out[1]["mean_token_df"] == round(4 / 3, 4)
    assert out[2]["n_hapax"] == 1 and out[2]["mean_token_df"] == 1.5
    assert out[3]["n_hapax"] == 3 and out[3]["min_token_df"] == 1
    assert out[3]["mean_token_df"] == 1.0


def test_token_rarity_counts_docs_not_occurrences(spark):
    """df is DOCUMENT frequency: repeating a token within one document
    must not raise its df."""
    df = _docs(spark, [(1, "spam spam spam"), (2, "spam ham")])
    out = {r["doc_id"]: r.asDict() for r in textops.token_rarity(df).collect()}
    assert out[1]["n_distinct_tokens"] == 1
    assert out[1]["mean_token_df"] == 2.0  # spam appears in 2 docs, not 4 times
    assert out[2]["min_token_df"] == 1  # ham


def test_length_quantiles_interpolation(spark):
    """p90 over lengths [1..5] must interpolate: pos = 0.9*4 = 3.6 ->
    4 + 0.6*(5-4) = 4.6 chars."""
    from slice_db_spark.operators.text import length_quantiles

    docs = spark.createDataFrame(
        [(i, "x" * i, "s") for i in range(1, 6)],
        "doc_id bigint, text string, source string",
    )
    row = length_quantiles(docs).collect()[0]
    assert row["n_docs"] == 5
    assert row["p50_chars"] == 3.0
    assert abs(row["p90_chars"] - 4.6) < 1e-9


def test_bigram_table_occurrences_and_short_docs(spark):
    from slice_db_spark.operators.text import bigram_table

    df = _docs(spark, [(1, "a b a b"), (2, "solo"), (3, "")])
    got = [(r.doc_id, r.w1, r.w2) for r in bigram_table(df).collect()]
    # occurrences kept: "a b" twice, "b a" once; <2-token docs emit nothing
    assert sorted(got) == [(1, "a", "b"), (1, "a", "b"), (1, "b", "a")]


def test_lm_bigram_score_hand_computed(spark):
    """Two-doc corpus; verify the smoothed conditional math by hand.

    Corpus: doc1 = "a b a b", doc2 = "a b c".  Bigram counts:
    (a,b)=3, (b,a)=1, (b,c)=1; prefix counts: a=3, b=2; V=|{a,b,c}|=3.
    p(a,b) = (3+1)/(3+3) = 2/3 -> floor(666666.66...) = 666666
    p(b,a) = (1+1)/(2+3) = 0.4 -> 400000
    p(b,c) = (1+1)/(2+3) = 0.4 -> 400000
    doc1: (2*666666 + 400000)/3 = 577777.3333
    doc2: (666666 + 400000)/2  = 533333.0
    """
    from slice_db_spark.operators.text import lm_bigram_score

    df = _docs(spark, [(1, "a b a b"), (2, "a b c")])
    out = {r.doc_id: r.asDict() for r in lm_bigram_score(df).collect()}
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 2
    assert out[1]["lm_score"] == round((2 * 666666 + 400000) / 3, 4)
    assert out[2]["lm_score"] == 533333.0


def test_ngram_topk_counts_and_tiebreak(spark):
    from slice_db_spark.operators.text import ngram_topk

    df = _docs(spark, [(1, "a b a b"), (2, "a b c"), (3, "z")])
    rows = [(r.gram, r.n_occ) for r in ngram_topk(df, n=2, k=3).collect()]
    # "a b" x3; then ties ("b a", "b c") break lexicographically
    assert rows == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_bm25_topk_ranking_and_saturation(spark):
    """BM25 invariants on crafted docs: more matching terms outrank
    repetition of one term (tf saturation), non-matching docs are absent,
    and ties break on doc_id."""
    from slice_db_spark.operators.text import bm25_topk

    df = _docs(spark, [
        (1, "spark window"),                 # two distinct terms
        (2, "spark spark spark spark"),      # one term, repeated
        (3, "nothing relevant here at all"),
        (4, "spark window"),                 # tie with doc 1
    ])
    rows = [(r.doc_id, r.score_fx, r.n_terms) for r in bm25_topk(df, "spark window").collect()]
    ids = [r[0] for r in rows]
    assert 3 not in ids
    assert ids[0] == 1 and ids[1] == 4          # tie -> id order
    assert rows[0][1] == rows[1][1]             # identical docs, equal score
    d = dict((i, (s, n)) for i, s, n in rows)
    assert d[1][1] == 2 and d[2][1] == 1
    assert d[1][0] > d[2][0]                    # 2 terms beat saturated 1-term


def test_feature_hash_signed_routing(spark):
    """Hand-check: same token's occurrences land on one (dim, sign) cell;
    weights are signed counts; empty docs emit nothing."""
    import hashlib

    from slice_db_spark.operators.text import feature_hash_table

    df = _docs(spark, [(1, "spark spark duck"), (2, "")])
    got = {(r.doc_id, r.dim_idx): r.weight for r in feature_hash_table(df, dim=8).collect()}
    def cell(tok):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)  # == hash64
        return h % 8, 1 if (h >> 32) % 2 == 1 else -1
    d_spark, s_spark = cell("spark")
    d_duck, s_duck = cell("duck")
    if d_spark == d_duck:
        assert got[(1, d_spark)] == 2 * s_spark + s_duck
    else:
        assert got[(1, d_spark)] == 2 * s_spark and got[(1, d_duck)] == s_duck
    assert not any(k[0] == 2 for k in got)


def test_tfidf_top_terms_prefers_rare_tokens(spark):
    """A token unique to one doc outranks corpus-wide tokens even at
    equal tf; ranks are contiguous from 1 and capped at k."""
    df = spark.createDataFrame(
        [(1, "shared shared unique"), (2, "shared common"), (3, "shared common")],
        "doc_id bigint, text string",
    )
    out = textops.tfidf_top_terms(df, k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # doc 1: 'unique' df=1 -> idf 3e6, score 3e6; 'shared' tf=2 df=3 -> 2e6
    assert rows[(1, 1)].token == "unique" and rows[(1, 1)].score == 3_000_000
    assert rows[(1, 2)].token == "shared" and rows[(1, 2)].score == 2_000_000
    # docs 2/3: 'common' df=2 -> floor(3e6/2)=1.5e6 beats 'shared' 1e6
    assert rows[(2, 1)].token == "common" and rows[(2, 1)].score == 1_500_000
    assert max(r for (_, r) in rows) == 2


def test_tfidf_tie_breaks_on_token(spark):
    """Equal scores order alphabetically — deterministic top-k."""
    df = spark.createDataFrame([(1, "beta alpha")], "doc_id bigint, text string")
    out = [r.token for r in textops.tfidf_top_terms(df, k=2).orderBy("rank").collect()]
    assert out == ["alpha", "beta"]


def test_collocations_lift_exact(spark):
    """A pair that always co-occurs gets lift > 1e6 (ppm); the exact
    floor arithmetic matches the hand computation."""
    # corpus: "new york" 5 times (for min_count), "new day" 5, "old day" 5
    docs = [(i, "new york") for i in range(5)]
    docs += [(i + 5, "new day") for i in range(5)]
    docs += [(i + 10, "old day") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {(r.w1, r.w2): r for r in textops.collocations(df, min_count=5, k=10).collect()}
    # totals: 30 tokens, 15 bigram occurrences
    # new york: n_ab=5, n_new=10, n_york=5 -> (1e6*5/15)*(30/10)*(30/5) = 6e6
    assert out[("new", "york")].lift_ppm == 5_999_999 or out[("new", "york")].lift_ppm == 6_000_000
    # old day: n_ab=5, n_old=5, n_day=10 -> same lift by symmetry
    assert out[("old", "day")].lift_ppm == out[("new", "york")].lift_ppm
    assert out[("new", "day")].lift_ppm < out[("new", "york")].lift_ppm
    assert all(r.n_ab >= 5 for r in out.values())


def test_source_token_drift_uniform_vs_skewed(spark):
    """The corpus-dominant source sits near the corpus profile; a small
    source speaking a disjoint vocabulary scores far higher.  Cell
    arithmetic pinned to the defined per-cell-floor semantics: the
    dominant alpha/beta cells are (8−6.4)²/6.4 = 0.4 each, whose DOUBLE
    value floors to 399999 ppm (6.4 is not binary-exact — the floor of
    the double is the contract, both engines); the skewed omega cell
    (4−0.8)²/0.8 floors to 12800000 ppm."""
    mixed = [(i, "alpha beta", "dominant") for i in range(8)]
    skew = [(10 + i, "omega omega", "skewed") for i in range(2)]
    df = spark.createDataFrame(mixed + skew, "doc_id bigint, text string, source string")
    out = {r.source: r for r in textops.source_token_drift(df, top_v=10).collect()}
    assert out["dominant"].n_tokens == 16 and out["skewed"].n_tokens == 4
    assert out["dominant"].chi2_ppm == 2 * 399_999
    assert out["skewed"].chi2_ppm == 12_800_000


def test_token_windows_boundaries(spark):
    """Chunk-count and remainder arithmetic at the window boundaries:
    exactly-w tokens → one chunk; w+1 → two (second keeps the stride
    remainder); empty/punctuation-only docs yield nothing."""
    from slice_db_spark.operators import text as T

    w, s = 8, 6
    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame(
        [(1, mk(8)), (2, mk(9)), (3, mk(5)), (4, ""), (5, "!!! ...")],
        "doc_id bigint, text string",
    )
    rows = T.token_windows(df, window=w, stride=s).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"]))
    for v in got.values():
        v.sort()
    assert got == {
        1: [(0, 8)],          # exactly w → one full chunk
        2: [(0, 8), (1, 3)],  # w+1 → second chunk = tokens 7..9 (w+1-s)
        3: [(0, 5)],          # short doc → single partial chunk
    }


def test_token_windows_overlap_hashes(spark):
    """Adjacent chunks overlap by window−stride tokens: with a periodic
    token stream whose period equals the stride, every full window hashes
    identically — pins that slicing starts advance by exactly stride."""
    from slice_db_spark.operators import text as T

    text = " ".join(f"w{i % 6}" for i in range(26))  # period 6 == stride
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(
        T.token_windows(df, window=12, stride=6).collect(),
        key=lambda r: r["chunk_idx"],
    )
    full = [r for r in rows if r["n_tokens"] == 12]
    assert len(full) >= 2 and len({r["chunk_hash"] for r in full}) == 1


def test_tokenizer_fertility_punctuation(spark):
    """Punctuation costs BPE pre-tokens but not words: "hello, world!!"
    is 2 words but 4 pre-tokens (hello + , + world + !!) → fertility
    2.0; a plain two-word doc stays at 1.0."""
    from slice_db_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "en", "hello, world!!"), (2, "de", "guten tag")],
        "doc_id bigint, lang string, text string",
    )
    got = {r["lang"]: r for r in T.tokenizer_fertility(df).collect()}
    assert got["en"]["n_words"] == 2 and got["en"]["n_bpe"] == 4
    assert got["en"]["fertility"] == 2.0
    assert got["de"]["n_words"] == 2 and got["de"]["n_bpe"] == 2
    assert got["de"]["fertility"] == 1.0


def test_char_diversity_repetition_vs_random(spark):
    """'abab...' has exactly 2 distinct 4-grams no matter the length;
    a non-repeating sequence keeps diversity at 1.0."""
    import slice_db_spark.plans.queries as Q

    rows = [(1, "ab" * 40), (2, "abcdefghijklmnopqrstuvwxyz0123456789")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    Q._CATALOGS["__cd__"] = {"documents": df}
    try:
        got = {r["doc_id"]: r for r in Q.char_diversity(spark, "__cd__").collect()}
    finally:
        del Q._CATALOGS["__cd__"]
    assert got[1]["n_distinct"] == 2 and got[1]["n_grams"] == 77
    assert got[2]["n_distinct"] == got[2]["n_grams"] == 33
    assert got[2]["diversity_ppm"] == 1_000_000


def test_bpe_train_merges_sennrich_golden(spark):
    """The canonical BPE example (Sennrich et al. 2016 §3.2 shape): the
    learned merge sequence, counts, and the lexicographic tie-break at
    round 6 ('e w' beats 'n e' on equal count) are pinned."""
    from slice_db_spark.operators.text import bpe_train_merges

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = [tuple(r) for r in bpe_train_merges(df, rounds=6).collect()]
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "est", "</w>", 9),
        (4, "l", "o", 7),
        (5, "lo", "w", 7),
        (6, "e", "w", 6),
    ]


def test_bpe_train_merges_adjacent_overlap_greedy(spark):
    """Greedy left-to-right non-overlap: 'aaaa' merges (a,a) twice
    ('aa aa'), 'aaa' merges once ('aa a') — the double-space replace
    construction must reproduce the classic scan, not the shared-space
    artifact that drops adjacent occurrences."""
    from slice_db_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([(1, "aaaa aaaa aaa")], "doc_id bigint, text string")
    got = [tuple(r) for r in bpe_train_merges(df, rounds=2).collect()]
    # round 1: 'a a a a </w>' has (a,a) 3x (word count 2) + 'a a a </w>'
    # 2x (count 1) = 8 — the overlap-aware greedy count
    assert got[0] == (1, "a", "a", 8)
    # round 2 proves BOTH adjacent occurrences merged in round 1
    # ('aa aa </w>', not 'aa a a </w>'): (aa,aa)=2 ties (aa,</w>)=2 and
    # the lexicographic tie-break picks 'aa </w>' ('<' sorts before 'a')
    assert got[1] == (2, "aa", "</w>", 2)


def test_bpe_batched_equals_serial_trained_vocabulary(spark):
    """Batched training (k=4) reaches the SAME fully-merged vocabulary
    as the serial learner on a corpus of disjoint-alphabet words, with
    the same total merge count — the output-level equivalence that holds
    for batching (the merge ORDER legitimately differs: serial is
    chain-greedy down each word, batched is breadth-first across
    words)."""
    from slice_db_spark.operators.text import _bpe_train, bpe_train_merges

    text = " ".join(["zy"] * 9 + ["xw"] * 7 + ["vu"] * 5 + ["ts"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    serial = bpe_train_merges(df, rounds=8).collect()
    batched = bpe_train_merges(df, rounds=4, batch_merges=4).collect()
    # both learners exhaust the corpus: 4 words x 2 merges each
    assert len(serial) == len(batched) == 8
    # identical final vocabulary segmentation (every word one symbol)
    _, vs = _bpe_train(df, 8, "text")
    _, vb = _bpe_train(df, 4, "text", batch_merges=4)
    assert sorted(map(tuple, vs.collect())) == sorted(map(tuple, vb.collect()))
    # and batched got there in fewer driver rounds than merges
    assert len({r.merge_round for r in batched}) == 8


def test_bpe_batched_k1_is_exactly_serial_sennrich(spark):
    """batch_merges=1 is bit-identical to the classic serial learner on
    the Sennrich example (same collect path, same tie-breaks)."""
    from slice_db_spark.operators.text import bpe_train_merges

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    a = [tuple(r) for r in bpe_train_merges(df, rounds=6).collect()]
    b = [tuple(r) for r in bpe_train_merges(df, rounds=6, batch_merges=1).collect()]
    assert a == b


def test_bpe_batched_round_picks_are_disjoint_and_counted_at_round_start(spark):
    """Within a batched round every pick is symbol-disjoint from the
    others and carries the round-START pair count (invariant under the
    other picks' application — the correctness condition for applying
    the batch as one chained replace).  Pinned on Sennrich where the
    approximation visibly diverges from serial (documented)."""
    from slice_db_spark.operators.text import bpe_train_merges

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = [tuple(r) for r in bpe_train_merges(df, rounds=1, batch_merges=4).collect()]
    # round-1 ranking: 'e s'=9, 's t'=9 (skip: shares s), 't </w>'=9,
    # 'w e'=8 (skip: shares e), 'l o'=7, 'o w'=7 (skip: shares o),
    # 'e w'/'n e'=6 (skip: share e), 'w </w>'=5 (skip), 'd e'=3 (skip),
    # 'i d'=3
    assert got == [
        (1, "e", "s", 9),
        (2, "t", "</w>", 9),
        (3, "l", "o", 7),
        (4, "i", "d", 3),
    ]
    used = set()
    for _, a, b, _n in got:
        assert a not in used and b not in used
        used.update((a, b))
