"""Property-based tests (hypothesis) for pure-Python contract surfaces:
the SQL statement splitter and the transform library's invariants.
No Spark session — these run in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from slice_db_spark.functions import transforms as T
from slice_db_spark.sources.ddl import parse_statements, split_statements

# statements over a small alphabet that stresses the splitter's states
_sql_text = st.text(alphabet="ab;'\"-\n ", max_size=60)


def _balanced(text: str) -> bool:
    try:
        list(parse_statements(text))
        return True
    except ValueError:
        return False


@given(_sql_text)
@settings(max_examples=300)
def test_splitter_reassembles_input(text):
    """Concatenating the yielded segments with ';' reproduces the input
    exactly (the splitter never drops or reorders bytes)."""
    if not _balanced(text):
        return  # unterminated quote — error contract covered below
    segs = list(parse_statements(text))
    joined = ";".join(segs)
    # the final top-level ';' (if any) is consumed as a separator; a ';'
    # inside a trailing comment/quote stays part of its segment
    assert joined == text or (text.endswith(";") and joined == text[:-1])


@given(_sql_text)
@settings(max_examples=300)
def test_splitter_segments_hold_no_top_level_semicolon(text):
    """No yielded segment contains a top-level ';' (quotes/comments may)."""
    if not _balanced(text):
        return
    for seg in parse_statements(text):
        # re-splitting a single segment must yield itself
        assert list(parse_statements(seg)) in ([seg], [])


@given(st.text(max_size=50))
@settings(max_examples=200)
def test_split_statements_members_are_stripped_nonempty(text):
    if not _balanced(text):
        return
    for s in split_statements(text):
        assert s == s.strip() and s


@given(st.text(max_size=40), st.text(alphabet="ab", min_size=1, max_size=8))
@settings(max_examples=200)
def test_alphanumeric_preserves_shape(value, pepper):
    """T1 invariant: per-character class (upper/lower/digit/other) is
    preserved; non-alnum characters pass through verbatim."""
    out = T.alphanumeric(pepper)(value)
    assert out is not None and len(out) == len(value)
    for a, b in zip(value, out):
        if a.isupper():
            assert b.isupper()
        elif a.islower():
            assert b.islower()
        elif a.isdigit():
            assert b.isdigit()
        else:
            assert b == a


@given(st.text(max_size=40))
@settings(max_examples=200)
def test_transforms_deterministic(value):
    """Same pepper + value → same output; different pepper → (almost
    always) different RNG stream but never a crash."""
    t1 = T.alphanumeric("pep")
    assert t1(value) == t1(value)
    assert T.word("pep")(value) == T.word("pep")(value)


@given(st.integers(min_value=0, max_value=99999))
@settings(max_examples=100)
def test_geozip_prefix_contract(z):
    """T14: output is a 5-digit zip; when the input prefix exists in the
    wordlist the output shares its first 3 digits."""
    from slice_db_spark.data.wordlists import zips_by_prefix

    text = str(z).zfill(5)
    out = T.geozip("pep")(text)
    assert out is not None and len(out) == 5 and out.isdigit()
    if text[:3] in zips_by_prefix():
        assert out[:3] == text[:3]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_regimes_agree(spark, edges):
    """Driver union-find and the distributed min-label loop must produce
    identical (id, rep) labelings on arbitrary pair graphs."""
    from slice_db_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a bigint, id_b bigint"
    )
    driver = {tuple(r) for r in dedup.connected_components(pairs).collect()}
    dist = {tuple(r) for r in dedup.connected_components(pairs, driver_rows=0).collect()}
    assert driver == dist


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), max_size=64),
    st.integers(min_value=1, max_value=192000),
)
@settings(max_examples=200)
def test_wav_roundtrip_property(samples, rate):
    from slice_db_spark.operators.multimodal import decode_wav, encode_wav

    got_rate, got = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate and got == samples


@given(st.integers(min_value=1, max_value=17), st.integers(min_value=1, max_value=17), st.randoms())
@settings(max_examples=100)
def test_bmp_roundtrip_property(w, h, rnd):
    import numpy as np

    from slice_db_spark.operators.multimodal import decode_bmp, encode_bmp

    px = np.array(
        [[[rnd.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)],
        dtype="uint8",
    )
    gw, gh, back = decode_bmp(encode_bmp(w, h, px))
    assert (gw, gh) == (w, h)
    assert np.array_equal(px, back)


@given(
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=4),
    st.randoms(),
)
@settings(max_examples=60, deadline=None)
def test_gif_animated_roundtrip_property(w, h, n_frames, rnd):
    """r9: encode_gif_animated -> gif_frames/gif_anim_info round-trips
    arbitrary frame stacks and delays byte-exact (real LZW both ways,
    strict GCE framing)."""
    import numpy as np

    from slice_db_spark.operators.multimodal import (
        encode_gif_animated, gif_anim_info, gif_frames,
    )

    frames = np.array(
        [[[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
         for _ in range(n_frames)],
        dtype="uint8",
    )
    delays = [rnd.randrange(1000) for _ in range(n_frames)]
    p = encode_gif_animated(w, h, frames, delays)
    assert gif_anim_info(p) == (w, h, n_frames, sum(delays))
    gw, gh, back = gif_frames(p)
    assert (gw, gh) == (w, h)
    assert np.array_equal(back[:, :, :, 0], frames)


@given(
    st.integers(min_value=4, max_value=16),
    st.integers(min_value=4, max_value=16),
    st.integers(min_value=1, max_value=4),
    st.randoms(),
)
@settings(max_examples=40, deadline=None)
def test_gif_compositing_property(sw, sh, n_frames, rnd):
    """r10: encode_gif_frames -> gif_frames agrees with an independent
    numpy canvas compositor over RANDOM frame specs — offsets, sizes,
    disposal methods 0-3, transparency indexes, and interlace flags all
    drawn arbitrarily."""
    import numpy as np

    from slice_db_spark.operators.multimodal import (
        encode_gif_frames, gif_frames,
    )

    specs = []
    for _ in range(n_frames):
        fw = rnd.randrange(1, sw + 1)
        fh = rnd.randrange(1, sh + 1)
        x = rnd.randrange(sw - fw + 1)
        y = rnd.randrange(sh - fh + 1)
        px = np.array(
            [[rnd.randrange(256) for _ in range(fw)] for _ in range(fh)],
            dtype="uint8",
        )
        specs.append({
            "px": px, "x": x, "y": y,
            "delay_cs": rnd.randrange(100),
            "disposal": rnd.randrange(4),
            "transparent": rnd.choice([None, rnd.randrange(256)]),
            "interlaced": rnd.random() < 0.5,
        })
    p = encode_gif_frames(sw, sh, specs, bg_index=rnd.randrange(256))
    bg = p[11]  # LSD background index; gray palette -> gray value
    gw, gh, got = gif_frames(p)
    assert (gw, gh) == (sw, sh)

    canvas = np.full((sh, sw), bg, dtype=np.uint8)
    for i, s in enumerate(specs):
        fh, fw = s["px"].shape
        x, y = s["x"], s["y"]
        region = canvas[y:y + fh, x:x + fw]
        prev = region.copy()
        if s["transparent"] is None:
            region[:] = s["px"]
        else:
            vis = s["px"] != s["transparent"]
            region[vis] = s["px"][vis]
        # gray palette: every RGB channel equals the index
        assert np.array_equal(got[i][:, :, 0], canvas), i
        assert np.array_equal(got[i][:, :, 1], canvas), i
        if s["disposal"] == 2:
            canvas[y:y + fh, x:x + fw] = bg
        elif s["disposal"] == 3:
            canvas[y:y + fh, x:x + fw] = prev


@given(
    st.integers(min_value=4, max_value=24),
    st.integers(min_value=4, max_value=24),
    st.integers(min_value=1, max_value=5),
    st.randoms(),
)
@settings(max_examples=40, deadline=None)
def test_gif_matte_compositing_property(sw, sh, n_frames, rnd):
    """r11: the RGBA canvas flattened against an ARBITRARY matte agrees
    with an independent value-canvas compositor whose never-painted /
    transparent / disposal-2-cleared pixels take the matte value — the
    browser-parity contract over random specs.  (Flatten is pointwise
    and GIF alpha is binary, so the value model is exact.)"""
    import numpy as np

    from slice_db_spark.operators.multimodal import (
        encode_gif_frames, gif_frames,
    )

    specs = []
    for _ in range(n_frames):
        fw = rnd.randrange(1, sw + 1)
        fh = rnd.randrange(1, sh + 1)
        x = rnd.randrange(sw - fw + 1)
        y = rnd.randrange(sh - fh + 1)
        px = np.array(
            [[rnd.randrange(256) for _ in range(fw)] for _ in range(fh)],
            dtype="uint8",
        )
        specs.append({
            "px": px, "x": x, "y": y,
            "delay_cs": rnd.randrange(100),
            "disposal": rnd.randrange(4),
            "transparent": rnd.choice([None, rnd.randrange(256)]),
            "interlaced": rnd.random() < 0.5,
        })
    p = encode_gif_frames(sw, sh, specs, bg_index=rnd.randrange(256))
    mv = rnd.randrange(256)
    gw, gh, got = gif_frames(p, matte=(mv, mv, mv))
    assert (gw, gh) == (sw, sh)

    canvas = np.full((sh, sw), mv, dtype=np.uint8)
    for i, s in enumerate(specs):
        fh, fw = s["px"].shape
        x, y = s["x"], s["y"]
        region = canvas[y:y + fh, x:x + fw]
        prev = region.copy()
        if s["transparent"] is None:
            region[:] = s["px"]
        else:
            vis = s["px"] != s["transparent"]
            region[vis] = s["px"][vis]
        assert np.array_equal(got[i][:, :, 0], canvas), i
        assert np.array_equal(got[i][:, :, 2], canvas), i
        if s["disposal"] == 2:
            canvas[y:y + fh, x:x + fw] = mv  # browser clear + matte
        elif s["disposal"] == 3:
            canvas[y:y + fh, x:x + fw] = prev


@given(
    st.integers(min_value=1, max_value=13),
    st.integers(min_value=1, max_value=13),
    st.booleans(),
    st.randoms(),
)
@settings(max_examples=60, deadline=None)
def test_png_adam7_roundtrip_property(w, h, rgb, rnd):
    """r9: Adam7 interlaced encode -> decode round-trips arbitrary
    images byte-exact, including sizes with EMPTY passes."""
    import numpy as np

    from slice_db_spark.operators.multimodal import (
        decode_png, encode_png, encode_png_interlaced,
    )

    shape = (h, w, 3) if rgb else (h, w)
    px = np.frombuffer(
        bytes(rnd.randrange(256) for _ in range(h * w * (3 if rgb else 1))),
        dtype="uint8",
    ).reshape(shape)
    gw, gh, back = decode_png(encode_png_interlaced(w, h, px))
    assert (gw, gh) == (w, h)
    assert np.array_equal(back, px)
    assert np.array_equal(back, decode_png(encode_png(w, h, px))[2])


@given(
    st.sampled_from([8, 16, 24, 32]),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=1, max_value=40),
    st.randoms(),
)
@settings(max_examples=80, deadline=None)
def test_wav_depths_roundtrip_property(bits, channels, n_frames, rnd):
    """r9: every WAV depth round-trips through the pinned 16-bit-scale
    normalization; the Python model below IS the oracle arithmetic."""
    import math

    from slice_db_spark.operators.multimodal import (
        decode_wav, encode_wav_typed,
    )

    n = n_frames * channels
    if bits == 8:
        raw = [rnd.randrange(256) for _ in range(n)]
        norm = [(b - 128) * 256 for b in raw]
    elif bits == 16:
        raw = [rnd.randrange(65536) - 32768 for _ in range(n)]
        norm = list(raw)
    elif bits == 24:
        raw = [rnd.randrange(1 << 24) - (1 << 23) for _ in range(n)]
        norm = [s >> 8 for s in raw]
    else:
        nums = [rnd.randrange(2049) - 1024 for _ in range(n)]
        raw = [v / 1024.0 for v in nums]
        norm = [min(v * 32, 32767) for v in nums]
    rate, got = decode_wav(encode_wav_typed(raw, 8000, bits, channels))
    if channels == 2:
        norm = [
            (norm[i] + norm[i + 1] + 65536) // 2 - 32768
            for i in range(0, n, 2)
        ]
    assert rate == 8000 and got == norm


# ------------------------------------------------- event-join operators

_timeline = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50)),  # (user, ts_us offset)
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None)
@given(_timeline, _timeline)
def test_asof_join_matches_python_model(spark, lrows, rrows):
    """asof_join == brute-force latest (us, id) right row with us <= l.us."""
    import datetime as dtm

    from slice_db_spark.operators.events import asof_join

    base = dtm.datetime(2024, 1, 1)

    def df_of(rows, start_id):
        return spark.createDataFrame(
            [
                (start_id + i, base + dtm.timedelta(microseconds=us), u)
                for i, (u, us) in enumerate(rows)
            ],
            "event_id bigint, ts timestamp, user_id bigint",
        )

    left, right = df_of(lrows, 0), df_of(rrows, 1000)
    out = {r["l_id"]: r["r_id"] for r in asof_join(left, right).collect()}
    for i, (u, us) in enumerate(lrows):
        cands = [
            (rus, 1000 + j)
            for j, (ru, rus) in enumerate(rrows)
            if ru == u and rus <= us
        ]
        expect = max(cands)[1] if cands else None
        assert out[i] == expect, (i, u, us, cands)


@settings(max_examples=15, deadline=None)
@given(_timeline, _timeline, st.integers(1, 40))
def test_range_pairs_matches_python_model(spark, arows, brows, w_us):
    """range_pairs == brute-force O(n*m) interval filter, every window."""
    import datetime as dtm

    from slice_db_spark.operators.events import range_pairs

    base = dtm.datetime(2024, 1, 1)

    def df_of(rows, start_id):
        return spark.createDataFrame(
            [
                (start_id + i, base + dtm.timedelta(microseconds=us), u)
                for i, (u, us) in enumerate(rows)
            ],
            "event_id bigint, ts timestamp, user_id bigint",
        )

    a, b = df_of(arows, 0), df_of(brows, 1000)
    got = {(r["a_id"], r["b_id"]) for r in range_pairs(a, b, window_us=w_us).collect()}
    want = {
        (i, 1000 + j)
        for i, (ua, ta) in enumerate(arows)
        for j, (ub, tb) in enumerate(brows)
        if ua == ub and ta <= tb <= ta + w_us
    }
    assert got == want


# --------------------------------------------------- PQ / chunk dedup models

_vecs = st.lists(
    st.lists(st.integers(-500, 500).map(lambda v: v / 1000.0), min_size=8, max_size=8),
    min_size=5,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(_vecs)
def test_pq_encode_matches_python_model(spark, vecs):
    """pq_encode == per-subspace integer argmin over the quantized
    subvectors (first-min tie-break)."""
    from slice_db_spark.operators.similarity import pq_codebook, pq_encode

    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, embedding array<float>"
    )
    cb = pq_codebook(corpus, n_codes=4)
    got = {(r["vec_id"], r["m"]): r["code"]
           for r in pq_encode(corpus, cb, m_subspaces=2).collect()}

    def q(x):
        return round(x * 1000)

    for i, v in enumerate(vecs):
        e = [q(x) for x in v]
        for m in range(2):
            s = e[m * 4 : (m + 1) * 4]
            dists = [
                sum((a - b) * (a - b) for a, b in zip(s, c[m * 4 : (m + 1) * 4]))
                for c in cb
            ]
            assert got[(i, m)] == dists.index(min(dists)), (i, m, dists)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=7),
        min_size=1,
        max_size=8,
    )
)
def test_chunk_dedup_matches_python_model(spark, docs):
    """chunk_dedup_stats == brute-force first-occurrence chunk model over
    3-token chunks of arbitrary tiny corpora."""
    from slice_db_spark.operators.dedup import chunk_dedup_stats

    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in chunk_dedup_stats(df, chunk_tokens=3).collect()}

    seen = {}
    want = {}
    for i, toks in enumerate(docs):
        chunks = [toks[p : p + 3] for p in range(0, len(toks), 3)]
        n_dup = kept = 0
        for p, c in enumerate(chunks):
            key = " ".join(c)
            if key in seen:
                n_dup += 1
            else:
                seen[key] = (i, p)
                kept += len(c)
        want[i] = (len(chunks), n_dup, kept)
    for i, (n, d, k) in want.items():
        assert (got[i]["n_chunks"], got[i]["dup_chunks"], got[i]["kept_tokens"]) == (n, d, k), i


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50), st.booleans()),
        max_size=12,
    ),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)), min_size=1, max_size=8),
)
@settings(max_examples=30, deadline=None)
def test_merge_upsert_model_equivalence(spark, changes, base_rows):
    """merge_upsert == the dict model: apply updates (dedup to one row per
    key first, as the contract requires), delete tombstones."""
    from slice_db_spark.operators.cdc import merge_upsert

    base = {}
    for k, v in base_rows:
        base[k] = v
    # contract: at most one change row per key — collapse by LAST occurrence
    chg = {}
    for k, v, d in changes:
        chg[k] = (v, d)
    model = dict(base)
    for k, (v, d) in chg.items():
        if d:
            model.pop(k, None)
        else:
            model[k] = v

    bdf = spark.createDataFrame(list(base.items()), "k bigint, v bigint")
    if chg:
        cdf = spark.createDataFrame(
            [(k, v, d) for k, (v, d) in chg.items()], "k bigint, v bigint, del boolean"
        )
        out = merge_upsert(bdf, cdf, ["k"], delete_col="del")
    else:
        out = bdf
    assert {(r.k, r.v) for r in out.collect()} == set(model.items())


@given(
    st.dictionaries(
        st.integers(0, 3),
        st.lists(st.integers(1, 100), min_size=1, max_size=4, unique=True),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=20, deadline=None)
def test_scd2_intervals_partition_timeline(spark, changes_by_key):
    """SCD2 invariant: per key, the produced intervals tile [0, inf) with
    no gaps or overlaps, and exactly one row stays open."""
    from slice_db_spark.operators.cdc import scd2_apply

    keys = sorted(changes_by_key)
    dim = spark.createDataFrame(
        [(k, -1, 0, None) for k in keys],
        "k bigint, attr bigint, valid_from bigint, valid_to bigint",
    )
    rows = [
        (k, t, t) for k, ts in changes_by_key.items() for t in sorted(ts)
    ]
    ch = spark.createDataFrame(rows, "k bigint, attr bigint, eff bigint")
    out = scd2_apply(dim, ch, ["k"], effective_col="eff").collect()
    for k in keys:
        ivs = sorted(
            (r.valid_from, r.valid_to) for r in out if r.k == k
        )
        assert ivs[0][0] == 0
        opens = [iv for iv in ivs if iv[1] is None]
        assert len(opens) == 1 and ivs[-1] == opens[0]
        for (a, b), (c, d) in zip(ivs, ivs[1:]):
            assert b == c  # contiguous: close of one = open of next


def test_price_qty_corr_exact_moments(spark):
    """Crafted perfectly-correlated and anti-correlated groups: corr must
    hit ±1.0 exactly (the moments are exact integers, so no float noise)
    and the OLS slope must match the planted line."""
    from slice_db_spark.plans.queries import price_qty_corr
    import slice_db_spark.plans.queries as Q

    rows = []
    # flag 'P': y = 3x exactly → corr 1, slope 3 (cents scale preserved)
    for i in range(1, 21):
        rows.append(("P", float(i), float(3 * i)))
    # flag 'N': y = -2x + 100 → corr -1, slope -2
    for i in range(1, 21):
        rows.append(("N", float(i), float(100 - 2 * i)))
    df = spark.createDataFrame(rows, "l_returnflag string, l_quantity double, l_extendedprice double")
    Q._CATALOGS["__corr_test__"] = {"lineitem": df}
    try:
        got = {r["l_returnflag"]: r for r in price_qty_corr(spark, "__corr_test__").collect()}
    finally:
        del Q._CATALOGS["__corr_test__"]
    assert got["P"]["corr"] == 1.0 and got["P"]["slope_cents"] == 3.0
    assert got["N"]["corr"] == -1.0 and got["N"]["slope_cents"] == -2.0


def test_weighted_sample_inclusion_scales_with_weight(spark):
    """Priority sampling property: with heavy (10x) and light weights in
    one pool, the top-k sample must include heavy items at a far higher
    rate; determinism: two runs produce the identical set."""
    import slice_db_spark.plans.queries as Q
    from slice_db_spark.plans.queries import weighted_sample

    rows = [(i, "x", 5000 if i % 10 == 0 else 500) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")
    Q._CATALOGS["__ws__"] = {"documents": df}
    try:
        s1 = {r["doc_id"] for r in weighted_sample(spark, "__ws__").collect()}
        s2 = {r["doc_id"] for r in weighted_sample(spark, "__ws__").collect()}
    finally:
        del Q._CATALOGS["__ws__"]
    assert s1 == s2 and len(s1) == 200
    heavy = {i for i in range(2000) if i % 10 == 0}          # 200 of 2000
    heavy_rate = len(s1 & heavy) / len(heavy)                 # of 200 heavy
    light_rate = len(s1 - heavy) / 1800
    assert heavy_rate > 4 * light_rate
    assert heavy_rate > 0.5


# ------------------------------------------------------------- PNG codec

_png_shape = st.tuples(
    st.integers(min_value=1, max_value=12),   # width
    st.integers(min_value=1, max_value=12),   # height
    st.booleans(),                            # grayscale?
)


@given(
    _png_shape,
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.lists(st.integers(min_value=0, max_value=4), min_size=12, max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(shape, seed, filters):
    """decode(encode(px)) == px for arbitrary sizes, contents, and
    per-scanline filter assignments (mixed within one image)."""
    import numpy as np

    from slice_db_spark.operators.multimodal import decode_png, encode_png

    w, h, gray = shape
    rng = np.random.RandomState(seed % (2**32))
    px = rng.randint(0, 256, (h, w) if gray else (h, w, 3)).astype("uint8")
    payload = encode_png(w, h, px, row_filters=filters[:h])
    w2, h2, out = decode_png(payload)
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, px)


@given(st.binary(max_size=80))
@settings(max_examples=120, deadline=None)
def test_png_decode_never_crashes_on_garbage(payload):
    """Arbitrary bytes either decode (only if they are a real PNG we
    produced — vanishingly unlikely here) or raise ValueError; never any
    other exception type (the quarantine contract)."""
    from slice_db_spark.operators.multimodal import decode_png

    try:
        decode_png(payload)
    except ValueError:
        pass


@given(
    st.integers(1, 3),                      # n_frames
    st.integers(1, 12), st.integers(1, 9),  # w, h
    st.integers(0, 2**32 - 1),              # content seed
)
@settings(max_examples=30, deadline=None)
def test_y4m_roundtrip_property(n, w, h, seed):
    """Any uint8 frame stack survives the Y4M container bit-exactly."""
    import numpy as np

    from slice_db_spark.operators.multimodal import decode_y4m, encode_y4m

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    w2, h2, out = decode_y4m(encode_y4m(w, h, px))
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, px)


@given(
    st.integers(1, 3), st.integers(1, 2),   # block grid (bw, bh)
    st.integers(0, 2**32 - 1),              # block-value seed
)
@settings(max_examples=25, deadline=None)
def test_jpeg_exact_roundtrip_property(bw, bh, seed):
    """The oracle-bearing construction holds for ARBITRARY even-offset
    constant blocks, not just the synth formula: any 8x8-block-constant
    image with even (v - 128) offsets survives quantize/Huffman/IDCT at
    q=16 bit-exactly."""
    import numpy as np

    from slice_db_spark.operators.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    blocks = (128 + 2 * rng.integers(-64, 64, (bh, bw))).clip(0, 254)
    px = np.kron(blocks, np.ones((8, 8))).astype(np.uint8)
    w, h = bw * 8, bh * 8
    w2, h2, out = decode_jpeg(encode_jpeg(w, h, px))
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, px)


@given(
    st.integers(1, 30), st.integers(1, 30),  # arbitrary pixel dims
    st.integers(0, 2**32 - 1),               # pixel seed
    st.sampled_from([2, 4, 16]),             # quant step
    st.integers(0, 4),                       # restart interval (0 = off)
)
@settings(max_examples=30, deadline=None)
def test_jpeg_progressive_equals_baseline_property(w, h, seed, quant, rst):
    """For ARBITRARY images, the progressive scan script decodes to
    exactly the baseline decoder's pixels — same quantized coefficients,
    different bit order.  Covers EOB runs, refinement correction bits,
    edge-padded partial blocks, and restart intervals."""
    import numpy as np

    from slice_db_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(w, h, px, quant=quant))
    prog = decode_jpeg(
        encode_jpeg_progressive(w, h, px, quant=quant, restart_interval=rst)
    )
    assert (base[0], base[1]) == (prog[0], prog[1]) == (w, h)
    assert np.array_equal(base[2], prog[2])


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_phash_brightness_invariance_property(seed):
    """pHash is EXACTLY brightness-invariant whenever the shift doesn't
    clip: adding a constant to every pixel moves only the DC
    coefficient, and the hash reads ACs against their own median."""
    import numpy as np

    from slice_db_spark.operators.multimodal import (
        PHASH_DCT_K,
        encode_bmp,
        phash_media,  # noqa: F401  (spark-side; hash math replicated below)
    )

    K = np.array(PHASH_DCT_K, dtype=np.int64)

    def phash_of(g):
        coef = K @ g.astype(np.int64) @ K.T
        ac = coef.ravel()[1:]
        med = int(np.sort(ac)[31])
        return sum(1 << i for i, v in enumerate(ac) if v > med)

    rng = np.random.default_rng(seed)
    g = rng.integers(0, 240, (8, 8))
    assert phash_of(g) == phash_of(g + 7)


@given(st.integers(0, 2**32 - 1), st.integers(2, 5))
@settings(max_examples=25, deadline=None)
def test_audio_fingerprint_amplitude_invariance_property(seed, scale):
    """The energy-delta fingerprint is EXACTLY invariant under any
    positive amplitude scaling: energies scale by scale² > 0, so every
    adjacent-window comparison keeps its truth value."""
    import random

    rng = random.Random(seed)
    samples = [rng.randint(-2048, 2048) for _ in range(1550)]

    def fp(s):
        e = [sum(x * x for x in s[w * 50 : (w + 1) * 50]) for w in range(31)]
        return sum(1 << w for w in range(30) if e[w + 1] > e[w])

    assert fp(samples) == fp([scale * x for x in samples])


@given(
    st.integers(min_value=3, max_value=12),
    st.integers(min_value=3, max_value=12),
    st.integers(min_value=1, max_value=4),
    st.randoms(),
)
@settings(max_examples=30, deadline=None)
def test_apng_compositing_property(sw, sh, n_frames, rnd):
    """r11: encode_apng_frames -> _apng_decode_frames_rgba + the
    alpha-weighted flatten agree with an INDEPENDENT scalar compositor
    over random specs — offsets, sizes, dispose 0-2, blend SOURCE/OVER,
    per-pixel fractional alpha.  The model keeps a straight-RGBA canvas
    of exact rationals (fractions.Fraction, per-pixel Python loops) and
    rounds half-up at each emit, which provably equals the engine's
    (num + den//2) // den integer form — so any vectorized indexing,
    broadcast, dispose-region, or blend-denominator bug diverges."""
    from fractions import Fraction

    import numpy as np

    from slice_db_spark.operators.multimodal import (
        _apng_decode_frames_rgba, _rgba_flatten, encode_apng_frames,
    )

    def half_up(x):
        return int((2 * x.numerator + x.denominator)
                   // (2 * x.denominator)) if isinstance(x, Fraction) else x

    specs = []
    for i in range(n_frames):
        if i == 0:
            fw, fh, x, y = sw, sh, 0, 0  # IDAT frame: full canvas
        else:
            fw = rnd.randrange(1, sw + 1)
            fh = rnd.randrange(1, sh + 1)
            x = rnd.randrange(sw - fw + 1)
            y = rnd.randrange(sh - fh + 1)
        px = np.zeros((fh, fw, 4), dtype=np.uint8)
        for r in range(fh):
            for c in range(fw):
                v = rnd.randrange(256)
                a = rnd.choice([0, 255, rnd.randrange(256)])
                px[r, c] = (v, v, v, a)
        specs.append({
            "px": px, "x": x, "y": y,
            "dispose": rnd.randrange(3), "blend": rnd.choice([0, 1]),
        })
    payload = encode_apng_frames(sw, sh, specs)
    gw, gh, got, _bg, _plays = _apng_decode_frames_rgba(payload)
    assert (gw, gh) == (sw, sh) and len(got) == n_frames

    canvas = [[(0, 0) for _ in range(sw)] for _ in range(sh)]  # (v, a)
    mv = rnd.randrange(256)
    for i, s in enumerate(specs):
        fh, fw = s["px"].shape[:2]
        x, y = s["x"], s["y"]
        prev = [row[x:x + fw] for row in canvas[y:y + fh]]
        prev = [list(r) for r in prev]
        for r in range(fh):
            for c in range(fw):
                v, a = int(s["px"][r, c, 0]), int(s["px"][r, c, 3])
                if s["blend"] == 0:
                    canvas[y + r][x + c] = (v, a)
                else:
                    bv, ba = canvas[y + r][x + c]
                    fa, fb = Fraction(a, 255), Fraction(ba, 255)
                    oa = fa + fb * (1 - fa)
                    if oa == 0:
                        canvas[y + r][x + c] = (0, 0)
                    else:
                        oc = (v * fa + bv * fb * (1 - fa)) / oa
                        canvas[y + r][x + c] = (
                            half_up(oc), half_up(oa * 255)
                        )
        for r in range(sh):
            for c in range(sw):
                ev, ea = canvas[r][c]
                assert got[i][r, c, 0] == ev, (i, r, c)
                assert got[i][r, c, 3] == ea, (i, r, c)
        # flatten against a random matte: exact alpha weighting
        flat = _rgba_flatten(got[i], (mv, mv, mv))
        for r in range(sh):
            for c in range(sw):
                ev, ea = canvas[r][c]
                want = half_up(Fraction(ev * ea + mv * (255 - ea), 255))
                assert flat[r, c, 0] == want, (i, r, c)
        dispose = s["dispose"]
        if dispose == 1 or (dispose == 2 and i == 0):
            for r in range(fh):
                for c in range(fw):
                    canvas[y + r][x + c] = (0, 0)
        elif dispose == 2:
            for r in range(fh):
                for c in range(fw):
                    canvas[y + r][x + c] = prev[r][c]
