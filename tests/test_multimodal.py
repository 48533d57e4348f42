"""Multimodal codec contracts: the real RIFF/WAVE encoder/parser pair
(round-trip, malformed rejection) and the Spark pipeline over it."""

from __future__ import annotations

import pytest

from slice_db_spark.operators import multimodal as M


def test_wav_roundtrip_bytes():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    payload = M.encode_wav(samples, 44100)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + 2 * len(samples)
    rate, back = M.decode_wav(payload)
    assert rate == 44100 and back == samples


def test_wav_decode_rejects_malformed():
    with pytest.raises(ValueError):
        M.decode_wav(b"not a wav file at all, nope, still not one....")
    with pytest.raises(ValueError):
        M.decode_wav(b"")
    # a stereo header over an ODD sample count is a half frame —
    # refused, not mis-parsed (proper stereo now downmixes, r8)
    good = bytearray(M.encode_wav([1, 2, 3], 8000))
    good[22] = 2  # channels = 2
    with pytest.raises(ValueError, match="half frame"):
        M.decode_wav(bytes(good))


def test_wav_pipeline_stats(spark):
    df = spark.createDataFrame([(0,), (7,), (199,)], "doc_id bigint")
    out = {r["media_id"]: r.asDict() for r in M.wav_stats(M.synth_wav(df)).collect()}
    for k in (0, 7, 199):
        n = 50 + k % 200
        samples = [((k * 31 + i * 7) % 65536) - 32768 for i in range(n)]
        assert out[k]["n_samples"] == n
        assert out[k]["sample_rate"] == 8000 + (k % 8) * 1000
        assert out[k]["sum_abs"] == sum(abs(s) for s in samples)
        assert out[k]["max_abs"] == max(abs(s) for s in samples)


def test_bmp_roundtrip_bytes():
    import numpy as np

    from slice_db_spark.operators.multimodal import decode_bmp, encode_bmp

    # non-multiple-of-4 row width exercises the padding path
    px = np.arange(5 * 3 * 3, dtype="uint8").reshape(3, 5, 3)
    payload = encode_bmp(5, 3, px)
    assert payload[:2] == b"BM"
    w, h, back = decode_bmp(payload)
    assert (w, h) == (5, 3)
    assert np.array_equal(px, back)


def test_bmp_decode_rejects_malformed():
    from slice_db_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"definitely not a bitmap, not even close to one truly")
    with pytest.raises(ValueError):
        decode_bmp(b"")


def test_bmp_resize_nearest_neighbor(spark):
    import numpy as np

    from slice_db_spark.operators import multimodal as MM

    df = spark.createDataFrame([(4,)], "doc_id bigint")
    out = MM.bmp_stats(MM.resize_bmp(MM.synth_bmp(df), 12, 10)).collect()[0]
    k, W, H = 4, 12, 10
    w, h = 8 + k % 9, 8 + (3 * k) % 9
    expect = sum(
        (k + 3 * ((j * w) // W) + 5 * ((i * h) // H)) % 256
        for i in range(H)
        for j in range(W)
    )
    assert (out["width"], out["height"]) == (W, H)
    assert out["sum_red"] == expect


def test_pgm_roundtrip_and_quarantine():
    """PGM encode→decode round-trips pixels exactly; malformed headers
    and truncated data raise (the quarantine contract)."""
    import numpy as np
    import pytest

    from slice_db_spark.operators.multimodal import decode_pgm, encode_pgm

    px = ((np.arange(35) * 7) % 256).astype(np.uint8).reshape(5, 7)
    w, h, back = decode_pgm(encode_pgm(7, 5, px))
    assert (w, h) == (7, 5) and (back == px).all()
    with pytest.raises(ValueError):
        decode_pgm(b"P6\n2 2\n255\n" + b"\x00" * 12)  # P6 = color, unsupported
    with pytest.raises(ValueError):
        decode_pgm(encode_pgm(7, 5, px)[:-10])  # truncated data
    with pytest.raises(ValueError):
        decode_pgm(b"P5\n2 2\n65535\n" + b"\x00" * 8)  # 16-bit maxval


# ------------------------------------------------------------- PNG codec


def test_png_roundtrip_every_filter_gray_and_rgb():
    """Each scanline filter type (None/Sub/Up/Average/Paeth) must
    reconstruct byte-exactly, for both grayscale and RGB and for
    degenerate 1-pixel-wide/tall shapes."""
    import numpy as np

    from slice_db_spark.operators.multimodal import decode_png, encode_png

    for ft in range(5):
        for shape in [(6, 5), (6, 5, 3), (3, 1), (1, 4, 3), (2, 1, 3)]:
            rng = np.random.RandomState(ft * 10 + len(shape) + shape[0])
            px = rng.randint(0, 256, shape).astype("uint8")
            h, w = shape[0], shape[1]
            payload = encode_png(w, h, px, row_filters=[ft] * h)
            w2, h2, out = decode_png(payload)
            assert (w2, h2) == (w, h)
            assert np.array_equal(out, px), (ft, shape)


def test_png_filtered_bytes_match_spec_golden():
    """Spec-derived golden: the FILTERED byte stream (inflated IDAT) for a
    known 3x2 RGB image under Sub then Paeth filters, computed by hand
    from the PNG spec's predictor definitions — guards against an
    encoder/decoder pair that round-trips but diverges from the standard."""
    import struct
    import zlib

    import numpy as np

    from slice_db_spark.operators.multimodal import encode_png

    px = np.array(
        [[[10, 20, 30], [40, 50, 60], [70, 80, 90]],
         [[15, 25, 35], [45, 55, 65], [75, 85, 95]]],
        dtype="uint8",
    )
    payload = encode_png(3, 2, px, row_filters=[1, 4])
    # walk chunks, inflate IDAT
    pos, idat = 8, b""
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    # row 0 Sub: first pixel verbatim, then deltas of 30 per byte
    # row 1 Paeth: predictor resolves to the up neighbor everywhere -> 5s
    want = (
        b"\x01" + bytes([10, 20, 30, 30, 30, 30, 30, 30, 30])
        + b"\x04" + bytes([5] * 9)
    )
    assert raw == want


def test_png_rejects_malformed():
    import struct
    import zlib

    import numpy as np
    import pytest

    from slice_db_spark.operators.multimodal import decode_png, encode_png

    px = np.arange(24, dtype="uint8").reshape(4, 6)
    good = encode_png(6, 4, px)

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + good[2:])
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[40] ^= 0xFF  # flip a byte inside IDAT body
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[:30])
    # unsupported layout: patch IHDR to 16-bit depth and re-CRC
    ihdr = struct.pack(">IIBBBBB", 6, 4, 16, 0, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(good[:8] + chunk + good[8 + 25:])
    # data-length mismatch: valid chunks, IDAT one row short
    short = zlib.compress(b"\x00" * (6 + 1) * 3)  # 3 rows for a 4-row image

    def chunkify(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    ihdr_ok = struct.pack(">IIBBBBB", 6, 4, 8, 0, 0, 0, 0)
    doctored = (good[:8] + chunkify(b"IHDR", ihdr_ok)
                + chunkify(b"IDAT", short) + chunkify(b"IEND", b""))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(doctored)


def test_png_resize_and_stats_pipeline(spark):
    """synth -> resize -> stats over Spark: nearest-neighbor indices and
    pixel sums match a local numpy replica of the same arithmetic."""
    import numpy as np

    from slice_db_spark.operators import multimodal as mm

    ids = spark.createDataFrame([(k,) for k in range(12)], "doc_id bigint")
    resized = mm.resize_png(mm.synth_png(ids), 5, 4)
    got = {r.media_id: r for r in mm.png_stats(resized).collect()}
    for k in range(12):
        w, h = 8 + k % 9, 8 + (3 * k) % 7
        ys, xs = np.mgrid[0:h, 0:w]
        px = ((7 * k + 3 * xs + 5 * ys) % 256).astype("uint8")
        sx = (np.arange(5) * w) // 5
        sy = (np.arange(4) * h) // 4
        want = px[sy[:, None], sx[None, :]]
        r = got[k]
        assert (r.width, r.height) == (5, 4)
        assert r.sum_px == int(want.sum())
        assert r.ds2_sum == int(want[::2, ::2].sum())


def test_decode_media_dispatches_real_codecs(spark):
    """The GENERIC decode entry point decodes real formats for real: true
    dimensions and in-range band features for png/bmp/pgm/wav payloads,
    stub path untouched for unknown formats."""
    from slice_db_spark.operators import multimodal as mm

    ids = spark.createDataFrame([(k,) for k in range(6)], "doc_id bigint")
    for synth, fmt, dims in [
        (M.synth_png, "png", lambda k: (8 + k % 9, 8 + (3 * k) % 7)),
        (M.synth_bmp, "bmp", lambda k: (8 + k % 9, 8 + (3 * k) % 9)),
        (M.synth_pgm, "pgm", lambda k: (8 + k % 9, 8 + k % 7)),
    ]:
        got = {r.media_id: r for r in M.decode_media(synth(ids)).collect()}
        for k in range(6):
            w, h = dims(k)
            r = got[k]
            assert (r.width, r.height, r.n_frames) == (w, h, 1), (fmt, k)
            assert len(r.features) == 8
            assert all(0.0 <= f <= 1.0 for f in r.features), (fmt, k)

    wav = {r.media_id: r for r in M.decode_media(M.synth_wav(ids)).collect()}
    for k in range(6):
        assert wav[k].height == 1 and wav[k].width > 0
        assert all(0.0 <= f <= 1.0 for f in wav[k].features)

    # unknown format: deterministic stub (unchanged contract)
    docs = spark.createDataFrame([(1, "hello world")], "doc_id bigint, text string")
    stub = M.decode_media(M.attach_payload(docs, "doc_id", "text")).collect()[0]
    from slice_db_spark.operators.multimodal import _stub_decode
    want = _stub_decode(b"hello world")
    assert (stub.width, stub.height, stub.n_frames) == want[:3]


# ------------------------------------------------------------ JPEG codec


def test_jpeg_exact_roundtrip_piecewise_constant():
    """The synth construction (8x8-constant blocks, even value-128
    offsets, uniform q=16) round-trips BIT-EXACTLY through the full
    lossy pipeline — DC quantization and the float IDCT land exactly
    half a step from every rounding boundary (the property the
    arithmetic oracle relies on)."""
    import numpy as np

    for k in range(40):
        w, h = 8 * (1 + k % 3), 8 * (1 + (3 * k + 1) % 2)
        bys, bxs = np.mgrid[0 : h // 8, 0 : w // 8]
        blocks = (128 + 2 * ((3 * k + 5 * bxs + 7 * bys) % 48)).astype(np.uint8)
        px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        w2, h2, out = M.decode_jpeg(M.encode_jpeg(w, h, px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(out, px)


def test_jpeg_entropy_bytes_match_hand_derived_golden():
    """Spec-level golden for the entropy coder (the JPEG analog of the
    PNG filtered-byte golden): one constant 8x8 block with value 130
    (d=2, qdc=1, diff=1) must encode as DC category-1 code 0001 + bit 1
    + EOB code 00000000 + 1-padding = bytes 0x18 0x07.  Guards against a
    roundtrip-consistent-but-nonstandard encoder/decoder pair."""
    import numpy as np

    px = np.full((8, 8), 130, dtype=np.uint8)
    payload = M.encode_jpeg(8, 8, px)
    sos = payload.index(b"\xff\xda")
    seg_len = int.from_bytes(payload[sos + 2 : sos + 4], "big")
    entropy = payload[sos + 2 + seg_len : -2]  # up to EOI
    assert entropy == b"\x18\x07"
    w, h, out = M.decode_jpeg(payload)
    assert np.array_equal(out, px)


def test_jpeg_general_content_small_error_and_color():
    """Arbitrary content (including non-multiple-of-8 dims with edge
    padding) decodes within the expected quantization error; RGB goes
    through YCbCr 4:4:4 both ways."""
    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    w, h, out = M.decode_jpeg(M.encode_jpeg(17, 24, px, quant=4))
    assert (w, h, out.shape) == (17, 24, (24, 17))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 8

    px3 = (rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) // 4 * 2 + 60).astype(
        np.uint8
    )
    w, h, out3 = M.decode_jpeg(M.encode_jpeg(16, 16, px3, quant=2))
    assert out3.shape == (16, 16, 3)
    assert np.abs(out3.astype(int) - px3.astype(int)).max() <= 8


def test_jpeg_rejects_malformed():
    import numpy as np
    import pytest

    px = np.full((8, 8), 140, dtype=np.uint8)
    good = M.encode_jpeg(8, 8, px)

    with pytest.raises(ValueError, match="not a JPEG"):
        M.decode_jpeg(b"\x89PNG" + good)
    with pytest.raises(ValueError):
        M.decode_jpeg(good[:20])  # truncated mid-segment
    # a baseline stream relabeled SOF2 is MALFORMED progressive (its
    # single full-band scan violates the DC-scan Se=0 rule) — reject,
    # never mis-decode (r7: SOF2 itself now decodes, see
    # test_jpeg_progressive_*)
    bad = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="Se = 0"):
        M.decode_jpeg(bad)
    # genuinely unsupported frame types still raise
    with pytest.raises(ValueError, match="SOF0.*SOF2|progressive"):
        M.decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc3"))
    # sampling factors beyond 2 rejected (on a MULTI-component frame —
    # single-component scans are non-interleaved and ignore sampling,
    # T.81 A.2.2, so 0x22 on grayscale decodes fine)
    color = M.encode_jpeg(8, 8, np.full((8, 8, 3), 140, dtype=np.uint8))
    sofc = color.index(b"\xff\xc0")
    arrc = bytearray(color)
    arrc[sofc + 11] = 0x33  # Y component sampling byte
    with pytest.raises(ValueError, match="sampling"):
        M.decode_jpeg(bytes(arrc))
    sof = good.index(b"\xff\xc0")
    arr = bytearray(good)
    arr[sof + 11] = 0x22
    w, h, out = M.decode_jpeg(bytes(arr))
    assert np.array_equal(out, np.full((8, 8), 140, dtype=np.uint8))
    # DRI declaring an interval the 1-MCU image never reaches: decodes
    # (restart support landed; the misnumbered-RST case is pinned in
    # test_jpeg_restart_intervals); a TRUNCATED DRI still raises
    dri = b"\xff\xdd\x00\x04\x00\x08"
    w, h, out = M.decode_jpeg(good[:2] + dri + good[2:])
    assert np.array_equal(out, np.full((8, 8), 140, dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        M.decode_jpeg(good[:2] + b"\xff\xdd\x00\x02" + good[2:])


def test_jpeg_synth_stats_pipeline(spark):
    """End-to-end Spark path: synth -> decode -> exact integer stats
    match the block arithmetic; decode_media dispatches jpeg for real."""
    import numpy as np

    docs = spark.createDataFrame([(k,) for k in range(12)], "doc_id bigint")
    stats = {r.media_id: r for r in M.jpeg_stats(M.synth_jpeg(docs)).collect()}
    for k in range(12):
        w, h = 8 * (1 + k % 3), 8 * (1 + (3 * k + 1) % 2)
        bys, bxs = np.mgrid[0 : h // 8, 0 : w // 8]
        blocks = 128 + 2 * ((3 * k + 5 * bxs + 7 * bys) % 48)
        r = stats[k]
        assert (r.width, r.height) == (w, h)
        assert r.sum_px == 64 * int(blocks.sum())
        assert r.max_px == int(blocks.max())
        assert r.ds2_sum == 16 * int(blocks.sum())

    dec = M.decode_media(M.synth_jpeg(docs.limit(2))).collect()
    for row in dec:
        assert row.width in (8, 16, 24) and row.height in (8, 16)
        assert all(0.0 <= f <= 1.0 for f in row.features)


# ------------------------------------------------------------- Y4M codec


def test_y4m_roundtrip_and_c420_luma():
    """Mono Y4M round-trips bit-exactly; 4:2:0 streams parse by reading
    the luma plane and skipping chroma."""
    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (4, 6, 10), dtype=np.uint8)
    w, h, fr = M.decode_y4m(M.encode_y4m(10, 6, px))
    assert (w, h) == (10, 6) and np.array_equal(fr, px)

    hdr = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
    luma = bytes(range(8))
    chroma = bytes([7, 9]) * 2
    w, h, fr = M.decode_y4m(hdr + b"FRAME\n" + luma + chroma + b"FRAME\n" + luma + chroma)
    assert (w, h) == (4, 2) and fr.shape == (2, 2, 4)
    assert fr[0].tobytes() == luma and fr[1].tobytes() == luma


def test_y4m_rejects_malformed():
    import numpy as np
    import pytest

    good = M.encode_y4m(4, 2, np.zeros((1, 2, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        M.decode_y4m(b"RIFF" + good)
    with pytest.raises(ValueError, match="truncated"):
        M.decode_y4m(good[:-3])
    with pytest.raises(ValueError, match="FRAME"):
        M.decode_y4m(good.replace(b"FRAME", b"FRAMX"))
    with pytest.raises(ValueError, match="colorspace"):
        M.decode_y4m(good.replace(b"Cmono", b"C444p"))
    with pytest.raises(ValueError, match="missing W/H"):
        M.decode_y4m(b"YUV4MPEG2 F25:1\nFRAME\n")


def test_y4m_frame_sampling_pipeline(spark):
    """End-to-end Spark path: synth clips -> real frame sampling (every
    2nd) -> exact per-frame stats; decode_media reports the TRUE frame
    count for video now, not the stub's."""
    import numpy as np

    docs = spark.createDataFrame([(k,) for k in range(10)], "doc_id bigint")
    rows = M.y4m_frame_stats(M.synth_y4m(docs), every=2).collect()
    got = {(r.media_id, r.frame_idx): (r.width, r.height, r.sum_px, r.max_px)
           for r in rows}
    want = {}
    for k in range(10):
        w, h, n = 8 + k % 5, 8 + (2 * k) % 3, 2 + k % 4
        fs, ys, xs = np.mgrid[0:n, 0:h, 0:w]
        px = (11 * k + 3 * xs + 5 * ys + 17 * fs) % 256
        for idx in range(0, n, 2):
            f = px[idx]
            want[(k, idx)] = (w, h, int(f.sum()), int(f.max()))
    assert got == want

    dec = {r.media_id: r for r in M.decode_media(M.synth_y4m(docs)).collect()}
    for k in range(10):
        assert dec[k].n_frames == 2 + k % 4  # TRUE frame count
        assert dec[k].width == 8 + k % 5


def test_jpeg_fill_bytes_and_truncated_segments():
    """T.81 B.1.1.2 fill bytes (extra 0xFF before a marker) must parse;
    truncated SOF0/DRI bodies must raise ValueError (the quarantine
    contract), never a bare struct.error."""
    import numpy as np
    import pytest

    px = np.full((8, 8), 140, dtype=np.uint8)
    good = M.encode_jpeg(8, 8, px)
    # inject a fill byte before the DQT marker
    dqt = good.index(b"\xff\xdb")
    padded = good[:dqt] + b"\xff" + good[dqt:]
    w, h, out = M.decode_jpeg(padded)
    assert np.array_equal(out, px)

    # SOF0 with a declared length too short for its fixed header
    sof = good.index(b"\xff\xc0")
    broken = bytearray(good)
    broken[sof + 2 : sof + 4] = (4).to_bytes(2, "big")
    with pytest.raises(ValueError):
        M.decode_jpeg(bytes(broken))
    # truncated DRI body
    with pytest.raises(ValueError):
        M.decode_jpeg(good[:2] + b"\xff\xdd\x00\x02" + good[2:])


def test_jpeg_extreme_quant_no_keyerror():
    """quant=1 on a checkerboard drives AC magnitudes past size 10; the
    encoder clamps to the codable ±1023 instead of KeyError, and the
    result still decodes within the (documented) clamp distortion."""
    import numpy as np

    px = np.indices((8, 8)).sum(axis=0) % 2 * 255
    payload = M.encode_jpeg(8, 8, px.astype(np.uint8), quant=1)
    w, h, out = M.decode_jpeg(payload)
    assert (w, h) == (8, 8)
    assert np.abs(out.astype(int) - px).max() <= 16


def test_wav_window_stats(spark):
    """Windowed audio features: exact energy and strict-sign zero
    crossings per fixed window, partial last window included, boundary
    pairs counted in neither window."""
    import numpy as np

    samples = [100, -100, 50, 0, -50, 200, 300]  # 7 samples, window=3
    payload = M.encode_wav(samples, 8000)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(payload), "wav", len(payload))],
        M.MEDIA_SCHEMA,
    )
    rows = {r.window_idx: (r.n_in_window, r.energy, r.zero_crossings)
            for r in M.wav_window_stats(df, window=3).collect()}
    # w0 = [100,-100,50]: crossings (100,-100),(−100,50) -> 2
    assert rows[0] == (3, 100*100 + 100*100 + 50*50, 2)
    # w1 = [0,-50,200]: (0,-50) product 0 -> no; (-50,200) -> 1
    assert rows[1] == (3, 0 + 2500 + 40000, 1)
    # w2 = [300] partial, no pairs
    assert rows[2] == (1, 90000, 0)


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 — the form real crawl JPEGs actually use: 2x2 box-filtered
    chroma, 4-Y-blocks-per-MCU interleave, replication upsampling on
    decode.  Constant color blocks survive exactly; smooth gradients stay
    within small quantization error at non-multiple-of-16 dims."""
    import numpy as np

    blk = np.kron(np.array([[100, 160], [180, 90]]), np.ones((16, 16))).astype(
        np.uint8
    )
    img = np.stack([blk, blk, blk], axis=2)
    pay = M.encode_jpeg(32, 32, img, subsampling="420")
    w, h, out = M.decode_jpeg(pay)
    assert (w, h) == (32, 32)
    assert np.array_equal(out, img)  # constant blocks: exact through 4:2:0

    ys, xs = np.mgrid[0:22, 0:19]
    grad = np.stack(
        [np.clip(80 + c * 30 + xs * 1.5 - ys * 0.8, 0, 255) for c in range(3)],
        axis=2,
    ).astype(np.uint8)
    pay = M.encode_jpeg(19, 22, grad, quant=2, subsampling="420")
    w, h, out = M.decode_jpeg(pay)
    assert (w, h, out.shape) == (19, 22, (22, 19, 3))
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 12

    # the SOF sampling bytes really declare 2x2 luma / 1x1 chroma
    sof = pay.index(b"\xff\xc0")
    assert pay[sof + 11] == 0x22 and pay[sof + 14] == 0x11


def test_jpeg_restart_intervals():
    """DRI/RSTn support (ubiquitous in real encoder output): byte-aligned
    modulo-8 restart markers with DC-predictor resets round-trip exactly
    on the even-offset construction (gray and 4:2:0 color), and a
    misnumbered RST raises instead of desynchronizing the stream."""
    import numpy as np

    k, w, h = 7, 24, 16
    bys, bxs = np.mgrid[0 : h // 8, 0 : w // 8]
    blocks = (128 + 2 * ((3 * k + 5 * bxs + 7 * bys) % 48)).astype(np.uint8)
    px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    for ri in (1, 2, 3):
        pay = M.encode_jpeg(w, h, px, restart_interval=ri)
        assert b"\xff\xdd" in pay  # DRI present
        w2, h2, out = M.decode_jpeg(pay)
        assert np.array_equal(out, px), ri

    blk = np.kron(np.array([[100, 160], [180, 90]]), np.ones((16, 16))).astype(
        np.uint8
    )
    img = np.stack([blk] * 3, axis=2)
    pay = M.encode_jpeg(32, 32, img, subsampling="420", restart_interval=1)
    _, _, out = M.decode_jpeg(pay)
    assert np.array_equal(out, img)

    bad = bytearray(M.encode_jpeg(w, h, px, restart_interval=1))
    i = bad.index(b"\xff\xd0", bad.index(b"\xff\xda"))
    bad[i + 1] = 0xD5  # wrong modulo-8 sequence number
    import pytest

    with pytest.raises(ValueError, match="restart marker"):
        M.decode_jpeg(bytes(bad))


def test_jpeg_422_440_and_fill_before_rst():
    """The asymmetric-subsampling paths (4:2:2 / 4:4:0: one axis
    box-filtered, one-axis replication upsample) round-trip; spec-legal
    0xFF fill bytes before an RST marker are consumed; out-of-range
    restart_interval raises upfront."""
    import numpy as np
    import pytest

    blk = np.kron(np.array([[100, 160], [180, 90]]), np.ones((16, 16))).astype(
        np.uint8
    )
    img = np.stack([blk] * 3, axis=2)
    for mode in ("422", "440"):
        pay = M.encode_jpeg(32, 32, img, subsampling=mode)
        sof = pay.index(b"\xff\xc0")
        want = 0x21 if mode == "422" else 0x12
        assert pay[sof + 11] == want and pay[sof + 14] == 0x11
        w, h, out = M.decode_jpeg(pay)
        assert np.array_equal(out, img), mode  # constant blocks: exact

    # fill byte before a restart marker (T.81 B.1.1.2) must be consumed
    px = np.kron(
        (128 + 2 * np.arange(6).reshape(2, 3) * 7 % 96).astype(np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    pay = M.encode_jpeg(24, 16, px, restart_interval=1)
    sos = pay.index(b"\xff\xda")
    i = pay.index(b"\xff\xd0", sos)
    padded = pay[:i] + b"\xff" + pay[i:]
    w, h, out = M.decode_jpeg(padded)
    assert np.array_equal(out, px)

    with pytest.raises(ValueError, match="restart_interval"):
        M.encode_jpeg(8, 8, px[:8, :8], restart_interval=70000)
    with pytest.raises(ValueError, match="restart_interval"):
        M.encode_jpeg(8, 8, px[:8, :8], restart_interval=-1)
    with pytest.raises(ValueError, match="subsampling"):
        M.encode_jpeg(32, 32, img, subsampling="411")


def test_jpeg_truncated_dqt_dht_sos_raise():
    """ADVICE r6 pin: truncated DQT/DHT/SOS segment bodies raise
    ValueError (the quarantine contract) instead of building a short
    table that IndexErrors mid-decode."""
    import numpy as np
    import pytest

    px = np.full((8, 8), 140, dtype=np.uint8)
    good = M.encode_jpeg(8, 8, px)

    # DQT body of 64 bytes: id byte + only 63 entries (needs 65)
    with pytest.raises(ValueError, match="truncated JPEG DQT"):
        M.decode_jpeg(good[:2] + b"\xff\xdb\x00\x42" + bytes(64) + good[2:])
    # DHT body of 16 bytes: shorter than the 17-byte header
    with pytest.raises(ValueError, match="truncated JPEG DHT"):
        M.decode_jpeg(good[:2] + b"\xff\xc4\x00\x12" + bytes(16) + good[2:])
    # DHT declaring one value but carrying none
    bits = bytes([1] + [0] * 15)
    with pytest.raises(ValueError, match="truncated JPEG DHT"):
        M.decode_jpeg(good[:2] + b"\xff\xc4\x00\x13" + b"\x00" + bits + good[2:])
    # SOS declaring 2 components but carrying none
    with pytest.raises(ValueError, match="truncated JPEG SOS"):
        M.decode_jpeg(good[:2] + b"\xff\xda\x00\x03" + b"\x02" + good[2:])


def test_phash_planted_near_dups_and_recall(spark):
    """r7 pHash pins: (1) brightness shift leaves the hash IDENTICAL
    (AC spectrum invariance), (2) the contrast-reduced replay stays
    within the pairing threshold, (3) unrelated textures are far, and
    (4) the banded pairing recalls EXACTLY the brute-force pairs at
    hamming <= 6 (pigeonhole completeness, max_hamming < bands)."""
    from slice_db_spark.operators.dedup import hamming_near_pairs

    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id bigint")
    sigs = M.phash_media(M.synth_texture_bmp(ids))
    hashes = {r.media_id: r.phash for r in sigs.collect()}

    def ham(a, b):
        return bin(hashes[a] ^ hashes[b]).count("1")

    for g in (0, 10, 20, 30):
        assert ham(g, g + 8) == 0          # brightness-shifted replay
        assert ham(g, g + 9) <= 6          # contrast-reduced replay
    assert ham(0, 10) > 6 and ham(1, 22) > 6  # distinct textures far

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_pairs(
            sigs, "phash", "media_id", bits=63, bands=7, max_hamming=6
        ).collect()
    }
    brute = {
        (a, b, ham(a, b))
        for a in hashes
        for b in hashes
        if a < b and ham(a, b) <= 6
    }
    assert got == brute and len(brute) >= 12  # >= 3 planted pairs / group


def test_phash_jpeg_path_and_unknown_format(spark):
    """phash_media rides the REAL codec dispatch: JPEG payloads decode
    and hash; a format with no real codec raises (quarantine upstream,
    like decode_media's malformed contract)."""
    import pytest

    ids = spark.createDataFrame([(3,), (51,)], "doc_id bigint")
    got = {r.media_id: r.phash for r in M.phash_media(M.synth_jpeg(ids)).collect()}
    assert set(got) == {3, 51} and all(0 <= v < 2**63 for v in got.values())
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"xx"), "tiff", 2)], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="no real codec"):
        M.phash_media(bad).collect()


def test_jpeg_progressive_roundtrip_equals_baseline():
    """r7 progressive JPEG: the four-phase SOF2 scan script (DC first at
    Al=1, AC first with EOB runs, DC refinement, AC refinement with
    buffered correction bits) decodes to EXACTLY the baseline pixels —
    progressive transmission reorders bits, not coefficients.  Random,
    smooth (cross-block EOBn runs), color, and restart-interval cases."""
    import numpy as np

    rng = np.random.default_rng(42)
    for _ in range(6):
        w, h = int(rng.integers(5, 45)), int(rng.integers(5, 45))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        for q in (2, 16):
            base = M.decode_jpeg(M.encode_jpeg(w, h, img, quant=q))
            prog = M.decode_jpeg(M.encode_jpeg_progressive(w, h, img, quant=q))
            assert np.array_equal(base[2], prog[2])
    # smooth gradient: many all-zero-AC blocks -> multi-block EOBn codes
    xs, ys = np.arange(48)[None, :], np.arange(48)[:, None]
    img = ((xs * 3 + ys * 5) % 256).astype(np.uint8)
    base = M.decode_jpeg(M.encode_jpeg(48, 48, img, quant=16))
    prog = M.decode_jpeg(M.encode_jpeg_progressive(48, 48, img, quant=16))
    assert np.array_equal(base[2], prog[2])
    # color 4:4:4
    img3 = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    base = M.decode_jpeg(M.encode_jpeg(17, 24, img3, quant=4))
    prog = M.decode_jpeg(M.encode_jpeg_progressive(17, 24, img3, quant=4))
    assert np.array_equal(base[2], prog[2])
    # restart intervals reset DC preds AND EOB runs per scan
    imgr = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    base = M.decode_jpeg(M.encode_jpeg(32, 16, imgr, quant=4))
    for ri in (1, 3):
        prog = M.decode_jpeg(
            M.encode_jpeg_progressive(32, 16, imgr, quant=4, restart_interval=ri)
        )
        assert np.array_equal(base[2], prog[2])


def test_jpeg_progressive_golden_scan_bytes():
    """Hand-derived entropy bytes for the constant-140 8x8 progressive
    stream (guards against an encoder/decoder bug pair that round-trips
    but emits a non-spec bitstream): DC first at Al=1 sends diff=3 as
    size-2 code 0010 + bits 11 + pad 11 = 0x2F; both AC scans are a
    single EOB0 byte 0x00; the DC refinement bit is (6 & 1) = 0 plus
    seven pad ones = 0x7F."""
    import numpy as np

    p = M.encode_jpeg_progressive(8, 8, np.full((8, 8), 140, dtype=np.uint8))
    scans = []
    pos = 0
    while True:
        i = p.find(b"\xff\xda", pos)
        if i < 0:
            break
        ln = int.from_bytes(p[i + 2 : i + 4], "big")
        start = i + 2 + ln
        j = p.find(b"\xff", start)
        scans.append(p[start:j].hex())
        pos = i + 2
    assert scans == ["2f", "00", "7f", "00"]
    w, h, out = M.decode_jpeg(p)
    assert np.array_equal(out, np.full((8, 8), 140, dtype=np.uint8))


def test_jpeg_progressive_exactness_and_dispatch(spark):
    """The even-offset q=16 exactness construction carries over to
    progressive streams, and decode_media dispatches them like any
    other jpeg payload."""
    import numpy as np

    k = 7
    w, h = 8 * (1 + k % 3), 8 * (1 + (3 * k + 1) % 2)
    bys, bxs = np.mgrid[0 : h // 8, 0 : w // 8]
    blocks = (128 + 2 * ((3 * k + 5 * bxs + 7 * bys) % 48)).astype(np.uint8)
    px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    payload = M.encode_jpeg_progressive(w, h, px)
    w2, h2, out = M.decode_jpeg(payload)
    assert (w2, h2) == (w, h) and np.array_equal(out, px)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), "jpeg", len(payload))], M.MEDIA_SCHEMA
    )
    dec = M.decode_media(df).collect()[0]
    assert (dec.width, dec.height) == (w, h)


def test_jpeg_progressive_malformed_scan_headers_raise():
    """REVIEW r7 pin: corrupt progressive scan headers (Se past the
    band, unknown component id) raise ValueError — never IndexError/
    KeyError — so the media sink's quarantine split keeps firing."""
    import numpy as np
    import pytest

    px = np.full((8, 8), 140, dtype=np.uint8)
    good = M.encode_jpeg_progressive(8, 8, px)

    # the SECOND SOS is the AC-first scan: header bytes ... Ss Se AhAl
    i = good.find(b"\xff\xda", good.find(b"\xff\xda") + 2)
    ln = int.from_bytes(good[i + 2 : i + 4], "big")
    arr = bytearray(good)
    se_pos = i + 2 + ln - 2  # Se byte of that scan header
    assert arr[se_pos] == 63
    arr[se_pos] = 200
    with pytest.raises(ValueError, match="spectral range"):
        M.decode_jpeg(bytes(arr))

    arr = bytearray(good)
    arr[i + 5] = 9  # scan component id -> not in the frame
    with pytest.raises(ValueError, match="unknown component"):
        M.decode_jpeg(bytes(arr))


def test_imageio_lane_bitexact_on_lossless_formats(spark, tmp_path):
    """r8 JVM decode lane pins: ImageIO's BMP and PNG decodes are
    BIT-EXACT vs the repo codecs, so the file-based lane's pHashes
    equal phash_media's on the same pixels — the property that lets the
    arithmetic oracles hold verbatim for the ImageIO-lane query."""
    import os

    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id bigint")
    bmp_rows = M.synth_texture_bmp(ids).select("media_id", "payload").collect()
    png_rows = M.synth_png(ids).select("media_id", "payload").collect()
    d = str(tmp_path / "imgs")
    os.makedirs(d)
    for r in bmp_rows:
        open(os.path.join(d, f"{r.media_id}.bmp"), "wb").write(bytes(r.payload))
    for r in png_rows:
        open(os.path.join(d, f"{r.media_id + 1000}.png"), "wb").write(
            bytes(r.payload)
        )
    got = {r.media_id: r.phash
           for r in M.phash_image_files(spark, d).collect()}
    ref_bmp = {r.media_id: r.phash
               for r in M.phash_media(M.synth_texture_bmp(ids)).collect()}
    ref_png = {r.media_id: r.phash
               for r in M.phash_media(M.synth_png(ids)).collect()}
    assert len(got) == 40
    for k, v in ref_bmp.items():
        assert got[k] == v
    for k, v in ref_png.items():
        assert got[k + 1000] == v


def test_imageio_lane_gif_bitexact(spark, tmp_path):
    """r8 GIF x ImageIO parity: both decode paths are lossless (LZW +
    palette map here, Java ImageIO in the lane), so file-backed .gif
    corpora hash BIT-EXACTLY like in-column payloads — the same
    property that lets the arithmetic oracles hold for BMP/PNG."""
    import os

    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id bigint")
    rows = M.synth_gif(ids).select("media_id", "payload").collect()
    d = str(tmp_path / "gifs")
    os.makedirs(d)
    for r in rows:
        open(os.path.join(d, f"{r.media_id}.gif"), "wb").write(bytes(r.payload))
    got = {r.media_id: r.phash
           for r in M.phash_image_files(spark, d).collect()}
    ref = {r.media_id: r.phash
           for r in M.phash_media(M.synth_gif(ids)).collect()}
    assert len(got) == 12
    for k, v in ref.items():
        assert got[k] == v, k


def test_imageio_lane_jpeg_parity_and_quarantine(spark, tmp_path):
    """r8 JVM decode lane pins: (1) ImageIO's JPEG IDCT agrees with the
    repo decoder within ±1 per pixel on the synth patterns, so the
    pHash stays within the pairing threshold (lossy decode rounding is
    implementation-defined — exactness is only contractual for lossless
    formats); (2) an undecodable file NULLs under null_on_error and
    raises otherwise."""
    import os

    import numpy as np
    import pytest

    d = str(tmp_path / "imgs")
    os.makedirs(d)
    payloads = {}
    for k in range(6):
        w, h = 8 * (1 + k % 3), 8 * (1 + (3 * k + 1) % 2)
        bys, bxs = np.mgrid[0 : h // 8, 0 : w // 8]
        blocks = (128 + 2 * ((3 * k + 5 * bxs + 7 * bys) % 48)).astype(np.uint8)
        px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        payloads[k] = (M.encode_jpeg(w, h, px), w, h)
        open(os.path.join(d, f"{k}.jpg"), "wb").write(payloads[k][0])
    img = (
        spark.read.format("image").load(d)
        .select("image.origin", "image.height", "image.width",
                "image.nChannels", "image.data")
        .collect()
    )
    assert len(img) == 6
    for r in img:
        k = int(os.path.basename(r.origin).split(".")[0])
        payload, w, h = payloads[k]
        ww, hh, ours = M.decode_jpeg(payload)
        assert (ww, hh) == (r.width, r.height) == (w, h)
        arr = np.frombuffer(bytes(r.data), np.uint8).reshape(
            r.height, r.width, r.nChannels
        )
        gray = arr[:, :, 0] if r.nChannels > 1 else arr[:, :, 0]
        diff = np.abs(gray.astype(int) - np.asarray(ours).astype(int))
        assert diff.max() <= 1, diff.max()

    sigs = {r.media_id: r.phash
            for r in M.phash_image_files(spark, d).collect()}
    for k, (payload, w, h) in payloads.items():
        _, _, ours = M.decode_jpeg(payload)
        ref = M._phash_of_pixels(np.asarray(ours), w, h)
        assert bin(sigs[k] ^ ref).count("1") <= 6

    # quarantine contract
    open(os.path.join(d, "999.jpg"), "wb").write(b"not an image at all")
    got = {r.media_id: r.phash
           for r in M.phash_image_files(spark, d, null_on_error=True).collect()}
    assert got[999] is None and len(got) == 7
    with pytest.raises(Exception, match="undecodable|SparkException"):
        M.phash_image_files(spark, d).collect()


def test_imageio_lane_id_contract_and_digitless_files(spark, tmp_path):
    """REVIEW r8 pins: (1) a digit-less file name takes the quarantine
    path (NULL row under null_on_error, raise otherwise) instead of
    crashing the job on int(NaN); (2) ids='path-hash' gives colliding
    digit runs distinct identities; (3) an unknown ids mode raises."""
    import os

    import pytest

    ids = spark.createDataFrame([(0,), (1,)], "doc_id bigint")
    rows = M.synth_texture_bmp(ids).select("media_id", "payload").collect()
    d = str(tmp_path / "imgs")
    os.makedirs(d)
    # two different images whose names carry the SAME digit run, plus a
    # digit-less name
    open(os.path.join(d, "img_12.bmp"), "wb").write(bytes(rows[0].payload))
    open(os.path.join(d, "12_thumb.bmp"), "wb").write(bytes(rows[1].payload))
    open(os.path.join(d, "cover.bmp"), "wb").write(bytes(rows[0].payload))

    got = M.phash_image_files(spark, d, null_on_error=True).collect()
    assert len(got) == 3
    nulls = [r for r in got if r.media_id is None]
    assert len(nulls) == 1 and nulls[0].phash is None  # digit-less -> NULL
    assert {r.media_id for r in got if r.media_id is not None} == {12}

    with pytest.raises(Exception, match="digit run|SparkException"):
        M.phash_image_files(spark, d).collect()

    hashed = M.phash_image_files(spark, d, ids="path-hash").collect()
    assert len({r.media_id for r in hashed}) == 3  # unique per file
    assert all(r.phash is not None for r in hashed)

    with pytest.raises(ValueError, match="ids"):
        M.phash_image_files(spark, d, ids="stem")


def test_audio_subfingerprints_short_clip_quarantines(spark):
    """REVIEW r8 pin: a decodable clip too short to carry ANY
    sub-fingerprint (< frame_bits + 1 windows) takes the quarantine path
    (NULL row / raise) instead of silently emitting zero rows and
    vanishing from offset pairing."""
    import pytest

    short = [((5 * i * i + 3 * i) % 4096) - 2048 for i in range(800)]
    df = spark.createDataFrame(
        [(1, "audio", bytearray(M.encode_wav(short, 16000)), "wav",
          1600 + 44)],
        M.MEDIA_SCHEMA,
    )
    rows = M.audio_subfingerprints(df, null_on_error=True).collect()
    assert len(rows) == 1 and rows[0].subfp is None
    with pytest.raises(Exception, match="too short|SparkException"):
        M.audio_subfingerprints(df).collect()


def test_asym_offset_audio_and_trimmed_video_probes(spark):
    """r8 continuous-regime pins for the new modal probes: (1) the
    asymmetric offset-audio probe recovers the trimmed/padded replays of
    a STANDING clip at the planted offsets, and a probe whose own id is
    in the index matches nothing (replay self-immunity); (2) the
    asymmetric trimmed-video probe recovers a one-frame-trimmed replay,
    is immune to replay-duplicated index rows (distinct-frame reduce),
    and subsumes the equal-length contract at offset 0."""
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")

    # --- audio: index holds slots 0-7, batch brings the replays
    subs = M.audio_subfingerprints(M.synth_audio_clips_offset(ids))
    from pyspark.sql import functions as F

    idx = subs.where("media_id % 10 < 8").select(
        F.col("media_id").alias("corpus_id"), "win_idx", "subfp"
    )
    probe = subs.where("media_id % 10 >= 8")
    got = {(r.new_id, r.corpus_id): (r.win_offset, r.n_matched)
           for r in M.audio_offset_pairs_asym(probe, idx).collect()}
    assert got[(8, 0)][0] == -2    # trimmed replay: new windows lag by 2
    assert got[(9, 0)][0] == 3     # padded replay: new windows lead by 3
    # self-immunity: the probe's own rows already in the index
    self_idx = idx.unionByName(
        probe.select(F.col("media_id").alias("corpus_id"), "win_idx", "subfp")
    )
    again = {(r.new_id, r.corpus_id)
             for r in M.audio_offset_pairs_asym(probe, self_idx).collect()}
    assert (8, 8) not in again and (9, 9) not in again
    assert (8, 0) in again         # genuine matches survive
    # replay-duplicated index rows (crash contract) must not inflate the
    # per-offset vote counts: a doubled index yields IDENTICAL results
    dup = {(r.new_id, r.corpus_id): (r.win_offset, r.n_matched)
           for r in M.audio_offset_pairs_asym(
               probe, idx.unionByName(idx)).collect()}
    assert dup == got

    # --- video: index holds the original clip, batch brings the trim
    sigs = M.video_phash(M.synth_texture_y4m_trim(ids))
    nfr = sigs.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames")
    )
    vidx = sigs.where("media_id % 10 < 8").join(nfr, "media_id").select(
        F.col("media_id").alias("corpus_id"), "frame_idx", "phash", "n_frames"
    )
    vidx_dup = vidx.unionByName(vidx)   # replayed appends
    vprobe = sigs.where("media_id % 10 >= 8")
    res = {(r.new_id, r.corpus_id): (r.frame_offset, r.n_overlap,
                                     r.max_frame_hamming)
           for r in M.video_trimmed_pairs_asym(vprobe, vidx_dup).collect()}
    n = 3  # group 0's clip has 3 frames, trims have 2
    assert res[(8, 0)] == (-1, n - 1, 0)   # trim recovered, counts exact
    assert res[(9, 0)] == (-1, n - 1, 0)
    # equal-length subsumption: probe the ORIGINAL clip against an index
    # of its brightness replay (same frame count) -> offset-0 full match
    bidx = sigs.where("media_id = 8").join(nfr, "media_id").select(
        F.col("media_id").alias("corpus_id"), "frame_idx", "phash", "n_frames"
    )
    eq = {(r.new_id, r.corpus_id): r.frame_offset
          for r in M.video_trimmed_pairs_asym(
              sigs.where("media_id = 9"), bidx).collect()}
    assert eq[(9, 8)] == 0


def test_png_color_type_variants(spark):
    """r8 PNG color-type pins: palette indices map through PLTE exactly,
    RGBA/gray+alpha drop alpha (opaque statistics), an out-of-range
    palette index and a missing PLTE quarantine, and the pHash path
    decodes every variant for real."""
    import numpy as np

    import pytest as _pytest

    from pyspark.sql import functions as F

    # palette: decoded RGB = PLTE triple of each index
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    plte = bytes(b for i in range(256) for b in ((i, 255 - i, i // 2)))
    w, h, rgb = M.decode_png(M.encode_png_typed(4, 3, idx, 3, plte))
    assert (w, h) == (4, 3)
    assert np.array_equal(rgb[:, :, 0], idx)
    assert np.array_equal(rgb[:, :, 1], 255 - idx)
    assert np.array_equal(rgb[:, :, 2], idx // 2)
    # RGBA: alpha sliced off
    rgba = np.arange(4 * 3 * 4, dtype=np.uint8).reshape(3, 4, 4)
    _, _, got = M.decode_png(M.encode_png_typed(4, 3, rgba, 6))
    assert np.array_equal(got, rgba[:, :, :3])
    # gray+alpha: first channel survives
    ga = np.arange(4 * 3 * 2, dtype=np.uint8).reshape(3, 4, 2)
    _, _, gotg = M.decode_png(M.encode_png_typed(4, 3, ga, 4))
    assert np.array_equal(gotg, ga[:, :, 0])
    # out-of-range palette index / missing PLTE -> quarantine
    small_plte = bytes(b for i in range(8) for b in ((i, i, i)))
    with _pytest.raises(ValueError, match="outside the PLTE"):
        M.decode_png(M.encode_png_typed(4, 3, idx, 3, small_plte))
    bad = M.encode_png_typed(4, 3, idx, 3, plte)
    # strip the PLTE chunk: signature + IHDR(25) then PLTE
    no_plte = bad[:33] + bad[33 + 12 + 768:]
    with _pytest.raises(ValueError, match="PLTE"):
        M.decode_png(no_plte)
    # pHash decodes every synth variant
    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    ph = M.phash_media(M.synth_png_variants(ids))
    assert ph.where(F.col("phash").isNull()).count() == 0


def test_wav_stereo_downmix(spark):
    """r8 stereo pins: interleaved L/R downmixes to the shifted
    floor-average (odd NEGATIVE sums round down, matching both SQL
    engines' arithmetic on the shifted numerator), mono decode is
    unchanged, and >2 channels still quarantines."""
    import struct as _struct

    import pytest as _pytest

    left, right = [100, -3, 32767, -32768], [50, 0, 32767, -32768]
    rate, got = M.decode_wav(M.encode_wav_stereo(left, right, 16000))
    assert rate == 16000
    assert got == [75, -2, 32767, -32768]   # (-3+0) -> floor -1.5 = -2
    # mono path unchanged
    r2, mono = M.decode_wav(M.encode_wav([5, -5, 7], 8000))
    assert (r2, mono) == (8000, [5, -5, 7])
    # >2 channels: quarantine contract
    quad = bytearray(M.encode_wav_stereo(left, right, 16000))
    _struct.pack_into("<H", quad, 22, 4)
    with _pytest.raises(ValueError, match="ch=4"):
        M.decode_wav(bytes(quad))


def test_gif_codec_roundtrip_and_contracts(spark):
    """r8 GIF pins: (1) encode->decode round-trips textures bit-exactly
    through real LZW incl. code-width growth (251 distinct values) and
    a >4096-pixel image (dictionary reset); (2) a hand-built
    'uncompressed-style' stream with redundant clear codes decodes;
    (3) interlaced images and structural damage quarantine; (4) the
    generic decode_media/pHash paths treat gif as a REAL codec."""
    import struct as _struct

    import numpy as np

    from pyspark.sql import functions as F

    # round-trip incl. dict reset (80x70 = 5600 px > 4096 entries)
    for k, (w, h) in ((3, (13, 9)), (11, (80, 70))):
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        px = ((17 * k + 3 * xs * xs + 7 * ys * ys + 5 * xs * ys
               + 11 * xs + 13 * ys) % 251).astype(np.uint8)
        w2, h2, rgb = M.decode_gif(M.encode_gif(w, h, px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(rgb[:, :, 0], px)
        assert np.array_equal(rgb[:, :, 2], px)  # gray palette
    # KwKwK stress: constant image emits runs that hit code==next_code
    flat = np.zeros((33, 57), dtype=np.uint8)
    assert np.array_equal(
        M.decode_gif(M.encode_gif(57, 33, flat))[2][:, :, 0], flat)

    # hand-built uncompressed-style stream: literal codes with a clear
    # before every pixel (valid per the spec, never grows the dict)
    w, h = 4, 2
    pix = [10, 20, 30, 40, 50, 60, 70, 80]
    codes = []
    for p in pix:
        codes += [(256, 9), (p, 9)]
    codes.append((257, 9))
    acc = nb = 0
    data = bytearray()
    for c, wd in codes:
        acc |= c << nb
        nb += wd
        while nb >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        data.append(acc & 0xFF)
    raw = bytearray(b"GIF89a")
    raw += _struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    raw += bytes(i for i in range(256) for _ in range(3))
    raw += b"\x2c" + _struct.pack("<HHHHB", 0, 0, w, h, 0) + b"\x08"
    raw += bytes([len(data)]) + data + b"\x00\x3b"
    w2, h2, rgb = M.decode_gif(bytes(raw))
    assert list(rgb[:, :, 0].ravel()) == pix

    # interlace round-trips (r10): the writer emits 4-pass row order,
    # the reader scatters it back — a position-sensitive texture (not a
    # constant) so any pass-boundary off-by-one shuffles rows
    import pytest as _pytest

    tex = (np.arange(9 * 13).reshape(13, 9) * 7 % 251).astype(np.uint8)
    assert np.array_equal(
        M.decode_gif(M.encode_gif(9, 13, tex, interlaced=True))[2][:, :, 0],
        tex,
    )
    good = M.encode_gif(8, 8, np.zeros((8, 8), dtype=np.uint8))
    with _pytest.raises(ValueError):
        M.decode_gif(good[:30])
    with _pytest.raises(ValueError):
        M.decode_gif(b"GIF89a" + b"\x00" * 3)

    # 4096-entry dictionary RESET coverage: 120x100 = 12000 px of the
    # textured field adds >4095 entries, forcing a mid-stream clear
    xs = np.arange(120)[None, :]
    ys = np.arange(100)[:, None]
    big = ((17 * 5 + 3 * xs * xs + 7 * ys * ys + 5 * xs * ys
            + 11 * xs + 13 * ys) % 251).astype(np.uint8)
    assert np.array_equal(
        M.decode_gif(M.encode_gif(120, 100, big))[2][:, :, 0], big)

    # generic paths: real dims/features via decode_media, real pHash
    ids = spark.createDataFrame([(i,) for i in range(4)], "doc_id bigint")
    media = M.synth_gif(ids)
    dec = {r.media_id: (r.width, r.height) for r in M.decode_media(media).collect()}
    assert dec[0] == (40, 36) and dec[1] == (41, 39)
    ph = M.phash_media(media)
    assert ph.where(F.col("phash").isNull()).count() == 0


def test_media_dims_header_parity(spark):
    """r8 header-dims pins: for every format with a real codec the
    header-parsed dims equal the full decode's (BMP/PNG/JPEG incl. the
    EXIF-APP1-prefixed and progressive variants/PGM), audio returns
    NULL dims (pass-through contract), and a truncated header raises /
    nulls under the quarantine flag."""
    import numpy as np

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    corpora = [
        M.synth_varied_bmp(ids),
        M.synth_png(ids),
        M.synth_jpeg(ids),
        M.synth_jpeg(ids, progressive=True),
        M.synth_jpeg_exif(ids),          # APP1 before SOF
        M.synth_pgm(ids),
        M.synth_gif(ids),
    ]
    for media in corpora:
        hd = {r.media_id: (r.width, r.height)
              for r in M.media_dims(media).collect()}
        full = {r.media_id: (r.width, r.height)
                for r in M.decode_media(media).collect()}
        assert hd == full, media
    # audio: no header parser -> NULL dims, no error
    wav = M.synth_wav(ids.limit(2))
    got = M.media_dims(wav).collect()
    assert all(r.width is None and r.height is None for r in got)
    # malformed: raises by default, nulls under the flag
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(0, "image", b"BM\x01", "bmp", 3)], M.MEDIA_SCHEMA)
    with _pytest.raises(Exception):
        M.media_dims(bad).collect()
    assert M.media_dims(bad, null_on_error=True).collect()[0].width is None

    # T.81 B.1.1.2 fill bytes (0xFF padding before a marker) must not
    # break the header walkers — the full decoder consumes them too
    body = M.synth_jpeg_exif(ids.limit(2)).collect()[1]  # id 1: has EXIF
    raw = bytes(body.payload)
    filled = raw[:2] + b"\xff\xff\xff" + raw[2:]
    assert M._header_dims("jpeg", filled) == M._header_dims("jpeg", raw)
    assert M._find_exif_tiff(filled) == M._find_exif_tiff(raw)
    assert M._find_exif_tiff(filled) is not None


def test_phash_oriented_planted_rotations(spark):
    """r8 orientation-normalization pins: the planted orientation-6
    (90°-CCW-stored) and orientation-2 (mirrored) refetches land at
    pHash distance EXACTLY 0 after normalization, the RAW pHash misses
    both (the gap the operator closes), all eight orientation
    transforms are exact inverses of their storage transforms, and an
    out-of-range orientation quarantines."""
    import numpy as np

    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    media = M.synth_jpeg_oriented(ids)
    oriented = {r.media_id: r.phash
                for r in M.phash_media_oriented(media).collect()}
    raw = {r.media_id: r.phash for r in M.phash_media(media).collect()}
    assert oriented[8] == oriented[0] and oriented[9] == oriented[0]
    assert bin(raw[8] ^ raw[0]).count("1") > 6      # raw hash misses
    assert bin(raw[9] ^ raw[0]).count("1") > 6
    # slots 0-7 unchanged by normalization (orientation 1 / no EXIF)
    for k in range(8):
        assert oriented[k] == raw[k]

    # all 8 transforms undo their storage transforms exactly
    m = np.arange(24).reshape(4, 6)
    stored = {
        1: m, 2: m[:, ::-1], 3: m[::-1, ::-1], 4: m[::-1, :],
        5: np.swapaxes(m, 0, 1), 6: np.rot90(m, k=1),
        7: np.swapaxes(m[::-1, ::-1], 0, 1), 8: np.rot90(m, k=-1),
    }
    for o, s in stored.items():
        assert np.array_equal(M._apply_exif_orientation(s, o), m), o

    # out-of-range orientation tag -> quarantine path
    bad = M._build_exif_app1("II", "A", "B", "2020:01:01 00:00:00",
                             "2020:01:01 00:00:00", 9, 1, 1)
    body = M.encode_jpeg(8, 8, np.full((8, 8), 128, dtype=np.uint8))
    df = spark.createDataFrame(
        [(0, "image", body[:2] + bad + body[2:], "jpeg", 0)],
        "media_id bigint, kind string, payload binary, format string,"
        " n_bytes bigint")
    got = M.phash_media_oriented(df, null_on_error=True).collect()
    assert got[0].phash is None


def test_media_gate_boundaries_and_reason_order(spark):
    """r8 curation-gate pins: boundary dims keep (exactly min_side,
    exactly max_aspect), one-off dims drop, and when BOTH checks fail
    the reason is 'small' (side before aspect, the deterministic
    order)."""
    rows = [
        (1, 32, 32),    # keep: exactly min_side
        (2, 31, 64),    # small
        (3, 32, 96),    # keep: aspect exactly 3x
        (4, 32, 97),    # aspect
        (5, 8, 100),    # both fail -> 'small' wins
    ]
    df = spark.createDataFrame(rows, "media_id bigint, width int, height int")
    got = {r.media_id: (r.keep, r.reason)
           for r in M.media_gate(df, min_side=32, max_aspect=3).collect()}
    assert got[1] == (True, "ok")
    assert got[2] == (False, "small")
    assert got[3] == (True, "ok")
    assert got[4] == (False, "aspect")
    assert got[5] == (False, "small")
    # NULL dims (non-image rows / unparsed headers) must stay NULL in
    # BOTH columns — keep=NULL with reason='ok' would let a reason
    # report and a keep filter disagree about the same row
    nulls = spark.createDataFrame(
        [(9, None, None)], "media_id bigint, width int, height int")
    r = M.media_gate(nulls, min_side=32, max_aspect=3).collect()[0]
    assert r.keep is None and r.reason is None


def test_exif_parse_golden_and_quarantine(spark):
    """r8 EXIF pins: (1) a hand-authored little-endian TIFF blob parses
    to exactly the written fields (byte-level golden, independent of the
    builder); (2) a non-Exif APP1 (XMP) is a normal no-EXIF row; (3) a
    structurally damaged Exif segment raises by default and nulls the
    row under null_on_error (the quarantine contract)."""
    import struct

    from pyspark.sql import functions as F

    # --- hand-authored golden: IFD0 with Orientation (inline SHORT) and
    # Make (indirected ASCII), no sub-IFD.  Offsets computed by hand:
    # header 8 + count 2 + 2*12 entries + next 4 = 38 -> Make at 38.
    tiff = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 2)
        + struct.pack("<HHI", 0x010F, 2, 5) + struct.pack("<I", 38)
        + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<H", 6) + b"\0\0"
        + struct.pack("<I", 0)
        + b"Leic\0"
    )
    meta = M._parse_exif_tiff(tiff)
    assert meta["byte_order"] == "II"
    assert meta["make"] == "Leic"
    assert meta["orientation"] == 6
    assert meta["model"] is None and meta["exif_w"] is None

    # --- assemble JPEGs: valid EXIF / XMP APP1 / damaged EXIF
    import numpy as np

    body = M.encode_jpeg(8, 8, np.full((8, 8), 128, dtype=np.uint8))
    good = M._build_exif_app1("MM", "A", "B", "2020:01:01 00:00:00",
                              "2019:01:01 00:00:00", 3, 10, 20)
    xmp_body = b"http://ns.adobe.com/xap/1.0/\0<x/>"
    xmp = b"\xff\xe1" + struct.pack(">H", len(xmp_body) + 2) + xmp_body
    bad = good[:14] + b"ZZ" + good[16:]   # clobber the byte-order mark
    rows = [
        (0, "image", body[:2] + good + body[2:], "jpeg", 0),
        (1, "image", body[:2] + xmp + body[2:], "jpeg", 0),
        (2, "image", body[:2] + bad + body[2:], "jpeg", 0),
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, kind string, payload binary, format string,"
              " n_bytes bigint")
    got = {r.media_id: r for r in M.exif_metadata(
        df, null_on_error=True).collect()}
    assert got[0].has_exif and got[0].byte_order == "MM"
    assert got[0].orientation == 3 and got[0].make == "A"
    assert got[1].has_exif is False and got[1].byte_order is None
    assert got[2].has_exif is None          # quarantined whole-row null
    import pytest as _pytest
    with _pytest.raises(Exception):
        M.exif_metadata(df).collect()       # default path raises


def test_video_shots_planted_structure(spark):
    """r8 shot-detection pins: the shots synth plants 2+seed%3 two-frame
    shots per clip — detected boundaries land exactly on the planted
    even frames, within-shot distance is exactly 0 (+3 brightness is AC
    invariant), keyframes are each shot's middle (= second-of-two here
    start+0), and a threshold above the cross-shot distances collapses
    every clip to ONE shot."""
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
    sigs = M.video_phash(M.synth_texture_y4m_shots(ids))
    shots = M.video_shots(sigs, cut_threshold=16).collect()
    by_clip = {}
    for r in shots:
        by_clip.setdefault(r.media_id, []).append(r)
    for mid, rows in by_clip.items():
        rows.sort(key=lambda r: r.shot_idx)
        assert len(rows) == 2 + mid % 3          # planted shot count
        for s, r in enumerate(rows):
            assert r.shot_idx == s
            assert r.start_frame == 2 * s        # cuts on even frames
            assert r.n_frames == 2
            assert r.keyframe_idx == 2 * s       # middle of 2 = first
    # a threshold above every cross-shot distance -> one shot per clip
    one = M.video_shots(sigs, cut_threshold=63).groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n")).where("n != 1").count()
    assert one == 0
    # keyframe fetch composes: join back to the frame table
    keyed = (
        M.video_shots(sigs, cut_threshold=16)
        .join(
            sigs.select("media_id", F.col("frame_idx").alias("keyframe_idx"),
                        "phash"),
            ["media_id", "keyframe_idx"],
        )
    )
    assert keyed.where(F.col("phash").isNull()).count() == 0
    assert keyed.count() == sum(2 + i % 3 for i in range(30))


def test_audio_resampled_planted_recall(spark):
    """r8 resample-robustness pins: under TIME-based windows the
    2x-sample-duplicated 32kHz replay and its double-amplitude variant
    land at distance EXACTLY 0 from the 16kHz original, while fixed
    SAMPLE-count windows miss both (the gap the mode closes)."""
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    media = M.synth_audio_clips_resampled(ids)
    timed = {r.media_id: r.afp
             for r in M.audio_fingerprint(media, windows_per_sec=320).collect()}
    assert timed[8] == timed[0] and timed[9] == timed[0]
    fixed = {r.media_id: r.afp
             for r in M.audio_fingerprint(media).collect()}
    assert bin(fixed[8] ^ fixed[0]).count("1") > 4
    assert bin(fixed[9] ^ fixed[0]).count("1") > 4
    # 16kHz originals hash identically in both modes (window 50 either way)
    for k in range(8):
        assert timed[k] == fixed[k]


def test_shot_reuse_pairs_planted(spark):
    """r8 partial-content dedup pins: clip 8 reuses clip 0's shot-0
    texture as its second shot (keyframe distance 0), clip 9 reuses
    clip 0's shot-1 texture at +4 brightness (AC-invariant, also 0);
    both pair with exactly one shot match, (8, 9) does NOT pair, and
    every whole-clip contract misses the reuse (different lengths /
    non-aligned content)."""
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    sigs = M.video_phash(M.synth_texture_y4m_shot_reuse(ids))
    got = {(r.id_a, r.id_b): (r.n_shot_matches, r.min_hamming)
           for r in M.shot_reuse_pairs(sigs).collect()}
    assert got[(0, 8)] == (1, 0)
    assert got[(0, 9)] == (1, 0)
    assert (8, 9) not in got
    # whole-clip contracts miss it: clip 0 has 4 frames, 8/9 have 4 too
    # but only ONE aligned shot — aligned/trimmed pairing can't qualify
    eq = {(r.id_a, r.id_b) for r in M.video_near_pairs(sigs).collect()}
    tr = {(r.id_a, r.id_b) for r in M.video_trimmed_pairs(sigs).collect()}
    assert (0, 8) not in eq and (0, 8) not in tr
    assert (0, 9) not in eq and (0, 9) not in tr


def test_audio_fingerprint_planted_near_dups_and_recall(spark):
    """r7 audio fingerprint pins: amplitude doubling leaves the
    fingerprint IDENTICAL (energy-delta sign invariance), the jittered
    replay stays within the pairing threshold, unrelated clips are far,
    and the banded pairing recalls exactly the brute-force pairs."""
    from slice_db_spark.operators.dedup import hamming_near_pairs

    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id bigint")
    sigs = M.audio_fingerprint(M.synth_audio_clips(ids))
    fps = {r.media_id: r.afp for r in sigs.collect()}

    def ham(a, b):
        return bin(fps[a] ^ fps[b]).count("1")

    for g in (0, 10, 20, 30):
        assert ham(g, g + 8) == 0       # amplitude-doubled replay
        assert ham(g, g + 9) <= 4       # jittered replay
    assert ham(0, 11) > 4 and ham(3, 25) > 4  # distinct clips far

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_pairs(
            sigs, "afp", "media_id", bits=30, bands=6, max_hamming=4
        ).collect()
    }
    brute = {
        (a, b, ham(a, b))
        for a in fps for b in fps if a < b and ham(a, b) <= 4
    }
    assert got == brute and len(brute) >= 8


def test_audio_fingerprint_long_clip_bounded(spark):
    """r8 ADVICE fix: a realistic-length clip (1 s at 16 kHz = 320 raw
    windows, far past the 64-window signature width) must FOLD into a
    bounded fingerprint, not overflow Int64 and crash the stream.  The
    fold keeps amplitude invariance, a short clip's fingerprint is
    unchanged by the bounding code, and the guarded mode still routes
    malformed payloads to NULL."""
    rows = []
    long_samples = [((i * i * 3 + 11 * i) % 4096) - 2048 for i in range(16000)]
    rows.append((0, "audio", M.encode_wav(long_samples, 16000), "wav",
                 len(long_samples) * 2 + 44))
    rows.append((1, "audio", M.encode_wav([2 * s for s in long_samples], 16000),
                 "wav", len(long_samples) * 2 + 44))
    short = [((7 * i * i + 5 * i) % 4096) - 2048 for i in range(1550)]
    rows.append((2, "audio", M.encode_wav(short, 16000), "wav", len(short) * 2 + 44))
    rows.append((3, "audio", b"not a wav at all", "wav", 16))
    df = spark.createDataFrame(
        rows, "media_id bigint, kind string, payload binary, format string, n_bytes bigint"
    )
    fps = {r.media_id: r.afp
           for r in M.audio_fingerprint(df, null_on_error=True).collect()}
    assert fps[0] is not None and 0 <= fps[0] < (1 << 63)
    assert fps[1] == fps[0]            # amplitude ×2 survives the fold
    assert fps[3] is None              # malformed -> quarantine, not crash
    # a clip that needs no fold hashes exactly as the unbounded formula
    e = [sum(s * s for s in short[w * 50 : (w + 1) * 50]) for w in range(31)]
    expect = sum(1 << w for w in range(30) if e[w + 1] > e[w])
    assert fps[2] == expect
    # the fingerprint must raise on an out-of-range width rather than wrap
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bits"):
        M.audio_fingerprint(df, bits=64)


def test_audio_offset_pairs_recall_where_clip_fingerprint_misses(spark):
    """r8 offset-robust audio pins: the front-trimmed (2 windows) and
    front-padded (3 windows) replays pair with their original at the
    planted offsets (+2 / −3) via sub-fingerprint voting — while the
    clip-level fingerprint, whose every bit shifted, misses ALL of
    them.  Unrelated clips never reach the vote threshold."""
    from slice_db_spark.operators.dedup import hamming_near_pairs

    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
    clips = M.synth_audio_clips_offset(ids)
    subs = M.audio_subfingerprints(clips)
    got = {
        (r.id_a, r.id_b): (r.win_offset, r.n_matched)
        for r in M.audio_offset_pairs(subs).collect()
    }
    for g in (0, 10, 20):
        off, n = got[(g, g + 8)]          # trimmed replay recovered
        assert off == 2 and n >= 8
        off, n = got[(g, g + 9)]          # padded replay recovered
        assert off == -3 and n >= 8
        off, n = got[(g + 8, g + 9)]      # the two replays pair too
        assert off == -5 and n >= 8
    assert (0, 11) not in got and (3, 25) not in got

    # the clip-level fingerprint misses every planted offset replay
    afp = M.audio_fingerprint(clips)
    clip_pairs = {
        (r.id_a, r.id_b)
        for r in hamming_near_pairs(
            afp, "afp", "media_id", bits=30, bands=6, max_hamming=4
        ).collect()
    }
    for g in (0, 10, 20):
        assert (g, g + 8) not in clip_pairs
        assert (g, g + 9) not in clip_pairs

    # undecodable payloads take the NULL row path, and the pairing
    # ignores them
    bad = spark.createDataFrame(
        [(99, "audio", bytearray(b"nope"), "wav", 4)], M.MEDIA_SCHEMA
    )
    rows = M.audio_subfingerprints(bad, null_on_error=True).collect()
    assert len(rows) == 1 and rows[0].subfp is None
    assert M.audio_offset_pairs(
        M.audio_subfingerprints(bad, null_on_error=True)
    ).count() == 0


def test_video_trimmed_pairs_recall_where_aligned_contract_misses(spark):
    """r8 trim-robust video pins: the one-frame-front-trimmed replay
    (and its +4-brightness variant) pair with the original at frame
    offset +1 with every overlapping frame at distance 0 — while the
    equal-length contract of video_near_pairs, which requires matching
    frame counts, misses them entirely.  The two trimmed variants pair
    with each other at offset 0, and unrelated clips never qualify."""
    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
    sigs = M.video_phash(M.synth_texture_y4m_trim(ids))
    got = {
        (r.id_a, r.id_b, r.frame_offset): (r.n_overlap, r.max_frame_hamming)
        for r in M.video_trimmed_pairs(sigs).collect()
    }
    for g in (0, 10, 20):
        n = 3 + g % 3
        assert got[(g, g + 8, 1)] == (n - 1, 0)   # trimmed replay
        assert got[(g, g + 9, 1)] == (n - 1, 0)   # trimmed + brightness
        assert got[(g + 8, g + 9, 0)] == (n - 1, 0)
    assert not any(a == 0 and b == 11 for a, b, _ in got)

    # the equal-length contract misses every trimmed replay
    aligned = {
        (r.id_a, r.id_b)
        for r in M.video_near_pairs(sigs).collect()
    }
    for g in (0, 10, 20):
        assert (g, g + 8) not in aligned
        assert (g, g + 9) not in aligned
        assert (g + 8, g + 9) in aligned  # equal length, frame-wise d=0


def test_video_phash_planted_near_dups_and_recall(spark):
    """r7 video fingerprint pins: the brightness-shifted clip replay is
    distance 0 on EVERY frame, the contrast replay stays within
    threshold, different-frame-count clips never pair, and the banded
    pairing recalls exactly the brute-force sequence matches."""
    import itertools

    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
    sigs = M.video_phash(M.synth_texture_y4m(ids))
    by_vid: dict[int, list[int]] = {}
    for r in sigs.collect():
        by_vid.setdefault(r.media_id, []).append((r.frame_idx, r.phash))
    seqs = {k: [p for _, p in sorted(v)] for k, v in by_vid.items()}

    def maxham(a, b):
        return max(bin(x ^ y).count("1") for x, y in zip(seqs[a], seqs[b]))

    for g in (0, 10, 20):
        assert len(seqs[g]) == len(seqs[g + 8]) == len(seqs[g + 9])
        assert maxham(g, g + 8) == 0
        assert maxham(g, g + 9) <= 6

    got = {
        (r.id_a, r.id_b, r.n_frames, r.max_frame_hamming)
        for r in M.video_near_pairs(sigs).collect()
    }
    brute = {
        (a, b, len(seqs[a]), maxham(a, b))
        for a, b in itertools.combinations(sorted(seqs), 2)
        if len(seqs[a]) == len(seqs[b]) and maxham(a, b) <= 6
    }
    assert got == brute and len(brute) >= 9


def test_header_dims_bmp_rejects_invalid():
    """r9 ADVICE pin: _header_dims('bmp') must match decode_bmp's
    strictness — non-positive width, zero height, and an info header
    smaller than BITMAPINFOHEADER all raise instead of reporting a
    negative width the curation gate would misclassify as 'small'."""
    import struct

    import numpy as np

    from slice_db_spark.operators.multimodal import _header_dims, encode_bmp

    p = encode_bmp(5, 3, np.zeros((3, 5, 3), dtype="uint8"))
    assert _header_dims("bmp", p) == (5, 3)

    bad_w = bytearray(p)
    struct.pack_into("<i", bad_w, 18, -5)
    with pytest.raises(ValueError, match="dims invalid"):
        _header_dims("bmp", bytes(bad_w))

    bad_h = bytearray(p)
    struct.pack_into("<i", bad_h, 22, 0)
    with pytest.raises(ValueError, match="dims invalid"):
        _header_dims("bmp", bytes(bad_h))

    bad_hdr = bytearray(p)
    struct.pack_into("<I", bad_hdr, 14, 12)
    with pytest.raises(ValueError, match="header too small"):
        _header_dims("bmp", bytes(bad_hdr))


def test_spill_media_to_files_distributed_and_atomic(spark, tmp_path):
    """r9 spill bridge pins: (1) the executor-side spill lands every
    payload byte-exact under shard=<pid> dirs with a _SUCCESS marker;
    (2) a pre-existing dangling .staging dir is replaced, and the
    promote is the sources/atomic.py swap (old contents recoverable
    until promote); (3) NULL media_id raises instead of silently
    dropping a row; (4) jpeg payloads spill as .jpg."""
    import os

    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id bigint")
    media = M.synth_texture_bmp(ids).repartition(3)
    dest = str(tmp_path / "corpus")
    # dangling staging from a "crashed" prior spill must not leak in
    os.makedirs(dest + ".staging/shard=9")
    open(dest + ".staging/shard=9/999.bmp", "wb").write(b"stale")

    out = M.spill_media_to_files(media, dest)
    assert out == dest
    assert not os.path.exists(dest + ".staging")
    assert os.path.isfile(os.path.join(dest, "_SUCCESS"))
    shards = [d for d in os.listdir(dest) if d.startswith("shard=")]
    assert 1 <= len(shards) <= 3
    spilled = {}
    for sh in shards:
        for name in os.listdir(os.path.join(dest, sh)):
            mid, ext = name.split(".")
            assert ext == "bmp"
            spilled[int(mid)] = open(os.path.join(dest, sh, name), "rb").read()
    expect = {r.media_id: bytes(r.payload)
              for r in media.select("media_id", "payload").collect()}
    assert spilled == expect
    assert not any(v == b"stale" for v in spilled.values())

    # jpeg extension mapping
    jdest = str(tmp_path / "jcorpus")
    M.spill_media_to_files(M.synth_jpeg(ids.limit(3)), jdest)
    names = [n for sh in os.listdir(jdest) if sh.startswith("shard=")
             for n in os.listdir(os.path.join(jdest, sh))]
    assert names and all(n.endswith(".jpg") for n in names)

    # NULL media_id raises executor-side
    from pyspark.sql import functions as SF

    bad = media.withColumn(
        "media_id",
        SF.when(SF.col("media_id") == 5, SF.lit(None)).otherwise(
            SF.col("media_id")
        ),
    )
    with pytest.raises(Exception, match="NULL media_id"):
        M.spill_media_to_files(bad, str(tmp_path / "badcorpus"))


def test_phash_media_spilled_matches_python_codec(spark, tmp_path):
    """r9 bridge parity: in-column payloads routed through the spill +
    ImageIO lane produce the IDENTICAL pHash set as the pure-Python
    codec path on lossless formats — the property that lets
    media_phash_incolumn_imageio sit under the media_phash_pairs oracle
    verbatim.  (Since the r10 format dispatch, BMP rows take the Python
    lane inside phash_media_spilled — the parity contract is unchanged;
    test_phash_media_spilled_format_dispatch covers the routing.)"""
    ids = spark.createDataFrame([(i,) for i in range(25)], "doc_id bigint")
    got = {
        r.media_id: r.phash
        for r in M.phash_media_spilled(
            spark, M.synth_texture_bmp(ids), str(tmp_path / "c")
        ).collect()
    }
    ref = {r.media_id: r.phash
           for r in M.phash_media(M.synth_texture_bmp(ids)).collect()}
    assert got == ref and len(got) == 25


def test_phash_media_spilled_format_dispatch(spark, tmp_path):
    """r10 format dispatch in the spill bridge: (1) uncompressed
    formats (BMP/PGM) never touch the spill — no staging dir is even
    created for an all-BMP corpus (the datasheet measured the file
    round-trip as a 0.3-0.4x pessimization there); (2) a mixed
    BMP+JPEG corpus spills ONLY the JPEGs and the unioned hashes match
    each format's own lane; (3) PGM — unreadable by ImageIO, so it
    NULL-quarantined under the pure bridge — now hashes."""
    import os

    from pyspark.sql import functions as SF

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    bmp = M.synth_texture_bmp(ids)
    dest = str(tmp_path / "allbmp")
    got = {r.media_id: r.phash
           for r in M.phash_media_spilled(spark, bmp, dest).collect()}
    assert len(got) == 8 and not os.path.exists(dest)

    jpeg = M.synth_jpeg(ids).withColumn(
        "media_id", SF.col("media_id") + 100)
    mixed = bmp.unionByName(jpeg)
    dest2 = str(tmp_path / "mixed")
    got2 = {r.media_id: r.phash
            for r in M.phash_media_spilled(spark, mixed, dest2)
            .localCheckpoint(eager=True).collect()}
    spilled_files = [
        n for sh in os.listdir(dest2) if sh.startswith("shard=")
        for n in os.listdir(os.path.join(dest2, sh))
    ]
    assert len(spilled_files) == 8          # only the JPEGs spilled
    assert all(n.endswith(".jpg") for n in spilled_files)
    ref_bmp = {r.media_id: r.phash for r in M.phash_media(bmp).collect()}
    ref_jpg = {r.media_id: r.phash
               for r in M.phash_image_files(
                   spark, dest2, null_on_error=True).collect()}
    assert got2 == {**ref_bmp, **ref_jpg} and len(got2) == 16

    pgm = M.synth_pgm(ids)
    got3 = {r.media_id: r.phash
            for r in M.phash_media_spilled(
                spark, pgm, str(tmp_path / "pgm"), null_on_error=True
            ).collect()}
    ref3 = {r.media_id: r.phash for r in M.phash_media(pgm).collect()}
    assert got3 == ref3 and all(v is not None for v in got3.values())

    # review fix: a NULL format must not vanish from both lanes — it
    # routes to the Python lane and NULL-quarantines
    withnull = bmp.limit(2).unionByName(spark.createDataFrame(
        [(777, "image", bytearray(b"??"), None, 2)], M.MEDIA_SCHEMA))
    got4 = {r.media_id: r.phash
            for r in M.phash_media_spilled(
                spark, withnull, str(tmp_path / "nullfmt"),
                null_on_error=True
            ).collect()}
    assert 777 in got4 and got4[777] is None and len(got4) == 3


def test_gif_animated_roundtrip_and_strict_gce():
    """r9 animated GIF pins: (1) encode_gif_animated -> gif_frames
    round-trips every frame byte-exact and gif_anim_info reports the
    exact frame count + summed delays; (2) decode_gif returns frame 0
    (the thumbnail convention); (3) a malformed GCE — wrong block size
    or missing terminator — raises for quarantine instead of
    misreporting; (4, r10) an undersized frame COMPOSITES over the
    canvas instead of quarantining, while undefined disposal methods,
    duplicate GCEs, and out-of-screen rects still raise; (5) a still
    GIF reports (n_frames=1, duration=0)."""
    import numpy as np

    w, h = 41, 37
    frames = np.stack(
        [((np.arange(h * w).reshape(h, w) * 3 + 29 * f) % 251).astype("uint8")
         for f in range(4)]
    )
    p = M.encode_gif_animated(w, h, frames, [5, 6, 7, 8], loop=2)
    assert M.gif_anim_info(p) == (w, h, 4, 26)
    gw, gh, back = M.gif_frames(p)
    assert (gw, gh) == (w, h)
    assert np.array_equal(back[:, :, :, 0], frames)
    assert all(np.array_equal(back[..., c], back[..., 0]) for c in (1, 2))
    _, _, first = M.decode_gif(p)
    assert np.array_equal(first[:, :, 0], frames[0])

    i = p.find(b"\x21\xf9\x04")
    bad_size = bytearray(p)
    bad_size[i + 2] = 5
    with pytest.raises(ValueError, match="GCE block size"):
        M.gif_anim_info(bytes(bad_size))
    bad_term = bytearray(p)
    bad_term[i + 7] = 9  # the 0x00 terminator after size+4 payload
    with pytest.raises(ValueError, match="GCE missing terminator"):
        M.gif_anim_info(bytes(bad_term))
    # r10 consistency: the metadata walk rejects duplicate GCEs like
    # the compositing reader, so analyze-media never counts a stream
    # the gif-video lane will quarantine
    dup_gce = bytearray(p)
    dup_gce[i:i] = p[i : i + 8]
    with pytest.raises(ValueError, match="duplicate GCE"):
        M.gif_anim_info(bytes(dup_gce))
    with pytest.raises(ValueError, match="duplicate GCE"):
        M.gif_anim_features(bytes(dup_gce))

    # r10: an undersized first frame now COMPOSITES — the uncovered
    # right column stays the background color (index 0 → black)
    # (the descriptor follows the 8-byte GCE — a bare find(0x2c) can
    # land in the gray palette)
    j = i + 8
    assert p[j] == 0x2C
    partial = bytearray(p)
    partial[j + 5] -= 1  # iw low byte
    _, _, pframes = M.gif_frames(bytes(partial))
    assert pframes.shape == (4, h, w, 3)
    assert (pframes[0, :, w - 1, :] == 0).all()

    # quarantine pins that replaced the partial-frame guard
    bad_disp = bytearray(p)
    bad_disp[i + 3] = 5 << 2  # GCE packed: disposal 5 (undefined)
    with pytest.raises(ValueError, match="disposal method 5"):
        M.gif_frames(bytes(bad_disp))
    dup_gce = bytearray(p)
    dup_gce[i:i] = p[i : i + 8]
    with pytest.raises(ValueError, match="duplicate GCE"):
        M.gif_frames(bytes(dup_gce))
    import struct as _struct

    oob = bytearray(p)
    oob[j + 1 : j + 3] = _struct.pack("<H", 60000)  # descriptor x
    with pytest.raises(ValueError, match="outside the logical screen"):
        M.gif_frames(bytes(oob))

    still = M.encode_gif(w, h, frames[0])
    assert M.gif_anim_info(still) == (w, h, 1, 0)


def test_gif_animated_imageio_first_frame_parity(spark, tmp_path):
    """r9 parity pin: Spark's image source (Java ImageIO) reads the
    FIRST frame of an animated GIF, and our LZW decode of frame 0 is
    bit-exact vs it — so animated GIFs flow through both the Python
    lane and the JVM lane with identical pHashes."""
    import os

    ids = spark.createDataFrame([(i,) for i in range(15)], "doc_id bigint")
    rows = M.synth_gif_animated(ids).select("media_id", "payload").collect()
    d = str(tmp_path / "gifs")
    os.makedirs(d)
    for r in rows:
        open(os.path.join(d, f"{r.media_id}.gif"), "wb").write(bytes(r.payload))
    got = {r.media_id: r.phash for r in M.phash_image_files(spark, d).collect()}
    ref = {r.media_id: r.phash
           for r in M.phash_media(M.synth_gif_animated(ids)).collect()}
    assert got == ref and len(got) == 15


def test_gif_interlaced_imageio_parity(spark, tmp_path):
    """r10 parity pin: Java ImageIO de-interlaces GIFs too, so our
    4-pass row scatter must agree bit-exactly — interlaced files
    through phash_image_files hash identically to the same pixels'
    non-interlaced in-column payloads through the Python lane."""
    import os

    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id bigint")
    rows = M.synth_gif(ids, interlaced=True).select(
        "media_id", "payload").collect()
    d = str(tmp_path / "gifs")
    os.makedirs(d)
    for r in rows:
        open(os.path.join(d, f"{r.media_id}.gif"), "wb").write(bytes(r.payload))
    got = {r.media_id: r.phash for r in M.phash_image_files(spark, d).collect()}
    ref = {r.media_id: r.phash
           for r in M.phash_media(M.synth_gif(ids)).collect()}
    assert got == ref and len(got) == 12


def test_gif_video_phash_feeds_video_pairing(spark):
    """r9 adapter pin: gif_video_phash emits the video lane's schema and
    planted identical animations pair at distance 0 through the same
    sequence machinery video uses."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as SF

    # ids 0 and 100: identical animations (same k-arithmetic mod nothing)
    ids = spark.createDataFrame([(0,), (3,), (7,)], "doc_id bigint")
    sigs = M.gif_video_phash(M.synth_gif_animated(ids))
    pdf = sigs.toPandas()
    assert list(pdf.columns) == ["media_id", "frame_idx", "phash"]
    # frame-row counts match the synth arithmetic: 2 + k % 4
    got_nf = dict(pdf.groupby("media_id").size().astype(int).items())
    assert got_nf == {0: 2, 3: 1 + 4, 7: 2 + 3}
    # a duplicated payload pairs with itself at distance 0 per frame
    dup = M.synth_gif_animated(ids).withColumn(
        "media_id", SF.col("media_id") + 1000
    )
    both = M.synth_gif_animated(ids).unionByName(dup)
    allsigs = M.gif_video_phash(both)
    pairs = M.video_near_pairs(allsigs).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert {(0, 1000), (3, 1003), (7, 1007)} <= got


def test_gif_disposal_transparency_compositing(spark):
    """r10 compositing pins: (1) gif_frames composites partial/offset
    frames, disposal methods 1/2/3, the GCE transparent index, and an
    interlaced frame exactly like an independent numpy canvas
    simulation, across 30 seeds (all nine (d0, d1) combinations);
    (2) the Spark operator gif_composited_stats reproduces the
    simulation's plain + position-weighted sums; (3) gif_video_phash
    now accepts partial-frame animations (the real-crawl shape)."""
    import numpy as np

    def sim(k):
        w, h = 40 + k % 9, 36 + (3 * k) % 11
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        B = (17 * k + 3 * xs * xs + 7 * ys * ys + 5 * xs * ys
             + 11 * xs + 13 * ys) % 251
        d0, d1 = 1 + k % 3, 1 + (k // 3) % 3
        ox1, oy1, pw1, ph1 = 3 + k % 5, 2 + k % 7, 11 + k % 6, 9 + k % 5
        ox2, oy2, pw2, ph2 = 1 + k % 9, 4 + k % 3, 13 + k % 4, 7 + k % 6
        us = np.arange(pw1)[None, :]
        vs = np.arange(ph1)[:, None]
        P1 = (23 * k + 7 * us * us + 5 * vs + 3 * us * vs) % 251
        T1 = (us + 2 * vs + k) % 5 == 0
        us = np.arange(pw2)[None, :]
        vs = np.arange(ph2)[:, None]
        P2 = (31 * k + 11 * us + 13 * vs + us * us) % 251
        C0 = B.copy()
        U1 = B.copy() if d0 == 1 else np.zeros_like(B)
        C1 = U1.copy()
        reg = C1[oy1:oy1 + ph1, ox1:ox1 + pw1]
        reg[~T1] = P1[~T1]
        U2 = C1.copy()
        if d1 == 2:
            U2[oy1:oy1 + ph1, ox1:ox1 + pw1] = 0
        elif d1 == 3:
            U2 = U1.copy()
        C2 = U2.copy()
        C2[oy2:oy2 + ph2, ox2:ox2 + pw2] = P2
        return w, h, [C0, C1, C2]

    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
    payloads = {
        r.media_id: bytes(r.payload)
        for r in M.synth_gif_composited(ids).collect()
    }
    for k in range(30):
        w, h, exp = sim(k)
        gw, gh, fr = M.gif_frames(payloads[k])
        assert (gw, gh) == (w, h) and fr.shape[0] == 3
        for i in range(3):
            assert np.array_equal(fr[i][:, :, 0], exp[i]), (k, i)
            assert np.array_equal(fr[i][:, :, 2], exp[i]), (k, i)

    stats = M.gif_composited_stats(M.synth_gif_composited(ids)).collect()
    got = {(r.media_id, r.frame_idx): (r.sum_px, r.wsum_px) for r in stats}
    for k in range(30):
        w, h, exp = sim(k)
        wts = (1 + (np.arange(h * w, dtype=np.int64) % 97)).reshape(h, w)
        for i in range(3):
            assert got[(k, i)] == (
                int(exp[i].sum()), int((exp[i] * wts).sum())
            ), (k, i)

    # partial-frame animations flow into the video lane now
    sigs = M.gif_video_phash(M.synth_gif_composited(ids)).toPandas()
    assert len(sigs) == 90 and sigs["phash"].notna().all()


def test_gif_local_palette_compositing(spark):
    """r10 local color tables: frame 1 maps through its OWN 64-entry
    non-gray palette — (1) decoded RGB channels match the palette
    arithmetic per channel (so compositing is RGB-space, not
    index-space); (2) pixels outside the rect keep the gray base;
    (3) a palette that isn't 3*2^n bytes is refused by the writer."""
    import numpy as np

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    payloads = {r.media_id: bytes(r.payload)
                for r in M.synth_gif_local_palette(ids).collect()}
    for k in range(6):
        w, h = 40 + k % 9, 36 + (3 * k) % 11
        ox, oy = 2 + k % 7, 3 + k % 5
        pw, ph = 12 + k % 5, 10 + k % 4
        gw, gh, fr = M.gif_frames(payloads[k])
        assert (gw, gh) == (w, h) and fr.shape[0] == 2
        f1 = fr[1]
        us = np.arange(pw)[None, :]
        vs = np.arange(ph)[:, None]
        idx = (11 * k + 3 * us + 5 * vs) % 64
        rect = f1[oy:oy + ph, ox:ox + pw]
        assert np.array_equal(rect[:, :, 0], (3 * idx + k) % 251)
        assert np.array_equal(rect[:, :, 1], (5 * idx + 2 * k) % 251)
        assert np.array_equal(rect[:, :, 2], (7 * idx + 3 * k) % 251)
        # outside the rect: gray base (all channels equal)
        assert (f1[0, :, 0] == f1[0, :, 1]).all()

    with pytest.raises(ValueError, match="3\\*2\\^n"):
        M.encode_gif_frames(8, 8, [
            {"px": np.zeros((8, 8), dtype="uint8"), "palette": b"\x00" * 9}
        ])


def test_gif_optimized_vs_flattened_pairing(spark):
    """r10 compositing payoff pin: a partial-frame (optimizer-style) GIF
    pairs its FLATTENED full-frame re-encode at distance 0 through the
    unchanged video machinery — per ten-id group, slot 8 (verbatim
    flatten) and slot 9 (+4-brightness flatten) both pair with slot 0,
    and with each other, at max_frame_hamming 0."""
    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id bigint")
    sigs = M.gif_video_phash(M.synth_gif_composited_dups(ids))
    pairs = {(r.id_a, r.id_b): r.max_frame_hamming
             for r in M.video_near_pairs(sigs).collect()}
    for g in (0, 10):
        assert pairs[(g, g + 8)] == 0      # verbatim flatten
        assert pairs[(g, g + 9)] == 0      # +4 brightness flatten
        assert pairs[(g + 8, g + 9)] == 0


def test_png_adam7_roundtrip_and_parity():
    """r9 Adam7 pins: (1) interlaced encode -> decode round-trips
    byte-exact for gray and RGB across sizes including the tiny shapes
    where passes are EMPTY (w or h < 5/3/2); (2) interlaced and plain
    encodes of the same pixels decode identically (reordering, not
    change); (3) a truncated interlaced stream raises."""
    import numpy as np
    import zlib as _zlib

    rng = np.random.default_rng(11)
    for (w, h, rgb) in [(16, 13, False), (8, 8, True), (1, 1, False),
                        (3, 2, True), (7, 5, False), (2, 9, True),
                        (5, 1, False), (4, 4, True)]:
        shape = (h, w, 3) if rgb else (h, w)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        dw, dh, back = M.decode_png(M.encode_png_interlaced(w, h, px))
        assert (dw, dh) == (w, h) and np.array_equal(back, px), (w, h, rgb)

    ys, xs = np.mgrid[0:11, 0:13]
    px = ((3 * xs + 5 * ys) % 256).astype(np.uint8)
    plain = M.decode_png(M.encode_png(13, 11, px))[2]
    inter = M.decode_png(M.encode_png_interlaced(13, 11, px))[2]
    assert np.array_equal(plain, inter)

    # truncate the inflated stream: rebuild the IDAT with a short body
    p = M.encode_png_interlaced(13, 11, px)
    sig_end = 8 + 12 + 13  # signature + IHDR chunk
    ihdr_chunk = p[8:sig_end]
    raw_len = sum(
        ((13 - x0 + dx - 1) // dx * 1 + 1) * ((11 - y0 + dy - 1) // dy)
        for x0, y0, dx, dy in M._ADAM7_PASSES
        if (13 - x0 + dx - 1) // dx > 0 and (11 - y0 + dy - 1) // dy > 0
    )
    short = _zlib.compress(b"\x00" * (raw_len - 3))
    bad = (
        p[:sig_end]
        + M._png_chunk(b"IDAT", short)
        + M._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced data length"):
        M.decode_png(bad)


def test_png_adam7_imageio_bitexact(spark, tmp_path):
    """r9 parity pin: ImageIO de-interlaces Adam7 PNGs bit-exactly vs
    this decoder (PNG is lossless), so interlaced files flow through
    the JVM lane with identical pHashes — the arithmetic oracles hold
    verbatim for interlaced corpora too."""
    import os

    ids = spark.createDataFrame([(i,) for i in range(18)], "doc_id bigint")
    rows = M.synth_png_interlaced(ids).select("media_id", "payload").collect()
    d = str(tmp_path / "ipngs")
    os.makedirs(d)
    for r in rows:
        open(os.path.join(d, f"{r.media_id}.png"), "wb").write(bytes(r.payload))
    got = {r.media_id: r.phash for r in M.phash_image_files(spark, d).collect()}
    ref = {r.media_id: r.phash
           for r in M.phash_media(M.synth_png_interlaced(ids)).collect()}
    assert got == ref and len(got) == 18


def test_phash_dihedral_recovers_stripped_rotations(spark):
    """r9 dihedral pins: (1) EXIF-STRIPPED rotated/mirrored refetches
    (synth slots 8/9) land at distance 0 under the orbit-min hash —
    the case the oriented lane cannot recover; (2) when EXIF IS present
    the oriented lane agrees: for every planted pair the oriented
    normalization also pairs them at 0, and the dihedral hash of the
    tagged corpus equals the dihedral hash of the stripped corpus
    (EXIF never changes pixels); (3) the orbit min is exactly invariant
    under each of the 8 transforms on a non-square image."""
    import numpy as np

    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
    sigs = {r.media_id: r.phash for r in M.phash_media_dihedral(
        M.synth_jpeg_dihedral(ids)).collect()}
    for seed in (0, 10, 20):
        assert sigs[seed + 8] == sigs[seed] == sigs[seed + 9]

    # oriented lane agreement when EXIF is present: the tagged corpus's
    # dihedral hashes equal the stripped corpus's per media_id-fold,
    # and the oriented lane pairs the same planted refetches at 0
    osigs = {r.media_id: r.phash for r in M.phash_media_oriented(
        M.synth_jpeg_oriented(ids)).collect()}
    for seed in (0, 10, 20):
        assert osigs[seed + 8] == osigs[seed] == osigs[seed + 9]
    # the dihedral lane recovers the oriented corpus's planted pairs
    # WITHOUT reading the tag (stored pixels are dihedral transforms)
    dsigs_tagged = {r.media_id: r.phash for r in M.phash_media_dihedral(
        M.synth_jpeg_oriented(ids)).collect()}
    for seed in (0, 10, 20):
        assert (dsigs_tagged[seed + 8] == dsigs_tagged[seed]
                == dsigs_tagged[seed + 9])

    # exact orbit invariance on a non-square random image
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 16), dtype=np.uint8)

    def dmin(p):
        return min(
            M._phash_of_pixels(t, t.shape[1], t.shape[0])
            for t in (M._apply_exif_orientation(p, o) for o in range(1, 9))
        )

    base = dmin(px)
    for o in range(1, 9):
        assert dmin(M._apply_exif_orientation(px, o)) == base


def test_wav_depths_roundtrip_and_quarantines():
    """r9 WAV depth pins: (1) every depth (8/16/24-bit PCM, float32)
    normalizes to the 16-bit scale with the pinned floor semantics and
    round-trips encode_wav_typed -> decode_wav; (2) +1.0 clamps to
    32767, -1.0 lands at -32768; (3) partial 24-bit/float32 samples,
    out-of-range and NaN floats, and stereo half frames at any depth
    all raise — parity with the 16-bit path's quarantine contract."""
    rate, s = M.decode_wav(M.encode_wav_typed([0, 128, 255], 8000, 8))
    assert s == [-32768, 0, 32512] and rate == 8000
    rate, s = M.decode_wav(
        M.encode_wav_typed([-8388608, -1, 255, 8388607], 8000, 24)
    )
    assert s == [-32768, -1, 0, 32767]
    rate, s = M.decode_wav(
        M.encode_wav_typed([1.0, -1.0, 0.5, -0.25], 8000, 32)
    )
    assert s == [32767, -32768, 16384, -8192]
    # stereo downmix parity across depths: same normalized L/R as PCM16
    p8 = M.encode_wav_typed([0, 255, 128, 128], 8000, 8, channels=2)
    p16 = M.encode_wav_typed([-32768, 32512, 0, 0], 8000, 16, channels=2)
    assert M.decode_wav(p8)[1] == M.decode_wav(p16)[1]

    with pytest.raises(ValueError, match="partial sample"):
        M.decode_wav(M.encode_wav_typed([0, 1, 2], 8000, 24)[:-1])
    with pytest.raises(ValueError, match="partial sample"):
        M.decode_wav(M.encode_wav_typed([0.5, 0.5], 8000, 32)[:-2])
    with pytest.raises(ValueError, match="out of"):
        M.decode_wav(M.encode_wav_typed([0.5, 1.5], 8000, 32))
    with pytest.raises(ValueError, match="out of"):
        M.decode_wav(M.encode_wav_typed([float("nan")], 8000, 32))
    with pytest.raises(ValueError, match="half frame"):
        M.decode_wav(M.encode_wav_typed([1, 2, 3], 8000, 8, channels=2))
    with pytest.raises(ValueError, match="unsupported WAV"):
        M.decode_wav(M.encode_wav_typed([0], 8000, 8)[:20]
                     + b"\x02\x00" + M.encode_wav_typed([0], 8000, 8)[22:])


def test_gif_video_pairs_planted_replays(spark):
    """r9 pin: animated-GIF replays pair through the unchanged video
    machinery — +4-brightness re-encodes at per-frame distance 0, and
    contrast-reduced ones within the pairing threshold; a clip with a
    different frame count never pairs (the equal-length contract)."""
    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
    sigs = M.gif_video_phash(M.synth_gif_animated_dups(ids))
    pairs = {(r.id_a, r.id_b): r.max_frame_hamming
             for r in M.video_near_pairs(sigs).collect()}
    for seed in (0, 10, 20):
        assert pairs[(seed, seed + 8)] == 0
        assert pairs[(seed, seed + 9)] <= 6
    # different frame counts never pair: seeds 0 (2 frames) vs 1 (3)
    assert (0, 1) not in pairs


def test_phash_image_files_dihedral_parity(spark, tmp_path):
    """r9: the ImageIO lane's dihedral option produces the IDENTICAL
    orbit-min hashes as phash_media_dihedral on lossless payloads, and
    the spill bridge passes the flag through — so the rotation-
    invariant lane runs at native decode rate too."""
    import os

    ids = spark.createDataFrame([(i,) for i in range(15)], "doc_id bigint")
    rows = M.synth_texture_bmp(ids).select("media_id", "payload").collect()
    d = str(tmp_path / "imgs")
    os.makedirs(d)
    for r in rows:
        open(os.path.join(d, f"{r.media_id}.bmp"), "wb").write(bytes(r.payload))
    got = {r.media_id: r.phash
           for r in M.phash_image_files(spark, d, dihedral=True).collect()}
    ref = {r.media_id: r.phash
           for r in M.phash_media_dihedral(M.synth_texture_bmp(ids)).collect()}
    assert got == ref and len(got) == 15

    spilled = {
        r.media_id: r.phash
        for r in M.phash_media_spilled(
            spark, M.synth_texture_bmp(ids), str(tmp_path / "c"),
            dihedral=True,
        ).collect()
    }
    assert spilled == ref


def test_gif_frames_strict_stream_end_and_negative_spill_ids(spark, tmp_path):
    """r9 review fixes: (1) gif_frames enforces the strict-walk stream
    end — a truncated extension or missing trailer raises instead of
    returning a PARTIAL frame stack (which would silently change
    n_frames and break the equal-length video pairing); (2)
    spill_media_to_files rejects negative media_ids (the file lane's
    digit-run identity would drop the sign and attribute the hash to
    the wrong id)."""
    import numpy as np

    frames = np.stack(
        [((np.arange(36 * 40).reshape(36, 40)) * (f + 1) % 251)
         for f in range(2)]
    ).astype("uint8")
    p = M.encode_gif_animated(40, 36, frames, [5, 6])
    i1 = p.find(b"\x21\xf9\x04")
    i2 = p.find(b"\x21\xf9\x04", i1 + 1)
    with pytest.raises(ValueError, match="GCE truncated"):
        M.gif_frames(p[: i2 + 2])
    with pytest.raises(ValueError, match="missing trailer"):
        M.gif_frames(p[:-1])

    ids = spark.createDataFrame([(-5,), (3,)], "doc_id bigint")
    with pytest.raises(Exception, match="negative media_id"):
        M.spill_media_to_files(M.synth_texture_bmp(ids),
                               str(tmp_path / "neg"))


def test_spill_reconciles_written_vs_landed(spark, tmp_path, monkeypatch):
    """r10 advisory fix + r11 refinement: spill_media_to_files
    reconciles the job-side UNIQUE-FILENAME count against the files
    the DRIVER can actually see under staging, and refuses to stamp
    _SUCCESS on mismatch — the silent data-loss mode when dest is not
    executor-shared storage.  Exact duplicate rows (same id, same
    payload — what the exact-dedup stage's left_semi legitimately
    passes through) overwrite benignly and count once; the same id
    with a DIFFERENT payload is id reuse and raises loudly."""
    import os

    ok_ids = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    d = str(tmp_path / "ok")
    M.spill_media_to_files(M.synth_texture_bmp(ok_ids), d)
    assert os.path.exists(os.path.join(d, "_SUCCESS"))

    # exact duplicate in one partition: benign — one file, promoted
    dup = M.synth_texture_bmp(
        spark.createDataFrame([(4,), (4,)], "doc_id bigint")
    ).coalesce(1)
    ddest = str(tmp_path / "dup")
    M.spill_media_to_files(dup, ddest)
    assert os.path.exists(os.path.join(ddest, "_SUCCESS"))
    landed = [
        f for _r, _d, fs in os.walk(ddest) for f in fs if f != "_SUCCESS"
    ]
    assert landed == ["4.bmp"]

    # same id, DIFFERENT payload: id reuse — refuse before any promote
    clash = spark.createDataFrame(
        [(7, "bmp", bytearray(b"aaa")), (7, "bmp", bytearray(b"bbb"))],
        "media_id bigint, format string, payload binary",
    ).coalesce(1)
    with pytest.raises(Exception, match="DIFFERENT payloads"):
        M.spill_media_to_files(clash, str(tmp_path / "clash"))

    # the shared-storage mismatch itself: hide the landed files from
    # the driver's walk (local mode can't split the filesystem)
    monkeypatch.setattr(os, "walk", lambda *_a, **_k: iter(()))
    with pytest.raises(Exception, match="visible under|not executor-shared"):
        M.spill_media_to_files(
            M.synth_texture_bmp(ok_ids), str(tmp_path / "split")
        )
    monkeypatch.undo()
    # the half-written staging is torn down, nothing promoted
    assert not os.path.exists(str(tmp_path / "split"))
    assert not os.path.exists(str(tmp_path / "split") + ".staging")


def test_gif_dual_matte_stats_disposal2(spark):
    """r11 browser-parity gate: the dual-matte stats over the
    disposal-2 synth match an in-test numpy rebuild of both flattens —
    the exposed (cleared, never-repainted) region takes the background
    gray under the bg matte and 255 under the page matte, and the two
    column pairs DIFFER on every id (the r10 RGB reader could only
    produce the bg columns)."""
    import numpy as np

    ids = spark.createDataFrame([(k,) for k in range(7)], "doc_id bigint")
    got = {
        (r.media_id, r.frame_idx): (r.sum_bg, r.wsum_bg, r.sum_page, r.wsum_page)
        for r in M.gif_dual_matte_stats(M.synth_gif_disposal2(ids)).collect()
    }
    assert len(got) == 14
    diverged = 0
    for k in range(7):
        w, h = 40 + k % 9, 36 + (3 * k) % 11
        bgv = 70 + k % 100
        x0, y0, pw0, ph0 = 2 + k % 3, 1 + k % 3, 33 + k % 3, 30 + k % 3
        x1, y1, pw1, ph1 = 1 + k % 3, 2 + k % 3, 30 + k % 3, 22 + k % 3
        us = np.arange(pw0)[None, :]; vs = np.arange(ph0)[:, None]
        p0 = (19 * k + 5 * us * us + 7 * vs + 3 * us * vs) % 251
        us = np.arange(pw1)[None, :]; vs = np.arange(ph1)[:, None]
        p1 = (29 * k + 3 * us + 11 * vs + us * vs) % 251
        wts = (1 + (np.arange(h * w, dtype=np.int64) % 97)).reshape(h, w)
        for f, (rx, ry, rw, rh, tex) in enumerate(
            [(x0, y0, pw0, ph0, p0), (x1, y1, pw1, ph1, p1)]
        ):
            for matte, cols in [(bgv, (0, 1)), (255, (2, 3))]:
                e = np.full((h, w), matte, dtype=np.int64)
                e[ry:ry + rh, rx:rx + rw] = tex
                assert got[(k, f)][cols[0]] == int(e.sum()), (k, f, matte)
                assert got[(k, f)][cols[1]] == int((e * wts).sum()), (k, f, matte)
            if got[(k, f)][0] != got[(k, f)][2]:
                diverged += 1
    assert diverged == 14, "every frame leaves matte-exposed pixels"


def test_gif_disposal2_browser_flatten_pairs(spark):
    """r11: a disposal-2 partial-frame GIF pairs its planted BROWSER
    flatten (white matte) at distance 0 through the unchanged video
    lane — the cross-tool pairing the r10 spec-background reader
    missed; the contrast-reduced flatten lands within threshold."""
    ids = spark.createDataFrame([(k,) for k in range(10)], "doc_id bigint")
    sigs = M.gif_video_phash(
        M.synth_gif_disposal2_dups(ids), matte=(255, 255, 255)
    )
    pairs = {
        (r.id_a, r.id_b): r.max_frame_hamming
        for r in M.video_near_pairs(
            sigs, bits=63, bands=7, max_hamming=6
        ).collect()
    }
    assert pairs[(0, 8)] == 0, pairs
    assert (0, 9) in pairs and (8, 9) in pairs
    # under the DEFAULT background matte the original composites the
    # exposed region to its background gray, not white — it must NOT
    # hash equal to the white flatten
    sigs_bg = M.gif_video_phash(M.synth_gif_disposal2_dups(ids))
    pairs_bg = {
        (r.id_a, r.id_b): r.max_frame_hamming
        for r in M.video_near_pairs(
            sigs_bg, bits=63, bands=7, max_hamming=6
        ).collect()
    }
    assert pairs_bg.get((0, 8), 99) > 0


def test_gif_walk_loop_and_comment_extensions(spark):
    """r11: the strict block walk PARSES the NETSCAPE2.0 loop count and
    comment extensions instead of generically skipping them — absent
    loop reads None (play once), the first NETSCAPE wins, a non-NETSCAPE
    application extension degrades to a generic event (browsers ignore
    those), and the unchanged quarantine still raises on truncated
    extension sub-blocks."""
    import numpy as np

    import pytest

    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    spec = [{"px": px, "delay_cs": 2, "disposal": 1}]

    feats = M.gif_anim_features(
        M.encode_gif_frames(4, 3, spec, loop=7,
                            comments=[b"hello", b"x" * 300])
    )
    # (n, partial, transp, inter, d_bg, d_prev, loop, n_comments, bytes)
    assert feats == (1, 0, 0, 0, 0, 0, 7, 2, 305)

    # loop=None omits the extension entirely -> loop_count None
    feats = M.gif_anim_features(M.encode_gif_frames(4, 3, spec, loop=None))
    assert feats[6] is None and feats[7] == 0 and feats[8] == 0

    # a second NETSCAPE extension does not override the first
    p = bytearray(M.encode_gif_frames(4, 3, spec, loop=3))
    i = p.index(b"NETSCAPE2.0") - 3
    second = bytes(p[i:i + 19])
    assert second[3:14] == b"NETSCAPE2.0" and len(second) == 19
    forged = p[:i + 19] + bytearray(
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x63\x00\x00"
    ) + p[i + 19:]
    assert M.gif_anim_features(bytes(forged))[6] == 3

    # an unknown application extension is a generic event, not a loop
    other = p[:i + 19] + bytearray(
        b"\x21\xff\x0bXMP DataXMP\x03\x01\x63\x00\x00"
    ) + p[i + 19:]
    assert M.gif_anim_features(bytes(other))[6] == 3

    # truncated comment sub-block: quarantine unchanged
    good = M.encode_gif_frames(4, 3, spec, comments=[b"abcdef"])
    j = good.index(b"\x21\xfe")
    cut = good[: j + 4]  # inside the 6-byte comment sub-block
    with pytest.raises(ValueError):
        M.gif_anim_features(cut)

    # Spark surface: the planted loop-meta synth folds to arithmetic
    ids = spark.createDataFrame([(k,) for k in range(9)], "doc_id bigint")
    rows = {r.media_id: r for r in M.gif_feature_meta(
        M.synth_gif_loop_meta(ids)
    ).collect()}
    for k in range(9):
        r = rows[k]
        assert r.n_frames == 2 and r.partial_frames == 0
        if k % 3 == 0:
            assert r.loop_count is None
        else:
            assert r.loop_count == (5 * k + 2) % 60000
        assert r.n_comments == k % 3
        assert r.comment_bytes == sum(1 + (k + i) % 13 for i in range(k % 3))


# ------------------------------------------------------------- APNG codec


def _rgba(gray, alpha=255):
    import numpy as np

    g = np.asarray(gray, dtype=np.uint8)
    a = np.broadcast_to(
        np.asarray(alpha, dtype=np.uint8), g.shape
    ).astype(np.uint8)
    return np.dstack([g, g, g, a])


def test_apng_roundtrip_composite_semantics():
    """Encode→decode through every dispose/blend branch and check the
    composited canvases against hand-computed expectations (an
    independent derivation, not the engine's own arithmetic)."""
    import numpy as np

    base = np.full((3, 4), 10, np.uint8)
    p1 = np.array([[100, 110], [120, 130]], np.uint8)
    a1 = np.array([[255, 0], [255, 255]], np.uint8)
    p2 = np.array([[200, 210]], np.uint8)
    payload = M.encode_apng_frames(
        4, 3,
        [
            {"px": _rgba(base), "dispose": 0, "blend": 0},
            {"px": _rgba(p1, a1), "x": 1, "y": 1, "dispose": 2, "blend": 0},
            {"px": _rgba(p2, 128), "x": 2, "y": 0, "dispose": 0, "blend": 1},
        ],
        num_plays=5, bkgd=(7, 8, 9),
    )
    w, h, frames, bg, plays = M._apng_decode_frames_rgba(payload)
    assert (w, h, plays) == (4, 3, 5) and list(bg) == [7, 8, 9]
    # frame 0: opaque base
    assert (frames[0][:, :, 0] == 10).all() and (frames[0][:, :, 3] == 255).all()
    # frame 1: SOURCE replaces alpha too — the hole punches through an
    # OPAQUE canvas (the semantics GIF transparency cannot express)
    f1 = frames[1]
    assert f1[1, 1, 0] == 100 and f1[2, 1, 0] == 120 and f1[2, 2, 0] == 130
    assert f1[1, 2, 3] == 0
    # dispose 2 reverts the rect before frame 2 draws
    f2 = frames[2]
    assert f2[1, 1, 0] == 10 and f2[1, 1, 3] == 255
    # OVER onto opaque 10 at alpha 128: the exact half-up integer form
    for x, fg in ((2, 200), (3, 210)):
        exp = (255 * (fg * 128 + 10 * (255 - 128)) + 32512) // 65025
        assert f2[0, x, 0] == exp and f2[0, x, 3] == 255
    # alpha-weighted flatten: hole shows the matte, blend is matte-free
    _, _, white = M.apng_frames(payload, matte=(255, 255, 255))
    _, _, bgm = M.apng_frames(payload)
    assert white[1][1, 2, 0] == 255 and bgm[1][1, 2, 0] == 7
    assert white[2][0, 2, 0] == bgm[2][0, 2, 0]


def test_apng_over_onto_transparent_and_dispose_background():
    """OVER onto a transparent canvas keeps the source's fractional
    alpha (flatten weights it); dispose 1 clears only the frame rect."""
    import numpy as np

    base = np.full((3, 4), 40, np.uint8)
    payload = M.encode_apng_frames(
        4, 3,
        [
            {"px": _rgba(base), "dispose": 1, "blend": 0},
            {"px": _rgba(np.full((1, 2), 200, np.uint8), 100),
             "x": 1, "y": 1, "dispose": 0, "blend": 1},
        ],
    )
    _, _, frames, _, _ = M._apng_decode_frames_rgba(payload)
    f1 = frames[1]
    # dispose 1 after a full-canvas frame: everything outside the new
    # rect is transparent
    assert f1[0, 0, 3] == 0 and f1[2, 3, 3] == 0
    # OVER onto transparent = the source pixel, alpha preserved
    assert f1[1, 1, 0] == 200 and f1[1, 1, 3] == 100
    _, _, flat = M.apng_frames(payload, matte=(255, 255, 255))
    assert flat[1][1, 1, 0] == (200 * 100 + 255 * 155 + 127) // 255
    assert flat[1][0, 0, 0] == 255


def test_apng_first_frame_dispose_previous_is_background():
    import numpy as np

    payload = M.encode_apng_frames(
        2, 2,
        [
            {"px": _rgba(np.full((2, 2), 90, np.uint8)), "dispose": 2},
            {"px": _rgba(np.full((1, 1), 7, np.uint8)),
             "x": 0, "y": 0, "dispose": 0},
        ],
    )
    _, _, frames, _, _ = M._apng_decode_frames_rgba(payload)
    # spec: first-frame dispose PREVIOUS acts as BACKGROUND — the
    # second frame's unpainted pixels are transparent, not 90
    assert frames[1][1, 1, 3] == 0 and frames[1][0, 0, 0] == 7


def test_apng_hidden_default_image():
    """First fcTL after IDAT: the default image is a fallback for
    still readers (decode_png serves it) and is NOT composited."""
    import numpy as np

    anim = np.full((2, 3), 10, np.uint8)
    payload = M.encode_apng_frames(
        3, 2, [{"px": _rgba(anim)}],
        hidden_default=_rgba(np.full((2, 3), 200, np.uint8)),
    )
    _, _, frames, _, _ = M._apng_decode_frames_rgba(payload)
    assert len(frames) == 1 and (frames[0][:, :, 0] == 10).all()
    w, h, px = M.decode_png(payload)
    assert (px[:, :, 0] == 200).all()
    assert M.apng_anim_features(payload)[6] == 1


def test_apng_still_png_readers_unaffected():
    """decode_png on an APNG serves the default image (animation
    chunks are ancillary); a plain PNG raises in the APNG reader."""
    import numpy as np

    base = np.full((3, 4), 10, np.uint8)
    payload = M.encode_apng_frames(4, 3, [{"px": _rgba(base)}])
    w, h, px = M.decode_png(payload)
    assert (w, h) == (4, 3) and (px[:, :, 0] == 10).all()
    still = M.encode_png(4, 3, base)
    with pytest.raises(ValueError, match="acTL"):
        M._apng_decode_frames_rgba(still)


def test_apng_quarantines():
    import struct as st

    import numpy as np

    base = _rgba(np.full((3, 4), 10, np.uint8))
    sub = _rgba(np.full((2, 2), 5, np.uint8))
    ok = M.encode_apng_frames(4, 3, [{"px": base},
                                     {"px": sub, "x": 1, "y": 1}])
    # undefined ops / bad rects refused at the writer
    for bad in ({"dispose": 3}, {"blend": 2}, {"x": 3, "y": 2}):
        with pytest.raises(ValueError):
            M.encode_apng_frames(4, 3, [{"px": base},
                                        {"px": sub, "x": 1, "y": 1, **bad}])
    # IDAT-backed first frame must be full-canvas
    with pytest.raises(ValueError, match="full-canvas"):
        M.encode_apng_frames(4, 3, [{"px": sub, "x": 1, "y": 1}])
    # sequence-number gap quarantines
    i = ok.index(b"fcTL", ok.index(b"fcTL") + 4)
    forged = bytearray(ok)
    forged[i + 4: i + 8] = st.pack(">I", 9)
    body = bytes(forged[i + 4: i + 30])
    forged[i + 30: i + 34] = st.pack(
        ">I", __import__("zlib").crc32(b"fcTL" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="sequence"):
        M._apng_decode_frames_rgba(bytes(forged))
    # acTL frame-count mismatch
    j = ok.index(b"acTL")
    forged = bytearray(ok)
    forged[j + 4: j + 8] = st.pack(">I", 5)
    body = bytes(forged[j + 4: j + 12])
    forged[j + 12: j + 16] = st.pack(
        ">I", __import__("zlib").crc32(b"acTL" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="num_frames"):
        M._apng_decode_frames_rgba(bytes(forged))
    # damaged CRC quarantines (no silent skip)
    forged = bytearray(ok)
    forged[j + 12] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        M._apng_decode_frames_rgba(bytes(forged))
    # truncated stream
    with pytest.raises(ValueError):
        M._apng_decode_frames_rgba(ok[:40])
    # tRNS (palette alpha) is out of contract
    trns = ok[:j - 4] + M._png_chunk(b"tRNS", b"\x00") + ok[j - 4:]
    with pytest.raises(ValueError, match="tRNS"):
        M._apng_decode_frames_rgba(trns)


def test_apng_features_fold(spark):
    ids = spark.createDataFrame([(k,) for k in range(18)], "doc_id bigint")
    rows = {r.media_id: r for r in M.apng_feature_meta(
        M.synth_apng_composited(ids)
    ).collect()}
    for k in range(18):
        r = rows[k]
        assert r.n_frames == 3 and r.partial_frames == 2
        assert r.over_frames == 1 and r.default_hidden == 0
        assert r.dispose_bg == (k % 3 == 1) + ((k // 3) % 3 == 1)
        assert r.dispose_prev == (k % 3 == 2) + ((k // 3) % 3 == 2)
        assert r.num_plays == k % 7


def test_apng_gif_cross_format_pairs(spark):
    """The planted GIF↔APNG re-encodes pair at distance 0 through the
    unchanged video machinery; no cross-group pair sneaks in."""
    ids = spark.createDataFrame([(k,) for k in range(20)], "doc_id bigint")
    sigs = M.anim_video_phash(M.synth_apng_gif_pairs(ids))
    pairs = {(r.id_a, r.id_b): r.max_frame_hamming
             for r in M.video_near_pairs(
                 sigs, bits=63, bands=7, max_hamming=6).collect()}
    want = {(g + a, g + b) for g in (0, 10)
            for (a, b) in ((0, 8), (0, 9), (8, 9))}
    assert want <= set(pairs)
    assert all(pairs[p] == 0 for p in want)
    assert not any(a // 10 != b // 10 for a, b in pairs)


def test_anim_video_phash_dispatch_and_quarantine(spark):
    df = spark.createDataFrame(
        [(1, "image", b"neither format", "bin", 14)],
        "media_id bigint, kind string, payload binary, format string, "
        "n_bytes bigint",
    )
    with pytest.raises(Exception):
        M.anim_video_phash(df).collect()
    rows = M.anim_video_phash(df, null_on_error=True).collect()
    assert len(rows) == 1 and rows[0].phash is None


def test_spill_cross_partition_duplicates(spark, tmp_path):
    """r11 review fix: benign exact duplicates of one media_id SPLIT
    ACROSS partitions spill exactly one file, and cross-partition id
    reuse (same id, different payload) raises instead of landing two
    conflicting files in different shards."""
    import os

    import numpy as np

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(16).reshape(4, 4) * 15
    pay = M.encode_bmp(4, 4, px)
    rows = [(7, "image", pay, "bmp", len(pay))] * 2
    schema = ("media_id bigint, kind string, payload binary, "
              "format string, n_bytes bigint")
    # force the two copies into different partitions
    df = spark.createDataFrame(rows, schema).repartition(2)
    assert df.rdd.glom().map(len).collect().count(1) == 2
    dest = str(tmp_path / "spill")
    M.spill_media_to_files(df, dest)
    files = [os.path.join(r, f) for r, _d, fs in os.walk(dest) for f in fs
             if f.endswith(".bmp")]
    assert len(files) == 1

    other = M.encode_bmp(4, 4, np.ones((4, 4, 3), dtype=np.uint8))
    reuse = spark.createDataFrame(
        [(7, "image", pay, "bmp", len(pay)),
         (7, "image", other, "bmp", len(other))], schema
    ).repartition(2)
    with pytest.raises(ValueError, match="id reuse"):
        M.spill_media_to_files(reuse, str(tmp_path / "spill2"))


def test_spill_precheck_ids_false_single_pass(spark, tmp_path):
    """r11 optimization: precheck_ids=False skips the cross-partition
    duplicate-id aggregate (one payload pass instead of two) for callers
    whose upstream guarantees unique ids — same files land, and the
    WITHIN-partition id-reuse digest backstop still raises."""
    import os

    import numpy as np

    schema = ("media_id bigint, kind string, payload binary, "
              "format string, n_bytes bigint")
    rows = []
    for k in range(6):
        px = np.full((4, 4, 3), k * 11, dtype=np.uint8)
        pay = M.encode_bmp(4, 4, px)
        rows.append((k, "image", pay, "bmp", len(pay)))
    df = spark.createDataFrame(rows, schema).repartition(3)

    a, b = str(tmp_path / "checked"), str(tmp_path / "unchecked")
    M.spill_media_to_files(df, a)
    M.spill_media_to_files(df, b, precheck_ids=False)

    def landed(root):
        return sorted(
            f for r, _d, fs in os.walk(root) for f in fs
            if f.endswith(".bmp")
        )

    assert landed(a) == landed(b) and len(landed(b)) == 6

    pay0 = M.encode_bmp(4, 4, np.zeros((4, 4, 3), dtype=np.uint8))
    pay1 = M.encode_bmp(4, 4, np.ones((4, 4, 3), dtype=np.uint8))
    reuse = spark.createDataFrame(
        [(7, "image", pay0, "bmp", len(pay0)),
         (7, "image", pay1, "bmp", len(pay1))], schema
    ).coalesce(1)  # same partition: the digest backstop owns the error
    # with the precheck off the error surfaces from the executor task
    # (wrapped by py4j), not as a driver-side ValueError
    with pytest.raises(Exception, match="DIFFERENT payloads"):
        M.spill_media_to_files(
            reuse, str(tmp_path / "reuse"), precheck_ids=False
        )


def test_apng_multiple_fctl_before_idat_quarantines():
    """r11 review fix: the spec allows at most ONE fcTL before IDAT —
    a second one must quarantine, not replay IDAT as an extra frame."""
    import struct as st
    import zlib as _zlib

    import numpy as np

    base = _rgba(np.full((2, 3), 9, np.uint8))
    ok = M.encode_apng_frames(3, 2, [{"px": base}, {"px": base}])
    # rebuild: IHDR acTL fcTL(0) fcTL(1) IDAT IEND
    ihdr = st.pack(">IIBBBBB", 3, 2, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + base[y].tobytes() for y in range(2))
    fctl = lambda seq: M._png_chunk(b"fcTL", st.pack(
        ">IIIIIHHBB", seq, 3, 2, 0, 0, 0, 100, 0, 0))
    bad = (M._PNG_SIG + M._png_chunk(b"IHDR", ihdr)
           + M._png_chunk(b"acTL", st.pack(">II", 2, 0))
           + fctl(0) + fctl(1)
           + M._png_chunk(b"IDAT", _zlib.compress(raw))
           + M._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="before IDAT"):
        M._apng_decode_frames_rgba(bad)
    with pytest.raises(ValueError, match="before IDAT"):
        M.apng_anim_features(bad)
    # the valid two-frame stream still decodes
    assert len(M._apng_decode_frames_rgba(ok)[2]) == 2


def test_apng_optimized_pairs_planted_recall(spark):
    """r11: the planted flatten re-encodes pair their partial-frame
    originals at distance 0 (verbatim) / within threshold (contrast)
    through the white-matte anim lane; the arithmetic flatten helper is
    pinned bit-exact vs the decoder's white-matte flatten."""
    import numpy as np

    for k in (0, 7, 13):
        pay = M._apng_composited_payload(k)
        _, _, dec = M.apng_frames(pay, matte=(255, 255, 255))
        _, _, arith = M._apng_composited_flat_frames(k)
        for a, b in zip(dec, arith):
            assert np.array_equal(a[:, :, 0], b)

    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id bigint")
    sigs = M.apng_video_phash(
        M.synth_apng_optimized_dups(ids), matte=(255, 255, 255)
    )
    pairs = {(r.id_a, r.id_b): r.max_frame_hamming
             for r in M.video_near_pairs(
                 sigs, bits=63, bands=7, max_hamming=6).collect()}
    for g in (0, 10):
        assert pairs[(g, g + 8)] == 0
        assert pairs[(g, g + 9)] <= 6
        assert (g + 8, g + 9) in pairs
    assert not any(a // 10 != b // 10 for a, b in pairs)


def test_gif_lzw_slice_table_decoder_differential():
    """r11 pin for the slice-table LZW decoder: the table stores
    (start, len) spans into the output buffer instead of materialized
    byte strings, so emissions are memoryview copies.  Differential
    against a straight serial reference (the pre-r11 table-of-bytes
    loop) on encoder round-trips — low-entropy runs (KwKwK-heavy),
    mod-251 textures (4096-entry table resets), width bumps — and on
    bit-flip / truncation corruptions: output bytes, error PRESENCE and
    error MESSAGE must all agree."""
    import random

    import numpy as np

    def reference(data: bytes, mcs: int, need: int) -> bytes:
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        roots = [bytes([i]) for i in range(clear)]
        table = roots + [b"", b""]
        next_code, width_bits = eoi + 1, mcs + 1
        out = bytearray()
        bits = int.from_bytes(bytes(data), "little")
        total_bits, pos = len(data) * 8, 0
        prev = None
        while len(out) < need:
            if total_bits - pos < width_bits:
                raise ValueError("GIF LZW stream truncated")
            code = (bits >> pos) & ((1 << width_bits) - 1)
            pos += width_bits
            if code == clear:
                table = roots + [b"", b""]
                next_code, width_bits, prev = eoi + 1, mcs + 1, None
                continue
            if code == eoi:
                if len(out) < need:
                    raise ValueError("GIF pixel data short of descriptor size")
                break
            if prev is None:
                if code >= clear:
                    raise ValueError(f"GIF LZW bad first code {code}")
                entry = table[code]
            else:
                if code < next_code:
                    entry = table[code]
                elif code == next_code:
                    entry = prev + prev[:1]
                else:
                    raise ValueError(f"GIF LZW code {code} out of range")
                if next_code < 4096:
                    table.append(prev + entry[:1])
                    next_code += 1
                    if next_code == (1 << width_bits) and width_bits < 12:
                        width_bits += 1
            out += entry
            prev = entry
        return bytes(out[:need])

    def image_blocks(payload: bytes):
        p, flags = 13, payload[10]
        if flags & 0x80:
            p += 3 * (2 << (flags & 7))
        while p < len(payload) and payload[p] != 0x3B:
            if payload[p] == 0x21:
                p += 2
                while payload[p]:
                    p += 1 + payload[p]
                p += 1
                continue
            assert payload[p] == 0x2C
            iw = int.from_bytes(payload[p + 5:p + 7], "little")
            ih = int.from_bytes(payload[p + 7:p + 9], "little")
            lflags = payload[p + 9]
            p += 10
            if lflags & 0x80:
                p += 3 * (2 << (lflags & 7))
            mcs = payload[p]
            p += 1
            data = bytearray()
            while payload[p]:
                ln = payload[p]
                data += payload[p + 1:p + 1 + ln]
                p += 1 + ln
            p += 1
            yield bytes(data), mcs, iw * ih

    rng = random.Random(11)
    n_cases = n_err = 0
    for t in range(40):
        w, h = rng.randint(3, 80), rng.randint(3, 70)
        mode = t % 4
        xs, ys = np.arange(w)[None, :], np.arange(h)[:, None]
        if mode == 0:      # constant runs: KwKwK-heavy
            px = np.full((h, w), t % 7, dtype=np.uint8)
        elif mode == 1:    # texture: table churn to 4096 resets
            px = ((17 * t + 3 * xs * xs + 7 * ys * ys) % 251).astype(np.uint8)
        elif mode == 2:    # tiny palette: width bumps from mcs=2
            px = ((xs + ys + t) % 3).astype(np.uint8)
        else:              # stripes: mid-entropy
            px = ((xs // 2 + t) % 16).astype(np.uint8)
        payload = M.encode_gif_frames(w, h, [{"px": px}])
        for data, mcs, need in image_blocks(payload):
            variants = [data]
            for _ in range(4):
                b2 = bytearray(data)
                b2[rng.randrange(len(b2))] ^= 1 << rng.randrange(8)
                variants.append(bytes(b2))
                variants.append(data[:rng.randrange(len(data))])
            for v in variants:
                n_cases += 1
                try:
                    want = ("ok", reference(v, mcs, need))
                except ValueError as e:
                    want = ("err", str(e))
                    n_err += 1
                try:
                    got = ("ok", M._gif_lzw_decode(v, mcs, need))
                except ValueError as e:
                    got = ("err", str(e))
                assert got == want, (mcs, need, want[0], got[0])
    assert n_cases > 300 and n_err > 20  # corruptions actually exercised
