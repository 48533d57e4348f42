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
    # stereo payload must be refused, not mis-parsed
    good = bytearray(M.encode_wav([1, 2, 3], 8000))
    good[22] = 2  # channels = 2
    with pytest.raises(ValueError):
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
