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
