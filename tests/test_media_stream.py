"""Continuous image ingestion: persisted pHash signature index, exact +
perceptual dedup at ingest, crash-replay immunity, compaction — the
image analog of the text pipeline's LSH/span index tests."""

from __future__ import annotations

import os
import shutil

from slice_db_spark.operators import multimodal as M
from slice_db_spark.streaming import media as SM


def _synth_rows(spark, ids):
    return M.synth_texture_bmp(
        spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    )


def _land(df, land, name, mt):
    """Write one batch as a single parquet file with a pinned mtime
    (file-source batch order is mtime order)."""
    tmp = os.path.join(land, f".tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dst = os.path.join(land, name)
    shutil.copy(os.path.join(tmp, part), dst)
    os.utime(dst, (mt, mt))
    shutil.rmtree(tmp)


def test_media_ingest_three_batch_growth(spark, tmp_path):
    """Exact refetches, brightness near-dups (vs the standing index),
    and corrupt payloads all drop/quarantine per batch; the signature
    index grows with the survivors; a drained replay is a no-op."""
    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "phash_idx")
    rej = str(tmp_path / "rejects")
    quar = str(tmp_path / "quarantine")

    _land(_synth_rows(spark, [0, 1, 2]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej)
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1, 2}
    assert spark.read.parquet(idx).count() == 3
    assert SM.read_phash_meta(idx) == {"bits": 63, "bands": 7, "max_hamming": 6, "fingerprint": "phash"}

    # batch 2: id 8 = brightness replay of id 0 (perceptual near-dup via
    # the STANDING index), id 10 = fresh texture, id 100 = byte-identical
    # refetch of id 0's payload under a new id (exact dedup)
    b1 = _synth_rows(spark, [8, 10])
    refetch = _synth_rows(spark, [0]).collect()[0]
    b1 = b1.unionByName(
        spark.createDataFrame(
            [(100, refetch.kind, refetch.payload, refetch.format,
              refetch.n_bytes)],
            M.MEDIA_SCHEMA,
        )
    )
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej)
    got = {r.media_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 2, 10}
    assert spark.read.parquet(idx).count() == 4
    neardup = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert neardup == {8}

    # batch 3: id 18 near-dups batch-2's survivor (id 10), id 20 fresh,
    # plus one undecodable payload -> quarantine
    b2 = _synth_rows(spark, [18, 20]).unionByName(
        spark.createDataFrame(
            [(999, "image", bytearray(b"not an image"), "bmp", 12)],
            M.MEDIA_SCHEMA,
        )
    )
    _land(b2, land, "b2.parquet", 1_000_000_200)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej)
    got = {r.media_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 2, 10, 20}
    assert {r.media_id for r in spark.read.json(quar).collect()} == {999}

    # drained replay: nothing changes
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej)
    assert {r.media_id for r in spark.read.parquet(out).collect()} == got


def test_media_ingest_crash_replay_self_immune(spark, tmp_path):
    """Crash between index append and corpus append: on replay the
    batch's signatures are ALREADY in the index under its own ids — the
    id exclusion must land the image intact instead of dropping it as a
    perceptual dup of itself."""
    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "phash_idx")

    _land(_synth_rows(spark, [0, 1]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx)

    # simulate the crash state for batch 2: id 30's signature landed,
    # corpus row did not
    from pyspark.sql import functions as F

    M.phash_media(_synth_rows(spark, [30])).select(
        F.col("media_id").alias("corpus_id"), "phash"
    ).write.mode("append").parquet(idx)

    _land(_synth_rows(spark, [30]), land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx)
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1, 30}


def test_compact_phash_index_dedups_and_preserves_meta(spark, tmp_path):
    """Replayed appends leave duplicate (corpus_id, phash) rows; the
    compactor reclaims them, keeps the banding sidecar, and the probe
    behaves identically afterwards."""
    from pyspark.sql import functions as F

    from slice_db_spark.operators.dedup import hamming_near_pairs_asym
    from slice_db_spark.plans.scale import compact_phash_index

    idx = str(tmp_path / "idx")
    sigs = M.phash_media(_synth_rows(spark, [0, 1, 2])).select(
        F.col("media_id").alias("corpus_id"), "phash"
    )
    sigs.write.mode("append").parquet(idx)
    sigs.write.mode("append").parquet(idx)  # replayed duplicate rows
    SM.write_phash_meta(idx, 63, 7, 6)

    report = compact_phash_index(spark, idx)
    assert report["files_after"] <= report["files_before"]
    assert spark.read.parquet(idx).count() == 3  # duplicates reclaimed
    assert SM.read_phash_meta(idx) == {"bits": 63, "bands": 7, "max_hamming": 6, "fingerprint": "phash"}

    probe = M.phash_media(_synth_rows(spark, [8]))  # brightness replay of 0
    hits = hamming_near_pairs_asym(
        probe, spark.read.parquet(idx), "phash"
    ).collect()
    assert {(r.new_id, r.corpus_id, r.hamming) for r in hits} == {(8, 0, 0)}


def test_media_ingest_cross_format_perceptual_dedup(spark, tmp_path):
    """A re-encode of the SAME pixels (baseline JPEG in batch 1,
    progressive JPEG in batch 2) has a different payload hash — exact
    dedup cannot catch it — but an IDENTICAL pHash: the perceptual probe
    against the standing index drops it.  This is the format-shift
    refetch case only perceptual dedup covers."""
    import numpy as np

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "phash_idx")
    rej = str(tmp_path / "rej")

    k = 7
    w, h = 8 * (1 + k % 3), 8 * (1 + (3 * k + 1) % 2)
    import numpy as np

    bys, bxs = np.mgrid[0 : h // 8, 0 : w // 8]
    blocks = (128 + 2 * ((3 * k + 5 * bxs + 7 * bys) % 48)).astype(np.uint8)
    px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    base = M.encode_jpeg(w, h, px)
    prog = M.encode_jpeg_progressive(w, h, px)
    assert base != prog  # different bytes, same pixels

    b0 = spark.createDataFrame(
        [(1, "image", bytearray(base), "jpeg", len(base))], M.MEDIA_SCHEMA
    )
    _land(b0, land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx, rejects=rej)

    b1 = spark.createDataFrame(
        [(2, "image", bytearray(prog), "jpeg", len(prog))], M.MEDIA_SCHEMA
    )
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx, rejects=rej)

    assert {r.media_id for r in spark.read.parquet(out).collect()} == {1}
    neardup = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert neardup == {2}


def test_media_ingest_audio_lane(spark, tmp_path):
    """The ingest lane serves audio too: fingerprint='audio' swaps the
    signature function and banding (30/6, threshold 4) while sharing
    every other stage — the amplitude-doubled replay drops against the
    standing index, corrupt WAVs quarantine, and a mode-mismatched
    re-ingest raises instead of mixing incomparable signatures."""
    import pytest

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "audio")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "afp_idx")
    rej = str(tmp_path / "rej")
    quar = str(tmp_path / "quar")

    def clips(ids):
        return M.synth_audio_clips(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    _land(clips([0, 1]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, quarantine=quar, fingerprint="audio")
    meta = SM.read_phash_meta(idx)
    assert meta["fingerprint"] == "audio" and (meta["bits"], meta["bands"]) == (30, 6)

    # batch 2: id 8 = amplitude-doubled replay of id 0 (near-dup via the
    # standing index), id 12 fresh, one corrupt payload
    b1 = clips([8, 12]).unionByName(
        spark.createDataFrame(
            [(999, "audio", bytearray(b"not a wav"), "wav", 9)], M.MEDIA_SCHEMA
        )
    )
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, quarantine=quar, fingerprint="audio")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1, 12}
    assert {r.media_id for r in spark.read.json(rej + ".neardup").collect()} == {8}
    assert {r.media_id for r in spark.read.json(quar).collect()} == {999}

    # mode mismatch against the standing index raises
    _land(clips([20]), land, "b2.parquet", 1_000_000_200)
    with pytest.raises(Exception, match="fingerprint"):
        SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                               fingerprint="phash")


def test_media_index_sidecar_first_and_untagged_refusal(spark, tmp_path):
    """REVIEW r7 pins: (1) the sidecar lands BEFORE the first signature
    append, so no crash window can leave rows whose fingerprint mode is
    unknowable; (2) an index with rows but no sidecar (hand-built or
    tampered) is refused instead of silently mixed into."""
    import pytest

    from pyspark.sql import functions as F

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "idx")

    _land(_synth_rows(spark, [0]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx)
    assert SM.read_phash_meta(idx)["fingerprint"] == "phash"

    # untagged index: rows, no sidecar -> refused either mode
    idx2 = str(tmp_path / "idx2")
    M.phash_media(_synth_rows(spark, [1])).select(
        F.col("media_id").alias("corpus_id"), "phash"
    ).write.mode("append").parquet(idx2)
    _land(_synth_rows(spark, [2]), land, "b1.parquet", 1_000_000_100)
    with pytest.raises(Exception, match="no _phash_meta"):
        SM.ingest_media_stream(spark, land, out, str(tmp_path / "ck2"),
                               phash_index=idx2)


def test_media_ingest_video_lane(spark, tmp_path):
    """The ingest lane serves video: fingerprint='video' hashes every
    frame, the index carries (frame_idx, n_frames), and the aligned-
    sequence contract holds continuously — the brightness-shifted clip
    replay drops against the standing index, a corrupt stream
    quarantines, and a crash-replayed epoch lands intact (id
    self-exclusion)."""
    from pyspark.sql import functions as F

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "video")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "vfp_idx")
    rej = str(tmp_path / "rej")
    quar = str(tmp_path / "quar")

    def clips(ids):
        return M.synth_texture_y4m(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    _land(clips([0, 1]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, quarantine=quar, fingerprint="video")
    meta = SM.read_phash_meta(idx)
    assert meta["fingerprint"] == "video"
    assert set(spark.read.parquet(idx).columns) == {
        "corpus_id", "frame_idx", "phash", "n_frames"}

    # batch 2: id 8 = brightness replay of clip 0 (every frame distance 0
    # via the standing index), id 12 fresh, one corrupt payload
    b1 = clips([8, 12]).unionByName(
        spark.createDataFrame(
            [(999, "video", bytearray(b"not a y4m"), "y4m", 9)], M.MEDIA_SCHEMA
        )
    )
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, quarantine=quar, fingerprint="video")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1, 12}
    assert {r.media_id for r in spark.read.json(rej + ".neardup").collect()} == {8}
    assert {r.media_id for r in spark.read.json(quar).collect()} == {999}

    # crash state: id 30's per-frame signatures already in the index
    sigs30 = M.video_phash(clips([30]))
    n30 = sigs30.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"))
    sigs30.join(n30, "media_id").select(
        F.col("media_id").alias("corpus_id"), "frame_idx", "phash", "n_frames"
    ).write.mode("append").parquet(idx)
    _land(clips([30]), land, "b2.parquet", 1_000_000_200)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, quarantine=quar, fingerprint="video")
    got = {r.media_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 12, 30}  # own signatures ignored, clip intact


def test_media_ingest_cross_batch_id_reuse_quarantined(spark, tmp_path):
    """r8 ADVICE fix: a LATER batch reusing an existing media_id with a
    DIFFERENT payload must quarantine (``<quarantine>.idreuse``), not
    append a second frame sequence under the same corpus_id — the mixed
    sequence would inflate max_frame_hamming and silently break near-dup
    recall of the original clip.  After the guard, a brightness replay
    of the ORIGINAL clip still matches the standing index."""
    from pyspark.sql import functions as F

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "video")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "idx")
    rej = str(tmp_path / "rej")
    quar = str(tmp_path / "quar")

    def clips(ids):
        return M.synth_texture_y4m(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    _land(clips([0, 1]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, quarantine=quar, fingerprint="video")
    idx0 = spark.read.parquet(idx).where(F.col("corpus_id") == 0)
    n_frames_0 = idx0.count()

    # batch 2: id 0 re-arrives carrying clip 2's payload (cross-batch id
    # reuse), plus a fresh clip
    other = clips([2]).collect()[0]
    b1 = clips([12]).unionByName(
        spark.createDataFrame(
            [(0, "video", other.payload, "y4m", other.n_bytes)],
            M.MEDIA_SCHEMA,
        )
    )
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, quarantine=quar, fingerprint="video")
    reused = {r.media_id
              for r in spark.read.json(quar + ".idreuse").collect()}
    assert reused == {0}
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1, 12}
    # index still carries exactly ONE clean sequence for corpus_id 0
    idx0 = spark.read.parquet(idx).where(F.col("corpus_id") == 0)
    assert idx0.count() == n_frames_0
    assert {r.n_frames for r in idx0.collect()} == {n_frames_0}

    # batch 3: the brightness replay of the ORIGINAL clip 0 must still be
    # recalled as a near-dup — the recall the mixed sequence would lose
    _land(clips([8]), land, "b2.parquet", 1_000_000_200)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, quarantine=quar, fingerprint="video")
    assert {r.media_id
            for r in spark.read.json(rej + ".neardup").collect()} == {8}
    assert 8 not in {r.media_id for r in spark.read.parquet(out).collect()}


def test_media_ingest_file_source(spark, tmp_path):
    """r8 file-backed lane: raw image FILES drain through the binaryFile
    streaming source into the SAME dedup pipeline — exact refetches drop
    on the payload hash even under a new digit-less name (path-hash id
    fallback), brightness replays drop against the standing index, and
    corrupt files quarantine."""
    import time

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "idx")
    rej = str(tmp_path / "rej")
    quar = str(tmp_path / "quar")

    payloads = {r.media_id: bytes(r.payload)
                for r in _synth_rows(spark, [0, 1, 8]).collect()}

    def put(name, data, mt):
        p = os.path.join(land, name)
        with open(p, "wb") as f:
            f.write(data)
        os.utime(p, (mt, mt))

    put("0.bmp", payloads[0], 1_000_000_000)
    put("1.bmp", payloads[1], 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej, source="files")
    rows = {r.media_id: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].format == "bmp" and bytes(rows[0].payload) == payloads[0]

    # batch 2: brightness replay (near-dup), byte-identical refetch under
    # a DIGIT-LESS name (exact dup via the path-hash id fallback), and a
    # corrupt file
    put("8.bmp", payloads[8], 1_000_000_100)
    put("refetch.bmp", payloads[0], 1_000_000_100)
    put("junk.bmp", b"not an image", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej, source="files")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1}
    assert {r.media_id
            for r in spark.read.json(rej + ".neardup").collect()} == {8}
    quarantined = [r.media_id for r in spark.read.json(quar).collect()]
    assert len(quarantined) == 1 and quarantined[0] not in (0, 1, 8)


def test_media_id_reuse_with_fresh_alias_still_lands(spark, tmp_path):
    """REVIEW r8 pin: the id-reuse guard runs BEFORE the per-payload
    winner selection — a NEW payload arriving under BOTH a reused id and
    a fresh id must land under the fresh id (previously the min-id
    winner row was quarantined and the payload vanished entirely)."""
    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "video")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "idx")
    quar = str(tmp_path / "quar")

    def clips(ids):
        return M.synth_texture_y4m(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    _land(clips([5]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, fingerprint="video")

    # batch 2: clip 2's payload arrives under BOTH id 5 (reused) and 7
    other = clips([2]).collect()[0]
    b1 = spark.createDataFrame(
        [(5, "video", other.payload, "y4m", other.n_bytes),
         (7, "video", other.payload, "y4m", other.n_bytes)],
        M.MEDIA_SCHEMA,
    )
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, fingerprint="video")
    rows = {r.media_id: bytes(r.payload)
            for r in spark.read.parquet(out).collect()}
    assert set(rows) == {5, 7}
    assert rows[7] == bytes(other.payload)       # payload landed under 7
    assert rows[5] != bytes(other.payload)       # original clip 5 intact
    reused = {r.media_id
              for r in spark.read.json(quar + ".idreuse").collect()}
    assert reused == {5}


def test_media_corpus_legacy_hash_refused_and_migrated(spark, tmp_path):
    """r8 ADVICE fix: the media corpus content_hash is the FULL 128-bit
    md5; a legacy corpus carrying the 60-bit BIGINT prefix is refused
    (mixing widths breaks the exact-dedup anti-join), and
    migrate_media_corpus rewrites it in place, after which a
    byte-identical refetch drops exactly as before."""
    import pytest

    from pyspark.sql import functions as F

    from slice_db_spark.operators.hashing import hash64

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")

    # hand-write a legacy corpus (pre-r8 layout: BIGINT hash64 prefix)
    legacy = _synth_rows(spark, [0, 1]).withColumn(
        "content_hash", hash64(F.col("payload"))
    )
    legacy.write.mode("overwrite").parquet(out)

    _land(_synth_rows(spark, [2]), land, "b0.parquet", 1_000_000_000)
    with pytest.raises(Exception, match="legacy"):
        SM.ingest_media_stream(spark, land, out, ckpt)

    report = SM.migrate_media_corpus(spark, out)
    assert report == {"migrated": True, "rows": 2}
    assert dict(spark.read.parquet(out).dtypes)["content_hash"] == "string"
    # idempotent second run
    assert SM.migrate_media_corpus(spark, out) == {"migrated": False, "rows": 2}

    # ingest proceeds, and a refetch of a migrated row still drops on the
    # recomputed hash
    refetch = _synth_rows(spark, [0]).collect()[0]
    b1 = spark.createDataFrame(
        [(100, refetch.kind, refetch.payload, refetch.format,
          refetch.n_bytes)],
        M.MEDIA_SCHEMA,
    )
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, str(tmp_path / "ck2"))
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1, 2}


def test_media_ingest_zero_frame_video_and_id_collisions(spark, tmp_path):
    """REVIEW r7 pins: (1) a header-only zero-frame Y4M stream takes the
    quarantine path instead of silently bypassing perceptual dedup
    forever; (2) two rows sharing a media_id with DIFFERENT payloads
    collapse deterministically to one (min content hash) instead of
    interleaving two clips' frame sequences in the index."""
    from pyspark.sql import functions as F

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "video")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "idx")
    quar = str(tmp_path / "quar")

    def clip_rows(ids):
        return M.synth_texture_y4m(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    empty = M.encode_y4m(8, 8, __import__("numpy").zeros((0, 8, 8), "uint8"))
    collide = clip_rows([1]).collect()[0]
    b0 = clip_rows([0, 1]).unionByName(
        spark.createDataFrame(
            [
                (7, "video", bytearray(empty), "y4m", len(empty)),
                # id 1 again with a DIFFERENT payload (clip 2's bytes)
                (1, collide.kind,
                 clip_rows([2]).collect()[0].payload, "y4m", 1),
            ],
            M.MEDIA_SCHEMA,
        )
    )
    _land(b0, land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, fingerprint="video")
    assert {r.media_id for r in spark.read.json(quar).collect()} == {7}
    rows = spark.read.parquet(out).collect()
    assert sorted(r.media_id for r in rows) == [0, 1]  # one row per id
    # the index carries exactly one clip's frames for id 1
    n1 = spark.read.parquet(idx).where(F.col("corpus_id") == 1)
    n_frames = {r.n_frames for r in n1.collect()}
    assert len(n_frames) == 1 and n1.count() == n_frames.pop()


def test_media_ingest_dims_gate(spark, tmp_path):
    """r8 image curation gate at ingest: header-parsed dims drop
    too-small / too-skewed images to <rejects>.gate BEFORE the signature
    decode, keepers land normally, an unparseable header passes through
    to the codec quarantine (not the gate), and the gate refuses
    non-image lanes at plan time."""
    import pytest

    from pyspark.sql import functions as F

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")
    rej = str(tmp_path / "rejects")
    quar = str(tmp_path / "quarantine")

    # varied dims: keep iff min(w,h) >= 32 and max <= 3*min
    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id bigint")
    batch = M.synth_varied_bmp(ids)
    dims = {r.media_id: (4 + (7 * r.media_id) % 61, 4 + (11 * r.media_id) % 93)
            for r in batch.select("media_id").collect()}
    keep = {k for k, (w, h) in dims.items()
            if min(w, h) >= 32 and max(w, h) <= 3 * min(w, h)}
    drop = set(dims) - keep
    assert keep and drop  # the synth really spans the gate
    # plus one header-garbage payload: must reach the CODEC quarantine
    batch = batch.unionByName(spark.createDataFrame(
        [(999, "image", b"BM\x01", "bmp", 3)], M.MEDIA_SCHEMA))
    _land(batch, land, "b0.parquet", 1_000_000_000)

    SM.ingest_media_stream(spark, land, out, ckpt, quarantine=quar,
                           rejects=rej, min_side=32, max_aspect=3)
    landed = {r.media_id for r in spark.read.parquet(out).collect()}
    assert landed == keep
    gated = {r.media_id for r in spark.read.json(rej + ".gate").collect()}
    assert gated == drop
    quard = {r.media_id for r in spark.read.json(quar).collect()}
    assert quard == {999}

    # non-image lanes refuse the dims gate at plan time
    with pytest.raises(ValueError, match="phash"):
        SM.ingest_media_stream(spark, land, out, ckpt,
                               fingerprint="audio", min_side=32)


def test_media_ingest_audio_time_windows(spark, tmp_path):
    """r8 time-window audio lane: windows_per_sec is recorded in the
    index sidecar, a resampled (2x-rate) replay arriving in a LATER
    batch drops via the standing index (the continuous resample-robust
    regime), a mismatched re-ingest raises, and non-audio lanes refuse
    the knob at plan time."""
    import pytest

    land = str(tmp_path / "land")
    os.makedirs(land)
    out = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "afp_idx")
    rej = str(tmp_path / "rejects")

    ids0 = spark.createDataFrame([(0,), (1,)], "doc_id bigint")
    b0 = M.synth_audio_clips_resampled(ids0)   # slots 0/1: 16kHz originals
    _land(b0, land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, fingerprint="audio",
                           windows_per_sec=320)
    meta = SM.read_phash_meta(idx)
    assert meta["fingerprint"] == "audio" and meta["windows_per_sec"] == 320

    # batch 2: id 8 = 32kHz sample-duplicated replay of id 0 — the
    # time-window fingerprint matches the STANDING index entry exactly
    b1 = M.synth_audio_clips_resampled(
        spark.createDataFrame([(8,), (25,)], "doc_id bigint"))
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           rejects=rej, fingerprint="audio",
                           windows_per_sec=320)
    landed = {r.media_id for r in spark.read.parquet(out).collect()}
    assert landed == {0, 1, 25}            # 8 dropped as a near-dup
    dropped = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert dropped == {8}

    # mismatched windowing on an existing index raises
    _land(M.synth_audio_clips_resampled(
        spark.createDataFrame([(30,)], "doc_id bigint")),
        land, "b2.parquet", 1_000_000_200)
    with pytest.raises(Exception, match="windows_per_sec"):
        SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                               fingerprint="audio")
    # non-audio lanes refuse the knob
    with pytest.raises(ValueError, match="audio"):
        SM.ingest_media_stream(spark, land, out, ckpt,
                               windows_per_sec=320)


def test_media_ingest_dihedral_lane(spark, tmp_path):
    """r9 rotation-invariant ingest lane: batch 0 builds the DIHEDRAL
    signature index (sidecar records the mode); batch 1's EXIF-stripped
    90-degree-rotated refetch of a standing image drops to the neardup
    rejects — the refetch the plain phash lane would admit — while a
    fresh image lands; a plain-phash probe against the dihedral index
    refuses (sidecar mismatch)."""
    import pytest

    land = str(tmp_path / "land")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quar")
    rej = str(tmp_path / "rej")
    os.makedirs(land)

    def jpeg_rows(ids):
        return M.synth_jpeg_dihedral(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    _land(jpeg_rows(ids=[0, 1]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="phash-dihedral")
    assert SM.read_phash_meta(idx)["fingerprint"] == "phash-dihedral"
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1}

    # id 8 = EXIF-stripped 90-degree rotation of id 0 (synth slot 8),
    # id 3 = fresh content
    _land(jpeg_rows(ids=[8, 3]), land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="phash-dihedral")
    got = {r.media_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 3}
    neardup = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert neardup == {8}

    # sidecar mismatch: probing the dihedral index in plain-phash mode
    # must refuse instead of silently matching nothing
    _land(jpeg_rows(ids=[5]), land, "b2.parquet", 1_000_000_200)
    with pytest.raises(Exception, match="fingerprint|meta|mismatch"):
        SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                               quarantine=quar, rejects=rej,
                               fingerprint="phash")


def test_media_ingest_jvm_decode_lane(spark, tmp_path):
    """r9 JVM-decode ingest: the same three-batch growth contract as the
    Python lane, but signatures come from the executor-spill + ImageIO
    scan — (1) BMP hashes are bit-exact vs the Python lane, so a
    near-dup replay still rejects against an index the PYTHON lane
    built (cross-lane probe parity); (2) undecodable payloads quarantine
    under the JVM lane too; (3) the non-image lanes refuse the flag."""
    import pytest
    from pyspark.sql import functions as SF

    land = str(tmp_path / "land")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quar")
    rej = str(tmp_path / "rej")
    os.makedirs(land)

    # batch 0 builds the index through the PYTHON lane
    _land(_synth_rows(spark, [0, 1, 2]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej)
    # batch 1 probes through the JVM lane: id 8 = brightness replay of
    # id 0 (synth plants it) -> neardup reject; id 10 fresh; one
    # undecodable payload -> quarantine
    b1 = _synth_rows(spark, [8, 10]).unionByName(
        spark.createDataFrame(
            [(99, "image", bytearray(b"not an image at all......"), "bmp", 25)],
            M.MEDIA_SCHEMA,
        )
    )
    _land(b1, land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej, jvm_decode=True)
    got = {r.media_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 2, 10}
    neardup = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert neardup == {8}
    quarantined = {r.media_id for r in spark.read.json(quar).collect()}
    assert quarantined == {99}
    # the spill staging is cleaned up after each batch
    assert not os.path.exists(out + ".jvmspill") or not any(
        os.scandir(out + ".jvmspill")
    )

    with pytest.raises(ValueError, match="image lanes"):
        SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                               fingerprint="audio", jvm_decode=True)


def test_media_ingest_gif_video_lane(spark, tmp_path):
    """r10 gif-video fingerprint: animated GIFs get CONTINUOUS dedup
    rights through the per-frame video contract — (1) batch 0 builds
    the index from partial-frame composited GIFs; (2) batch 1's
    flattened re-encode of a batch-0 animation (the optimizer-vs-
    re-encoder case) rejects as a near-dup against the standing index
    while a fresh animation ingests; (3) a damaged GIF quarantines;
    (4) probing the index in plain-phash mode refuses (sidecar)."""
    import pytest

    land = str(tmp_path / "land")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quar")
    rej = str(tmp_path / "rej")
    os.makedirs(land)

    def gifs(ids):
        return M.synth_gif_composited_dups(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    # batch 0: two partial-frame originals (slots 0 and 1)
    _land(gifs([0, 1]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="gif-video")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 1}

    # batch 1: id 8 = flattened re-encode of id 0 -> neardup reject;
    # id 10 = fresh animation; id 999 = damaged payload -> quarantine
    damaged = spark.createDataFrame(
        [(999, "image", bytearray(b"GIF89a then garbage........"), "gif", 27)],
        M.MEDIA_SCHEMA,
    )
    _land(gifs([8, 10]).unionByName(damaged), land, "b1.parquet",
          1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="gif-video")
    got = {r.media_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 10}
    neardup = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert neardup == {8}
    quarantined = {r.media_id for r in spark.read.json(quar).collect()}
    assert quarantined == {999}
    # index rows carry the per-frame video contract columns
    cols = set(spark.read.parquet(idx).columns)
    assert {"corpus_id", "frame_idx", "phash", "n_frames"} <= cols

    # sidecar: plain-phash probe of a gif-video index refuses
    _land(gifs([20]), land, "b2.parquet", 1_000_000_200)
    with pytest.raises(Exception, match="fingerprint|meta|mismatch"):
        SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                               quarantine=quar, rejects=rej,
                               fingerprint="phash")


def test_media_ingest_jvm_decode_quarantines_negative_ids(spark, tmp_path):
    """r10 advisory fix: a single negative media_id in a batch must NOT
    fail the whole streaming batch under jvm_decode (spill_media_to_files
    raises on negative ids executor-side) — the lane splits it out
    pre-spill and emits a NULL-phash row so it flows to quarantine,
    while the rest of the batch ingests normally."""
    land = str(tmp_path / "land")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quar")
    os.makedirs(land)

    bad = spark.createDataFrame(
        [(-7, "image", bytearray(b"payload that never spills"), "bmp", 26)],
        M.MEDIA_SCHEMA,
    )
    b0 = _synth_rows(spark, [0, 1]).unionByName(bad)
    _land(b0, land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt,
                           quarantine=quar, jvm_decode=True)
    got = {r.media_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1}
    quarantined = {r.media_id for r in spark.read.json(quar).collect()}
    assert quarantined == {-7}


def test_media_ingest_gif_video_interlaced_and_local_palette(spark, tmp_path):
    """r11 gif-video lane over the two compositing shapes no stream
    test planted before: an INTERLACED animation (frame 2 written in
    4-pass order) and a per-frame LOCAL-COLOR-TABLE animation both
    build the standing index in batch 0; batch 1's plain re-encodes —
    the interlaced one's full-frame flatten and the local-palette one's
    GRAY re-encode at the luma values (the per-frame hash is luma-only,
    so a correct RGB-space compositor pairs it at distance 0; an
    index-space compositor would not) — reject as near-dups while a
    fresh animation ingests; batch 2 + a drained replay stay
    exactly-once."""
    import numpy as np

    land = str(tmp_path / "land")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quar")
    rej = str(tmp_path / "rej")
    os.makedirs(land)

    def ids_df(ids):
        return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")

    # batch 0: id 0 = composited synth (k even -> interlaced frame 2);
    # id 5 = local-palette animation
    b0 = M.synth_gif_composited(ids_df([0])).unionByName(
        M.synth_gif_local_palette(ids_df([5]))
    )
    _land(b0, land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="gif-video")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 5}

    # batch 1 re-encodes, derived from ID ARITHMETIC alone (never this
    # repo's decoder):
    # id 301 = full-frame flatten of id 0 (synth_gif_composited_dups'
    # slot-8 arithmetic re-keyed), id 302 = gray-luma flatten of id 5,
    # id 310 = fresh animation
    flat0 = M.synth_gif_composited_dups(ids_df([8])).collect()[0]
    flat0_row = spark.createDataFrame(
        [(301, flat0.kind, flat0.payload, flat0.format, flat0.n_bytes)],
        M.MEDIA_SCHEMA,
    )
    k = 5
    w, h = 40 + k % 9, 36 + (3 * k) % 11
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    base = ((17 * k + 3 * xs * xs + 7 * ys * ys + 5 * xs * ys
             + 11 * xs + 13 * ys) % 251).astype(np.int64)
    ox, oy = 2 + k % 7, 3 + k % 5
    pw, ph = 12 + k % 5, 10 + k % 4
    us = np.arange(pw)[None, :]
    vs = np.arange(ph)[:, None]
    i_idx = (11 * k + 3 * us + 5 * vs) % 64
    r = (3 * i_idx + k) % 251
    g = (5 * i_idx + 2 * k) % 251
    b = (7 * i_idx + 3 * k) % 251
    luma = (299 * r + 587 * g + 114 * b) // 1000
    f0, f1 = base.copy(), base.copy()
    f1[oy:oy + ph, ox:ox + pw] = luma
    flat5 = M.encode_gif_animated(
        w, h, np.stack([f0, f1]).astype(np.uint8), [2, 3])
    flat5_row = spark.createDataFrame(
        [(302, "image", bytearray(flat5), "gif", len(flat5))],
        M.MEDIA_SCHEMA,
    )
    fresh = M.synth_gif_composited(ids_df([310]))
    _land(flat0_row.unionByName(flat5_row).unionByName(fresh),
          land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="gif-video")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 5, 310}
    neardup = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert neardup == {301, 302}

    # batch 2: another fresh animation; then a drained replay is a no-op
    _land(M.synth_gif_local_palette(ids_df([6])), land, "b2.parquet",
          1_000_000_200)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="gif-video")
    want = {0, 5, 310, 6}
    assert {r.media_id for r in spark.read.parquet(out).collect()} == want
    n_idx = spark.read.parquet(idx).count()
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="gif-video")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == want
    assert spark.read.parquet(idx).count() == n_idx


def test_media_ingest_gif_video_browser_matte(spark, tmp_path):
    """r11 gif_matte: a gif-video index built under the WHITE page matte
    pairs a disposal-2 original against its browser-style flatten at the
    door (the default background matte would not — pinned), the matte
    lands in the sidecar, and a mismatched re-ingest refuses."""
    import pytest

    land = str(tmp_path / "land")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quar")
    rej = str(tmp_path / "rej")
    os.makedirs(land)

    def gifs(ids):
        return M.synth_gif_disposal2_dups(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    # batch 0: the disposal-2 original (slot 0) under matte white
    _land(gifs([0]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="gif-video",
                           gif_matte=(255, 255, 255))
    assert SM.read_phash_meta(idx)["gif_matte"] == [255, 255, 255]

    # batch 1: id 8 = the browser flatten of id 0 -> near-dup reject
    _land(gifs([8]), land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="gif-video",
                           gif_matte=(255, 255, 255))
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0}
    neardup = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert neardup == {8}

    # mismatched matte on re-ingest refuses (index property)
    _land(gifs([10]), land, "b2.parquet", 1_000_000_200)
    with pytest.raises(Exception, match="gif_matte"):
        SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                               quarantine=quar, rejects=rej,
                               fingerprint="gif-video")

    # negative pin: under the DEFAULT matte the flatten is NOT a
    # near-dup of the original (separate index)
    land2 = str(tmp_path / "land2")
    os.makedirs(land2)
    out2, idx2, ckpt2 = (str(tmp_path / n) for n in ("c2", "i2", "k2"))
    _land(gifs([0]), land2, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land2, out2, ckpt2, phash_index=idx2,
                           quarantine=quar, rejects=rej + "2",
                           fingerprint="gif-video")
    _land(gifs([8]), land2, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land2, out2, ckpt2, phash_index=idx2,
                           quarantine=quar, rejects=rej + "2",
                           fingerprint="gif-video")
    assert {r.media_id for r in spark.read.parquet(out2).collect()} == {0, 8}

    # matte on a non-gif lane refuses
    with pytest.raises(Exception, match="gif_matte"):
        SM.ingest_media_stream(spark, land2, out2, ckpt2,
                               fingerprint="phash",
                               gif_matte=(255, 255, 255))


def test_media_ingest_anim_video_cross_format(spark, tmp_path):
    """r11 anim-video lane: a GIF animation indexed in batch 0 rejects
    its APNG re-encode at the door in batch 1 (cross-container dedup —
    ONE index, magic-byte dispatch); a fresh animation in batch 2
    ingests; the sidecar records the anim-video mode and a gif-video
    re-ingest refuses."""
    import pytest

    land = str(tmp_path / "land")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quar")
    rej = str(tmp_path / "rej")
    os.makedirs(land)

    def media(ids):
        return M.synth_apng_gif_pairs(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        )

    # batch 0: the GIF original (slot 0)
    _land(media([0]), land, "b0.parquet", 1_000_000_000)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="anim-video")
    assert SM.read_phash_meta(idx)["fingerprint"] == "anim-video"

    # batch 1: id 8 = the APNG re-encode of id 0 -> rejects at the door
    _land(media([8]), land, "b1.parquet", 1_000_000_100)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="anim-video")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0}
    neardup = {r.media_id for r in spark.read.json(rej + ".neardup").collect()}
    assert neardup == {8}

    # batch 2: a fresh animation (different group) ingests
    _land(media([13]), land, "b2.parquet", 1_000_000_200)
    SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                           quarantine=quar, rejects=rej,
                           fingerprint="anim-video")
    assert {r.media_id for r in spark.read.parquet(out).collect()} == {0, 13}

    # the index rows carry the video lane's frame contract
    assert {"corpus_id", "frame_idx", "phash", "n_frames"} <= set(
        spark.read.parquet(idx).columns
    )

    # mode mismatch on re-ingest refuses (sidecar contract)
    _land(media([17]), land, "b3.parquet", 1_000_000_300)
    with pytest.raises(Exception, match="fingerprint"):
        SM.ingest_media_stream(spark, land, out, ckpt, phash_index=idx,
                               quarantine=quar, rejects=rej,
                               fingerprint="gif-video")
