"""Dump `.explain("formatted")` for the headline queries to PLANS.md —
the physical-plan audit artifact (broadcasts, pushed filters, partial
aggregates, exchange keys) readable without a Spark session.

Usage: python tools/plan_report.py [sf_dir] [out_md]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slice_db_spark.plans import queries as Q  # noqa: E402
from slice_db_spark.session import get_spark  # noqa: E402

# the plans worth auditing: every shape class once (scan+filter pushdown,
# star join, window top-k, posting-list dedup, LSH band join, ADC join,
# as-of union-window, interval-bucket range join, chunk winner-agg)
AUDIT = [
    "root_scan",
    "q5_region_revenue",
    "q10_returned_items",
    "window_top_orders",
    "dedup_jaccard",
    "minhash_lsh",
    "dedup_chunks",
    "events_asof",
    "events_range_join",
    "ann_pq",
    "dedup_embedding_hi",
    "corpus_pipeline",
    # round 4 shapes: corpus-statistic score joins, asymmetric LSH probe,
    # RANGE interval frame, group-filter-then-broadcast-survivors
    "lm_score",
    "dedup_incremental",
    "events_moving_avg",
    "q18_large_orders",
    "corpus_datasheet",
    "bm25_rank",
    "revenue_rollup",
    # round 4 session 3 shapes: decorrelated correlated-subquery forms,
    # outer-join distribution, generated-dimension gap-fill, sort-based
    # blocking, fixed-point centroid audit
    "q17_small_qty_revenue",
    "q21_waiting_supplier",
    "q13_order_distribution",
    "daily_gapfill",
    "dedup_sorted_nbrs",
    "label_coherence",
    "quality_blend",
    # sketch family: KB-sized mergeable state shapes + bloom pre-filter
    "sketch_hll",
    "bloom_decontam",
    "doc_pagerank",
    "nation_pareto",
    # round 4 session 4 shapes: correlated-MIN decorrelation, global-scalar
    # HAVING, NOT-IN anti + count-distinct, share-threshold semi join,
    # cluster-then-prune semantic dedup, zero-shuffle chunk/projection maps,
    # ordered-triple triangle join, metadata-strata quota planning
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_count",
    "q20_excess_suppliers",
    "semdedup",
    "chunk_windows",
    "rp_project",
    "doc_triangles",
    "source_temperature",
    "curriculum_order",
    # session-4 late shapes: moment statistics, state-frame quantile sketch,
    # blocked edit distance, grouped-HLL sliding merge, morton layout,
    # priority sampling, delta-merge aggregate, bounded BFS
    "price_qty_corr",
    "sketch_quantile",
    "fuzzy_typo_pairs",
    "events_sliding_distinct",
    "zorder_layout",
    "weighted_sample",
    "rollup_delta",
    "doc_hops",
    "k_anonymity",
    # final session-4 shapes: sketch join sizing, hold-weighted averages,
    # grouping-sets cube, bucket-decomposed overlap join, real PGM codec,
    # fixed-band segmentation
    "join_size_est",
    "events_twa",
    "status_cube",
    "sessions_promo_overlap",
    "media_pgm_stats",
    "customer_rfm",
    "basket_affinity",
    "markov_stationary",
    # round-5 shapes: zlib-unfilter codec over mapInPandas, pure-codegen
    # URL canonicalization, pair-graph domain aggregation, and the
    # two-pass bucket-decomposed cumulative (no global window)
    "media_png_stats",
    "url_canonical",
    "domain_stats",
    "customer_abc",
    "scrub_deterministic",
    # round-6 shapes: lossy-made-exact JPEG pipeline over mapInPandas,
    # per-frame video sampling, compacted-index probe (checkpointed
    # maintenance result), persisted-IVF probe, iterative BPE merge
    # learning (vocab-sized rounds after one corpus pass)
    "media_jpeg_stats",
    "media_y4m_frames",
    "dedup_index_compacted",
    "ann_index_probe",
    "bpe_train",
    "dedup_substring",
    # round-7 shapes: batched BPE (K disjoint merges per driver round),
    # pHash banding self-join + asymmetric persisted-index probe,
    # progressive JPEG over the same mapInPandas pipeline
    "bpe_train_batched",
    "media_phash_pairs",
    "media_phash_incremental",
    "media_jpeg_progressive",
    "media_audio_pairs",
    "media_video_pairs",
    "ann_ivfpq",
    # round-8 shapes: sub-fingerprint offset voting, per-frame banding
    # with aligned-run verify, ImageIO JVM decode scan, residual-PQ +
    # exact re-rank, wide-key span probe
    "media_audio_offset_pairs",
    "media_video_trimmed_pairs",
    "media_phash_imageio",
    "ann_ivfpq_refined",
    "dedup_span_incremental_wide",
    # round-8 session-2 shapes: per-clip shot windows + keyframe-banded
    # cross-clip pairing, header-dims gate expressions, EXIF parse over
    # mapInPandas, KMV TakeOrdered sketch algebra, time-window audio
    "media_video_shots",
    "media_shot_reuse",
    "media_curation_gate",
    "media_exif",
    "media_phash_oriented",
    "sketch_theta_diff",
    "media_audio_resampled_pairs",
    "media_gif_stats",
    "media_png_variants",
    "media_wav_stereo",
    # round-9 shapes: executor-spill + ImageIO scan over in-column
    # payloads, strict-GCE animation walk, Adam7 de-interlace over the
    # shared unfilter, orbit-min dihedral hashing (batch + asymmetric
    # persisted probe), OPQ rotated encode/ADC (in-memory + persisted
    # partition-pruned probe), depth-normalized WAV decode, GIF frames
    # through the video sequence-zip pairing
    "media_phash_incolumn_imageio",
    "media_gif_animated",
    "media_png_interlaced",
    "media_phash_dihedral",
    "media_dihedral_incremental",
    "ann_opq",
    "ann_opq_index",
    "media_wav_depths",
    "media_gif_video_pairs",
    # r10 shapes: compositing gates, the optimized-vs-flattened pairing,
    # the per-frame local palette gate, and OPQ across the flat +
    # composite PQ chains
    "media_gif_composited",
    "media_gif_interlaced",
    "media_gif_optimized_pairs",
    "media_gif_features",
    "media_gif_local_palette",
    "ann_pq_opq",
    "ann_ivfpq_opq",
    # r11 shapes: the RGBA dual-matte compositing gate, the disposal-2
    # original vs browser-flatten pairing (white-matte gif_video_phash
    # through the unchanged video lane), and the strict-walk
    # loop/comment metadata gate
    "media_gif_disposal2",
    "media_gif_disposal2_pairs",
    "media_gif_loop_meta",
    # r11 APNG shapes: dual-matte dispose/blend compositing, the
    # cross-format GIF<->APNG pairing through the unchanged video lane,
    # and the chunk-walk structural features
    "media_apng_composited",
    "media_apng_gif_pairs",
    "media_apng_features",
    # r11 SQ8: one min/max training scan + broadcast dim x 256 ADC table
    "ann_sq8",
    "ann_sq8_index",
    "ann_ivfsq8",
    "ann_sq8_refined",
    "media_anim_incremental",
    "media_apng_optimized_pairs",
]

MAX_LINES = 80


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    spark = get_spark("plan-report")
    qs = Q.queries()
    sections = [
        "# Physical plans (generated by tools/plan_report.py)\n",
        f"Source: `{sf_dir}`; each section is `.explain(\"formatted\")`, "
        f"truncated to {MAX_LINES} lines.  Regenerate after operator "
        "changes: `python tools/plan_report.py`.\n",
    ]
    for name in AUDIT:
        buf = io.StringIO()
        with redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        lines = buf.getvalue().splitlines()
        body = "\n".join(lines[:MAX_LINES])
        if len(lines) > MAX_LINES:
            body += f"\n... ({len(lines) - MAX_LINES} more lines)"
        sections.append(f"## {name}\n\n```\n{body}\n```\n")
    with open(out_md, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {out_md} ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
