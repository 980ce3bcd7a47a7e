"""Fixture oracles for queries with no SQL-expressible oracle.

The queries here (see FIXTURE_QUERIES below) are deterministic (seeded
models, fixed hash keys, deterministic synth input) but not computable
in ANSI SQL — isolation forests, RRCF sketches, MinHash/SimHash (pandas
siphash keys), codec decodes, audio kernels, eigendecompositions, and
the flagship clip pipeline. For each, ``tools/make_fixtures.py``
runs the query once per scale factor and freezes the expected result as
parquet under ``fixtures/`` (committed). The oracle SQL is then a plain
DuckDB ``read_parquet`` of the frozen table, discriminated by scale factor
through the events-view row count — so the driver's correctness gate
hash-compares the *live distributed run* against the frozen expectation.

What this pins (vs. the recursive-CTE oracles in oracle_sql.py, which are
independent recomputations): bit-exact reproducibility of the distributed
execution across processes and runs — partitioning-order invariance,
seed stability, and regressions. Semantic correctness of the underlying
kernels is pinned separately by the golden/parity pytest suite
(tests/test_similarity_iforest.py, test_text_dedup.py, test_sketches.py,
test_pipeline_validate.py) against sequential reference implementations.
"""

from __future__ import annotations

import os

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures")

# queries whose oracle is a frozen fixture table (see module docstring).
# NOT here: tdigest_quantiles_events — a t-digest is an order-dependent
# mergeable sketch and Ray's streaming executor does not preserve block
# arrival order (preserve_order=False), so its estimates are legitimately
# run-varying within the sketch's accuracy bound; a hash-exact oracle would
# be semantically wrong. Its accuracy is pinned in tests/test_sketches.py.
FIXTURE_QUERIES = [
    "minhash_dedup_documents",
    "simhash_documents",
    "doc_fingerprints",
    "embedding_dedup_embeddings",
    "semantic_dedup_embeddings",
    "charlm_quality_documents",
    "ann_ivf_embeddings",
    "ann_pq_embeddings",
    "iforest_events",
    "pca_iforest_events",
    "clustering_events",
    "autoencoder_events",
    "gan_autoencoder_events",
    "rrcf_events",
    "matrix_profile_events",
    "changepoint_events",
    "trend_mlp_events",
    "image_decode_features",
    "jpeg_decode_features",
    "webp_decode_features",
    "video_frame_features",
    "expectations_clips",
    "approx_distinct_events",
    "bpe_vocab_documents",
    "bpe_encode_documents",
    "kmeans_embeddings",
    "lof_embeddings",
    "clip_audio_audit",
    "mahalanobis_embeddings",
    "lof_ivf_embeddings",
    "clip_bandwidth_check",
    "lang_confusion_documents",
    "text_prep_documents",
    "clip_validation_verdicts",
    "clip_audio_features",
    "clip_spectral_features",
    "clip_mel_features",
    "clip_mfcc_delta",
    "clip_speaking_rate",
    "clip_augment_stats",
    "clip_specaugment_stats",
    "clip_trim_stats",
    "clip_speaker_clusters",
    "clip_dvector_speakers",
    "clip_pitch_features",
    "clip_loudness_stats",
    "clip_declip_stats",
    "clip_denoise_stats",
    "clip_tempo_features",
    "clip_stretch_stats",
    "clip_codec_stats",
    "clip_profile_store",
    "clip_expectations_incremental",
    "audio_fingerprint_dedup",
    "clip_segment_stats",
    "clip_resample_stats",
    "clip_reverb_stats",
    "clip_hygiene_check",
    "clip_wow_flutter",
    "clip_qc_scorecard",
    "pca_variance_embeddings",
    "pca_project_embeddings",
    "audio_prep_segments",
    "clip_stream_replay",
]


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.parquet")


def fixture_sql(name: str) -> str:
    """Oracle SQL: read the frozen expectation for the current scale factor
    (rows of the events view identify the sf — every test sf dir has a
    distinct events row count)."""
    path = fixture_path(name)
    return (f"SELECT * EXCLUDE (_fx_rows) FROM read_parquet('{path}') "
            f"WHERE _fx_rows = (SELECT count(*) FROM events)")


def available_fixture_oracles() -> dict[str, str]:
    """Oracle-SQL entries for every fixture that has been generated and
    committed (missing files simply stay rows-only in the driver gate)."""
    return {n: fixture_sql(n) for n in FIXTURE_QUERIES
            if os.path.exists(fixture_path(n))}
