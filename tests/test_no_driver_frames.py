"""Meta-test: corpus-scaled queries must stream, not driver-materialize.

Every queries() entry whose output is one row per corpus item (per event,
per clip, per embedding vector, per distinct document, per image/video)
must return a ``ray.data.Dataset`` so the scored table never lands on the
driver — canonical row ordering is the comparer's job (tools/oracle_check,
the driver gate and tests/test_entry_oracle all sort before hashing).

This closes the class behind the round-4 finding (q_mahalanobis_embeddings
returned a driver frame; q_ntile_events and q_exact_dedup_documents were
the same shape): a new corpus-scaled query that ends in ``.to_pandas()``
fails here loudly.

Documented exceptions (driver frames with a reason):
- stream_validation_events — single-consumer sequential stream replay;
  the verdict log is inherently collected by the replay loop.
- Everything with bounded output grain (per-user/type/nation/window folds,
  top-k contracts) is simply not listed here.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# one row per event
EVENTS_SCALED = [
    "row_validate_events", "border_check_events", "zscore_events",
    "robust_zscore_events", "winsorize_events", "impute_median_events",
    "welford_window_events", "welford_inf_events", "percent_rank_events",
    "ema_check_events", "macd_check_events", "cusum_events",
    "cusum_reset_events", "hampel_events", "percentile_events",
    "cumulative_events", "linear_fit_events", "filtering_events",
    "ema_percentile_events", "trend_classification_events",
    "trend_mlp_events", "rrcf_events", "matrix_profile_events",
    "changepoint_events", "repair_events", "percent_score_events",
    "feature_construction_events", "iforest_events", "pca_iforest_events",
    "clustering_events", "forecast_band_events", "seasonal_band_events",
    "autoencoder_events", "gan_autoencoder_events",
    "reference_config_borders", "ntile_events", "hbos_events",
]
# one row per clip (or per segment/augmented clip)
CLIPS_SCALED = [
    "clip_audio_features", "clip_spectral_features", "clip_mel_features",
    "clip_mfcc_delta", "clip_speaking_rate", "clip_augment_stats",
    "clip_specaugment_stats", "clip_trim_stats", "clip_speaker_clusters",
    "clip_dvector_speakers", "clip_pitch_features", "clip_loudness_stats",
    "clip_declip_stats", "clip_bandwidth_check", "clip_audio_audit",
    "clip_denoise_stats", "clip_tempo_features", "clip_stretch_stats",
    "clip_codec_stats", "clip_segment_stats", "clip_resample_stats",
    "clip_wow_flutter", "clip_reverb_stats", "clip_hygiene_check",
]
# one row per join-probe row / embedding vector / distinct doc / media item
OTHER_SCALED = [
    "semi_mark_orders_customer", "reconcile_orders_lineitem",
    "mahalanobis_embeddings", "exact_dedup_documents",
    "image_decode_features", "video_frame_features",
    "lof_embeddings", "lof_ivf_embeddings",
]

CORPUS_SCALED = EVENTS_SCALED + CLIPS_SCALED + OTHER_SCALED


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e
    return e


@pytest.mark.parametrize("name", CORPUS_SCALED)
def test_corpus_scaled_query_streams(name, entrymod):
    import ray.data as rd
    res = entrymod.queries()[name](SF_DIR)
    assert isinstance(res, rd.Dataset), (
        f"{name} is corpus-scaled but returned {type(res).__name__}: "
        "one row per corpus item must stream out as a Dataset, not land "
        "on the driver (sort is comparer-side)")
