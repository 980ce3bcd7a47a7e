"""Document-curation pipeline tests (pipelines/text_prep): ground-truth
drop decisions, cross-partition dedup scope, metric reconciliation,
resume + config-hash invalidation."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
DOCS = os.path.join(SF_DIR, "documents.parquet")


@pytest.fixture(scope="module")
def run(ray_session, tmp_path_factory):
    from anomaly_detection_ray.pipelines.text_prep import (TextPrepConfig,
                                                           run_text_prep)
    out = str(tmp_path_factory.mktemp("tp"))
    cfg = TextPrepConfig(P=4)
    res = run_text_prep(DOCS, out, cfg, resume=False)
    return {"out": out, "cfg": cfg, "res": res}


def _written(out: str) -> pd.DataFrame:
    return pd.concat([pd.read_parquet(p) for p in
                      glob.glob(os.path.join(out, "docs",
                                             "partition_id=*", "*.parquet"))],
                     ignore_index=True)


def test_metrics_reconcile_with_written_output(run):
    m = run["res"]["metrics"]
    df = _written(run["out"])
    assert m["docs"].sum() == 500  # every sf0.001 doc accounted for
    assert m["kept"].sum() == len(df)
    assert (m["docs"] == m[["kept", "drop_dup", "drop_lang",
                            "drop_quality"]].sum(axis=1)).all()


def test_near_dup_victims_dropped_across_partitions(run, ray_session):
    """Cross-partition dedup scope: the synth documents carry NEAR
    duplicates (no exact md5 twins at sf0.001); every non-representative
    member of a MinHash cluster must be gone from the survivors, and the
    clusters genuinely straddle the doc_id%P partitions."""
    import ray.data as rd

    from anomaly_detection_ray.stages import dedup as dd

    df = _written(run["out"])
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    clusters = dd.minhash_dedup(ds, threshold=0.8)
    assert len(clusters) > 0
    victims = set(int(i) for i in clusters["doc_id"])
    surv = set(df["doc_id"])
    assert not (victims & surv)
    assert run["res"]["metrics"]["drop_dup"].sum() == len(victims)
    # clusters really straddle partitions (the scope being tested)
    pairs = zip(clusters["doc_id"], clusters["cluster_rep"])
    assert any(int(a) % 4 != int(b) % 4 for a, b in pairs)


def test_lang_gate_drops_non_english(run):
    df = _written(run["out"])
    assert (df["lang"] == "en").all()
    non_en = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{DOCS}') WHERE lang <> 'en'"
    ).fetchone()[0]
    # every drop_lang row corresponds to a genuinely non-en doc (our
    # detector vs the generator's label can differ slightly; bound it)
    m = run["res"]["metrics"]
    assert 0 < m["drop_lang"].sum() <= non_en + 10


def test_resume_skips_completed_and_config_invalidates(run, ray_session):
    from anomaly_detection_ray.pipelines.text_prep import (TextPrepConfig,
                                                           run_text_prep)
    res2 = run_text_prep(DOCS, run["out"], run["cfg"], resume=True)
    assert res2["skipped_partitions"] == [0, 1, 2, 3]
    assert res2["wall_sec"] == 0.0
    pd.testing.assert_frame_equal(
        res2["metrics"].sort_values("partition_id").reset_index(drop=True),
        run["res"]["metrics"].sort_values("partition_id").reset_index(drop=True),
        check_dtype=False)
    # different config hash => full revalidation
    res3 = run_text_prep(DOCS, run["out"],
                         TextPrepConfig(P=4, min_tokens=12), resume=True)
    assert res3["skipped_partitions"] == []
    assert res3["metrics"]["docs"].sum() == 500


def test_config_P_change_purges_stale_partitions(ray_session, tmp_path):
    """Shrinking P must purge the old run's extra partitions from both the
    manifest and the output dirs — a later resume must not resurrect or
    double-count them."""
    from anomaly_detection_ray.pipelines.text_prep import (TextPrepConfig,
                                                           run_text_prep)
    out = str(tmp_path)
    run_text_prep(DOCS, out, TextPrepConfig(P=8), resume=False)
    assert os.path.isdir(os.path.join(out, "docs", "partition_id=7"))
    res = run_text_prep(DOCS, out, TextPrepConfig(P=4), resume=True)
    assert sorted(res["metrics"]["partition_id"]) == [0, 1, 2, 3]
    assert not os.path.isdir(os.path.join(out, "docs", "partition_id=7"))
    res2 = run_text_prep(DOCS, out, TextPrepConfig(P=4), resume=True)
    assert res2["skipped_partitions"] == [0, 1, 2, 3]
    assert sorted(res2["metrics"]["partition_id"]) == [0, 1, 2, 3]
    assert res2["metrics"]["docs"].sum() == 500  # no double counting


def test_empty_partition_marked_done(ray_session, tmp_path):
    """A todo partition that receives zero rows still gets a manifest entry
    (zero-filled) so resume does not re-run the pipeline forever."""
    import duckdb as d

    from anomaly_detection_ray.pipelines.text_prep import (TextPrepConfig,
                                                           run_text_prep)

    # craft a corpus whose doc_ids are all even => partitions 1,3 empty at P=4
    src = str(tmp_path / "docs.parquet")
    d.sql(f"COPY (SELECT doc_id * 2 AS doc_id, text "
          f"FROM read_parquet('{DOCS}') LIMIT 100) TO '{src}' (FORMAT PARQUET)")
    out = str(tmp_path / "out")
    cfg = TextPrepConfig(P=4, near_dup_threshold=0.0)
    res = run_text_prep(src, out, cfg, resume=False)
    assert sorted(res["metrics"]["partition_id"]) == [0, 1, 2, 3] or \
        res["metrics"]["docs"].sum() == 100
    res2 = run_text_prep(src, out, cfg, resume=True)
    assert res2["skipped_partitions"] == [0, 1, 2, 3]
    assert res2["wall_sec"] == 0.0


def test_anti_join_regime_matches_broadcast(ray_session, tmp_path_factory):
    """Forcing the large (anti_join) drop-set regime yields EXACTLY the
    broadcast regime's survivors and metrics — same victims removed, same
    per-partition docs/kept/drop_* accounting — with no driver-resident
    victim set. (Fresh out dirs for both regimes: earlier tests rewrite
    the module fixture's dir with a different config.)"""
    from anomaly_detection_ray.pipelines.text_prep import (TextPrepConfig,
                                                           run_text_prep)
    out_bc = str(tmp_path_factory.mktemp("tp_bc"))
    res_bc = run_text_prep(DOCS, out_bc,
                           TextPrepConfig(P=4, drop_mode="broadcast"),
                           resume=False)
    out_aj = str(tmp_path_factory.mktemp("tp_aj"))
    res_aj = run_text_prep(DOCS, out_aj,
                           TextPrepConfig(P=4, drop_mode="anti_join"),
                           resume=False)

    a = _written(out_bc).sort_values("doc_id").reset_index(drop=True)
    b = _written(out_aj).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)

    ma = res_bc["metrics"].sort_values("partition_id").reset_index(drop=True)
    mb = res_aj["metrics"].sort_values("partition_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(ma.astype("int64"), mb.astype("int64"))


def test_max_dup_frac_gates_internally_repetitive_doc(ray_session, tmp_path):
    """A doc that is neither an exact nor MinHash near-dup but is mostly
    self-repeated 8-gram windows is dropped by the substring gate (as
    drop_dup) in BOTH drop regimes; with the gate off (default) it
    survives."""
    import numpy as np
    import pandas as pd

    from anomaly_detection_ray.pipelines.text_prep import (TextPrepConfig,
                                                           run_text_prep)

    # every clean doc is fully unique text (no shared 8-gram anywhere),
    # so only the internally-repetitive doc can trip the substring gate
    docs = [" ".join(f"w{i}x{j}" for j in range(24)) for i in range(12)]
    span = "r1 r2 r3 r4 r5 r6 r7 r8"
    repet = (span + " ") * 6 + "ending words now"   # high dup_frac
    docs = docs + [repet]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs,
                       "lang": "en", "source": "src0",
                       "n_chars": [len(t) for t in docs]})
    path = str(tmp_path / "docs.parquet")
    df.to_parquet(path, index=False)
    rep_id = len(docs) - 1

    def kept_ids(out, **kw):
        cfg = TextPrepConfig(P=2, langs=(), min_tokens=1,
                             near_dup_threshold=0.95, **kw)
        res = run_text_prep(path, str(tmp_path / out), cfg, resume=False)
        import pyarrow.dataset as pads
        got = pads.dataset(res["docs_path"], partitioning="hive")\
            .to_table().to_pandas()
        return set(got["doc_id"].astype(int)), res["metrics"]

    kept_off, _ = kept_ids("off")
    assert rep_id in kept_off

    kept_b, m_b = kept_ids("gate_b", max_dup_frac=0.5,
                           drop_mode="broadcast")
    kept_a, m_a = kept_ids("gate_a", max_dup_frac=0.5,
                           drop_mode="anti_join")
    assert rep_id not in kept_b and rep_id not in kept_a
    assert kept_b == kept_a
    assert m_b["drop_dup"].sum() >= 1 and m_a["drop_dup"].sum() >= 1

def test_anti_join_forced_large_cc_matches_broadcast(ray_session,
                                                     tmp_path_factory):
    """cc_edge_threshold=0 forces MinHash connected components through
    the Ray label-propagation regime with pairs/clusters as Datasets end
    to end — survivors and metrics must still be bit-equal to the
    broadcast regime."""
    from anomaly_detection_ray.pipelines.text_prep import (TextPrepConfig,
                                                           run_text_prep)
    out_bc = str(tmp_path_factory.mktemp("tp_bc2"))
    res_bc = run_text_prep(DOCS, out_bc,
                           TextPrepConfig(P=4, drop_mode="broadcast"),
                           resume=False)
    out_lg = str(tmp_path_factory.mktemp("tp_lg"))
    res_lg = run_text_prep(DOCS, out_lg,
                           TextPrepConfig(P=4, drop_mode="anti_join",
                                          cc_edge_threshold=0),
                           resume=False)
    a = _written(out_bc).sort_values("doc_id").reset_index(drop=True)
    b = _written(out_lg).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    ma = res_bc["metrics"].sort_values("partition_id").reset_index(drop=True)
    mb = res_lg["metrics"].sort_values("partition_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(ma.astype("int64"), mb.astype("int64"))
