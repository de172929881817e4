"""Structured Streaming consumers over the engine's append-only tables
(SURVEY.md §2.9 streaming note) and the multimodal plumbing contract."""

from pyspark.sql import functions as F

from lyrics_crawler_spark.engine import CrawlEngine
from lyrics_crawler_spark.sitegen.graph import SiteSpec


def _small_crawl(spark, tmp_store):
    spec = SiteSpec("hindilyrics", "http://st.example", seed=31, n_seeds=2,
                    branch1=3, branch2=2)
    eng = CrawlEngine(spark, [spec], tmp_store)
    eng.run()
    return eng


def test_metrics_stream_drain(spark, tmp_store):
    """The per-wave metrics table is a valid file-stream source: draining
    it through the watermarked windowed agg yields per-host rows whose
    fetch totals equal the batch table's."""
    from lyrics_crawler_spark.streaming.wave_stream import run_metrics_drain

    eng = _small_crawl(spark, tmp_store + "/store")
    n = run_metrics_drain(spark, eng.store.base_dir, tmp_store + "/out")
    assert n > 0
    streamed = spark.table("host_throughput")
    batch_total = eng.metrics().agg(F.sum("urls_fetched")).collect()[0][0]
    stream_total = streamed.agg(F.sum("urls_fetched")).collect()[0][0]
    assert stream_total == batch_total


def test_document_stream_drain(spark, tmp_store):
    """The documents delta log is a valid file-stream source: draining it
    yields every MERGE delta row (pre-resolution), and applying the batch
    win rule to the drained rows reproduces the batch documents view."""
    from lyrics_crawler_spark.engine import CrawlEngine
    from lyrics_crawler_spark.streaming.wave_stream import run_document_drain

    eng = _small_crawl(spark, tmp_store + "/store")
    n = run_document_drain(spark, eng.store.base_dir, tmp_store + "/out")
    delta_rows = eng.store.read("documents").count()
    assert n == delta_rows and n > 0
    # stream rows are deltas; the batch reader's win rule over them gives
    # exactly the resolved view
    drained = eng.spark.read.parquet(tmp_store + "/out/docs_out")
    resolved = CrawlEngine._resolve_documents(drained)
    batch = eng.documents()
    assert resolved.count() == batch.count()
    assert (
        set(r.doc_id for r in resolved.select("doc_id").collect())
        == set(r.doc_id for r in batch.select("doc_id").collect())
    )


def test_multimodal_feature_shapes(spark, tmp_store):
    """Media refs from span arrays → deterministic payloads → Arrow-batched
    feature extraction: schema, determinism, and histogram normalization."""
    from lyrics_crawler_spark.operators.multimodal import (
        extract_features,
        fetch_payload,
        media_from_documents,
    )

    eng = _small_crawl(spark, tmp_store + "/store")
    media = media_from_documents(eng.documents())
    assert media.count() > 0
    payloads = fetch_payload(media)
    imgs = payloads.where("kind = 'image'")
    if imgs.take(1):
        assert imgs.where("width IS NULL OR height IS NULL").count() == 0
    feats1 = extract_features(payloads).collect()
    feats2 = extract_features(fetch_payload(media)).collect()
    by_ref1 = {r.media_ref: r.feature for r in feats1}
    by_ref2 = {r.media_ref: r.feature for r in feats2}
    assert by_ref1 == by_ref2, "feature extraction must be deterministic"
    for v in by_ref1.values():
        assert len(v) == 8
        assert abs(sum(v) - 1.0) < 1e-3


def test_multimodal_resize_and_frame_sample(spark, tmp_store):
    """Resize emits fixed-target dimensions for every image; frame
    sampling fans audio payloads out to one row per sampled timestamp,
    bounded by duration and max_frames."""
    from lyrics_crawler_spark.operators.multimodal import (
        fetch_payload,
        media_from_documents,
        resize_images,
        sample_frames,
    )

    eng = _small_crawl(spark, tmp_store + "/store")
    payloads = fetch_payload(media_from_documents(eng.documents()))
    resized = resize_images(payloads, target=32)
    n_img = payloads.where("kind = 'image'").count()
    assert resized.count() == n_img
    assert resized.where("width <> 32 OR height <> 32").count() == 0
    assert resized.where("length(payload) < 1").count() == 0

    frames = sample_frames(payloads, every_ms=500, max_frames=4)
    n_audio = payloads.where("kind = 'audio'").count()
    if n_audio:
        got = frames.groupBy("media_ref").count().agg(F.max("count")).collect()[0][0]
        assert 1 <= got <= 4
        assert frames.count() >= n_audio  # ≥1 frame per clip
        assert frames.where("t_ms % 500 <> 0").count() == 0
