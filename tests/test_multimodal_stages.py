"""Multimodal processing stages beyond feature extraction: resize and
frame sampling (the remaining items of the spec's decode / feature-extract
/ resize / frame-sample list). Kernels are deterministic stubs (no codec
libs in this container — honestly marked); the Spark-side mechanics under
test are real: schemas, Arrow batching, partition preservation, 1->N
fan-out shape, bounded per-row output, determinism."""

from forklift_spark.operators import multimodal as mm
from forklift_spark.plans.guards import count_exchanges


def test_resize_images_shape_and_determinism(spark):
    media = mm.synth_media(spark, n=48)
    out = mm.resize_images(media, max_side=128)
    rows = {r.media_id: r for r in out.collect()}
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images  # one row per image, other kinds dropped
    for r in rows.values():
        assert 1 <= max(r.width, r.height) <= 128  # aspect fit honored
        assert r.payload  # stub re-encode emitted bytes
    # partition-preserving: no exchange anywhere in the plan
    assert count_exchanges(out) == 0
    again = {r.media_id: (r.width, r.height, bytes(r.payload))
             for r in mm.resize_images(media, max_side=128).collect()}
    assert again == {k: (v.width, v.height, bytes(v.payload))
                     for k, v in rows.items()}


def test_sample_frames_fanout_bounded_and_deterministic(spark):
    media = mm.synth_media(spark, n=48)
    out = mm.sample_frames(media, every_ms=1000, max_frames=16)
    rows = out.collect()
    n_videos = media.filter("kind = 'video'").count()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id) == n_videos  # every video produced frames
    for mid, frames in by_id.items():
        assert 1 <= len(frames) <= 16  # fan-out bounded per row
        idxs = sorted(f.frame_index for f in frames)
        assert idxs == list(range(len(frames)))  # dense frame indices
        assert all(f.ts_ms == f.frame_index * 1000 for f in frames)
    assert count_exchanges(out) == 0
    again = sorted((r.media_id, r.frame_index, bytes(r.payload))
                   for r in mm.sample_frames(media, every_ms=1000, max_frames=16).collect())
    assert again == sorted((r.media_id, r.frame_index, bytes(r.payload)) for r in rows)
