"""Multimodal binary-column plumbing: schema, batching, deterministic
features; decode itself is stubbed (no media libs in this container)."""

import numpy as np

from honeywell_search_engine_spark.operators import multimodal as M


def test_synthesize_and_extract(spark):
    media = M.synthesize_media(spark, n=48, partitions=4)
    rows = media.collect()
    assert len(rows) == 48
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}
    assert all(isinstance(bytes(r["payload"]), bytes) and len(r["payload"]) >= 256 for r in rows)

    feats = M.extract_features(media).collect()
    assert len(feats) == 48
    by_id = {r["media_id"]: r for r in feats}
    for r in rows:
        f = by_id[r["media_id"]]
        assert f["n_bytes"] == len(r["payload"])
        if r["kind"] in ("image", "video"):
            assert f["thumb_w"] == 8 and len(f["feat"]) == 64
        else:
            assert f["thumb_w"] == 0 and 1 <= len(f["feat"]) <= 16


def test_features_deterministic(spark):
    a = {r["media_id"]: (r["crc"], tuple(r["feat"]))
         for r in M.extract_features(M.synthesize_media(spark, 16, 2)).collect()}
    b = {r["media_id"]: (r["crc"], tuple(r["feat"]))
         for r in M.extract_features(M.synthesize_media(spark, 16, 4)).collect()}
    assert a == b  # partition-count invariant


def test_strict_decode_raises(spark):
    M.STRICT_DECODE = True
    try:
        media = M.synthesize_media(spark, 4, 1)
        try:
            M.extract_features(media).collect()
            raised = False
        except Exception:
            raised = True
        assert raised, "strict mode must fail loudly instead of faking decode"
    finally:
        M.STRICT_DECODE = False


def test_pluggable_decode_callable_is_used(spark):
    """A user-supplied decode callable replaces the stub (the future
    PIL/ffmpeg hook) — constant image -> constant pooled features."""

    def flat_decode(payload, width, height):
        return np.full((max(height, 1), max(width, 1)), 7.0, dtype=np.float32)

    media = M.synthesize_media(spark, 6, 2)
    feats = M.extract_features(media, decode=flat_decode).collect()
    for r in feats:
        if r["kind"] in ("image", "video"):
            assert all(abs(v - 7.0) < 1e-6 for v in r["feat"])


def test_strict_mode_ok_with_injected_decode(spark):
    """STRICT_DECODE only bans the FAKE decode; a real callable passes."""
    M.STRICT_DECODE = True
    try:
        media = M.synthesize_media(spark, 4, 1)
        out = M.extract_features(
            media,
            decode=lambda p, w, h: np.zeros((max(h, 1), max(w, 1)), np.float32),
        ).collect()
        assert len(out) == 4
    finally:
        M.STRICT_DECODE = False
