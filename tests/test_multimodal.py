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


# --- REAL decode through the contract (round-4 verdict item 5) --------------


def _encode_png_gray8(img: np.ndarray, filters=None) -> bytes:
    """Stdlib PNG encoder (test-side): gray-8, one IDAT, per-row filter
    types chosen by `filters` to exercise every defilter branch."""
    import struct
    import zlib

    h, w = img.shape
    filters = filters or [0] * h

    def chunk(ctype, body):
        c = ctype + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = img[y].astype(np.int32)
        ft = filters[y]
        if ft == 0:
            enc = cur
        elif ft == 1:  # Sub
            enc = cur.copy()
            enc[1:] = (cur[1:] - cur[:-1]) % 256
        elif ft == 2:  # Up
            enc = (cur - prev) % 256
        elif ft == 3:  # Average
            enc = cur.copy()
            for x in range(w):
                left = cur[x - 1] if x else 0
                enc[x] = (cur[x] - (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            enc = cur.copy()
            for x in range(w):
                a = int(cur[x - 1]) if x else 0
                b, c = int(prev[x]), int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) % 256
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _ref_pool(img: np.ndarray, thumb: int = 8) -> np.ndarray:
    h, w = img.shape
    bh, bw = max(h // thumb, 1), max(w // thumb, 1)
    return (
        img[: bh * thumb, : bw * thumb]
        .reshape(thumb, bh, thumb, bw)
        .mean(axis=(1, 3))
        .ravel()
        .astype(np.float32)
    )


def test_png_decoder_roundtrip_all_filters():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    for filters in ([0] * 24, [1] * 24, [2] * 24, [3] * 24, [4] * 24,
                    [0, 1, 2, 3, 4] * 4 + [2, 4, 1, 3]):
        png = _encode_png_gray8(img.astype(np.int32), filters)
        got = M.decode_png_gray8(png)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, img.astype(np.float32))


def test_real_png_decode_through_extract_features(spark):
    """End-to-end: REAL PNG payloads in the binary column, the stdlib
    decoder injected, STRICT_DECODE on — pooled thumbnail features equal
    the numpy reference pooling of the known pixel arrays exactly."""
    rng = np.random.default_rng(42)
    imgs = {
        i: rng.integers(0, 256, size=(32 + 8 * i, 48 + 8 * i), dtype=np.uint8)
        for i in range(4)
    }
    rows = [
        (
            i,
            "image",
            bytearray(
                _encode_png_gray8(
                    imgs[i].astype(np.int32), [(y % 5) for y in range(imgs[i].shape[0])]
                )
            ),
            int(imgs[i].shape[1]),
            int(imgs[i].shape[0]),
            0,
        )
        for i in range(4)
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    M.STRICT_DECODE = True
    try:
        feats = {
            r["media_id"]: np.array(r["feat"], dtype=np.float32)
            for r in M.extract_features(media, decode=M.decode_png_gray8).collect()
        }
    finally:
        M.STRICT_DECODE = False
    assert set(feats) == set(imgs)
    for i, img in imgs.items():
        np.testing.assert_array_equal(feats[i], _ref_pool(img.astype(np.float32)))
