"""Real-decoder seam proof: uncompressed BMP decodes natively through
the mapInPandas feature path (VERDICT r6 item 7)."""


def test_bmp_real_decode_through_mapinpandas(spark):
    """The real (non-fake) decode path runs end-to-end for BMP: tiny
    payloads built with encode_bmp flow through mapInPandas and come
    back with pixel-derived features — no NotImplementedError."""
    import numpy as np

    from beagle_spark.ops.multimodal import (
        decode_bmp,
        encode_bmp,
        extract_features,
    )

    rng = np.random.default_rng(42)
    rows = []
    for i in range(6):
        img = rng.integers(0, 256, size=(4 + i, 5, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_bmp(img)), "bmp",
                     5, 4 + i, None))
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, format string, "
              "width int, height int, duration_ms int")
    out = extract_features(df, dim=8, fake=False).collect()
    assert len(out) == 6
    for r in out:
        assert r["feature"] is not None and len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # decode matches the local decoder: mean of channel 0
    img0 = decode_bmp(bytes(rows[0][2]))
    want = float(img0.reshape(-1, 3).mean(axis=0)[0] / 255.0)
    got = [r for r in out if r["media_id"] == 0][0]["feature"][0]
    assert abs(got - want) < 1e-6
