"""Round-5: stdlib PNG/WAV fixture encoders round-trip through the
real decoders, and the new media registry entries hold their
deterministic contract."""

import numpy as np

from schema_validata_spark.operators.multimodal import (
    decode_png, decode_wav, encode_png, encode_wav)


def test_png_roundtrip_gray_and_rgb():
    g = (np.add.outer(np.arange(10) * 7, np.arange(12) * 3)
         % 256).astype(np.uint8)
    f = decode_png(encode_png(g))
    assert f[:4] == [12.0, 10.0, 8.0, 1.0]
    assert abs(f[4] - g.mean() / 255.0) < 1e-9   # filter-0 is lossless
    rgb = np.stack([g, 255 - g, g // 2], axis=-1)
    f3 = decode_png(encode_png(rgb))
    assert f3[:4] == [12.0, 10.0, 8.0, 3.0]


def test_png_roundtrip_rgba():
    a = np.zeros((6, 5, 4), np.uint8)
    a[..., 3] = 200
    f = decode_png(encode_png(a))
    assert f[:4] == [5.0, 6.0, 8.0, 4.0]
    assert abs(f[7] - 200 / 255.0) < 1e-9


def test_wav_roundtrip_stats():
    t = np.sin(np.linspace(0, 40 * np.pi, 4000))
    f = decode_wav(encode_wav(t, rate=8000))
    rate, ch, bits, n, dur, rms, peak, _ = f
    assert (rate, ch, bits, n) == (8000.0, 1.0, 16.0, 4000.0)
    assert abs(dur - 0.5) < 1e-9
    assert abs(rms - 1 / 2 ** 0.5) < 0.01       # sine RMS
    assert 0.99 < peak <= 1.0


def test_media_features_registry_deterministic(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    rows = entry.queries()["media_features"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 35
    ok = [r for r in rows if r["ok"]]
    assert len(ok) == 33                        # 2 seeded poison blobs
    by_id = {r["media_id"]: r for r in rows}
    # the progressive payloads decode for real (r5)
    assert by_id[30]["ok"] and by_id[30]["channels"] == 1.0
    assert by_id[31]["ok"] and by_id[31]["channels"] == 3.0
    # the MJPEG-AVI video decodes for real (r5): feature[0:2] = WxH
    assert by_id[32]["ok"] and by_id[32]["width"] == 20.0 \
        and by_id[32]["height"] == 16.0
    # image rows carry real decoded dims; channels alternate 1/3 by
    # construction (gray, rgb, jpeg-gray, jpeg-420-rgb)
    assert [int(r["channels"]) for r in ok[:4]] == [1, 3, 1, 3]
    again = entry.queries()["media_features"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows == again
