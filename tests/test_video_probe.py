"""MP4/ISO-BMFF metadata probe (operators/video.py): the no-decode filter
pass a video corpus pipeline runs before paying any codec cost."""

import numpy as np
import pytest

from datapipelines_spark.operators.video import build_test_mp4, probe_mp4


def test_probe_known_values():
    mp4 = build_test_mp4(duration_s=2.5, timescale=1000, width=320, height=240)
    meta = probe_mp4(mp4)
    assert abs(meta["duration_s"] - 2.5) < 1e-9
    assert meta["timescale"] == 1000
    assert meta["n_tracks"] == 1
    tr = meta["tracks"][0]
    assert tr["handler"] == "vide"
    assert tr["codec"] == "avc1"
    assert (tr["width"], tr["height"]) == (320.0, 240.0)
    assert abs(tr["duration_s"] - 2.5) < 1e-9


def test_probe_various_geometries():
    for dur, w, h, codec in [(0.5, 1920, 1080, b"hvc1"), (120.0, 64, 64, b"mp4v")]:
        meta = probe_mp4(build_test_mp4(dur, 90000, w, h, codec))
        assert abs(meta["duration_s"] - dur) < 1e-6
        tr = meta["tracks"][0]
        assert tr["codec"] == codec.decode()
        assert (tr["width"], tr["height"]) == (float(w), float(h))


def test_non_mp4_rejected():
    with pytest.raises(ValueError, match="ISO-BMFF"):
        probe_mp4(b"\xff\xd8\xff\xe0 jpeg not mp4 " + b"\x00" * 32)
    with pytest.raises(ValueError, match="too short"):
        probe_mp4(b"tiny")


def test_truncated_box_rejected():
    mp4 = build_test_mp4()
    with pytest.raises(ValueError):
        probe_mp4(mp4[: len(mp4) // 2])


def test_probe_as_spark_filter_stage(spark):
    """The curation shape: probe every payload in an Arrow stage, filter by
    duration/resolution WITHOUT decoding."""
    import pandas as pd
    import pyspark.sql.functions as F

    rows = []
    for i in range(12):
        dur = 1.0 + i          # 1..12 s
        w = 160 * (1 + i % 3)  # 160/320/480
        rows.append((str(i), build_test_mp4(dur, 1000, w, 240)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["__key__", "mp4"]))

    @F.pandas_udf("duration_s double, width double, n_tracks int")
    def probe(payloads):
        import pandas as pd

        from datapipelines_spark.operators.video import probe_mp4

        out = []
        for p in payloads:
            m = probe_mp4(bytes(p))
            out.append(
                {
                    "duration_s": m["duration_s"],
                    "width": m["tracks"][0]["width"],
                    "n_tracks": m["n_tracks"],
                }
            )
        return pd.DataFrame(out)

    probed = df.withColumn("meta", probe("mp4")).select("__key__", "meta.*")
    kept = probed.where((F.col("duration_s") >= 4.0) & (F.col("width") >= 320.0))
    keys = sorted(int(r["__key__"]) for r in kept.collect())
    expected = [i for i in range(12) if (1.0 + i) >= 4.0 and 160 * (1 + i % 3) >= 320]
    assert keys == expected


# --- AVI (MJPEG) container ----------------------------------------------------


def _avi(colors=(10, 100, 200), size=16, fps=5):
    import numpy as np

    from datapipelines_spark.operators.jpegcodec import encode_jpeg
    from datapipelines_spark.operators.video import build_test_avi

    frames = [
        encode_jpeg(np.full((size, size, 3), c, dtype=np.uint8), quality=90)
        for c in colors
    ]
    return build_test_avi(frames, size, size, fps=fps)


def test_avi_probe_and_demux_decode():
    import numpy as np

    from datapipelines_spark.operators.jpegcodec import decode_jpeg
    from datapipelines_spark.operators.video import avi_mjpeg_frames, probe_avi

    avi = _avi()
    info = probe_avi(avi)
    assert info == {
        "n_frames": 3, "width": 16, "height": 16, "fps": 5.0, "codec": "MJPG",
    }
    frames = avi_mjpeg_frames(avi)
    assert len(frames) == 3
    means = [float(np.abs(decode_jpeg(f).astype(float).mean() - c)) for f, c in zip(frames, (10, 100, 200))]
    assert max(means) < 2.0  # lossy tolerance per solid-color block


def test_avi_garbage_rejected():
    import pytest

    from datapipelines_spark.operators.video import avi_mjpeg_frames, probe_avi

    for payload in (b"", b"RIFF\x00\x00\x00\x00WAVE", b"nope" * 10):
        with pytest.raises(ValueError):
            probe_avi(payload)
        with pytest.raises(ValueError):
            avi_mjpeg_frames(payload)


# --- YUV4MPEG2 ----------------------------------------------------------------


def test_y4m_roundtrip_and_header():
    import numpy as np

    from datapipelines_spark.operators.video import decode_y4m, encode_y4m

    frames = [np.full((8, 12), v, dtype=np.uint8) for v in (0, 128, 255)]
    dec, hdr = decode_y4m(encode_y4m(frames, fps=30))
    assert hdr == {"width": 12, "height": 8, "fps": 30.0, "colourspace": "Cmono"}
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)


def test_y4m_c420_chroma_skipped_and_truncation_detected():
    import numpy as np
    import pytest

    from datapipelines_spark.operators.video import decode_y4m

    w, h = 4, 2
    luma = np.arange(w * h, dtype=np.uint8).tobytes()
    chroma = bytes((w // 2) * (h // 2) * 2)
    data = b"YUV4MPEG2 W4 H2 F25:1 C420\x0a" + b"FRAME\x0a" + luma + chroma
    frames, hdr = decode_y4m(data)
    assert hdr["colourspace"] == "C420" and len(frames) == 1
    assert frames[0].tolist() == np.frombuffer(luma, dtype=np.uint8).reshape(2, 4).tolist()
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(data[:-1])
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"junk")
