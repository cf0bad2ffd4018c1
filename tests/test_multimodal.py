"""The stdlib BMP/PPM decoders parse real bytes correctly — padding,
row order, channel order, header comments — and the synth→decode
image pass is exact end-to-end."""

from __future__ import annotations

import struct

import pytest

from dst_spark_k8_lakehouse_spark.llm import multimodal as mm


def _gradient_bmp(w: int, h: int, top_down: bool = False) -> tuple[bytes, tuple]:
    """Hand-built gradient BMP; returns (payload, (mean_r, mean_g,
    mean_b)). Pixel (x, y) = (x*10, y*20, x+y), y indexed from the TOP
    of the image regardless of storage order."""
    rowsize = (w * 3 + 3) // 4 * 4
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r, g, b = x * 10, y * 20, x + y
            row += bytes((b, g, r))
        row += b"\x00" * (rowsize - 3 * w)
        rows.append(bytes(row))
    data = b"".join(rows if top_down else reversed(rows))
    header = b"BM" + struct.pack("<IHHI", 54 + len(data) , 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(data), 2835, 2835, 0, 0,
    )
    n = w * h
    means = (
        sum(x * 10 for x in range(w)) * h / n,
        sum(y * 20 for y in range(h)) * w / n,
        sum(x + y for x in range(w) for y in range(h)) / n,
    )
    return header + info + data, means


def test_bmp_gradient_padding_and_both_row_orders():
    for w, h, td in [(3, 2, False), (3, 2, True), (5, 4, False), (4, 3, True)]:
        payload, means = _gradient_bmp(w, h, top_down=td)
        fmt, W, H, mr, mg, mb = mm.decode_image(payload)
        assert (fmt, W, H) == ("bmp", w, h)
        assert (mr, mg, mb) == pytest.approx(means)


def test_bmp_solid_roundtrip():
    p = mm.encode_bmp(7, 5, (200, 100, 50))  # w=7 → 1 pad byte per row
    assert mm.decode_image(p) == ("bmp", 7, 5, 200.0, 100.0, 50.0)


def test_ppm_roundtrip_and_comments():
    p = mm.encode_ppm(6, 3, (9, 8, 7))
    assert mm.decode_image(p) == ("ppm", 6, 3, 9.0, 8.0, 7.0)
    # comments inside the header must be skipped
    with_comment = b"P6\n# a comment\n6 3\n# more\n255\n" + bytes((9, 8, 7)) * 18
    assert mm.decode_image(with_comment) == ("ppm", 6, 3, 9.0, 8.0, 7.0)


def test_unknown_and_unsupported_variants_raise():
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_image(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError):  # ASCII PPM not sniffed as P6
        mm.decode_image(b"P3\n1 1\n255\n1 2 3\n")
    # 8-bit BMP refused, never mis-read
    p = bytearray(mm.encode_bmp(2, 2, (1, 2, 3)))
    struct.pack_into("<H", p, 28, 8)
    with pytest.raises(NotImplementedError, match="24-bit"):
        mm.decode_image(bytes(p))
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_image(mm.encode_bmp(4, 4, (1, 2, 3))[:-8])


def test_synth_decode_pass_is_exact(spark):
    docs = spark.range(0, 40).selectExpr("id AS doc_id")
    out = {
        r.doc_id: r
        for r in mm.decode_images(mm.attach_image_payloads(docs)).collect()
    }
    assert len(out) == 40
    for d in range(40):
        r = out[d]
        assert r.fmt == ("bmp" if d % 2 == 0 else "ppm")
        assert (r.width, r.height) == (8 + d % 16, 8 + (d // 16) % 16)
        assert (r.mean_r, r.mean_g, r.mean_b) == (
            float(d % 256), float(d * 7 % 256), float(d * 13 % 256)
        )


def test_wav_roundtrip_real_bytes():
    from dst_spark_k8_lakehouse_spark.llm.multimodal import (
        decode_wav,
        encode_wav,
    )

    payload = encode_wav(n_samples=120, rate=16000, amp=-42)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, n, ch, mean = decode_wav(payload)
    assert (rate, n, ch, mean) == (16000, 120, 1, -42.0)
    # empty audio decodes to 0 mean, not NaN
    assert decode_wav(encode_wav(0, 8000, 0))[3] == 0.0


def test_decode_audio_distributed(spark, sf_dir):
    from dst_spark_k8_lakehouse_spark.llm.multimodal import (
        attach_audio_payloads,
        decode_audio,
    )
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = decode_audio(attach_audio_payloads(docs)).collect()
    assert len(out) == 20
    for r in out:
        d = r.doc_id
        assert r.sample_rate == 8000 + (d % 4) * 4000
        assert r.n_samples == 100 + d % 50
        assert r.mean_amp == float((d % 2000) - 1000)


def test_y4m_roundtrip_all_colorspaces():
    for cs, frames in [("C420jpeg", 3), ("C444", 2), ("Cmono", 4),
                       ("C422", 1)]:
        p = mm.encode_y4m(6, 4, frames, 30, 99, colorspace=cs)
        w, h, n, fps, luma = mm.decode_y4m(p)
        assert (w, h, n, fps, luma) == (6, 4, frames, 30.0, 99.0), cs


def test_y4m_mean_over_heterogeneous_frames():
    # hand-built stream: two frames with DIFFERENT constant luma —
    # the mean must average across frames, not read frame 0 only
    hdr = b"YUV4MPEG2 W4 H2 F24:1 Ip A1:1 Cmono\n"
    f1 = b"FRAME\n" + bytes([10]) * 8
    f2 = b"FRAME\n" + bytes([30]) * 8
    w, h, n, fps, luma = mm.decode_y4m(hdr + f1 + f2)
    assert (w, h, n, fps, luma) == (4, 2, 2, 24.0, 20.0)


def test_y4m_frame_params_and_fractional_rate():
    # per-frame parameters after FRAME are legal Y4M; 30000:1001 NTSC
    hdr = b"YUV4MPEG2 W4 H2 F30000:1001 Cmono\n"
    f = b"FRAME Xsome=param\n" + bytes([50]) * 8
    w, h, n, fps, luma = mm.decode_y4m(hdr + f)
    assert (w, h, n) == (4, 2, 1)
    assert abs(fps - 30000 / 1001) < 1e-9
    assert luma == 50.0


def test_y4m_loud_failures():
    with pytest.raises(NotImplementedError, match="YUV4MPEG2"):
        mm.decode_y4m(b"\x00\x00\x00\x18ftypmp42")  # an MP4 box
    with pytest.raises(NotImplementedError, match="colourspace"):
        mm.decode_y4m(b"YUV4MPEG2 W4 H2 F24:1 C411\nFRAME\n" + b"\0" * 12)
    good = mm.encode_y4m(4, 2, 2, 24, 7)
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_y4m(good[:-3])
    with pytest.raises(ValueError, match="malformed FRAME"):
        mm.decode_y4m(good + b"JUNK\n")
    with pytest.raises(ValueError, match="zero frames"):
        mm.decode_y4m(b"YUV4MPEG2 W4 H2 F24:1 Cmono\n")
    with pytest.raises(ValueError, match="even"):
        mm.encode_y4m(5, 3, 1, 24, 0)


def test_decode_video_distributed(spark, sf_dir):
    from dst_spark_k8_lakehouse_spark.llm.multimodal import (
        attach_video_payloads,
        decode_video,
    )
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = decode_video(attach_video_payloads(docs)).collect()
    assert len(out) == 20
    for r in out:
        d = r.doc_id
        assert r.width == 4 + 2 * (d % 4)
        assert r.height == 2 + 2 * (d % 3)
        assert r.n_frames == 1 + d % 5
        assert r.fps == 24.0 + (d % 2) * 6
        assert r.mean_luma == float(d % 256)
