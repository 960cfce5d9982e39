"""Multimodal operators: real header parsing + scaffold plumbing edges."""

import pytest

from sparkdu.fixtures import synth_image_bytes
from sparkdu.multimodal import parse_image_header, sniff_format


def test_header_parser_recovers_generator_truth():
    for i in range(120):
        payload, fmt, w, h = synth_image_bytes(i)
        got_fmt, got_w, got_h = parse_image_header(payload)
        assert (got_fmt, got_w, got_h) == (fmt, w, h), i


@pytest.mark.parametrize(
    "b, expect",
    [
        (b"", ("unknown", None, None)),
        (b"\x89PNG\r\n\x1a\n", ("unknown", None, None)),  # truncated: no IHDR
        (b"\xff\xd8\xff\xd9", ("jpeg", None, None)),      # no SOF before EOI
        (b"GIF89a\x10\x00\x20\x00", ("gif", 16, 32)),
        (b"GIF87a\x01\x00\x01\x00", ("gif", 1, 1)),
        (b"\x00\x01\x02\x03junk", ("unknown", None, None)),
        # JPEG with fill bytes (FF FF) before SOF0 for a 2x3 image
        (
            b"\xff\xd8\xff\xff\xff\xc0\x00\x11\x08\x00\x03\x00\x02\x03"
            b"\x01\x22\x00\x02\x11\x01\x03\x11\x01",
            ("jpeg", 2, 3),
        ),
        # JPEG whose segment length lies (< 2): parser must stop, not loop
        (b"\xff\xd8\xff\xe0\x00\x01", ("jpeg", None, None)),
    ],
)
def test_header_parser_edges(b, expect):
    assert parse_image_header(b) == expect


def test_image_meta_spark_roundtrip(spark):
    rows = []
    for i in range(60):
        payload, fmt, w, h = synth_image_bytes(i)
        rows.append((i, bytearray(payload), fmt, w, h))
    df = spark.createDataFrame(
        rows, "img_id long, payload binary, fmt string, w int, h int"
    )
    from sparkdu.multimodal import image_meta

    got = {r["img_id"]: (r["format"], r["width"], r["height"])
           for r in image_meta(df.select("img_id", "payload")).collect()}
    for i, _, fmt, w, h in rows:
        assert got[i] == (fmt, w, h)


def test_sniff_format_magic():
    assert sniff_format(b"\x89PNG\r\n\x1a\n") == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert sniff_format(b"GIF89a") == "gif"
    assert sniff_format(b"zzzz") == "unknown"


def test_image_meta_survives_corrupt_payloads(spark):
    """a batch mixing valid and unparseable payloads must not crash the
    Arrow conversion (None dims -> nullable Int32)."""
    from sparkdu.multimodal import image_meta

    p0, f0, w0, h0 = synth_image_bytes(0)
    rows = [(0, bytearray(p0)), (1, bytearray(b"")),
            (2, bytearray(b"\xff\xd8\xff\xd9")), (3, None)]
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    got = {r["img_id"]: (r["format"], r["width"], r["height"])
           for r in image_meta(df).collect()}
    assert got[0] == (f0, w0, h0)
    assert got[1] == ("unknown", None, None)
    assert got[2] == ("jpeg", None, None)
    assert got[3] == ("unknown", None, None)


def test_audio_decode_roundtrip_exact(spark):
    """REAL WAV decode: features computed from decoded PCM must equal the
    generator-truth columns exactly (same quantized samples), truncated
    payloads come back all-null with decode_status='error'."""
    import os

    from sparkdu.harness import fx
    from sparkdu.multimodal import audio_features

    if not os.path.exists(fx("audio")):
        import pytest

        pytest.skip("audio fixture missing")
    audio = spark.read.parquet(fx("audio"))
    got = {r["audio_id"]: r for r in audio_features(
        audio.select("audio_id", "payload")).collect()}
    truth = {r["audio_id"]: r for r in audio.collect()}
    assert len(got) == len(truth) > 0
    n_err = 0
    for aid, tr in truth.items():
        g = got[aid]
        if tr["sample_rate"] is None:
            n_err += 1
            assert g["decode_status"] == "error"
            assert g["rms"] is None and g["n_samples"] is None
        else:
            assert g["decode_status"] == "ok"
            assert g["sample_rate"] == tr["sample_rate"]
            assert g["n_samples"] == tr["n_samples"]
            assert g["rms"] == tr["rms"]  # bit-exact: same bytes, same math
            assert g["zcr"] == tr["zcr"]
    assert n_err >= 5  # the truncated tail is actually exercised
