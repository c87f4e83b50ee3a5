"""Real image-header decode (VERDICT r2 task #4).

`parse_image_header` is pure Python over real byte layouts — PNG IHDR,
JPEG segment-marker scan to SOFn, GIF logical-screen descriptor — with the
deterministic stub only as the unknown-format fallback. The corpus
(media_table) emits all three bands; dims in the header bands live in a
domain (16..2063) disjoint enough from the stub's (64..575 only by
construction of the oracle SQL) that a silent stub fallback fails the
oracle value-compare.
"""

import struct

import pytest

from pdfextract_spark.functions import multimodal as mm


def _png(w: int, h: int, trailer: bytes = b"\x00" * 16) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\x0dIHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
        + trailer
    )


def _jpeg(w: int, h: int, extra_segments: bytes = b"") -> bytes:
    sof = b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", h, w) + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + extra_segments + sof + b"\x00" * 16


class TestParseImageHeader:
    def test_png(self):
        assert mm.parse_image_header(_png(640, 480)) == (640, 480, "png")

    def test_png_large_dims(self):
        assert mm.parse_image_header(_png(70000, 3)) == (70000, 3, "png")

    def test_png_bad_signature(self):
        assert mm.parse_image_header(b"\x89PNG\r\n\x1a\x00" + b"\x00" * 20) is None

    def test_png_truncated(self):
        assert mm.parse_image_header(_png(640, 480)[:20]) is None

    def test_jpeg_immediate_sof(self):
        assert mm.parse_image_header(_jpeg(320, 200)) == (320, 200, "jpg")

    def test_jpeg_sof_behind_app0_and_com(self):
        app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
        com = b"\xff\xfe\x00\x04ab"
        assert mm.parse_image_header(_jpeg(1920, 1080, app0 + com)) == (1920, 1080, "jpg")

    def test_jpeg_progressive_sof2(self):
        sof2 = b"\xff\xc2\x00\x11\x08" + struct.pack(">HH", 77, 99) + b"\x03" + b"\x00" * 9
        assert mm.parse_image_header(b"\xff\xd8" + sof2) == (99, 77, "jpg")

    def test_jpeg_dht_is_not_sof(self):
        # C4 (DHT) must be skipped as a variable-length segment, not read as SOF
        dht = b"\xff\xc4\x00\x05\x08\x00\x01"
        assert mm.parse_image_header(_jpeg(12, 34, dht)) == (12, 34, "jpg")

    def test_jpeg_fill_bytes_and_rst(self):
        fill = b"\xff\xff\xff\xd0"  # fill padding then a standalone RST0
        assert mm.parse_image_header(_jpeg(55, 66, fill)) == (55, 66, "jpg")

    def test_jpeg_eoi_before_sof(self):
        assert mm.parse_image_header(b"\xff\xd8\xff\xd9") is None

    def test_jpeg_lost_sync(self):
        assert mm.parse_image_header(b"\xff\xd8\x00\x00\x00\x00") is None

    def test_gif(self):
        assert mm.parse_image_header(b"GIF89a" + struct.pack("<HH", 300, 150) + b"\x00" * 4) == (300, 150, "gif")

    def test_opaque_falls_back(self):
        assert mm.parse_image_header(b"\x12\x34\x56\x78" * 4) is None
        w, h, fmt = mm.decode_any(b"\x12\x34\x56\x78" * 4)
        assert (w, h) == (64 + 0x1234 % 512, 64 + 0x5678 % 512)
        assert fmt == "png"  # byte 0 even


class TestMediaTableBands:
    """The synthesized payloads must be REAL parseable headers whose parsed
    dims equal the md5-derived values the DuckDB oracle computes."""

    @pytest.fixture(scope="class")
    def rows(self, spark):
        docs = spark.range(0, 48).withColumnRenamed("id", "doc_id")
        return mm.media_table(docs).collect()

    def test_all_bands_present_and_parse(self, rows):
        import hashlib

        seen = set()
        for r in rows:
            did = int(r["doc_id"])
            band = (did // 4) % 3
            seen.add(band)
            payload = bytes(r["payload"])
            md5 = hashlib.md5(r["media_ref"].encode()).hexdigest()
            parsed = mm.parse_image_header(payload)
            if band == mm.BAND_OPAQUE:
                assert parsed is None
                assert payload == bytes.fromhex(md5)
                continue
            exp_w = int(md5[0:4], 16) % mm.DIM_MOD + mm.DIM_MIN
            exp_h = int(md5[4:8], 16) % mm.DIM_MOD + mm.DIM_MIN
            exp_fmt = "png" if band == mm.BAND_PNG else "jpg"
            assert parsed == (exp_w, exp_h, exp_fmt), (did, band)
            # every band ends with the md5 bytes (frame_sample's duration tail)
            assert payload[-16:] == bytes.fromhex(md5)
        assert seen == {0, 1, 2}
