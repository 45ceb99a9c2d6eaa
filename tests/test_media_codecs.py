"""Real-codec tests for the pure-stdlib PNG decoder (VERDICT r12 task #6):
the multimodal decoder seam finally decodes REAL bytes end-to-end — a
genuine PNG byte stream (signature, CRC-checked chunks, zlib inflate,
Sub/Up/Average/Paeth unfiltering) — through the production
``frame_sample_plan`` mapInPandas path, with golden checksums.

Independence layers (so encoder and decoder can't hide a mirrored bug):
1. a SPEC golden: a PNG hand-packed byte-by-byte in the test (struct +
   zlib only, no ``png_encode``), whose filtered scanlines and expected
   reconstruction are written out by hand from the PNG spec;
2. cross-filter agreement anchored at filter 0: filter-None encoding is
   a raw passthrough (no filter arithmetic at all), so its decode is
   ground truth for the same pixels encoded with filters 1-4;
3. pinned md5 goldens for the generated fixtures (regression pins);
4. the full Spark path: real PNGs as BinaryType payloads through
   ``frame_sample_plan(decoder=png_scanline_frames)``.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from merl_etl_spark.operators.media_codecs import (
    PngFormatError,
    png_decode,
    png_encode,
    png_scanline_frames,
)


def _pix(w: int, h: int, c: int, salt: int) -> bytes:
    """Deterministic pixel pattern with gradients along every axis."""
    return bytes(
        (x * 7 + y * 13 + ch * 29 + salt * 31) % 256
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


# ---------------------------------------------------------------------------
# 1. spec golden — hand-packed PNG, hand-computed reconstruction
# ---------------------------------------------------------------------------


def test_png_decode_spec_golden_hand_packed():
    """A 2x3 RGB PNG assembled byte-by-byte from the spec, one filter per
    row, expected pixels reconstructed BY HAND below (not by any code in
    the package):

    row0 filter 1 (Sub):  line 10,20,30,  5, 5, 5
        px0 = 10,20,30 (left=0); px1 = 15,25,35 (adds left pixel)
    row1 filter 2 (Up):   line  1, 1, 1,  2, 2, 2
        adds row0:        11,21,31, 17,27,37
    row2 filter 4 (Paeth): line 3, 3, 3,  4, 4, 4
        px0: a=0, b=11/21/31, c=0 -> p=b, predictor=b -> 14,24,34
        px1: a=14/24/34, b=17/27/37, c=11/21/31
             p = a+b-c = 20/30/40; |p-a|=6, |p-b|=3, |p-c|=9 -> b
             -> 21,31,41
    """
    filtered = bytes(
        [1, 10, 20, 30, 5, 5, 5]
        + [2, 1, 1, 1, 2, 2, 2]
        + [4, 3, 3, 3, 4, 4, 4]
    )
    ihdr = struct.pack(">IIBBBBB", 2, 3, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered))
        + _chunk(b"IEND", b"")
    )
    w, h, c, pixels = png_decode(png)
    assert (w, h, c) == (2, 3, 3)
    assert pixels == bytes(
        [10, 20, 30, 15, 25, 35]
        + [11, 21, 31, 17, 27, 37]
        + [14, 24, 34, 21, 31, 41]
    )


def test_png_decode_filter0_is_ground_truth_for_all_filters():
    """Filter-None encoding stores raw scanlines verbatim (no filter
    arithmetic), so its decode anchors the unfilter recurrences: the same
    pixels encoded per-row with each of filters 1-4 must decode to the
    identical buffer."""
    w, h, c = 13, 9, 3
    raw = _pix(w, h, c, 4)
    base = png_decode(png_encode(w, h, raw, channels=c, filter_types=[0]))[3]
    assert base == raw  # passthrough: proves chunk + zlib layers alone
    for ftype in (1, 2, 3, 4):
        got = png_decode(
            png_encode(w, h, raw, channels=c, filter_types=[ftype])
        )[3]
        assert got == base, f"filter {ftype} decode diverges from ground truth"


# ---------------------------------------------------------------------------
# 2. pinned goldens + profile/corruption behaviour
# ---------------------------------------------------------------------------

# (salt, width, height, channels) -> (md5 of PNG bytes, md5 of raw pixels);
# the PNG md5 pins the encoder byte stream, the pixel md5 pins the decode.
_GOLDENS = [
    (0, 16, 11, 3, "718882e6891e4f35cbdb49dae0cef512",
     "3bbcf00187b8e0a0da9a59a901eed9fd"),
    (1, 9, 7, 4, "cf07ed4bae0cf1586bf7af2ca3f65fda",
     "7679d7655f492678f1dd4efbb537dd24"),
    (2, 23, 5, 1, "c0b74a811d4f429c38e8df340589cbc1",
     "115d1bd284d468dcf0f84bdd6a1c99af"),
]


def test_png_roundtrip_golden_checksums():
    for salt, w, h, c, png_md5, pix_md5 in _GOLDENS:
        raw = _pix(w, h, c, salt)
        png = png_encode(w, h, raw, channels=c)  # cycles all 5 filters
        assert hashlib.md5(png).hexdigest() == png_md5
        got_w, got_h, got_c, out = png_decode(png)
        assert (got_w, got_h, got_c) == (w, h, c)
        assert out == raw
        assert hashlib.md5(out).hexdigest() == pix_md5


def test_png_decode_rejects_corruption_and_unsupported_profiles():
    raw = _pix(8, 8, 3, 1)
    png = bytearray(png_encode(8, 8, raw, channels=3))
    # flip one IDAT payload byte -> CRC must catch it
    idat_at = bytes(png).index(b"IDAT") + 6
    png[idat_at] ^= 0xFF
    with pytest.raises(PngFormatError, match="CRC"):
        png_decode(bytes(png))
    # truncation
    with pytest.raises(PngFormatError):
        png_decode(png_encode(8, 8, raw, channels=3)[:40])
    # not a PNG at all
    with pytest.raises(PngFormatError, match="signature"):
        png_decode(b"GIF89a" + bytes(50))
    # 16-bit depth is out of profile: must refuse, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(18)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngFormatError, match="bit depth"):
        png_decode(deep)


# ---------------------------------------------------------------------------
# 3. end-to-end: real PNG bytes through the production mapInPandas seam
# ---------------------------------------------------------------------------


def test_frame_sample_plan_decodes_real_png_bytes(spark):
    """The task-#6 closer: REAL PNG byte streams ride a BinaryType column
    through the production ``frame_sample_plan`` (mapInPandas, Arrow
    batches, executor-side decode) with the real decoder plugged into the
    seam — and every emitted frame digest matches the md5 of the
    corresponding raw scanline computed directly from the pixel
    generator (never through the decoder)."""
    from merl_etl_spark.operators.multimodal import frame_sample_plan

    stride = 3
    docs, expected = [], {}
    for salt, w, h, c, _, _ in _GOLDENS:
        raw = _pix(w, h, c, salt)
        docs.append((salt, bytearray(png_encode(w, h, raw, channels=c))))
        for fid in range(0, h, stride):
            row = raw[fid * w * c : (fid + 1) * w * c]
            expected[(salt, fid)] = (len(row), hashlib.md5(row).hexdigest())

    df = spark.createDataFrame(docs, "doc_id long, payload binary")
    got = {
        (r["doc_id"], r["frame_id"]): (r["frame_bytes"], r["frame_md5"])
        for r in frame_sample_plan(
            df, decoder=png_scanline_frames, stride=stride
        ).collect()
    }
    assert got == expected


def test_decode_frames_real_flag_routes_to_png_decoder(spark):
    """decode_frames(real=True) is no longer a NotImplementedError: it
    decodes PNG payloads via the real codec and refuses non-PNG bytes."""
    from merl_etl_spark.operators.multimodal import decode_frames

    raw = _pix(6, 4, 3, 2)
    frames = decode_frames(png_encode(6, 4, raw, channels=3), real=True)
    assert frames == [raw[i : i + 18] for i in range(0, len(raw), 18)]
    with pytest.raises(PngFormatError):
        decode_frames(b"not a png", real=True)


def test_png_roundtrip_hypothesis_fuzz():
    """Property fuzz over the full encode→decode loop: arbitrary small
    dimensions, every colour type, arbitrary per-row filter choices, and
    arbitrary pixel bytes must round-trip exactly (the unfilter
    recurrences are exact inverses for ALL inputs, not just the
    deterministic fixtures the goldens pin)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(st.data())
    def prop(data):
        w = data.draw(st.integers(min_value=1, max_value=24), label="w")
        h = data.draw(st.integers(min_value=1, max_value=12), label="h")
        c = data.draw(st.sampled_from([1, 3, 4]), label="channels")
        filters = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=4), min_size=1, max_size=5
            ),
            label="filters",
        )
        raw = data.draw(
            st.binary(min_size=w * h * c, max_size=w * h * c), label="pixels"
        )
        width, height, channels, pixels = png_decode(
            png_encode(w, h, raw, channels=c, filter_types=filters)
        )
        assert (width, height, channels) == (w, h, c)
        assert pixels == raw

    prop()
