"""Round-14 wave tests — semantic replays (pure Python/numpy) plus
production-plan drives for the r14 operators.

Wave 1: mm-png-decode — the real PNG codec (zlib inflate + CRC +
Sub/Up/Average/Paeth unfiltering) on the driver surface through the
production ``frame_sample_plan`` mapInPandas seam, pinned to a golden
frame table the DuckDB oracle restates as literals.
"""

from __future__ import annotations

import hashlib

import pytest

from merl_etl_spark.operators.media_codecs import (
    PngFormatError,
    png_scanline_frames,
)
from merl_etl_spark.operators.multimodal import (
    _PNG_GOLDEN,
    _PNG_SPECS,
    _png_fixture_rows,
    mm_png_decode,
)


def test_png_golden_replay_pure_python():
    """Re-derive the pinned golden table from the codec alone: encode the
    deterministic fixtures, decode them back, stride-2 sample, digest.
    A codec regression (filter recurrences, CRC, inflate) fails here
    before the driver or the oracle ever see it."""
    got = []
    for doc_id, payload in _png_fixture_rows():
        frames = png_scanline_frames(payload)
        w, h, ch, _ = _PNG_SPECS[doc_id]
        assert len(frames) == h
        assert all(len(f) == w * ch for f in frames)
        for fid in range(0, len(frames), 2):
            got.append(
                (doc_id, fid, len(frames[fid]), hashlib.md5(frames[fid]).hexdigest())
            )
    assert got == _PNG_GOLDEN


def test_png_fixtures_cover_every_filter_and_colour_type():
    """The fixture grid must keep exercising all five difference filters
    and all three supported colour types — someone trimming _PNG_SPECS
    would silently shrink what the driver-surface query proves."""
    channels = {ch for _, _, ch, _ in _PNG_SPECS}
    assert channels == {1, 3, 4}
    filters: set[int] = set()
    for _, h, _, choice in _PNG_SPECS:
        rows = choice if choice is not None else list(range(5))
        filters.update(rows[i % len(rows)] for i in range(h))
    assert filters == {0, 1, 2, 3, 4}


def test_png_corrupt_payload_raises():
    _, payload = _png_fixture_rows()[0]
    bad = bytearray(payload)
    bad[40] ^= 0xFF  # inside the IDAT chunk: CRC or inflate must fail
    with pytest.raises(PngFormatError):
        png_scanline_frames(bytes(bad))


def test_mm_png_decode_production_plan(spark, sf_dir):
    """Drive the REGISTERED query (the real mapInPandas plan, decoder in
    the task closure) and compare against the golden table."""
    rows = sorted(
        (r.doc_id, r.frame_id, r.frame_bytes, r.frame_md5)
        for r in mm_png_decode(spark, sf_dir).collect()
    )
    assert rows == _PNG_GOLDEN
