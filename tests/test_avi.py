"""AVI (RIFF/MJPEG) container codec tests — ``llm/avi.py``.

The container walk is validated the way the WAV/PNG codec tests are: a
round trip must be byte-faithful at the frame level, and every lie the
format can tell (truncation, wrong magic, index/chunk disagreement,
header/payload disagreement) must raise loudly instead of mis-seeking.
"""

from __future__ import annotations

import numpy as np
import pytest

from lakehouse_workshop_spark.llm.avi import (
    AVI_US_PER_FRAME,
    decode_avi,
    encode_avi,
    parse_avi,
)
from lakehouse_workshop_spark.llm.multimodal import (
    JPEG_ERR_BOUND,
    video_frame_pixels,
    video_n_frames,
)


def _frames(n=4, text="avi codec test"):
    return [video_frame_pixels(text, f) for f in range(n)]


def test_roundtrip_container_level():
    """parse_avi must return the exact JPEG bytes the encoder wrote, in
    order, with the header metadata the encoder declared."""
    from lakehouse_workshop_spark.llm.jpeg import encode_jpeg

    frames = _frames(4)
    meta, jpegs = parse_avi(encode_avi(frames))
    assert meta["n_frames"] == 4
    assert meta["width"] == 8 and meta["height"] == 8
    assert meta["us_per_frame"] == AVI_US_PER_FRAME
    assert meta["handler"] == "MJPG"
    assert jpegs == [encode_jpeg(f) for f in frames]


def test_roundtrip_pixel_level_within_jpeg_bound():
    frames = _frames(3)
    _, decoded = decode_avi(encode_avi(frames))
    for d, o in zip(decoded, frames):
        err = np.abs(d.astype(np.int64) - o.astype(np.int64)).mean()
        assert err <= JPEG_ERR_BOUND


def test_odd_length_frame_padding():
    """RIFF chunks pad to even length; an odd-sized JPEG must not shift
    the walk off the following chunks."""
    from lakehouse_workshop_spark.llm.jpeg import encode_jpeg

    frames = _frames(5)
    # The property needs an odd-length chunk mid-stream to exercise the
    # pad byte: frame 1 of this set encodes odd (pinned here so a codec
    # change that evens every length turns this test into a loud failure
    # instead of silently dropping the coverage).
    encoded = [encode_jpeg(f) for f in frames]
    assert any(len(j) & 1 for j in encoded[:-1]), (
        "no odd-length JPEG mid-stream — padding walk not exercised"
    )
    _, jpegs = parse_avi(encode_avi(frames))
    assert jpegs == encoded  # walk stays aligned across the pad bytes
    assert len(jpegs) == 5


def test_rejects_non_avi_and_truncation():
    payload = encode_avi(_frames(2))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated"):
        parse_avi(payload[: len(payload) // 2])


def test_rejects_idx1_offset_mismatch():
    payload = bytearray(encode_avi(_frames(3)))
    i = bytes(payload).rindex(b"idx1")
    payload[i + 16] ^= 0xFF  # first entry's offset field
    with pytest.raises(ValueError, match="idx1 index disagrees"):
        parse_avi(bytes(payload))


def test_rejects_avih_frame_count_lie():
    payload = bytearray(encode_avi(_frames(3)))
    j = bytes(payload).index(b"avih")
    payload[j + 8 + 16] ^= 0x01  # dwTotalFrames
    with pytest.raises(ValueError, match="declares"):
        parse_avi(bytes(payload))


def test_empty_frame_list_rejected():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi([])


def test_video_n_frames_rule():
    assert [video_n_frames(i) for i in range(6)] == [2, 3, 4, 2, 3, 4]


def test_container_roundtrip_property():
    """Property: for ANY frame count/size/content, the demuxed JPEG bytes
    are exactly what the encoder wrote, in order, with consistent
    headers — the container layer adds and removes NOTHING."""
    from hypothesis import given, settings, strategies as st

    from lakehouse_workshop_spark.llm.jpeg import encode_jpeg

    @settings(max_examples=20, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=6),
        side=st.sampled_from([8, 16]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, side, seed):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        meta, jpegs = parse_avi(encode_avi(frames))
        assert meta["n_frames"] == n
        assert (meta["width"], meta["height"]) == (side, side)
        assert jpegs == [encode_jpeg(f) for f in frames]

    check()
