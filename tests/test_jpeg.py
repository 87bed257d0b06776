"""Tests for the baseline JPEG codec.

No image library ships in this container, so there is no third-party
cross-check fixture; a pure round-trip test could hide a compensating
encoder/decoder bug (transposed DCT, wrong zigzag, mis-assigned Huffman
codes). The spec-constant tests below pin each table against values
printed in ITU-T T.81 itself, which breaks that symmetry: the decoder is
checked against the STANDARD, not just against our encoder.
"""

from __future__ import annotations

import numpy as np
import pytest

from lakehouse_workshop_spark.llm import jpeg as J


def test_zigzag_is_the_spec_sequence():
    # ITU-T T.81 Figure 5 / every textbook: the first and last entries.
    assert J.ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert J.ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert len(set(J.ZIGZAG)) == 64


def test_dct_matrix_is_orthonormal_with_spec_dc():
    ident = J._DCT @ J._DCT.T
    np.testing.assert_allclose(ident, np.eye(8), atol=1e-12)
    # DC basis row is the constant 1/sqrt(8) — a flat block of value v
    # transforms to coef[0,0] = 8v ... scaled: DCT(flat v)[0,0] = 8*v/8^0.5... check directly
    flat = np.full((8, 8), 9.0)
    coef = J._dct2(flat)
    assert abs(coef[0, 0] - 72.0) < 1e-9  # 8 * 9
    assert np.abs(coef).sum() - abs(coef[0, 0]) < 1e-9


def test_huffman_canonical_codes_match_spec():
    # Annex K DC-luma canonical assignment (printed in T.81 Table K.3
    # commentary and every reference implementation): category 0 -> 00
    # (2 bits), 1 -> 010, ..., 11 -> 111111110 (9 bits).
    codes = J._huff_codes(J._DC_LUMA_BITS, J._DC_LUMA_VALS)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)
    # AC luma: EOB (0x00) = 1010 (4 bits), ZRL (0xF0) = 11111111001 (11).
    ac = J._huff_codes(J._AC_LUMA_BITS, J._AC_LUMA_VALS)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0x01] == (0b00, 2)
    assert ac[0xF0] == (0b11111111001, 11)


def test_quant_tables_are_annex_k():
    assert J.QT_LUMA[0, 0] == 16 and J.QT_LUMA[7, 7] == 99
    assert J.QT_CHROMA[0, 0] == 17 and J.QT_CHROMA[3, 1] == 66


def test_magnitude_coding_roundtrips():
    for v in (-255, -128, -1, 0, 1, 2, 127, 255, 1023):
        size, bits = J._magnitude(v)
        assert J._extend(bits, size) == v


def test_flat_image_roundtrips_exactly():
    for val in (0, 64, 128, 200, 255):
        flat = np.full((8, 8, 3), val, dtype=np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(flat))
        assert int(np.abs(out.astype(int) - val).max()) <= 1


def test_gradient_roundtrip_error_bounded():
    y, x = np.mgrid[0:16, 0:16]
    grad = np.stack(
        [(x * 16) % 256, (y * 16) % 256, ((x + y) * 8) % 256], axis=-1
    ).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(grad))
    err = np.abs(out.astype(int) - grad.astype(int))
    assert err.mean() < 8 and err.max() < 40


def test_roundtrip_is_deterministic_and_stuffed():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    payload = J.encode_jpeg(img)
    assert J.encode_jpeg(img) == payload
    out = J.decode_jpeg(payload)
    assert (J.decode_jpeg(payload) == out).all()
    # the entropy segment may contain 0xFF only as stuffed FF 00 — scan
    # between SOS payload start and EOI
    sos = payload.find(b"\xff\xda")
    scan = payload[sos + 2 + int.from_bytes(payload[sos + 2 : sos + 4], "big") : -2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, "bare 0xFF in entropy stream"
            i += 2
        else:
            i += 1


def test_decoder_reads_tables_from_stream_not_assumptions():
    # double every luma quant entry in the stream: decoded pixels MUST
    # change (a decoder that ignores DQT and assumes Annex K would not).
    y, x = np.mgrid[0:8, 0:8]
    img = np.stack([x * 30 % 256, y * 30 % 256, (x + y) * 15 % 256], axis=-1).astype(np.uint8)
    payload = bytearray(J.encode_jpeg(img))
    i = payload.find(b"\xff\xdb") + 5  # first DQT table id byte
    for k in range(1, 65):
        payload[i + k] = min(255, payload[i + k] * 2)
    changed = J.decode_jpeg(bytes(payload))
    assert (changed != J.decode_jpeg(J.encode_jpeg(img))).any()


def test_decoder_refuses_progressive_and_truncation():
    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    payload = bytearray(J.encode_jpeg(flat))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xdb\x00\x04\x00\x00")  # truncated
    with pytest.raises(ValueError):
        J.decode_jpeg(b"not a jpeg")


def test_decode_image_dispatches_jpeg():
    from lakehouse_workshop_spark.llm.multimodal import decode_image

    flat = np.full((8, 8, 3), 50, dtype=np.uint8)
    out = decode_image(J.encode_jpeg(flat))
    assert out.shape == (8, 8, 3)
    assert int(np.abs(out.astype(int) - 50).max()) <= 1


def test_jpeg_decodes_distributed(spark):
    """JPEG payloads synthesized and decoded through Arrow-batched
    mapInPandas must agree with the local decode — the distributed
    plumbing for the codec, without a registry slot."""
    import pandas as pd

    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rng = np.random.default_rng(21)
    imgs = {i: rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for i in range(24)}
    rows = [(i, bytearray(J.encode_jpeg(px))) for i, px in imgs.items()]
    media = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("media_id", LongType(), False),
                StructField("payload", BinaryType(), False),
            ]
        ),
    ).repartition(8)

    schema = StructType(
        [
            StructField("media_id", LongType(), True),
            StructField("pix_md5", StringType(), True),
        ]
    )

    def body(batches):
        import hashlib

        for pdf in batches:
            out = {"media_id": [], "pix_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = J.decode_jpeg(bytes(payload))
                out["media_id"].append(int(mid))
                out["pix_md5"].append(hashlib.md5(arr.tobytes()).hexdigest())
            yield pd.DataFrame(out)

    got = {r.media_id: r.pix_md5 for r in media.mapInPandas(body, schema=schema).collect()}
    import hashlib

    for i, px in imgs.items():
        local = hashlib.md5(J.decode_jpeg(J.encode_jpeg(px)).tobytes()).hexdigest()
        assert got[i] == local, i


def test_fill_bytes_between_segments_are_skipped():
    """T.81 allows any number of 0xFF fill bytes before a marker."""
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    payload = J.encode_jpeg(img)
    # splice a fill byte right after SOI, before the first segment marker
    padded = payload[:2] + b"\xff" + payload[2:]
    out = J.decode_jpeg(padded)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out, J.decode_jpeg(payload))


def test_standalone_marker_before_sos_refuses_loudly():
    """TEM/RSTn before SOS carry no length word; the walk must refuse,
    not misparse them as length-prefixed segments."""
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    payload = J.encode_jpeg(img)
    for standalone in (b"\xff\x01", b"\xff\xd0", b"\xff\xd7"):
        spliced = payload[:2] + standalone + payload[2:]
        with pytest.raises(NotImplementedError, match="standalone marker"):
            J.decode_jpeg(spliced)
