"""Baseline JPEG codec, pure numpy + stdlib — the last named codec seam.

Sequential baseline JFIF (SOF0), 4:4:4 (no chroma subsampling), standard
Annex-K quantization and Huffman tables. The encoder exists to synthesize
genuine JPEG payloads inside the engine; the decoder is the production
path (``decode_image`` dispatches on the SOI marker).

Scope guards: progressive (SOF2), subsampled, arithmetic-coded, or
restart-interval streams raise ``NotImplementedError`` loudly — decoding
a stream this module did not claim would silently corrupt pixels.

JPEG is lossy but DETERMINISTIC: decode(encode(x)) is the same integer
raster every run, so tests pin round-trip error bounds and byte-exact
re-decodes without golden files.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K, Table K.1/K.2 — the standard base (quality-50) tables.
QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Zigzag order: ZIGZAG[k] = (row, col) of the k-th coefficient.
def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        order.extend(diag if s % 2 else diag[::-1])
    return order


ZIGZAG = _zigzag_order()

# Annex K, Tables K.3-K.6: standard Huffman specs as (bits, values).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical code assignment: value -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value lookup for decoding."""
    return {
        (length, code): val
        for val, (code, length) in _huff_codes(bits, vals).items()
    }


_DCT = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, bit pattern)."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    dc_codes,
    ac_codes,
    pred: int,
) -> int:
    coef = _dct2(block.astype(np.float64) - 128.0)
    q = np.round(coef / qt).astype(np.int32)
    zz = [int(q[r, c]) for r, c in ZIGZAG]
    # DC (differential)
    diff = zz[0] - pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    # AC run-length
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return zz[0]


def _decode_block(
    reader: _BitReader, dc_dec, ac_dec, qt: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    def read_huff(dec) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if (length, code) in dec:
                return dec[(length, code)]
        raise ValueError("invalid Huffman code in JPEG scan")

    zz = [0] * 64
    size = read_huff(dc_dec)
    dc = pred + _extend(reader.read_bits(size), size)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = read_huff(ac_dec)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC index overran the block")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    q = np.zeros((8, 8), dtype=np.float64)
    for idx, (r, c) in enumerate(ZIGZAG):
        q[r, c] = zz[idx]
    return _idct2(q * qt) + 128.0, dc


def _qt_bytes(qt: np.ndarray) -> bytes:
    return bytes(int(qt[r, c]) for r, c in ZIGZAG)


def encode_jpeg(pixels) -> bytes:
    """Encode an HxWx3 uint8 array as baseline JFIF (4:4:4, Annex-K tables).

    Dims must be multiples of 8 (this engine synthesizes its own payloads;
    padding logic would be dead code here and raises instead).
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    assert c == 3, "JPEG encoder is RGB"
    if h % 8 or w % 8:
        raise NotImplementedError("encoder requires multiple-of-8 dims")
    ycc = _rgb_to_ycbcr(arr.astype(np.float64))

    dc_l = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0, 0, 0]
    for by in range(h // 8):
        for bx in range(w // 8):
            for comp in range(3):
                block = ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, comp]
                qt = QT_LUMA if comp == 0 else QT_CHROMA
                dc = dc_l if comp == 0 else dc_c
                ac = ac_l if comp == 0 else ac_c
                preds[comp] = _encode_block(writer, block, qt, dc, ac, preds[comp])
    scan = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + _qt_bytes(QT_LUMA))
    out += seg(0xFFDB, b"\x01" + _qt_bytes(QT_CHROMA))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, qid)  # 1x1 sampling = 4:4:4
    out += seg(0xFFC0, sof)
    for cls_id, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += seg(0xFFC4, bytes([cls_id] + bits) + bytes(vals))
    sos = struct.pack(">B", 3)
    for cid, tbl in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tbl)
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


JPEG_SOI = b"\xff\xd8"


def decode_jpeg(payload: bytes):
    """Decode a baseline JFIF stream (SOF0, 4:4:4, Huffman) to HxWx3 uint8.

    Walks markers, rebuilds quantization + Huffman tables FROM THE STREAM
    (not assumptions), entropy-decodes, dequantizes, IDCTs, converts to
    RGB. Progressive/subsampled/arithmetic/restart streams refuse loudly.
    """
    data = bytes(payload)
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[int, dict] = {}
    h = w = None
    comp_spec = []  # (cid, qt_id)
    scan_start = None
    comp_tables = {}
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        if data[pos + 1] == 0xFF:
            # T.81 permits 0xFF fill bytes between segments
            pos += 1
            continue
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        if marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD7:
            # standalone markers carry no length word; treating them as
            # length-prefixed would misparse the stream — refuse loudly
            # like every other out-of-scope shape in this module
            raise NotImplementedError(
                f"standalone marker 0x{marker:04X} before SOS (TEM/RSTn)"
            )
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                if i + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt = np.zeros((8, 8), dtype=np.int32)
                for idx, (r, c) in enumerate(ZIGZAG):
                    qt[r, c] = body[i + 1 + idx]
                qts[tq] = qt
                i += 65
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp != 3:
                raise NotImplementedError("8-bit 3-component only")
            for ci in range(ncomp):
                cid, sampling, qid = struct.unpack(
                    ">BBB", body[6 + 3 * ci : 9 + 3 * ci]
                )
                if sampling != 0x11:
                    raise NotImplementedError("4:4:4 only (no subsampling)")
                comp_spec.append((cid, qid))
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[tc_th] = _huff_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xFFDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xFFDA:
            ns = body[0]
            for ci in range(ns):
                cid, tbl = body[1 + 2 * ci], body[2 + 2 * ci]
                comp_tables[cid] = (tbl >> 4, tbl & 0xF)
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if scan_start is None or h is None:
        raise ValueError("JPEG missing SOF/SOS")
    if h % 8 or w % 8:
        raise NotImplementedError("decoder requires multiple-of-8 dims")

    scan_end = data.rfind(b"\xff\xd9")
    reader = _BitReader(data[scan_start : scan_end if scan_end > 0 else None])
    ycc = np.zeros((h, w, 3), dtype=np.float64)
    preds = [0, 0, 0]
    for by in range(h // 8):
        for bx in range(w // 8):
            for comp, (cid, qid) in enumerate(comp_spec):
                dc_id, ac_id = comp_tables[cid]
                block, preds[comp] = _decode_block(
                    reader,
                    huff[dc_id],  # DC class: tc=0 -> key = (0<<4)|th = th
                    huff[0x10 | ac_id],
                    qts[qid].astype(np.float64),
                    preds[comp],
                )
                ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, comp] = block
    rgb = np.clip(np.rint(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
    return rgb
