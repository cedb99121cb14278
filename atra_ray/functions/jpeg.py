"""Pure-stdlib baseline JPEG (JFIF) codec — numpy DCT, no PIL/libjpeg.

Scope (documented, enforced): baseline sequential DCT (SOF0), 8-bit,
grayscale or YCbCr with 4:4:4, 4:2:2 or 4:2:0 chroma subsampling (any
integer sampling-factor ratio, MCU-interleaved per T.81 A.2.3 with
nearest-neighbor chroma upsampling on decode — real-world corpora are
overwhelmingly 4:2:0), standard JPEG Annex-K quantization (quality-50)
and Huffman tables. The encoder exists to make REAL JPEG fixture bytes
(`sources/media.py`); the decoder is the production path in
``DecodeImageStage`` (multimodal.py) — it parses baseline JFIF streams
(incl. 0xFF fill bytes before markers), and REJECTS progressive (SOF2),
arithmetic, 12-bit, non-integer sampling ratios and restart-interval
(DRI) streams with ValueError, which the stage surfaces as an ok=False
row (decode errors are DATA, not exceptions — truncated-segment
struct/index failures convert at the decode_jpeg boundary).

Why not byte-exact oracles: JPEG is lossy — the driver oracle checks the
header-parsed dimensions (id arithmetic), and tests bound the roundtrip
pixel error instead (flat blocks reconstruct near-exactly; random images
within quant-table error).

All constants are from the public JPEG spec (ITU T.81 Annex K).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "JPEG_MAGIC"]

JPEG_MAGIC = b"\xff\xd8\xff"

# ITU T.81 Annex K quantization tables (quality 50)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K Huffman tables: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16)
_C *= np.sqrt(2.0 / 8)
_C[0] /= np.sqrt(2.0)


def _huff_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_component(blocks: np.ndarray, q: np.ndarray, dc_tab, ac_tab, w, pred):
    """blocks: (n, 8, 8) float (level-shifted); appends to bit-writer w.
    Returns the updated DC predictor."""
    for b in blocks:
        coef = _C @ b @ _C.T
        qc = np.round(coef / q).astype(np.int64)
        zz = qc.reshape(64)[_ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = _category(diff)
        code, ln = dc_tab[s]
        w.write(code, ln)
        if s:
            w.write(_amplitude(diff, s), s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                w.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_tab[(run << 4) | s]
            w.write(code, ln)
            w.write(_amplitude(v, s), s)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]  # EOB
            w.write(code, ln)
    return pred


def _edge_pad(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    """Edge-replicate ``plane`` up to (H, W)."""
    h, w = plane.shape
    p = np.empty((H, W), dtype=np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:, w:] = p[:, w - 1 : w]
    return p


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane -> (n_blocks, 8, 8) in raster MCU order, edge
    padded to multiples of 8."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    p = _edge_pad(plane, H, W)
    return (
        p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _mcu_blocks(plane: np.ndarray, hf: int, vf: int, mcu_h: int, mcu_w: int) -> np.ndarray:
    """(h, w) float plane -> (n_mcus, hf*vf, 8, 8): the component's data
    units grouped per MCU in T.81 A.2.3 interleave order (raster over the
    component's hf x vf blocks within each MCU), edge padded to the MCU
    grid."""
    p = _edge_pad(plane, mcu_h * vf * 8, mcu_w * hf * 8)
    return (
        p.reshape(mcu_h, vf, 8, mcu_w, hf, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(mcu_h * mcu_w, vf * hf, 8, 8)
    )


def _downsample(plane: np.ndarray, hf: int, vf: int) -> np.ndarray:
    """Box-average chroma downsampling by (vf, hf) with edge padding —
    the encoder's sampling filter (any filter is spec-legal)."""
    if hf == 1 and vf == 1:
        return plane
    h, w = plane.shape
    H, W = -(-h // vf) * vf, -(-w // hf) * hf
    p = _edge_pad(plane, H, W)
    return p.reshape(H // vf, vf, W // hf, hf).mean(axis=(1, 3))


def _dht_segment(tclass: int, tid: int, table) -> bytes:
    bits, values = table
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_jpeg(px: np.ndarray, subsampling: str = "444") -> bytes:
    """(h, w) or (h, w, 1|3) uint8 -> baseline JFIF bytes.

    ``subsampling`` picks the luma sampling factors for 3-channel input:
    "444" (1x1, every component full resolution), "422" (2x1 — chroma
    halved horizontally), "420" (2x2 — chroma halved both ways, the
    near-universal real-world layout). Chroma planes are box-averaged
    down and the scan is MCU-interleaved per T.81 A.2.3. Ignored for
    grayscale."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hf, vf = _SUBSAMPLING[subsampling] if c == 3 else (1, 1)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ([(0, _QY)] if c == 1 else [(0, _QY), (1, _QC)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in q.reshape(64)[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * c) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([c])
    for ci in range(c):
        samp = (hf << 4) | vf if ci == 0 else 0x11
        out += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += _dht_segment(0, 0, _DC_LUM) + _dht_segment(1, 0, _AC_LUM)
    if c == 3:
        out += _dht_segment(0, 1, _DC_CHR) + _dht_segment(1, 1, _AC_CHR)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * c) + bytes([c])
    for ci in range(c):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])
    f = px.astype(np.float64)
    if c == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            _downsample(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0, hf, vf),
            _downsample(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0, hf, vf),
        ]
    else:
        planes = [f[..., 0]]
    dc_l, ac_l = _huff_codes(*_DC_LUM), _huff_codes(*_AC_LUM)
    dc_c, ac_c = _huff_codes(*_DC_CHR), _huff_codes(*_AC_CHR)
    # MCU interleave: per MCU the luma's hf*vf blocks in raster order,
    # then one block of each chroma component (T.81 A.2.3); 4:4:4
    # degenerates to one block per component
    mcu_h, mcu_w = -(-h // (8 * vf)), -(-w // (8 * hf))
    comp_blocks = [
        _mcu_blocks(
            np.clip(p, 0, 255) - 128.0,
            hf if ci == 0 else 1,
            vf if ci == 0 else 1,
            mcu_h,
            mcu_w,
        )
        for ci, p in enumerate(planes)
    ]
    wtr = _BitWriter()
    preds = [0] * c
    for i in range(mcu_h * mcu_w):
        for ci in range(c):
            q = _QY if ci == 0 else _QC
            dct_tabs = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            preds[ci] = _encode_component(
                comp_blocks[ci][i], q, dct_tabs[0], dct_tabs[1], wtr, preds[ci]
            )
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                # incl. RSTn: restart intervals are rejected at DRI, so a
                # restart marker mid-entropy means a stream we'd corrupt
                raise ValueError("unexpected marker in entropy stream")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def huff(self, lut: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad JPEG Huffman code")


def _huff_decode_lut(bits, values):
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline 4:4:4 / grayscale JFIF bytes -> (h, w, c) uint8.

    EVERY malformed-stream failure surfaces as ValueError (the stage
    contract: decode errors are DATA) — the inner parser's struct/index
    errors on truncated segments are converted at this boundary."""
    try:
        return _decode_jpeg_inner(data)
    except (struct.error, IndexError) as e:
        raise ValueError("malformed JPEG stream") from e


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if not data.startswith(JPEG_MAGIC[:2]):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment")
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment body")
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = np.frombuffer(body[bpos + 1 : bpos + 65], np.uint8)
                qtabs[tq] = tab.reshape(8, 8)
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                values = list(body[bpos + 17 : bpos + 17 + nv])
                htabs[(tc, th)] = _huff_decode_lut(bits, values)
                bpos += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hf, vf = samp >> 4, samp & 0xF
                if not (1 <= hf <= 4 and 1 <= vf <= 4):
                    raise ValueError("bad JPEG sampling factors")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI: restart intervals are out of scope
            # (decoding them needs DC-predictor resets + pad-bit resync,
            # T.81 E.2.4 — reject rather than silently corrupt pixels)
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            if struct.unpack(">H", body[:2])[0] != 0:
                raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if h is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            if ns != len(comps):
                raise ValueError("multi-scan baseline JPEG unsupported")
            rdr = _BitReader(data, pos + seglen)
            comp_by_id = {c[0]: c for c in comps}
            hmax = max(c[1] >> 4 for c in comps)
            vmax = max(c[1] & 0xF for c in comps)
            # per-scan-component geometry (T.81 A.1.1 / A.2.4): sampling
            # factors, per-MCU block grid, true sample dims, upsampling
            # ratio back to image resolution
            qs, facs, dims = [], [], []
            for cid, _, _ in scan:
                if cid not in comp_by_id or comp_by_id[cid][2] not in qtabs:
                    raise ValueError("JPEG scan references missing tables")
                _, samp, tq = comp_by_id[cid]
                hf, vf = samp >> 4, samp & 0xF
                if ns == 1:
                    hf = vf = hmax = vmax = 1  # single-comp scan: own grid
                if hmax % hf or vmax % vf:
                    raise ValueError("non-integer JPEG sampling ratio")
                qs.append(qtabs[tq])
                facs.append((hf, vf))
                dims.append((-(-h * vf // vmax), -(-w * hf // hmax)))
            mcu_h, mcu_w = -(-h // (8 * vmax)), -(-w // (8 * hmax))
            planes = [
                np.zeros((mcu_h * vf * 8, mcu_w * hf * 8))
                for hf, vf in facs
            ]
            preds = [0] * ns
            luts = []
            for _, dc_id, ac_id in scan:
                dc_lut = htabs.get((0, dc_id))
                ac_lut = htabs.get((1, ac_id))
                if dc_lut is None or ac_lut is None:
                    raise ValueError("JPEG scan references missing tables")
                luts.append((dc_lut, ac_lut))
            for my in range(mcu_h):
                for mx in range(mcu_w):
                    for si in range(ns):
                        hf, vf = facs[si]
                        dc_lut, ac_lut = luts[si]
                        for by in range(vf):
                            for bx in range(hf):
                                s = rdr.huff(dc_lut)
                                diff = _extend(rdr.bits(s), s) if s else 0
                                preds[si] += diff
                                zz = np.zeros(64, dtype=np.int64)
                                zz[0] = preds[si]
                                k = 1
                                while k < 64:
                                    rs = rdr.huff(ac_lut)
                                    if rs == 0x00:  # EOB
                                        break
                                    if rs == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += rs >> 4
                                    size = rs & 0xF
                                    if k > 63:
                                        raise ValueError("JPEG AC index overflow")
                                    zz[k] = _extend(rdr.bits(size), size)
                                    k += 1
                                coef = np.zeros(64, dtype=np.float64)
                                coef[_ZIGZAG] = zz * qs[si].reshape(64)[_ZIGZAG]
                                block = _C.T @ coef.reshape(8, 8) @ _C + 128.0
                                r0 = (my * vf + by) * 8
                                c0 = (mx * hf + bx) * 8
                                planes[si][r0 : r0 + 8, c0 : c0 + 8] = block
            # crop to true sample dims, then nearest-neighbor upsample
            # chroma back to image resolution (sample replication)
            up = []
            for si in range(ns):
                hf, vf = facs[si]
                ch, cw = dims[si]
                p = planes[si][:ch, :cw]
                ry, rx = vmax // vf, hmax // hf
                if ry > 1:
                    p = np.repeat(p, ry, axis=0)
                if rx > 1:
                    p = np.repeat(p, rx, axis=1)
                up.append(p[:h, :w])
            planes = up
            if ns == 1:
                out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
                return out[:, :, None]
            if ns == 3:
                y, cb, cr = planes
                cb = cb - 128.0
                cr = cr - 128.0
                rgb = np.stack(
                    [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr,
                     y + 1.772 * cb],
                    axis=-1,
                )
                return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
            raise ValueError(f"unsupported JPEG component count {ns}")
        pos += seglen
    raise ValueError("JPEG missing SOS scan")
