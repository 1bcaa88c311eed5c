"""Pure-stdlib baseline JPEG codec (grayscale, single scan).

The third REAL image format for the multimodal column (after PNG and
GIF): ``decode_jpeg_gray`` parses DQT/SOF0/DHT/SOS, entropy-decodes the
huffman bitstream (byte unstuffing, DC prediction, run-length AC),
dequantizes and inverse-DCTs each 8×8 block. ``encode_jpeg_gray`` is the
matching encoder (standard Annex-K luminance tables). JPEG is lossy, so
the exact test oracle is ``jpeg_reconstruct_gray`` — the quantize →
dequantize → IDCT reconstruction computed WITHOUT entropy coding;
``decode(encode(x)) == jpeg_reconstruct_gray(x)`` must hold bit-for-bit
(entropy coding is exactly invertible), which pins the huffman/bitstream
layer. Reference analog: paddle_ocr.py:17-19 ``img_decode``/cv2.imdecode.

Scope: 8-bit grayscale, baseline DCT, no restart markers, no subsampling.
Color/progressive JPEGs raise ValueError (decode_image falls back).
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 luminance quantization table
QTAB = np.array(
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
    dtype=np.float64,
)

# Annex K.3 luminance huffman specs (BITS counts per code length, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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


def _zigzag() -> np.ndarray:
    """Flat indices of the 8×8 block in zigzag scan order."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(7, s) + 1)
        rs = rng if s % 2 == 1 else reversed(rng)
        for r in rs:
            out.append(r * 8 + (s - r))
    return np.asarray(out, dtype=np.int64)


ZIG = _zigzag()


def _dct_matrix() -> np.ndarray:
    n = np.arange(8, dtype=np.float64)
    M = 0.5 * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    M[0] *= 1.0 / np.sqrt(2.0)
    return M


_DCT = _dct_matrix()


def _huff_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical JPEG code assignment: symbol → (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    return {(ln, code): sym for sym, (code, ln) in _huff_encode_table(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write_code(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.bits.append((code >> k) & 1)

    def write_value(self, v: int, s: int) -> None:
        # magnitude bits: negative values stored as v + 2^s - 1
        self.write_code(v if v > 0 else v + (1 << s) - 1, s)

    def stuffed_bytes(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)  # pad with 1s (spec)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i:i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


def _quantized_blocks(arr: np.ndarray):
    """(padded shape, iterator of per-block zigzag int coefficient arrays)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(a, ((0, H - h), (0, W - w)), mode="edge").astype(np.float64) - 128.0
    blocks = []
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            F = _DCT @ padded[by:by + 8, bx:bx + 8] @ _DCT.T
            q = np.rint(F / QTAB).astype(np.int64)
            blocks.append(q.reshape(-1)[ZIG])
    return (H, W), blocks


def _reconstruct(
    H: int, W: int, blocks: list[np.ndarray], qtab: np.ndarray | None = None
) -> np.ndarray:
    qt = QTAB if qtab is None else qtab
    out = np.zeros((H, W), dtype=np.float64)
    i = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            zz = blocks[i]
            i += 1
            q = np.zeros(64, dtype=np.float64)
            q[ZIG] = zz
            block = _DCT.T @ (q.reshape(8, 8) * qt) @ _DCT
            out[by:by + 8, bx:bx + 8] = block
    return np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)


def jpeg_reconstruct_gray(arr: np.ndarray) -> np.ndarray:
    """The exact expected result of decode(encode(arr)) — the lossy
    quantize/dequantize/IDCT reconstruction without entropy coding."""
    a = np.asarray(arr, dtype=np.uint8)
    (H, W), blocks = _quantized_blocks(a)
    return _reconstruct(H, W, blocks)[: a.shape[0], : a.shape[1]]


def encode_jpeg_gray(arr: np.ndarray) -> bytes:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3:
        if a.shape[2] != 1:
            raise ValueError("encode_jpeg_gray takes grayscale (h, w[, 1])")
        a = a[:, :, 0]
    h, w = a.shape
    _, blocks = _quantized_blocks(a)
    dct_t = _huff_encode_table(DC_BITS, DC_VALS)
    act_t = _huff_encode_table(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for zz in blocks:
        vals = zz.tolist()
        diff = vals[0] - prev_dc
        prev_dc = vals[0]
        s = abs(diff).bit_length()
        bw.write_code(*dct_t[s])
        if s:
            bw.write_value(diff, s)
        run = 0
        for v in vals[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                bw.write_code(*act_t[0xF0])  # ZRL
                run -= 16
            s = abs(v).bit_length()
            bw.write_code(*act_t[(run << 4) | s])
            bw.write_value(v, s)
            run = 0
        if run:
            bw.write_code(*act_t[0x00])  # EOB

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz = QTAB.astype(np.int64).reshape(-1)[ZIG]  # DQT stores zigzag order
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, b"\x00" + bytes(int(x) for x in qz))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += bw.stuffed_bytes()
    return out + b"\xff\xd9"  # EOI


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed
            else:
                raise ValueError(f"unexpected marker 0xff{nxt:02x} in scan")
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """→ (h, w, 1) uint8. Baseline grayscale only; else ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtab = None
    h = w = None
    dc_table = ac_table = None
    scan_pos = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        length = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + length]
        if marker == 0xDB:
            if body[0] & 0xF0:
                raise ValueError("16-bit quant tables unsupported")
            flat = np.zeros(64, dtype=np.float64)
            flat[ZIG] = np.frombuffer(body[1:65], dtype=np.uint8)
            qtab = flat.reshape(8, 8)
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit grayscale baseline supported")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1:off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17:off + 17 + nvals])
                table = _huff_decode_table(bits, vals)
                if tc_th >> 4 == 0:
                    dc_table = table
                else:
                    ac_table = table
                off += 17 + nvals
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            scan_pos = pos + 2 + length
            break
        pos += 2 + length
    if qtab is None or h is None or dc_table is None or ac_table is None or scan_pos is None:
        raise ValueError("missing JPEG segments")

    br = _BitReader(data, scan_pos)
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    blocks = []
    prev_dc = 0
    for _ in range((H // 8) * (W // 8)):
        zz = np.zeros(64, dtype=np.int64)
        s = _read_symbol(br, dc_table)
        diff = _extend(br.read_bits(s), s) if s else 0
        prev_dc += diff
        zz[0] = prev_dc
        i = 1
        while i < 64:
            rs = _read_symbol(br, ac_table)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                i += 16
                continue
            i += rs >> 4
            s = rs & 0x0F
            if i > 63:
                raise ValueError("AC index overflow")
            zz[i] = _extend(br.read_bits(s), s)
            i += 1
        blocks.append(zz)

    out = _reconstruct(H, W, blocks, qtab=qtab)
    return out[:h, :w, None]
