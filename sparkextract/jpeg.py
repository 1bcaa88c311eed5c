"""Pure-stdlib baseline JPEG codec (grayscale + 4:2:0 YCbCr color).

A REAL image format for the multimodal column (with PNG and GIF):
``decode_jpeg`` parses DQT/SOF0/DHT/SOS, entropy-decodes the huffman
bitstream (byte unstuffing, DC prediction per component, run-length AC),
dequantizes and inverse-DCTs each 8×8 block; for 3-component scans it
walks 4:2:0 MCUs (4 Y + Cb + Cr), nearest-upsamples chroma and converts
back to RGB. ``encode_jpeg_gray`` / ``encode_jpeg_color`` are the
matching encoders (standard Annex-K luminance + chrominance tables).
JPEG is lossy, so the exact test oracles are ``jpeg_reconstruct_gray`` /
``jpeg_reconstruct_color`` — the colorspace → subsample → quantize →
dequantize → IDCT → upsample reconstruction computed WITHOUT entropy
coding; ``decode(encode(x)) == jpeg_reconstruct(x)`` must hold
bit-for-bit (entropy coding is exactly invertible), which pins the
huffman/bitstream/MCU layer. The decode path and the oracle share every
numeric helper, so equality is structural, not luck. Reference analog:
paddle_ocr.py:17-19 ``img_decode``/cv2.imdecode.

Scope: 8-bit DCT; baseline single-scan gray (1 component, no
subsampling) or color (3 components, fixed 4:2:0) WITH optional
restart markers (DRI/RSTn: predictor reset + byte alignment, encoder
flag + decoder support), plus
PROGRESSIVE (SOF2) grayscale AND 4:2:0 color — full
spectral-selection + successive-approximation scan decoding (EOBn
runs, ZRL, correction bits, interleaved DC scans; T.81 Annex G) with
matching 4-scan (gray) / 8-scan (color) progressive encoders, pinned
to the same ``jpeg_reconstruct_*`` exactness oracles. Other samplings
raise ValueError (decode_image falls back)."""

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


# ITU-T T.81 Annex K.1 chrominance quantization table
QTAB_C = np.array(
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
    dtype=np.float64,
)

# Annex K.3 chrominance huffman specs
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
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


def _quantized_blocks(arr: np.ndarray, qtab: np.ndarray | None = None, mult: int = 8):
    """(padded shape, list of per-block zigzag int coefficient arrays),
    blocks in row-major 8×8 raster order; plane edge-padded to a multiple
    of ``mult`` (16 for the 4:2:0 luma plane)."""
    qt = QTAB if qtab is None else qtab
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    H, W = -(-h // mult) * mult, -(-w // mult) * mult
    padded = np.pad(a, ((0, H - h), (0, W - w)), mode="edge").astype(np.float64) - 128.0
    blocks = []
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            F = _DCT @ padded[by:by + 8, bx:bx + 8] @ _DCT.T
            q = np.rint(F / qt).astype(np.int64)
            blocks.append(q.reshape(-1)[ZIG])
    return (H, W), blocks


# ---------- color: JFIF YCbCr + 4:2:0 sampling (shared by the encoder,
# the decoder and the reconstruction oracle — bit-exactness by sharing)

def _rgb_to_ycbcr(a: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = a[:, :, 0].astype(np.float64)
    g = a[:, :, 1].astype(np.float64)
    b = a[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    to8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(cb), to8(cr)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.stack(
        [np.clip(np.rint(p), 0, 255).astype(np.uint8) for p in (r, g, b)], axis=2
    )


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """4:2:0 chroma: mean of each 2×2 (edge-padded to even dims), rint."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.float64)
    m = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    return np.clip(np.rint(m), 0, 255).astype(np.uint8)


def _upsample2(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor 2× replication, cropped to (h, w)."""
    return np.repeat(np.repeat(plane, 2, axis=0), 2, axis=1)[:h, :w]


def _pad_to(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


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


def _write_block(bw: _BitWriter, zz: np.ndarray, dct_t, act_t, prev_dc: int) -> int:
    """Entropy-encode one zigzag block; returns the new DC predictor."""
    vals = zz.tolist()
    diff = vals[0] - prev_dc
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
    return vals[0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _dqt_body(tid: int, qtab: np.ndarray) -> bytes:
    qz = qtab.astype(np.int64).reshape(-1)[ZIG]  # DQT stores zigzag order
    return bytes([tid]) + bytes(int(x) for x in qz)


def encode_jpeg_gray(arr: np.ndarray, restart_interval: int = 0) -> bytes:
    """Baseline grayscale encoder; ``restart_interval`` > 0 emits a DRI
    segment and an RSTn marker (DC predictor reset, byte-aligned) every
    that many MCUs — the error-resilience feature real-world encoders
    use (T.81 §B.2.5/E.2.4)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3:
        if a.shape[2] != 1:
            raise ValueError("encode_jpeg_gray takes grayscale (h, w[, 1])")
        a = a[:, :, 0]
    h, w = a.shape
    _, blocks = _quantized_blocks(a)
    dct_t = _huff_encode_table(DC_BITS, DC_VALS)
    act_t = _huff_encode_table(AC_BITS, AC_VALS)
    segments, bw, prev_dc, rst = [], _BitWriter(), 0, 0
    for m, zz in enumerate(blocks):
        if restart_interval and m and m % restart_interval == 0:
            segments.append(bw.stuffed_bytes() + bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            bw = _BitWriter()
            prev_dc = 0
        prev_dc = _write_block(bw, zz, dct_t, act_t, prev_dc)
    segments.append(bw.stuffed_bytes())

    out = b"\xff\xd8"  # SOI
    out += _seg(0xFFDB, _dqt_body(0, QTAB))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += b"".join(segments)
    return out + b"\xff\xd9"  # EOI


def _color_planes(a: np.ndarray):
    """RGB → (Y blocks grid dims + blocks, padded Cb/Cr blocks) for 4:2:0;
    shared by encode_jpeg_color and jpeg_reconstruct_color."""
    y, cb, cr = _rgb_to_ycbcr(a)
    cbs, crs = _subsample2(cb), _subsample2(cr)
    (Hy, Wy), yb = _quantized_blocks(y, QTAB, mult=16)
    Hc, Wc = Hy // 2, Wy // 2
    _, cbb = _quantized_blocks(_pad_to(cbs, Hc, Wc), QTAB_C)
    _, crb = _quantized_blocks(_pad_to(crs, Hc, Wc), QTAB_C)
    return (Hy, Wy), yb, (Hc, Wc), cbb, crb


def encode_jpeg_color(arr: np.ndarray, restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB uint8 → baseline 4:2:0 YCbCr JPEG; optional RSTn
    markers every ``restart_interval`` MCUs (see encode_jpeg_gray)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_jpeg_color takes (h, w, 3) RGB")
    h, w = a.shape[:2]
    (Hy, Wy), yb, (Hc, Wc), cbb, crb = _color_planes(a)
    dct_y = _huff_encode_table(DC_BITS, DC_VALS)
    act_y = _huff_encode_table(AC_BITS, AC_VALS)
    dct_c = _huff_encode_table(DC_BITS_C, DC_VALS_C)
    act_c = _huff_encode_table(AC_BITS_C, AC_VALS_C)
    segments, bw, rst, m = [], _BitWriter(), 0, 0
    dy_, dcb, dcr = 0, 0, 0
    nbx, ncx = Wy // 8, Wc // 8
    for my in range(Hy // 16):
        for mx in range(Wy // 16):
            if restart_interval and m and m % restart_interval == 0:
                segments.append(bw.stuffed_bytes() + bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                bw = _BitWriter()
                dy_ = dcb = dcr = 0
            m += 1
            for oy, ox in ((0, 0), (0, 1), (1, 0), (1, 1)):
                dy_ = _write_block(
                    bw, yb[(2 * my + oy) * nbx + 2 * mx + ox], dct_y, act_y, dy_
                )
            dcb = _write_block(bw, cbb[my * ncx + mx], dct_c, act_c, dcb)
            dcr = _write_block(bw, crb[my * ncx + mx], dct_c, act_c, dcr)
    segments.append(bw.stuffed_bytes())

    out = b"\xff\xd8"
    out += _seg(0xFFDB, _dqt_body(0, QTAB) + _dqt_body(1, QTAB_C))
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01",
    )
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    out += _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11" + b"\x00\x3f\x00")
    out += b"".join(segments)
    return out + b"\xff\xd9"


def jpeg_reconstruct_color(arr: np.ndarray) -> np.ndarray:
    """Expected decode(encode_jpeg_color(arr)) — the lossy colorspace →
    4:2:0 → quantize → IDCT → upsample path without entropy coding."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    (Hy, Wy), yb, (Hc, Wc), cbb, crb = _color_planes(a)
    yr = _reconstruct(Hy, Wy, yb)[:h, :w]
    cbr = _reconstruct(Hc, Wc, cbb, qtab=QTAB_C)
    crr = _reconstruct(Hc, Wc, crb, qtab=QTAB_C)
    return _ycbcr_to_rgb(yr, _upsample2(cbr, h, w), _upsample2(crr, h, w))


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

    def sync_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker (T.81 §B.2.5:
        restart markers stand between entropy segments, not stuffed)."""
        self.cur = 0
        self.nbits = 0  # discard pad bits of the closed segment
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise ValueError("missing/misnumbered restart marker")
        self.pos += 2


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


def _read_block(br: _BitReader, dc_table, ac_table, prev_dc: int):
    """Entropy-decode one zigzag block; returns (zz, new_dc)."""
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
    return zz, prev_dc


def decode_jpeg(data: bytes) -> np.ndarray:
    """→ (h, w, 1) uint8 for grayscale, (h, w, 3) RGB for 4:2:0 color.
    Baseline single-scan only; anything else raises ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (component id, sampling, qtab id)
    scan_tables: dict[int, tuple[int, int]] = {}  # cid -> (dc id, ac id)
    scan_order: list[int] = []
    scan_pos = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        length = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + length]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                if body[off] & 0xF0:
                    raise ValueError("16-bit quant tables unsupported")
                flat = np.zeros(64, dtype=np.float64)
                flat[ZIG] = np.frombuffer(body[off + 1:off + 65], dtype=np.uint8)
                qtabs[body[off] & 0x0F] = flat.reshape(8, 8)
                off += 65
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component baseline supported")
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i])
                for i in range(ncomp)
            ]
            if ncomp == 1 and comps[0][1] != 0x11:
                raise ValueError("subsampled grayscale unsupported")
            if ncomp == 3 and [c[1] for c in comps] != [0x22, 0x11, 0x11]:
                raise ValueError("only 4:2:0 color sampling supported")
        elif marker == 0xC2:
            return _decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1:off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17:off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _huff_decode_table(bits, vals)
                off += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            for i in range(ns):
                cid, t = body[1 + 2 * i], body[2 + 2 * i]
                scan_tables[cid] = (t >> 4, t & 0x0F)
                scan_order.append(cid)
            scan_pos = pos + 2 + length
            break
        pos += 2 + length
    if not qtabs or h is None or not huff or scan_pos is None or not comps:
        raise ValueError("missing JPEG segments")
    if [c[0] for c in comps] != scan_order:
        raise ValueError("scan component order differs from frame order")

    def tables(cid: int):
        dc_id, ac_id = scan_tables[cid]
        return huff[(0, dc_id)], huff[(1, ac_id)]

    br = _BitReader(data, scan_pos)
    if len(comps) == 1:
        cid, _, qid = comps[0]
        dc_t, ac_t = tables(cid)
        H, W = -(-h // 8) * 8, -(-w // 8) * 8
        n_mcu = (H // 8) * (W // 8)
        blocks, prev_dc = [], 0
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                br.sync_restart(m // restart_interval - 1)
                prev_dc = 0  # RSTn resets the DC predictor (T.81 E.2.4)
            zz, prev_dc = _read_block(br, dc_t, ac_t, prev_dc)
            blocks.append(zz)
        return _reconstruct(H, W, blocks, qtab=qtabs[qid])[:h, :w, None]

    # 4:2:0 color: MCU = 4 Y (2×2 raster) + Cb + Cr
    Hy, Wy = -(-h // 16) * 16, -(-w // 16) * 16
    Hc, Wc = Hy // 2, Wy // 2
    nbx, ncx = Wy // 8, Wc // 8
    yb: list = [None] * ((Hy // 8) * nbx)
    cbb: list = [None] * ((Hc // 8) * ncx)
    crb: list = [None] * ((Hc // 8) * ncx)
    (y_cid, _, y_qid), (cb_cid, _, cb_qid), (cr_cid, _, cr_qid) = comps
    dc_y, ac_y = tables(y_cid)
    dc_c1, ac_c1 = tables(cb_cid)
    dc_c2, ac_c2 = tables(cr_cid)
    pdy = pdcb = pdcr = 0
    m = 0
    for my in range(Hy // 16):
        for mx in range(Wy // 16):
            if restart_interval and m and m % restart_interval == 0:
                br.sync_restart(m // restart_interval - 1)
                pdy = pdcb = pdcr = 0
            m += 1
            for oy, ox in ((0, 0), (0, 1), (1, 0), (1, 1)):
                zz, pdy = _read_block(br, dc_y, ac_y, pdy)
                yb[(2 * my + oy) * nbx + 2 * mx + ox] = zz
            zz, pdcb = _read_block(br, dc_c1, ac_c1, pdcb)
            cbb[my * ncx + mx] = zz
            zz, pdcr = _read_block(br, dc_c2, ac_c2, pdcr)
            crb[my * ncx + mx] = zz
    yr = _reconstruct(Hy, Wy, yb, qtab=qtabs[y_qid])[:h, :w]
    cbr = _reconstruct(Hc, Wc, cbb, qtab=qtabs[cb_qid])
    crr = _reconstruct(Hc, Wc, crb, qtab=qtabs[cr_qid])
    return _ycbcr_to_rgb(yr, _upsample2(cbr, h, w), _upsample2(crr, h, w))


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Back-compat wrapper: → (h, w, 1); raises on color payloads."""
    out = decode_jpeg(data)
    if out.shape[2] != 1:
        raise ValueError("decode_jpeg_gray called on a color JPEG")
    return out


# ---------------------------------------------------------------------
# Progressive mode (SOF2, T.81 Annex G) — grayscale scope.
#
# Progressive re-packages the SAME quantized coefficients as baseline
# into spectral-selection + successive-approximation scans, so once all
# scans are decoded the result must equal jpeg_reconstruct_gray
# bit-for-bit — the same exactness oracle the baseline codec carries.
# Scan script used by the encoder (the common 4-scan progression):
#   1. DC first       (Ss=0, Se=0,  Ah=0, Al=1)  huffman-coded diffs of dc>>1
#   2. DC refinement  (Ss=0, Se=0,  Ah=1, Al=0)  one raw bit/block (dc & 1)
#   3. AC first       (Ss=1, Se=63, Ah=0, Al=1)  RLE over sign·(|v|>>1)
#   4. AC refinement  (Ss=1, Se=63, Ah=1, Al=0)  G.1.2.3 correction bits
# The decoder handles the general grayscale case (any spectral bands,
# EOBn run lengths, multiple refinements); color progressive raises.


def _ac_shift(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (T.81 G.1.2.1)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _write_ac_first(bw: _BitWriter, shifted: list[int], act) -> None:
    """AC-first scan for one block over already point-transformed coefs
    (EOB emitted as EOB0 — an EOB run of exactly one block)."""
    run = 0
    for v in shifted:
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write_code(*act[0xF0])
            run -= 16
        s = abs(v).bit_length()
        bw.write_code(*act[(run << 4) | s])
        bw.write_value(v, s)
        run = 0
    if run:
        bw.write_code(*act[0x00])


def _write_ac_refine(bw: _BitWriter, coefs: list[int], act, al: int) -> None:
    """AC-refinement scan for one block (T.81 G.1.2.3): newly-significant
    coefficients as (run,1) symbols + sign bit; already-significant ones
    contribute buffered correction bits appended after the next symbol."""
    absv = [abs(v) >> al for v in coefs]
    eob = 0  # index AFTER the last newly-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = i + 1
    run, pending = 0, []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        # the ZRL check runs before EVERY nonzero coefficient (also the
        # already-significant ones): the decoder consumes buffered
        # correction bits inside each symbol's ≤16-zero advance span, so
        # a correction may never sit more than 15 zeros past the last
        # emitted symbol
        while run > 15 and i < eob:
            bw.write_code(*act[0xF0])
            for b in pending:
                bw.write_code(b, 1)
            pending = []
            run -= 16
        if t > 1:  # already significant: one correction bit
            pending.append(t & 1)
            continue
        bw.write_code(*act[(run << 4) | 1])
        bw.write_code(1 if coefs[i] > 0 else 0, 1)  # sign of the new ±1
        for b in pending:
            bw.write_code(b, 1)
        pending = []
        run = 0
    if run or pending:
        bw.write_code(*act[0x00])  # EOB0
        for b in pending:
            bw.write_code(b, 1)


def encode_jpeg_gray_progressive(arr: np.ndarray) -> bytes:
    """Grayscale PROGRESSIVE JPEG (SOF2) with the 4-scan script above.
    Carries exactly the baseline encoder's quantized coefficients, so
    ``decode_jpeg`` must reproduce ``jpeg_reconstruct_gray``."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3:
        if a.shape[2] != 1:
            raise ValueError("encode_jpeg_gray_progressive takes grayscale")
        a = a[:, :, 0]
    h, w = a.shape
    _, blocks = _quantized_blocks(a)
    dct_t = _huff_encode_table(DC_BITS, DC_VALS)
    act_t = _huff_encode_table(AC_BITS, AC_VALS)

    # scan 1: DC first, Al=1
    bw1, prev = _BitWriter(), 0
    for zz in blocks:
        v = int(zz[0]) >> 1
        diff = v - prev
        prev = v
        s = abs(diff).bit_length()
        bw1.write_code(*dct_t[s])
        if s:
            bw1.write_value(diff, s)
    # scan 2: DC refinement, one raw bit per block
    bw2 = _BitWriter()
    for zz in blocks:
        bw2.write_code(int(zz[0]) & 1, 1)
    # scan 3: AC first, Al=1
    bw3 = _BitWriter()
    for zz in blocks:
        _write_ac_first(bw3, [_ac_shift(int(v), 1) for v in zz[1:]], act_t)
    # scan 4: AC refinement, Al 1 → 0
    bw4 = _BitWriter()
    for zz in blocks:
        _write_ac_refine(bw4, [int(v) for v in zz[1:]], act_t, 0)

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return _seg(0xFFDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    out = b"\xff\xd8"
    out += _seg(0xFFDB, _dqt_body(0, QTAB))
    out += _seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += sos(0, 0, 0, 1) + bw1.stuffed_bytes()
    out += sos(0, 0, 1, 0) + bw2.stuffed_bytes()
    out += sos(1, 63, 0, 1) + bw3.stuffed_bytes()
    out += sos(1, 63, 1, 0) + bw4.stuffed_bytes()
    return out + b"\xff\xd9"


def encode_jpeg_color_progressive(arr: np.ndarray) -> bytes:
    """(h, w, 3) RGB → PROGRESSIVE 4:2:0 YCbCr JPEG (SOF2), 8-scan
    script: interleaved DC first + DC refine (MCU order, per-component
    predictors), then per-component AC first + AC refine in
    non-interleaved order (T.81 G.1.1: multi-component scans are DC
    only). Carries exactly ``encode_jpeg_color``'s quantized
    coefficients → ``decode_jpeg`` must equal ``jpeg_reconstruct_color``
    on the visible crop."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_jpeg_color_progressive takes (h, w, 3) RGB")
    h, w = a.shape[:2]
    (Hy, Wy), yb, (Hc, Wc), cbb, crb = _color_planes(a)
    planes = [yb, cbb, crb]
    dct = [_huff_encode_table(DC_BITS, DC_VALS),
           _huff_encode_table(DC_BITS_C, DC_VALS_C)]
    act = [_huff_encode_table(AC_BITS, AC_VALS),
           _huff_encode_table(AC_BITS_C, AC_VALS_C)]
    tcls = [0, 1, 1]  # table class per component (luma, chroma, chroma)
    mcu_seq = _color_mcu_seq(Hy, Wy)

    # scan 1: interleaved DC first, Al=1
    bw1, preds = _BitWriter(), [0, 0, 0]
    for ci, bi in mcu_seq:
        v = int(planes[ci][bi][0]) >> 1
        diff = v - preds[ci]
        preds[ci] = v
        s = abs(diff).bit_length()
        bw1.write_code(*dct[tcls[ci]][s])
        if s:
            bw1.write_value(diff, s)
    # scan 2: interleaved DC refinement (raw bits, MCU order)
    bw2 = _BitWriter()
    for ci, bi in mcu_seq:
        bw2.write_code(int(planes[ci][bi][0]) & 1, 1)
    # per-component AC scans in non-interleaved order
    ch_h, ch_w = -(-h // 2), -(-w // 2)
    orders = [
        _ni_order(h, w, Wy // 8),
        _ni_order(ch_h, ch_w, Wc // 8),
        _ni_order(ch_h, ch_w, Wc // 8),
    ]
    ac_scans = []
    for ci in range(3):
        bwf, bwr = _BitWriter(), _BitWriter()
        for bi in orders[ci]:
            zz = planes[ci][bi]
            _write_ac_first(bwf, [_ac_shift(int(v), 1) for v in zz[1:]], act[tcls[ci]])
            _write_ac_refine(bwr, [int(v) for v in zz[1:]], act[tcls[ci]], 0)
        ac_scans.append((bwf, bwr))

    cids = [1, 2, 3]
    out = b"\xff\xd8"
    out += _seg(0xFFDB, _dqt_body(0, QTAB) + _dqt_body(1, QTAB_C))
    out += _seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01",
    )
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    out += _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    dc_sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11])
    out += _seg(0xFFDA, dc_sos + bytes([0, 0, 0x01])) + bw1.stuffed_bytes()
    out += _seg(0xFFDA, dc_sos + bytes([0, 0, 0x10])) + bw2.stuffed_bytes()
    for ci in range(3):
        tb = tcls[ci]  # ac table id == class id here (0 luma, 1 chroma)
        bwf, bwr = ac_scans[ci]
        out += _seg(0xFFDA, bytes([1, cids[ci], tb, 1, 63, 0x01]))
        out += bwf.stuffed_bytes()
        out += _seg(0xFFDA, bytes([1, cids[ci], tb, 1, 63, 0x10]))
        out += bwr.stuffed_bytes()
    return out + b"\xff\xd9"


def _next_marker(data: bytes, pos: int) -> int:
    """First offset ≥ pos of a real (non-stuffed, non-fill) marker."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise ValueError("unterminated scan")


def _scan_dc(
    coefs: np.ndarray, br: _BitReader, dc_table, ah: int, al: int,
    order: list[int] | None = None,
) -> None:
    seq = order if order is not None else range(len(coefs))
    if ah == 0:  # first DC scan: huffman diffs of dc >> al
        prev = 0
        for i in seq:
            s = _read_symbol(br, dc_table)
            prev += _extend(br.read_bits(s), s) if s else 0
            coefs[i, 0] = prev << al
    else:  # refinement: one raw bit per block
        for i in seq:
            if br.read_bit():
                coefs[i, 0] |= 1 << al


def _scan_dc_interleaved(
    comps: list[dict], mcu_seq: list[tuple[int, int]], br: _BitReader,
    dc_tables: dict[int, dict], ah: int, al: int,
) -> None:
    """Interleaved (ns=ncomp) DC scan in MCU order, per-component
    predictors (T.81 G.2 with the baseline MCU walk)."""
    if ah == 0:
        preds = [0] * len(comps)
        for ci, bi in mcu_seq:
            s = _read_symbol(br, dc_tables[ci])
            preds[ci] += _extend(br.read_bits(s), s) if s else 0
            comps[ci]["coefs"][bi, 0] = preds[ci] << al
    else:
        for ci, bi in mcu_seq:
            if br.read_bit():
                comps[ci]["coefs"][bi, 0] |= 1 << al


def _scan_ac_first(
    coefs: np.ndarray, br: _BitReader, ac_table, ss: int, se: int, al: int,
    order: list[int] | None = None,
) -> None:
    """AC first scan (T.81 G.2): RLE symbols + EOBn block-run lengths.
    ``order`` gives the block indices the scan covers (non-interleaved
    component order for color; default = every block)."""
    eobrun = 0
    for bi in order if order is not None else range(len(coefs)):
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            rs = _read_symbol(br, ac_table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: run of 2^r + extra-bits blocks
                    eobrun = (1 << r) - 1 + (br.read_bits(r) if r else 0)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            coefs[bi, k] = _extend(br.read_bits(s), s) << al
            k += 1


def _scan_ac_refine(
    coefs: np.ndarray, br: _BitReader, ac_table, ss: int, se: int, al: int,
    order: list[int] | None = None,
) -> None:
    """AC refinement scan (T.81 G.2 / Annex G decode flowcharts):
    (run,1) symbols introduce new ±1·2^al coefficients, with one
    correction bit consumed for every already-nonzero coefficient
    passed over (including inside ZRL runs and EOB tails)."""
    eobrun = 0

    def correct(bi: int, k: int) -> None:
        if br.read_bit():
            step = (1 << al) if coefs[bi, k] > 0 else -(1 << al)
            coefs[bi, k] += step

    for bi in order if order is not None else range(len(coefs)):
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _read_symbol(br, ac_table)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) + (br.read_bits(r) if r else 0)
                        break
                    # ZRL: pass 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("refinement magnitude must be 1")
                    newval = (1 << al) if br.read_bit() else -(1 << al)
                # advance past r zero-history coefficients, consuming
                # correction bits for nonzero ones along the way
                while k <= se:
                    if coefs[bi, k] != 0:
                        correct(bi, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    coefs[bi, k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:  # EOB tail: correction bits only
                if coefs[bi, k] != 0:
                    correct(bi, k)
                k += 1
            eobrun -= 1


def _color_mcu_seq(Hy: int, Wy: int) -> list[tuple[int, int]]:
    """(comp index, block index) pairs in 4:2:0 MCU order (4 Y, Cb, Cr)
    over the 16-padded luma grid."""
    nbx, ncx = Wy // 8, Wy // 16
    seq: list[tuple[int, int]] = []
    for my in range(Hy // 16):
        for mx in range(Wy // 16):
            for oy, ox in ((0, 0), (0, 1), (1, 0), (1, 1)):
                seq.append((0, (2 * my + oy) * nbx + 2 * mx + ox))
            seq.append((1, my * ncx + mx))
            seq.append((2, my * ncx + mx))
    return seq


def _ni_order(comp_h: int, comp_w: int, nbx: int) -> list[int]:
    """NON-interleaved scan block order for a component: raster over its
    own ceil-to-8 grid, indices into the (possibly MCU-padded) block
    array with ``nbx`` columns. MCU-padding blocks outside this grid are
    never coded in AC scans (their coefficients stay zero — they lie
    entirely outside the visible crop)."""
    return [
        r * nbx + c
        for r in range(-(-comp_h // 8))
        for c in range(-(-comp_w // 8))
    ]


def _decode_progressive(data: bytes) -> np.ndarray:
    """SOF2 decoder (grayscale or 4:2:0 color): accumulate coefficients
    across all scans (interleaved DC + non-interleaved AC), then
    dequantize + IDCT once."""
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[dict] = []  # {cid, qid, coefs, nbx, order}
    by_cid: dict[int, int] = {}
    mcu_seq: list[tuple[int, int]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        length = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + length]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                if body[off] & 0xF0:
                    raise ValueError("16-bit quant tables unsupported")
                flat = np.zeros(64, dtype=np.float64)
                flat[ZIG] = np.frombuffer(body[off + 1:off + 65], dtype=np.uint8)
                qtabs[body[off] & 0x0F] = flat.reshape(8, 8)
                off += 65
        elif marker == 0xC2:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError("progressive: 8-bit, 1 or 3 components only")
            raw = [
                (body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i])
                for i in range(ncomp)
            ]
            if ncomp == 1:
                if raw[0][1] != 0x11:
                    raise ValueError("subsampled grayscale unsupported")
                Hp, Wp = -(-h // 8) * 8, -(-w // 8) * 8
                dims = [(Hp, Wp, h, w)]
            else:
                if [r[1] for r in raw] != [0x22, 0x11, 0x11]:
                    raise ValueError("only 4:2:0 color sampling supported")
                Hy, Wy = -(-h // 16) * 16, -(-w // 16) * 16
                ch_h, ch_w = -(-h // 2), -(-w // 2)
                dims = [
                    (Hy, Wy, h, w),
                    (Hy // 2, Wy // 2, ch_h, ch_w),
                    (Hy // 2, Wy // 2, ch_h, ch_w),
                ]
                mcu_seq = _color_mcu_seq(Hy, Wy)
            for i, ((cid, _s, qid), (Hp, Wp, ch2, cw2)) in enumerate(
                zip(raw, dims)
            ):
                nbx = Wp // 8
                comps.append(
                    {
                        "cid": cid, "qid": qid, "nbx": nbx,
                        "Hp": Hp, "Wp": Wp,
                        "coefs": np.zeros(((Hp // 8) * nbx, 64), dtype=np.int64),
                        "order": _ni_order(ch2, cw2, nbx),
                    }
                )
                by_cid[cid] = i
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1:off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17:off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _huff_decode_table(bits, vals)
                off += 17 + nvals
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            specs = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            br = _BitReader(data, pos + 2 + length)
            if ns > 1:  # interleaved: DC only (T.81 G.1.1)
                if ss != 0 or se != 0 or ns != len(comps):
                    raise ValueError("interleaved progressive scan must be DC")
                dc_tables = {
                    by_cid[cid]: huff[(0, tbl >> 4)] for cid, tbl in specs
                } if ah == 0 else {}
                _scan_dc_interleaved(comps, mcu_seq, br, dc_tables, ah, al)
            else:
                cid, tbl = specs[0]
                c = comps[by_cid[cid]]
                if ss == 0:
                    if se != 0:
                        raise ValueError("DC scan must have Se=0")
                    _scan_dc(
                        c["coefs"], br,
                        huff.get((0, tbl >> 4)), ah, al, order=c["order"],
                    )
                elif ah == 0:
                    _scan_ac_first(
                        c["coefs"], br, huff[(1, tbl & 0x0F)], ss, se, al,
                        order=c["order"],
                    )
                else:
                    _scan_ac_refine(
                        c["coefs"], br, huff[(1, tbl & 0x0F)], ss, se, al,
                        order=c["order"],
                    )
            pos = _next_marker(data, br.pos)
            continue
        pos += 2 + length
    if not comps or not qtabs:
        raise ValueError("missing JPEG segments")
    # coefficients are stored in NATURAL order during scans (the scan
    # index IS the zigzag index) — _reconstruct expects zigzag vectors,
    # which is exactly this layout
    planes = []
    for c in comps:
        if c["qid"] not in qtabs:
            raise ValueError("missing quant table")
        blocks = [c["coefs"][i] for i in range(len(c["coefs"]))]
        planes.append(
            _reconstruct(c["Hp"], c["Wp"], blocks, qtab=qtabs[c["qid"]])
        )
    if len(planes) == 1:
        return planes[0][:h, :w, None]
    yr = planes[0][:h, :w]
    return _ycbcr_to_rgb(
        yr, _upsample2(planes[1], h, w), _upsample2(planes[2], h, w)
    )


# back-compat alias (grayscale was the first progressive scope)
_decode_progressive_gray = _decode_progressive

