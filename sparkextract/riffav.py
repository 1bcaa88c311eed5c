"""REAL pure-stdlib RIFF codecs: WAV (16-bit PCM) and AVI (MJPEG).

Closes the audio/video half of the multimodal decode gap (reference
analog: PDF-Extract-Kit feeds cv2/ffmpeg for media decode, e.g.
pdf_extract_kit/utils/ocr/paddle_ocr.py:17-55 ``img_decode`` — this
environment has no native codec libs, so the containers are parsed
directly). Both formats are RIFF chunk trees (Microsoft multimedia
container spec, public): ``RIFF <size> WAVE|AVI `` followed by tagged
chunks. The decoders walk chunks defensively and normalize every parse
failure to ``ValueError`` so the Spark-side callers (multimodal.py) can
distinguish "malformed payload" from "format not supported".

Scope is honest: WAV covers 16-bit PCM (format 1, any channel count),
IEEE float32 (format 3, scaled to int16 on decode) AND mono IMA ADPCM
(format 0x11, the classic 4-bit compressed WAV — full encoder +
decoder below); AVI covers MJPEG ('00dc' frame chunks, decoded by
sparkextract.jpeg). Other WAV formats (MP3/ALAW/...) and non-MJPEG
video raise NotImplementedError — there is no stdlib path for those.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- WAV


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) → canonical RIFF/WAVE
    with one 'fmt ' and one 'data' chunk."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (n,) or (n, ch)")
    n, ch = s.shape
    data = s.tobytes()  # interleaved row-major == interleaved channels
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_riff(data: bytes, form: bytes):
    """Yield (tag, payload) for each top-level chunk of a RIFF form."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != form:
        raise ValueError(f"not a RIFF {form.decode(errors='replace')} stream")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError("truncated RIFF chunk")
        yield tag, payload
        pos += 8 + size + (size % 2)  # skip alignment pad


def encode_wav_float32(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, ch) → IEEE-float WAV
    (format 3, 32-bit)."""
    s = np.asarray(samples, dtype="<f4")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (n,) or (n, ch)")
    n, ch = s.shape
    data = s.tobytes()
    block_align = ch * 4
    fmt = struct.pack(
        "<HHIIHH", 3, ch, sample_rate, sample_rate * block_align, block_align, 32
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n)
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, samples) with samples int16 (n, ch).
    16-bit PCM (format 1), IEEE float32 (format 3, scaled to int16) and
    mono IMA ADPCM (format 0x11, the classic 4-bit compressed WAV);
    malformed input → ValueError, other formats → NotImplementedError."""
    fmt = pcm = fmt_raw = None
    n_samples = None
    for tag, payload in _walk_riff(bytes(data), b"WAVE"):
        if tag == b"fmt " and fmt is None:
            if len(payload) < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
            fmt_raw = payload
        elif tag == b"fact" and len(payload) >= 4:
            (n_samples,) = struct.unpack("<I", payload[:4])
        elif tag == b"data" and pcm is None:
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _byte_rate, block_align, bits = fmt
    if ch < 1 or sample_rate < 1:
        raise ValueError("bad fmt fields")
    if audio_format == 0x11:
        if bits != 4:
            raise ValueError("IMA ADPCM must be 4 bits/sample")
        if len(fmt_raw) < 20:
            raise ValueError("ADPCM fmt chunk missing samples-per-block")
        (spb,) = struct.unpack("<H", fmt_raw[18:20])
        if spb < 1:
            raise ValueError("bad ADPCM samples-per-block")
        return sample_rate, _decode_adpcm(pcm, ch, block_align, spb, n_samples)
    if audio_format == 3:  # IEEE float: scale [-1, 1] → int16
        if bits != 32:
            raise NotImplementedError(f"{bits}-bit float WAV (only float32)")
        usable = len(pcm) - len(pcm) % (4 * ch)
        f = np.frombuffer(pcm[:usable], dtype="<f4").reshape(-1, ch)
        return sample_rate, np.clip(
            np.rint(f.astype(np.float64) * 32767.0), -32768, 32767
        ).astype(np.int16)
    if audio_format != 1:
        raise NotImplementedError(f"WAV format {audio_format} (unsupported)")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit WAV (only 16-bit PCM)")
    usable = len(pcm) - len(pcm) % (2 * ch)
    samples = np.frombuffer(pcm[:usable], dtype="<i2").reshape(-1, ch)
    return sample_rate, samples


def wav_features(data: bytes) -> dict:
    """Deterministic audio features from a real decode: duration, RMS,
    peak, zero-crossing count. Integer/exact math, one final sqrt."""
    sample_rate, s = decode_wav(data)
    mono = s.astype(np.int64).sum(axis=1) // s.shape[1]  # channel mean
    n = len(mono)
    sq = int((mono * mono).sum())
    signs = mono[:-1] * mono[1:] if n > 1 else np.array([], dtype=np.int64)
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(s.shape[1]),
        "n_samples": n,
        "duration_ms": round(1000.0 * n / sample_rate, 3),
        "rms": round(float(np.sqrt(sq / n)) if n else 0.0, 3),
        "peak": int(np.abs(mono).max(initial=0)),
        "zero_crossings": int((signs < 0).sum()),
    }


# ------------------------------------------------- IMA ADPCM (fmt 0x11)
# The classic 4-bit compressed-audio WAV format (IMA/DVI ADPCM, public
# spec; WAV tag 0x11): per-block header carries (predictor, step index),
# then one nibble per sample. Lossy 4:1 compression — the exactness
# anchor is that ENCODER and DECODER share the reconstruction arithmetic
# (the encoder tracks the decoder's state), so decode(encode(x)) is
# deterministic and its error is bounded by the step table.

_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _ima_reconstruct(pred: int, idx: int, delta: int) -> tuple[int, int]:
    """One IMA step: (predictor, index) + 4-bit code → new state."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if delta & 4:
        diff += step
    if delta & 2:
        diff += step >> 1
    if delta & 1:
        diff += step >> 2
    pred = pred - diff if delta & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[delta & 7]))
    return pred, idx


def _ima_encode_sample(pred: int, idx: int, sample: int) -> tuple[int, int, int]:
    """Quantize one sample against the decoder state → (code, pred, idx)."""
    step = _IMA_STEPS[idx]
    diff = sample - pred
    code = 8 if diff < 0 else 0
    diff = abs(diff)
    for bit in (4, 2, 1):
        if diff >= step:
            code |= bit
            diff -= step
        step >>= 1
    pred, idx = _ima_reconstruct(pred, idx, code)
    return code, pred, idx


ADPCM_SAMPLES_PER_BLOCK = 505  # → block_align 256 (4-byte header + 252)


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Mono int16 samples → IMA-ADPCM WAV (format 0x11, 4 bits/sample)."""
    s = np.asarray(samples, dtype=np.int16).reshape(-1)
    if len(s) == 0:
        raise ValueError("need at least one sample")
    spb = ADPCM_SAMPLES_PER_BLOCK
    block_align = 4 + (spb - 1) // 2
    blocks, pred, idx = [], 0, 0
    vals = s.astype(np.int64).tolist()
    for start in range(0, len(vals), spb):
        chunk = vals[start:start + spb]
        pred = int(chunk[0])
        blk = struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for v in chunk[1:]:
            code, pred, idx = _ima_encode_sample(pred, idx, int(v))
            nibbles.append(code)
        if len(nibbles) % 2:
            nibbles.append(0)
        blk += bytes(
            (nibbles[i] | (nibbles[i + 1] << 4)) for i in range(0, len(nibbles), 2)
        )
        blocks.append(blk.ljust(block_align, b"\x00"))
    data = b"".join(blocks)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(s))
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_adpcm(
    pcm: bytes, ch: int, block_align: int, spb: int, n_samples: int | None
) -> np.ndarray:
    if ch != 1:
        raise NotImplementedError("multi-channel IMA ADPCM not supported")
    if block_align < 5:
        raise ValueError("bad ADPCM block align")
    out: list[int] = []
    for start in range(0, len(pcm) - block_align + 1, block_align):
        blk = pcm[start:start + block_align]
        pred, idx, _r = struct.unpack("<hBB", blk[:4])
        if idx > 88:
            raise ValueError("bad ADPCM step index")
        out.append(pred)
        produced = 1
        for b in blk[4:]:
            for code in (b & 0x0F, b >> 4):
                if produced >= spb:
                    break
                pred, idx = _ima_reconstruct(pred, idx, code)
                out.append(pred)
                produced += 1
    if n_samples is not None:
        out = out[:n_samples]
    return np.asarray(out, dtype=np.int16)[:, None]


# ---------------------------------------------------------------- AVI


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads → minimal valid AVI: LIST hdrl (avih + one
    MJPG video stream) + LIST movi of '00dc' chunks + idx1 index."""
    if not frames:
        raise ValueError("need at least one frame")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * fps, 0, 0x10, len(frames), 0, 1,
        max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
        len(frames), max_bytes, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    idx, off = b"", 4
    for f in frames:
        idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_frames(data: bytes) -> tuple[tuple[int, int], list[bytes]]:
    """AVI bytes → ((width, height), [jpeg frame bytes]) by walking the
    chunk tree: avih carries dimensions, LIST movi carries '00dc'
    frames. Non-MJPEG streams raise NotImplementedError."""
    dims, frames, codec = (0, 0), [], None
    for tag, payload in _walk_riff(bytes(data), b"AVI "):
        if tag != b"LIST" or len(payload) < 4:
            continue
        form, body = payload[:4], payload[4:]
        if form == b"hdrl":
            pos = 0
            while pos + 8 <= len(body):
                t = body[pos : pos + 4]
                (sz,) = struct.unpack("<I", body[pos + 4 : pos + 8])
                p = body[pos + 8 : pos + 8 + sz]
                if t == b"avih" and len(p) >= 40:
                    w, h = struct.unpack("<II", p[32:40])
                    dims = (int(w), int(h))
                elif t == b"LIST" and p[:4] == b"strl":
                    i = p.find(b"strh")
                    if i >= 0 and len(p) >= i + 16:
                        codec = p[i + 12 : i + 16]
                pos += 8 + sz + (sz % 2)
        elif form == b"movi":
            pos = 0
            while pos + 8 <= len(body):
                t = body[pos : pos + 4]
                (sz,) = struct.unpack("<I", body[pos + 4 : pos + 8])
                p = body[pos + 8 : pos + 8 + sz]
                if len(p) < sz:
                    raise ValueError("truncated movi chunk")
                if t.endswith(b"dc") or t.endswith(b"db"):
                    frames.append(bytes(p))
                pos += 8 + sz + (sz % 2)
    if not frames:
        raise ValueError("no video frames in AVI")
    if codec is not None and codec not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI codec {codec!r} (only MJPG has a stdlib decode path)"
        )
    return dims, frames
