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

Scope is honest: WAV covers PCM format 1, 16-bit, any channel count;
AVI covers MJPEG ('00dc' frame chunks, decoded by sparkextract.jpeg).
Compressed WAV (ADPCM/float) and non-MJPEG video raise
NotImplementedError — there is no stdlib path for those.
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


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, samples) with samples int16 (n, ch).
    PCM 16-bit only; malformed input → ValueError, compressed WAV →
    NotImplementedError."""
    fmt = pcm = None
    for tag, payload in _walk_riff(bytes(data), b"WAVE"):
        if tag == b"fmt " and fmt is None:
            if len(payload) < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data" and pcm is None:
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"WAV format {audio_format} (non-PCM)")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit WAV (only 16-bit PCM)")
    if ch < 1 or sample_rate < 1:
        raise ValueError("bad fmt fields")
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
