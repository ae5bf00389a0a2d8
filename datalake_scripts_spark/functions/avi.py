"""Pure-stdlib MJPEG-AVI video codec — REAL video frame extraction for
the multimodal pipeline, completing the codec family (PNG/JPEG:
:mod:`functions.jpeg`, WAV: :mod:`functions.wav`).

AVI is RIFF (the same chunk walk the WAV codec does) and Motion-JPEG
stores every frame as a plain baseline JPEG — so a container walk plus
:func:`functions.jpeg.decode_jpeg` gives actual per-frame pixel access
with no ffmpeg. The envelope: ``00dc``/``00dj`` video chunks holding
JPEG payloads, one video stream. Other codecs (the fourcc says so) or
malformed containers raise :class:`UnsupportedAvi` / ``ValueError``
and callers fall back to the deterministic stub — the same contract as
every other real codec here, with corrupt payloads covered by the
shared DECODE_ERRORS lane (operators.multimodal).

Scale shape: ``avi_info`` is an O(1) header probe (the 100 TB
metadata pass); ``frame_payload`` seeks the i-th chunk without
decoding earlier frames; full decodes run per-row inside Arrow-batched
``mapInPandas`` stages — bytes stay executor-side, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg, is_jpeg


class UnsupportedAvi(ValueError):
    """Valid RIFF/AVI magic but not single-stream Motion-JPEG."""


def is_avi(data: bytes) -> bool:
    d = bytes(data[:12])
    return len(d) == 12 and d[:4] == b"RIFF" and d[8:12] == b"AVI "


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_offset, body_len) over a RIFF chunk run;
    LIST chunks yield their subtype as fourcc with the inner run as
    body (callers recurse)."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + length > len(data):
            raise ValueError("AVI chunk overruns the buffer")
        yield tag, body, length
        pos = body + length + (length & 1)  # word-aligned


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """List of uint8 (H,W,3)/(H,W) arrays -> minimal MJPEG AVI bytes
    (RIFF: hdrl(avih, strl(strh,strf)) + movi with one ``00dc`` JPEG
    chunk per frame). Every frame must share the first frame's
    dimensions. Round-trips through :func:`decode_frame`."""
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    us_per_frame = max(1, 1_000_000 // max(1, fps))
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * fps, 0, 0x10, len(payloads), 0,
        1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        fps, 0, len(payloads), max_bytes,
                                        0xFFFFFFFF, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)  # BITMAPINFOHEADER, 'MJPG'
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _movi_bounds(data: bytes) -> tuple[int, int]:
    for tag, body, length in _chunks(data, 12, len(data)):
        if tag == b"LIST" and data[body : body + 4] == b"movi":
            return body + 4, body + length
    raise ValueError("AVI missing movi list")


def avi_info(data: bytes) -> tuple[int, int, int, int]:
    """(n_frames, width, height, fps) from the avih header alone —
    O(1) metadata probe, no frame decode. Validates the stream is
    Motion-JPEG (strh fourcc) on the way."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/AVI magic)")
    avih = None
    mjpg = False
    for tag, body, length in _chunks(data, 12, len(data)):
        if tag == b"LIST" and data[body : body + 4] == b"hdrl":
            for t2, b2, l2 in _chunks(data, body + 4, body + length):
                if t2 == b"avih":
                    avih = struct.unpack("<14I", data[b2 : b2 + 56])
                elif t2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    for t3, b3, _l3 in _chunks(data, b2 + 4, b2 + l2):
                        if t3 == b"strh":
                            if data[b3 : b3 + 4] != b"vids":
                                continue
                            mjpg = data[b3 + 4 : b3 + 8] in (b"MJPG", b"mjpg")
            break
    if avih is None:
        raise ValueError("AVI missing avih header")
    if not mjpg:
        raise UnsupportedAvi("not a Motion-JPEG video stream")
    us_per_frame, _, _, _, n_frames, _, streams, _, w, h = avih[:10]
    if streams != 1:
        raise UnsupportedAvi(f"{streams} streams (single-stream only)")
    fps = 1_000_000 // us_per_frame if us_per_frame else 0
    return n_frames, w, h, fps


def frame_payload(data: bytes, idx: int) -> bytes:
    """The idx-th frame's raw JPEG bytes — container seek only, no
    entropy decode of any frame."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/AVI magic)")
    start, end = _movi_bounds(data)
    k = 0
    for tag, body, length in _chunks(data, start, end):
        if tag[2:4] in (b"dc", b"dj"):
            if k == idx:
                payload = data[body : body + length]
                if not is_jpeg(payload):
                    raise ValueError(f"frame {idx} is not a JPEG payload")
                return payload
            k += 1
    raise ValueError(f"AVI has only {k} frames, wanted index {idx}")


def decode_frame(data: bytes, idx: int) -> np.ndarray:
    """uint8 pixel array of the idx-th frame (real JPEG decode)."""
    return decode_jpeg(frame_payload(data, idx))
