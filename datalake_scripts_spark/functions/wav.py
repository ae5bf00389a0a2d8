"""Pure-stdlib WAV (RIFF/PCM16) codec — the real audio decode behind
the multimodal pipeline, sibling of :mod:`functions.png`.

No soundfile/librosa in this container, but canonical WAV needs
neither: RIFF chunk walk + fixed-point PCM samples. Decode supports
16-bit PCM (format 1), mono or multi-channel; anything else raises
``UnsupportedWav`` and callers fall back to the deterministic stub
(keeping DuckDB oracle twins exact for non-WAV payloads). Used inside
Arrow-batched ``mapInPandas`` stages — bytes stay executor-side.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedWav(ValueError):
    """Valid RIFF/WAVE magic but an encoding this codec doesn't
    implement (float PCM, ADPCM, 8/24/32-bit)."""


def is_wav(data: bytes) -> bool:
    d = bytes(data[:12])
    return len(d) == 12 and d[:4] == b"RIFF" and d[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 array (n,) or (n, channels) -> WAV bytes (PCM16).
    Round-trips exactly through :func:`decode_wav`."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    byte_rate = sample_rate * ch * 2
    data = a.tobytes()  # interleaved little-endian int16
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 array (n, channels), sample_rate)."""
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE magic)")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise UnsupportedWav(f"format={audio_format} bits={bits}")
    if ch == 0 or sample_rate == 0:
        raise ValueError(f"corrupt WAV fmt: channels={ch} rate={sample_rate}")
    n = len(pcm) // (2 * ch)
    arr = np.frombuffer(pcm, dtype="<i2", count=n * ch).reshape(n, ch)
    return arr, sample_rate


def wav_info(data: bytes) -> tuple[int, int, int]:
    """(n_samples, sample_rate, channels) from the headers alone —
    O(1) metadata probe, no sample materialization."""
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", data[pos + 8 : pos + 24])
        elif tag == b"data":
            data_len = length
        pos += 8 + length + (length & 1)
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise UnsupportedWav(f"format={audio_format} bits={bits}")
    if ch == 0 or sample_rate == 0:
        raise ValueError(f"corrupt WAV fmt: channels={ch} rate={sample_rate}")
    return data_len // (2 * ch), sample_rate, ch


def rms_int16(samples: np.ndarray) -> float:
    """Root-mean-square of int16 samples, computed in int64 (exact sum
    of squares — deterministic across platforms, no float accumulation
    order dependence)."""
    a = np.asarray(samples, dtype=np.int64).reshape(-1)
    if a.size == 0:
        return 0.0
    return float(np.sqrt(np.sum(a * a) / a.size))
