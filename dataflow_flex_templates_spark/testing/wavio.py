"""RIFF/WAVE container writer + parser (public Microsoft/IBM 1991
spec: RIFF chunks are fourcc + u32le size + payload + pad byte when
the size is odd; WAVE needs an `fmt ` chunk before `data`).

From-scratch like the PPM/BMP/Avro writers — no external libs. The
writer exists so tests and the oracle generator can synthesize byte-
identical fixture files without Spark; the parser is the single
implementation used BOTH by the Spark ingest source (sources/wav.py,
parsing in-memory bytes from binaryFile rows) and by the pure-Python
oracle twin, so the two sides cannot drift.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FMT_PCM = 1


def write_wav_bytes(pcm16: np.ndarray, sr_hz: int,
                    n_channels: int = 1,
                    extra_chunks: list[tuple[bytes, bytes]] | None = None,
                    ) -> bytes:
    """int16 samples (interleaved if stereo) -> RIFF/WAVE PCM bytes.

    extra_chunks are inserted between `fmt ` and `data` (e.g. a LIST
    INFO chunk) to exercise chunk-walking; odd-sized payloads get the
    spec's pad byte."""
    pcm16 = np.asarray(pcm16, dtype="<i2")
    data = pcm16.tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack("<HHIIHH", _FMT_PCM, n_channels, sr_hz,
                      sr_hz * block_align, block_align, 16)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    body = chunk(b"fmt ", fmt)
    for cc, payload in (extra_chunks or []):
        body += chunk(cc, payload)
    body += chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def parse_wav_bytes(buf: bytes) -> dict:
    """Chunk-walk a RIFF/WAVE byte string.

    Returns {sr_hz, n_channels, bits, n_frames, pcm: np.int16 mono}
    (stereo is downmixed by the exact integer mean (l+r)>>1 so the
    result is deterministic). Raises ValueError on malformed input —
    callers in the Spark path null the row (poison convention)."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload_end = pos + 8 + size
        if payload_end > len(buf):
            raise ValueError(f"truncated chunk {fourcc!r}")
        if fourcc == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", buf, pos + 8)
        elif fourcc == b"data":
            data = buf[pos + 8:payload_end]
        pos = payload_end + (size % 2)  # spec pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sr_hz, _rate, _align, bits = fmt
    if audio_format != _FMT_PCM or bits != 16:
        raise ValueError(f"unsupported format {audio_format}/{bits}")
    if n_channels not in (1, 2):
        raise ValueError(f"unsupported channel count {n_channels}")
    samples = np.frombuffer(
        data[:len(data) - (len(data) % (2 * n_channels))], dtype="<i2")
    if n_channels == 2:
        s32 = samples.astype(np.int32)
        pcm = ((s32[0::2] + s32[1::2]) >> 1).astype(np.int16)
    else:
        pcm = samples
    return {"sr_hz": int(sr_hz), "n_channels": int(n_channels),
            "bits": int(bits), "n_frames": int(len(pcm)), "pcm": pcm}


# ---------------------------------------------------------------- fixture

WAV_SRS = (8000, 16000, 22050, 44100)


def _wav_seed(i: int) -> int:
    return int.from_bytes(
        hashlib.sha256(f"wav_{i:06d}".encode()).digest()[:8], "big")


def make_wav_fixture(i: int) -> tuple[str, bytes, dict]:
    """Deterministic WAV file #i: (filename, bytes, expected facts).

    Every 7th file is stereo (downmix path), every 5th carries a LIST
    INFO chunk with an odd payload (pad-byte path), and i == 13 is a
    truncated poison file (data chunk shorter than its declared size).
    """
    rng = np.random.default_rng(_wav_seed(i))
    sr = WAV_SRS[i % len(WAV_SRS)]
    n = int(rng.integers(sr // 10, sr // 2))  # 100–500 ms
    t = np.arange(n, dtype=np.float64) / sr
    f0 = 80.0 + float(rng.uniform(0.0, 360.0))
    w = 0.8 * np.sin(2 * np.pi * f0 * t) \
        + 0.1 * np.sin(2 * np.pi * 3 * f0 * t)
    pcm = np.clip((w * 32767.0).round(), -32768, 32767).astype(np.int16)
    n_channels = 2 if i % 7 == 0 else 1
    if n_channels == 2:
        right = np.roll(pcm, 1)
        inter = np.empty(2 * n, dtype=np.int16)
        inter[0::2] = pcm
        inter[1::2] = right
        buf_pcm = inter
    else:
        buf_pcm = pcm
    extra = ([(b"LIST", b"INFOICMT" + f"fixture {i}".encode())]
             if i % 5 == 0 else None)  # odd-length payload when i<10
    buf = write_wav_bytes(buf_pcm, sr, n_channels, extra)
    if i == 13:
        buf = buf[:len(buf) - 7]  # truncate inside the data chunk
        return (f"wav_{i:06d}.wav", buf,
                {"name": f"wav_{i:06d}", "ok": False})
    parsed = parse_wav_bytes(buf)
    mono = parsed["pcm"].astype(np.int64)
    facts = {
        "name": f"wav_{i:06d}", "ok": True, "sr_hz": sr,
        "n_channels": n_channels, "n_frames": int(parsed["n_frames"]),
        "dur_ms": int(round(parsed["n_frames"] * 1000.0 / sr)),
        "sum_abs": int(np.abs(mono).sum()),
    }
    return f"wav_{i:06d}.wav", buf, facts


def write_wav_fixture_dir(path: str, n_files: int = 40) -> list[dict]:
    """Materialize the fixture set under `path`; returns the facts."""
    import os

    os.makedirs(path, exist_ok=True)
    out = []
    for i in range(n_files):
        fname, buf, facts = make_wav_fixture(i)
        with open(os.path.join(path, fname), "wb") as f:
            f.write(buf)
        out.append(facts)
    return out
