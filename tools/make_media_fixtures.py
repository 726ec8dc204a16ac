"""Generate the committed REAL media fixtures (stdlib only, deterministic):

* tests/fixtures/tiny_13x7.png  — a valid 13×7 RGB PNG (signature, IHDR,
  zlib IDAT, IEND, correct CRCs; opens in any viewer)
* tests/fixtures/tone_8k.wav    — a valid 16-bit mono 8 kHz WAV, 200 frames

Re-run only if the fixtures need to change; tests read the committed bytes.
"""

from __future__ import annotations

import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")


def make_png(width: int = 13, height: int = 7) -> bytes:
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + bytes((x * 17) % 256 for x in range(width * 3)) for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(n_frames: int = 200, rate: int = 8000) -> bytes:
    samples = b"".join(struct.pack("<h", (i * 257) % 32768 - 16384) for i in range(n_frames))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)  # PCM mono 16-bit
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(samples)) + samples
    return b"RIFF" + struct.pack("<I", len(body)) + body


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    for name, data in (("tiny_13x7.png", make_png()), ("tone_8k.wav", make_wav())):
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")
