"""Pure-stdlib audio codec: a REAL RIFF/WAVE (PCM16 mono) encoder +
decoder, so the multimodal audio path runs an actual decode kernel
(bytes -> samples) with no third-party audio library — the same
discipline as the PNG kernel in imagecodec.py.

Scope (deliberate): 16-bit little-endian PCM, mono, arbitrary sample
rate — the canonical uncompressed interchange WAV. The decoder walks
RIFF chunks properly (validates RIFF/WAVE magic, parses `fmt `,
skips unknown chunks, reads exactly the `data` payload) — the full
pipeline a soundfile-backed kernel would run minus compressed
codecs, which a 100 TB media pipeline hands to native libraries.

Serialization discipline: every public function is a CLOSURE produced
by ``_make_codec()`` (qualname ``_make_codec.<locals>.*``) so
cloudpickle ships it to Python workers BY VALUE — a module-level
function would pickle by reference and crash workers whose sys.path
lacks the repo root (see imagecodec.py / operators/multimodal.py).
"""

from __future__ import annotations


def _make_codec():
    import struct

    def encode_wav_pcm16(sample_rate: int, samples) -> bytes:
        """Samples: iterable of ints in [-32768, 32767] → RIFF/WAVE
        bytes (PCM16 mono little-endian)."""
        pcm = b"".join(struct.pack("<h", int(s)) for s in samples)
        byte_rate = sample_rate * 2
        fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
        chunks = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    def decode_wav(data: bytes):
        """RIFF/WAVE bytes → (sample_rate, [int samples]). Validates
        magic, walks chunks (skipping unknown ones), checks the fmt
        chunk declares PCM16 mono. Raises on malformed input — corrupt
        media must fail loudly, not emit plausible rows."""
        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE stream")
        (riff_len,) = struct.unpack("<I", data[4:8])
        if riff_len != len(data) - 8:
            raise ValueError("RIFF length mismatch")
        pos = 12
        sample_rate = None
        pcm = None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + clen]
            if len(body) != clen:
                raise ValueError(f"truncated chunk {cid!r}")
            if cid == b"fmt ":
                audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if (audio_fmt, n_ch, bits) != (1, 1, 16):
                    raise ValueError(
                        f"unsupported WAV: fmt={audio_fmt} ch={n_ch} bits={bits}"
                    )
                sample_rate = rate
            elif cid == b"data":
                pcm = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if sample_rate is None or pcm is None:
            raise ValueError("missing fmt or data chunk")
        if len(pcm) % 2:
            raise ValueError("odd PCM byte length for 16-bit samples")
        samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
        return sample_rate, samples

    return encode_wav_pcm16, decode_wav


encode_wav_pcm16, decode_wav = _make_codec()
