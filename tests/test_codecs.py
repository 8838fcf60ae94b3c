"""Pure-kernel tests for the stdlib media codecs (no Ray needed).

The PNG decoder must reproduce EXACT pixels through every scanline
filter type — a forward-filtering reference implementation here builds
streams with chosen filters and the decoder has to invert them."""

import struct
import zlib

import numpy as np
import pytest

from gencore_ray.functions.codecs import (
    AudioMeta,
    ImageMeta,
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_png,
    encode_wav,
    sniff_media,
    PNG_MAGIC,
)


def _png_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Forward-filter each scanline with the given type (spec §9) and
    wrap in a valid PNG container — the decoder must invert exactly."""
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    out = bytearray()
    prior = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        row = px[y].astype(np.int32)
        if ft == 0:
            enc = row
        elif ft == 1:    # Sub
            left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
            enc = (row - left) % 256
        elif ft == 2:    # Up
            enc = (row - prior) % 256
        elif ft == 3:    # Average
            left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
            enc = (row - ((left + prior) >> 1)) % 256
        elif ft == 4:    # Paeth
            left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
            ul = np.vstack([np.zeros((1, ch), np.int32), prior[:-1]])
            p = left + prior - ul
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, prior, ul))
            enc = (row - pred) % 256
        out.append(ft)
        out.extend(enc.astype(np.uint8).tobytes())
        prior = row

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_roundtrip_all_filters(channels, ftypes):
    rng = np.random.RandomState(channels * 10 + ftypes[0])
    px = rng.randint(0, 256, size=(11, 7, channels), dtype=np.uint8)
    data = _png_with_filters(px, ftypes)
    m = decode_png(data)
    assert (m.width, m.height, m.channels, m.bit_depth) == (7, 11, channels, 8)
    np.testing.assert_array_equal(m.pixels, px)


def test_png_encoder_decoder_roundtrip():
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    m = decode_png(encode_png(px))
    np.testing.assert_array_equal(m.pixels, px)
    assert sniff_media(encode_png(px)) == "png"


def test_png_header_only_and_rejects():
    px = np.zeros((3, 3, 3), dtype=np.uint8)
    m = decode_png(encode_png(px), header_only=True)
    assert (m.width, m.height) == (3, 3) and m.pixels is None
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def _bmp24(px: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB writer."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y][:, [2, 1, 0]].astype(np.uint8).tobytes()  # RGB->BGR
        body.extend(row + b"\x00" * (stride - len(row)))
    off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0))
    return hdr + bytes(body)


def test_bmp_roundtrip():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    data = _bmp24(px)
    assert sniff_media(data) == "bmp"
    m = decode_bmp(data)
    assert (m.width, m.height, m.channels) == (5, 6, 3)
    np.testing.assert_array_equal(m.pixels, px)


def test_ppm_roundtrip():
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, size=(4, 8, 3), dtype=np.uint8)
    data = b"P6\n# comment\n8 4\n255\n" + px.tobytes()
    assert sniff_media(data) == "ppm"
    m = decode_ppm(data)
    np.testing.assert_array_equal(m.pixels, px)
    gray = px[:, :, 0].copy()
    mg = decode_ppm(b"P5 8 4 255\n" + gray.tobytes())
    np.testing.assert_array_equal(mg.pixels[:, :, 0], gray)


def test_wav_roundtrip():
    sr = 8000
    t = np.arange(2 * sr) / sr
    sig = 0.25 * np.sin(2 * np.pi * 220 * t)
    data = encode_wav(np.stack([sig, -sig], axis=1), sample_rate=sr)
    assert sniff_media(data) == "wav"
    a = decode_wav(data)
    assert (a.n_channels, a.sample_rate, a.n_frames) == (2, sr, 2 * sr)
    assert abs(np.sqrt((a.samples ** 2).mean()) - 0.25 / np.sqrt(2)) < 1e-3
    # encode scales by 32767, decode by 1/32768 -> ~1/16k quantization
    np.testing.assert_allclose(a.samples[:, 0], sig, atol=1 / 16000)
