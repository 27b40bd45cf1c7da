"""Branding tags and the share-card PNG renderer."""

import numpy as np

from amw_tpu.utils import wav
from amw_tpu.utils.metadata import brand_flac, brand_mp3, brand_wav
from amw_tpu.utils.png import encode_png, draw_text
from amw_tpu.runtime.share_card import render_share_png


def _wav_blob():
    x = (0.4 * np.sin(2 * np.pi * 220 * np.arange(8000) / 8000)).astype(np.float32)
    q = (np.stack([x, x]) * 32767).astype(np.int16)
    return wav.write_wav_int16(q, 8000)


def test_brand_wav_still_readable():
    blob = _wav_blob()
    branded = brand_wav(blob)
    assert b"Magic Master" in branded
    back, sr = wav.read_wav(branded)
    assert sr == 8000 and back.shape[0] == 2


def test_brand_mp3_prepends_id3():
    fake = b"\xff\xfb\x90\x00" + b"\x00" * 100
    branded = brand_mp3(fake)
    assert branded[:3] == b"ID3"
    assert b"MASTERED_BY" in branded
    # existing tag untouched
    tagged = b"ID3\x03\x00\x00\x00\x00\x00\x00" + fake
    assert brand_mp3(tagged) == tagged


def test_brand_flac_inserts_comment():
    # minimal fake FLAC: fLaC + STREAMINFO(34 bytes, last) + audio
    streaminfo = bytes([0x80]) + (34).to_bytes(3, "big") + b"\x00" * 34
    fake = b"fLaC" + streaminfo + b"AUDIO"
    branded = brand_flac(fake)
    assert b"MASTERED_BY" in branded
    assert branded[:4] == b"fLaC"


def test_png_encoder_valid():
    img = np.zeros((20, 30, 3), np.uint8)
    draw_text(img, 1, 1, "OK", np.array([255, 255, 255], np.uint8), 1)
    blob = encode_png(img)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IEND" in blob


def test_share_card_renders():
    job = {"filename": "track_mastered.wav", "style": "edm",
           "before_lufs": -18.3, "after_lufs": -9.0,
           "result_bytes": _wav_blob()}
    png = render_share_png(job)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(png) > 2000
