"""Real pure-numpy raster decode (PNM/BMP) + nearest-neighbor resize:
planted fixtures encoded in-test so every byte of the decode → resample
→ re-encode path has a known-pixel oracle (r4 verdict item 6 — the
NotImplementedError stub retires for uncompressed formats; compressed
types keep raising).

Reference parity: the decode/resize surface mirrors the media pipeline
shape a production lakehouse runs (decode → resample → re-encode per
Arrow batch); the reference repo has no media path, so the oracle here
is the synthesizing numpy array itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crypto_near_real_time_data_ingestion_spark.operators import multimodal as mm


def _rng_img(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _encode_ppm(img: np.ndarray, comment: bool = False) -> bytes:
    h, w = img.shape[:2]
    c = b"# planted fixture\n" if comment else b""
    return b"P6\n" + c + f"{w} {h}\n255\n".encode() + img.tobytes()


def _encode_pgm(gray: np.ndarray) -> bytes:
    h, w = gray.shape
    return f"P5\n{w} {h}\n255\n".encode() + gray.tobytes()


def _encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB BMP: bottom-up BGR rows padded to 4 bytes."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    px = rows.tobytes()
    off = 14 + 40

    def u4(v):
        return int(v).to_bytes(4, "little")

    def u2(v):
        return int(v).to_bytes(2, "little")

    header = (
        b"BM" + u4(off + len(px)) + u4(0) + u4(off)
        + u4(40) + u4(w) + u4(h) + u2(1) + u2(24) + u4(0) + u4(len(px))
        + u4(2835) + u4(2835) + u4(0) + u4(0)
    )
    return header + px


def _nn_ref(img: np.ndarray, width: int, height: int) -> np.ndarray:
    h, w = img.shape[:2]
    yi = np.arange(height) * h // height
    xi = np.arange(width) * w // width
    return img[yi[:, None], xi[None, :]]


def test_decoders_roundtrip_known_pixels():
    """Every encoder's pixels come back exactly — including the BMP
    bottom-up flip + BGR swap + row padding (odd width) and the PNM
    comment/whitespace header forms."""
    img = _rng_img(1, 5, 7)  # odd width → BMP rows padded
    assert (mm.decode_media(_encode_ppm(img), "image") == img).all()
    assert (mm.decode_media(_encode_ppm(img, comment=True), "image") == img).all()
    assert (mm.decode_media(_encode_bmp(img), "image") == img).all()
    gray = np.random.default_rng(2).integers(0, 256, (4, 6), dtype=np.uint8)
    got = mm.decode_media(_encode_pgm(gray), "image")
    assert got.shape == (4, 6, 3)
    assert (got == gray[..., None]).all()


def test_compressed_and_nonimage_still_raise():
    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    with pytest.raises(NotImplementedError):
        mm.decode_media(png_magic, "image")
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"RIFF....WAVE", "audio")
    # 16-bit PNM and compressed BMP stay out of scope, loudly
    img = _rng_img(3, 2, 2)
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"P6\n2 2\n65535\n" + img.tobytes(), "image")
    bad_bmp = bytearray(_encode_bmp(img))
    bad_bmp[28] = 8  # bits-per-pixel
    with pytest.raises(NotImplementedError):
        mm.decode_media(bytes(bad_bmp), "image")
    # truncated PNM header fails at the typed boundary, not IndexError
    with pytest.raises(ValueError, match="truncated PNM header"):
        mm.decode_media(b"P6\n3", "image")


def test_resize_decoded_images_byte_oracle(spark):
    """The Spark path end-to-end: planted PPM + BMP payloads of
    different sizes decode, resample (floor-convention nearest
    neighbor), and re-encode to EXACTLY the numpy reference — payload
    bytes, integer checksum, and round-6 luma."""
    imgs = {1: _rng_img(11, 9, 13), 2: _rng_img(12, 16, 8), 3: _rng_img(13, 4, 4)}
    rows = [
        (1, "image", _encode_ppm(imgs[1])),
        (2, "image", _encode_bmp(imgs[2])),
        (3, "image", _encode_ppm(imgs[3], comment=True)),
        (4, "video", b"\x00" * 64),  # filtered out by media_type
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "media_type", "payload"])
    )
    W = H = 6
    got = (
        mm.resize_decoded_images(media, width=W, height=H)
        .orderBy("media_id")
        .toPandas()
    )
    assert list(got.media_id) == [1, 2, 3]
    for _, r in got.iterrows():
        ref = _nn_ref(imgs[r.media_id], W, H)
        assert bytes(r.payload) == ref.tobytes()
        assert (r.src_height, r.src_width) == imgs[r.media_id].shape[:2]
        assert r.pixel_checksum == int(ref.astype(np.int64).sum())
        luma = round(
            float(
                ref.reshape(-1, 3).astype(np.int64).sum(axis=0)
                @ np.array([299, 587, 114])
            )
            / (1000.0 * W * H),
            6,
        )
        assert abs(r.mean_luma - luma) < 1e-9


def test_resize_upscale_and_identity():
    """Floor-convention sampling: identity when dims match; upscale
    repeats source pixels (every source pixel appears)."""
    img = _rng_img(4, 3, 3)
    assert (mm._nn_resize(img, 3, 3) == img).all()
    up = mm._nn_resize(img, 9, 9)
    assert up.shape == (9, 9, 3)
    assert (up[::3, ::3] == img).all()


def test_fixture_survives_spark_binary_roundtrip(spark):
    """Binary payload integrity through Spark: encode → DataFrame →
    collect gives back identical bytes (the contract every decode UDF
    rests on)."""
    img = _rng_img(5, 3, 5)
    payload = _encode_bmp(img)
    df = spark.createDataFrame(
        pd.DataFrame([(1, "image", payload)], columns=["media_id", "media_type", "payload"])
    )
    back = df.select(F.col("payload")).first()[0]
    assert bytes(back) == payload


def test_media_features_empty_text_matches_oracle(spark):
    """An EMPTY (non-NULL) text payload has zero bytes: the Spark op
    emits (checksum 0, entropy 0.0, base fake dims) and the oracle's
    LEFT joins + coalesce now keep the row — the previous inner joins
    dropped it, a latent hash mismatch on any corpus with an empty
    text (r5 review)."""
    import duckdb

    from crypto_near_real_time_data_ingestion_spark.operators import multimodal as mm2

    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["hello world", "", "abc"],
         "source": ["s"] * 3}
    )
    docs = spark.createDataFrame(pdf)
    got = (
        mm2.extract_media_features(mm2.documents_as_media(docs))
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(got) == 3  # the empty-text doc is present
    empty = got[got.media_id == 1].iloc[0]
    assert empty.n_bytes == 0 and empty.checksum32 == 0
    assert empty.byte_entropy == 0.0 and empty.fake_width == 320

    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(mm2.MEDIA_FEATURES_ORACLE_SQL)
        .df()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    got_c = got[sorted(got.columns)].astype(str)
    want_c = want[sorted(want.columns)].astype(str)
    pd.testing.assert_frame_equal(got_c, want_c)
