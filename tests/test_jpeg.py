"""Pure-numpy baseline JPEG codec (operators/jpeg.py) — the round-7
closure of the largest documented media-codec seam.

Evidence layers:
1. spec unit vectors: zigzag walk, canonical Huffman assignment, EXTEND;
2. encode→decode round-trips with quant=1 (near-lossless: only DCT
   rounding) bounded to ≤2 gray levels per pixel, across odd sizes,
   grayscale / 4:4:4 / 4:2:0;
3. the Spark perceptual-hash path runs END-TO-END on codec='jpeg'
   payloads and reproduces the raw-pixel hashes (pHash is invariant to
   the ≤2-level codec noise by design);
4. corrupt/unsupported streams (truncation, progressive marker,
   restart intervals, 16-bit quant) refuse with None — never garbage.
"""

from __future__ import annotations

import numpy as np
import pytest

from c_tran_data_pipeline_spark.operators.jpeg import (
    _AC_LUMA,
    _DC_LUMA,
    _ZIGZAG,
    _extend,
    canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _planted(h, w, seed=0, color=False):
    rng = np.random.RandomState(seed)
    if color:
        return rng.randint(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
    return rng.randint(0, 256, (h, w), dtype=np.int64).astype(np.uint8)


def test_zigzag_is_the_spec_walk():
    # T.81 §A.3.6: first and last entries of the canonical sequence.
    assert _ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0),
    ]
    assert _ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert sorted(_ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]


def test_canonical_huffman_matches_spec_assignment():
    """§C.2 on the Annex K.3 luma DC table: 12 symbols, code lengths
    follow BITS, codes are consecutive within a length and double-shift
    across lengths — symbol 0 gets the 2-bit code 00, symbol 1 gets
    010, symbol 11 the all-ones 9-bit code."""
    codes = canonical_codes(*_DC_LUMA)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[2] == (0b011, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)
    # AC luma: EOB (0x00) is 4-bit 1010, ZRL (0xF0) is 11-bit per K.3
    ac = canonical_codes(*_AC_LUMA)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0xF0][1] == 11
    # prefix-free: no code is a prefix of a longer one
    entries = sorted(ac.values(), key=lambda t: t[1])
    for i, (c1, l1) in enumerate(entries):
        for c2, l2 in entries[i + 1 :]:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1


def test_extend_sign_procedure():
    # §F.2.2.1 table: s-bit fields with a 0 MSB are negative.
    assert _extend(0, 0) == 0
    assert _extend(1, 1) == 1
    assert _extend(0, 1) == -1
    assert _extend(0b11, 2) == 3
    assert _extend(0b00, 2) == -3
    assert _extend(0b01, 2) == -2
    assert _extend(0b10, 2) == 2


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (17, 19), (33, 31)])
def test_gray_roundtrip_near_lossless(h, w):
    px = _planted(h, w, seed=h * 100 + w)
    dec = decode_jpeg(encode_jpeg(px, quality_quant=1))
    assert dec is not None
    dw, dh, ch, raw = dec
    assert (dw, dh, ch) == (w, h, 1)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(np.int64)
    err = np.abs(got - px.astype(np.int64))
    assert err.max() <= 2, err.max()  # FDCT round + IDCT round only


def test_color_444_roundtrip_bounded():
    px = _planted(24, 16, seed=7, color=True)
    dec = decode_jpeg(encode_jpeg(px, quality_quant=1, subsampling="444"))
    dw, dh, ch, raw = dec
    assert (dw, dh, ch) == (16, 24, 3)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(24, 16, 3).astype(np.int64)
    # color-space forward+inverse rounding adds a little over the DCT error
    assert np.abs(got - px.astype(np.int64)).max() <= 4


def test_color_420_roundtrip_smooth_image():
    """4:2:0 halves chroma resolution, so pin it on a chroma-smooth
    gradient (the content it's FOR) instead of noise: luma error stays
    codec-grade and chroma error is bounded by the 2×2 averaging."""
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // (w - 1)).astype(np.uint8)
    g = (yy * 255 // (h - 1)).astype(np.uint8)
    b = ((xx + yy) * 255 // (w + h - 2)).astype(np.uint8)
    px = np.stack([r, g, b], axis=-1)
    dec = decode_jpeg(encode_jpeg(px, quality_quant=1, subsampling="420"))
    dw, dh, ch, raw = dec
    assert (dw, dh, ch) == (w, h, 3)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
    assert np.abs(got - px.astype(np.int64)).max() <= 12  # 2x2 chroma pooling
    # luma must be near-lossless regardless of subsampling
    wy = np.array([0.299, 0.587, 0.114])
    assert np.abs((got @ wy) - (px.astype(np.int64) @ wy)).max() <= 3


def test_quantization_actually_compresses():
    px = _planted(32, 32, seed=3)
    fine = encode_jpeg(px, quality_quant=1)
    coarse = encode_jpeg(px, quality_quant=16)
    assert len(coarse) < len(fine)
    dec = decode_jpeg(coarse)
    got = np.frombuffer(dec[3], dtype=np.uint8).reshape(32, 32).astype(np.int64)
    # coarse quant loses detail but stays in the right neighborhood
    assert np.abs(got - px.astype(np.int64)).mean() < 24


def test_refusals_return_none_not_garbage():
    px = _planted(16, 16, seed=1)
    good = encode_jpeg(px)
    assert decode_jpeg(good) is not None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8\xff") is None
    assert decode_jpeg(good[:-10]) is None        # truncated entropy data
    assert decode_jpeg(good[: len(good) // 2]) is None
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2                           # progressive marker
    assert decode_jpeg(bytes(prog)) is None
    # DRI with a nonzero restart interval → unsupported, refuse
    dri = good[:2] + b"\xff\xdd\x00\x04\x00\x08" + good[2:]
    assert decode_jpeg(dri) is None
    # 16-bit quant table (pq=1) → refuse
    bad = bytearray(good)
    dqt = bad.find(b"\xff\xdb")
    bad[dqt + 4] = 0x10
    assert decode_jpeg(bytes(bad)) is None


def test_spark_phash_path_on_jpeg_payloads(spark):
    """END-TO-END: image_ahash/image_phash over codec='jpeg' — the
    planted pixels' hashes survive the near-lossless codec exactly
    (quant=1 error ≤2 levels; the 32×32 DCT block and the 8×8 grid
    means move by O(err/1024))."""
    from pyspark.sql import Row

    from c_tran_data_pipeline_spark.operators.multimodal import (
        _pack_header,
        image_ahash,
        image_phash,
    )

    imgs = {i: _planted(32, 32, seed=40 + i) for i in range(6)}
    jdf = spark.createDataFrame(
        [Row(asset_id=i, payload=encode_jpeg(px)) for i, px in imgs.items()]
        + [Row(asset_id=99, payload=b"not a jpeg")],
        "asset_id long, payload binary",
    )
    fdf = spark.createDataFrame(
        [
            Row(asset_id=i, payload=_pack_header(32, 32, 1) + px.tobytes())
            for i, px in imgs.items()
        ],
        "asset_id long, payload binary",
    )
    jp = {r.asset_id: r.phash for r in image_phash(jdf, codec="jpeg").collect()}
    fp = {r.asset_id: r.phash for r in image_phash(fdf, codec="fake").collect()}
    assert jp[99] is None  # undecodable → NULL row, executor survives
    for i in imgs:
        assert jp[i] is not None
        ham = bin((jp[i] ^ fp[i]) & ((1 << 64) - 1)).count("1")
        assert ham <= 2, (i, ham)
    ja = {r.asset_id: r.ahash for r in image_ahash(jdf, codec="jpeg").collect()}
    fa = {r.asset_id: r.ahash for r in image_ahash(fdf, codec="fake").collect()}
    for i in imgs:
        ham = bin((ja[i] ^ fa[i]) & ((1 << 64) - 1)).count("1")
        assert ham <= 3, (i, ham)  # aHash thresholds raw pixels — noisier


def test_jpeg_roundtrip_property():
    """Property sweep of the codec: random dimensions (including
    non-multiple-of-8 and non-multiple-of-16 for 4:2:0), random pixel
    content, grayscale and both chroma modes — every near-lossless
    round-trip must stay within the DCT-rounding error bound and
    preserve exact shape. Pure Python+numpy, no Spark, so the sweep is
    wide and fast."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        mode=st.sampled_from(["gray", "444", "420"]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def check(w, h, mode, seed):
        rng = np.random.RandomState(seed)
        if mode == "gray":
            px = rng.randint(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
            enc = encode_jpeg(px, quality_quant=1)
        else:
            px = rng.randint(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
            enc = encode_jpeg(px, quality_quant=1, subsampling=mode)
        dec = decode_jpeg(enc)
        assert dec is not None
        dw, dh, ch, raw = dec
        assert (dw, dh) == (w, h)
        if mode == "gray":
            got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(np.int64)
            assert np.abs(got - px.astype(np.int64)).max() <= 2
        else:
            got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
            # 4:2:0 halves chroma resolution on RANDOM (chroma-noisy)
            # content: only luma is bounded tightly there
            if mode == "444":
                assert np.abs(got - px.astype(np.int64)).max() <= 4
            else:
                # 4:2:0 on NOISE: 2×2 chroma pooling pushes reconstructed
                # R/G/B outside [0,255] wherever neighbors disagree, and
                # the clip displaces luminance too — so luma-through-RGB
                # is only loosely bounded here (the tight ≤3 bound lives
                # in test_color_420_roundtrip_smooth_image, on the
                # chroma-smooth content 4:2:0 is FOR). This sweep checks
                # shape preservation and that the error stays codec-scale
                # rather than structural (a block/offset bug shows up as
                # 100+).
                wy = np.array([0.299, 0.587, 0.114])
                assert np.abs((got @ wy) - (px.astype(np.int64) @ wy)).max() <= 32

    check()


def test_decode_jpeg_luma_color_branch():
    """decode_jpeg_luma on a COLOR jpeg returns the BT.601 luma of the
    decoded RGB — the single-channel frame the perceptual hashes
    consume. Pinned against an independent recomputation from
    decode_jpeg's own RGB output, and against the encoder's source luma
    within codec error."""
    from c_tran_data_pipeline_spark.operators.jpeg import decode_jpeg_luma

    px = _planted(16, 24, seed=11, color=True)
    enc = encode_jpeg(px, quality_quant=1, subsampling="444")
    w, h, ch, raw = decode_jpeg_luma(enc)
    assert (w, h, ch) == (24, 16, 1)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(16, 24).astype(np.float64)
    # independent: luma of the decoder's RGB
    dw, dh, dch, rgb_raw = decode_jpeg(enc)
    rgb = np.frombuffer(rgb_raw, dtype=np.uint8).reshape(16, 24, 3).astype(np.float64)
    want = np.clip(np.round(0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]), 0, 255)
    assert np.array_equal(got, want)
    # and the source image's luma within codec error
    src_y = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert np.abs(got - src_y).max() <= 4
