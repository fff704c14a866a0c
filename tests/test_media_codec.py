"""Real multimodal kernels: pure-numpy/stdlib codecs (media_codec.py) and
the Spark operators over them (multimodal.py REAL tier).

Codec tests are plain numpy (no Spark); the Spark tests pin operator
schemas and value parity against local references on the same bytes.
"""

import numpy as np
import pytest

from wallaroo_spark.operators import media_codec as mc


rng = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# Codec roundtrips and golden bytes
# ---------------------------------------------------------------------------

def test_ppm_roundtrip_rgb_and_gray():
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert (mc.decode_ppm(mc.encode_ppm(img)) == img).all()
    g = rng.integers(0, 256, (9, 5), dtype=np.uint8)
    assert (mc.decode_ppm(mc.encode_ppm(g))[:, :, 0] == g).all()


def test_pnm_header_grammar_comments_and_whitespace():
    # the real netpbm grammar: arbitrary whitespace, '#' comments
    raw = b"P6 # cmt\n# another comment\n 4\t3 255\n" + bytes(range(36))
    d = mc.decode_ppm(raw)
    assert d.shape == (3, 4, 3) and d[0, 0, 0] == 0 and d[2, 3, 2] == 35


def test_bmp_roundtrip_with_row_padding():
    # widths 5 and 6: strides 16 (pad 1) and 20 (pad 2) exercise padding
    for shape in [(7, 5, 3), (4, 4, 3), (3, 6, 3)]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (mc.decode_bmp(mc.encode_bmp(im)) == im).all()


def test_bmp_golden_bytes():
    # hand-checked 1x2 image: bottom-up BGR rows padded to 4 bytes
    img = np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)  # red, green
    raw = mc.encode_bmp(img)
    assert raw[:2] == b"BM"
    data_off = int.from_bytes(raw[10:14], "little")
    # row: B G R | B G R | pad pad  (red -> 00 00 FF, green -> 00 FF 00)
    assert raw[data_off : data_off + 8] == b"\x00\x00\xff\x00\xff\x00\x00\x00"
    assert (mc.decode_bmp(raw) == img).all()


def test_wav_roundtrip_mono_stereo():
    s = rng.integers(-32768, 32767, (1000, 2), dtype=np.int16)
    dec, rate = mc.decode_wav(mc.encode_wav(s, 8000))
    assert rate == 8000 and (dec == s).all()
    m = rng.integers(-32768, 32767, 64, dtype=np.int16)
    dec, rate = mc.decode_wav(mc.encode_wav(m, 44100))
    assert rate == 44100 and (dec[:, 0] == m).all()


def test_sniff_format():
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    assert mc.sniff_format(mc.encode_ppm(img)) == "ppm"
    assert mc.sniff_format(mc.encode_ppm(img[:, :, 0])) == "pgm"
    assert mc.sniff_format(mc.encode_bmp(img)) == "bmp"
    assert mc.sniff_format(mc.encode_wav(np.zeros(4, np.int16))) == "wav"
    assert mc.sniff_format(mc.encode_rvid(img[None])) == "rvid"
    assert mc.sniff_format(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert mc.sniff_format(b"\xff\xd8\xff\xe0") == "jpg"
    assert mc.sniff_format(b"garbage") is None


def test_rvid_demux_every_k_touches_only_sampled_frames():
    fr = rng.integers(0, 256, (10, 4, 6, 3), dtype=np.uint8)
    rv = mc.encode_rvid(fr)
    assert mc.rvid_info(rv) == (6, 4, 3, 10)
    got = list(mc.iter_rvid_frames(rv, every=3))
    assert [i for i, _ in got] == [0, 3, 6, 9]
    for i, f in got:
        assert (f == fr[i]).all()


# ---------------------------------------------------------------------------
# Signal kernels
# ---------------------------------------------------------------------------

def test_bilinear_identity_and_constant():
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert (mc.bilinear_resize(img, 13, 17) == img).all()
    const = np.full((10, 8, 3), 111, np.uint8)
    assert (mc.bilinear_resize(const, 4, 7) == 111).all()


def test_bilinear_matches_manual_interpolation():
    # 2x2 -> 4x4 with half-pixel centers: compare to a hand-rolled loop
    img = np.array([[[0], [100]], [[200], [60]]], dtype=np.uint8)
    out = mc.bilinear_resize(img, 4, 4)
    a = img[:, :, 0].astype(float)
    for oy in range(4):
        for ox in range(4):
            sy = (oy + 0.5) * 2 / 4 - 0.5
            sx = (ox + 0.5) * 2 / 4 - 0.5
            y0, x0 = int(np.clip(np.floor(sy), 0, 1)), int(np.clip(np.floor(sx), 0, 1))
            y1, x1 = min(y0 + 1, 1), min(x0 + 1, 1)
            wy, wx = np.clip(sy - y0, 0, 1), np.clip(sx - x0, 0, 1)
            v = (a[y0, x0] * (1 - wx) + a[y0, x1] * wx) * (1 - wy) + (
                a[y1, x0] * (1 - wx) + a[y1, x1] * wx
            ) * wy
            assert out[oy, ox, 0] == np.clip(np.rint(v), 0, 255)


def test_bilinear_ramp_monotone_preserves_endpoints():
    ramp = np.tile(np.arange(0, 250, 50, dtype=np.uint8)[None, :, None], (5, 1, 3))
    up = mc.bilinear_resize(ramp, 5, 10)
    assert up.shape == (5, 10, 3)
    assert up[0, 0, 0] == 0 and up[0, -1, 0] == 200
    assert np.all(np.diff(up[0, :, 0].astype(int)) >= 0)


def test_ahash64_brightness_shift_invariant_and_sensitive():
    img = rng.integers(0, 200, (32, 32, 3), dtype=np.uint8)
    shifted = (img.astype(int) + 30).astype(np.uint8)  # headroom: no clipping
    assert mc.ahash64(img) == mc.ahash64(shifted)
    other = rng.integers(0, 200, (32, 32, 3), dtype=np.uint8)
    d = bin(mc.ahash64(img) ^ mc.ahash64(other)).count("1")
    assert d > 8  # independent images should differ in many blocks


def test_ahash64_small_noise_small_distance():
    img = rng.integers(40, 160, (64, 64, 3), dtype=np.uint8)
    noisy = np.clip(img.astype(int) + rng.integers(-2, 3, img.shape), 0, 255).astype(
        np.uint8
    )
    d = bin(mc.ahash64(img) ^ mc.ahash64(noisy)).count("1")
    assert d <= 8


def test_luma_integer_exact():
    img = np.array([[[255, 255, 255], [0, 0, 0], [255, 0, 0]]], dtype=np.uint8)
    ly = mc.luma(img)
    assert ly[0, 0] == (77 * 255 + 150 * 255 + 29 * 255) >> 8  # 255
    assert ly[0, 1] == 0
    assert ly[0, 2] == (77 * 255) >> 8


def test_spectrogram_sine_peak_and_parseval():
    t = np.arange(2048)
    sine = np.sin(2 * np.pi * 32 * t / 256)
    sp = mc.spectrogram(sine, frame=256)
    assert sp.shape == (8, 129)
    assert np.argmax(sp[0]) == 32
    x = rng.normal(size=512)
    sp2 = mc.spectrogram(x, frame=256)
    # Parseval over one rectangular frame (rfft: double the interior bins)
    e_freq = sp2[0, 0] + sp2[0, -1] + 2 * sp2[0, 1:-1].sum()
    assert abs(e_freq - (x[:256] ** 2).sum()) < 1e-8


def test_band_energies_sine_lands_in_right_band():
    sine = np.sin(2 * np.pi * 32 * np.arange(2048) / 256)
    be = mc.band_energies(sine, n_bands=8, frame=256)
    assert be.shape == (8,)
    assert np.argmax(be) == 2  # bin 32 of 129 -> band [32, 48)
    short = mc.band_energies(np.zeros(10), n_bands=8, frame=256)
    assert (short == 0).all()


# ---------------------------------------------------------------------------
# Spark operators (REAL tier) — schema + value parity vs local references
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    local = {}
    r = np.random.default_rng(7)
    for i in range(6):
        img = r.integers(0, 256, (6 + i, 5 + i, 3), dtype=np.uint8)
        raw = mc.encode_ppm(img) if i % 2 == 0 else mc.encode_bmp(img)
        rows.append((i, bytearray(raw)))
        local[i] = img
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    return df, local


def test_spark_attach_media_meta_decoded(spark, media_df):
    from wallaroo_spark.operators import multimodal as mm

    df, local = media_df
    got = {r["doc_id"]: r for r in mm.attach_media_meta_decoded(df).collect()}
    for i, img in local.items():
        assert got[i]["format"] == ("ppm" if i % 2 == 0 else "bmp")
        assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (
            img.shape[1], img.shape[0], 3,
        )
        assert got[i]["sample_rate"] is None


def test_spark_decoded_image_stats_parity(spark, media_df):
    from wallaroo_spark.operators import multimodal as mm

    df, local = media_df
    got = {r["doc_id"]: r for r in mm.decoded_image_stats(df).collect()}
    for i, img in local.items():
        assert got[i]["pixel_sum"] == int(img.sum(dtype="int64"))
        assert got[i]["px_min"] == int(img.min())
        assert got[i]["px_max"] == int(img.max())
        assert got[i]["luma_sum"] == int(mc.luma(img).sum())


def test_spark_resize_images_reencodes_decodable_ppm(spark, media_df):
    from wallaroo_spark.operators import multimodal as mm

    df, local = media_df
    out = {r["doc_id"]: r for r in mm.resize_images(df, 4, 7).collect()}
    for i, img in local.items():
        expect = mc.bilinear_resize(img, 4, 7)
        r = out[i]
        assert (r["width"], r["height"]) == (7, 4)
        assert (mc.decode_ppm(bytes(r["media"])) == expect).all()
        assert r["pixel_sum"] == int(expect.sum(dtype="int64"))


def test_spark_ahash64_near_pairs_parity(spark):
    """Operator pairs == brute-force numpy pairs at the same threshold."""
    from wallaroo_spark.operators import multimodal as mm

    r = np.random.default_rng(3)
    base = r.integers(60, 190, (24, 24, 3), dtype=np.uint8)
    imgs = {}
    for i in range(8):
        if i % 2 == 0:
            imgs[i] = np.clip(
                base.astype(int) + r.integers(-2, 3, base.shape), 0, 255
            ).astype(np.uint8)
        else:
            imgs[i] = r.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(i, bytearray(mc.encode_ppm(im))) for i, im in imgs.items()],
        "doc_id bigint, media binary",
    )
    got = {
        (r2["doc_a"], r2["doc_b"]): r2["hamming"]
        for r2 in mm.ahash64_near_pairs(df, max_hamming=6).collect()
    }
    hashes = {i: mc.ahash64(im) for i, im in imgs.items()}
    expect = {}
    for a in range(8):
        for b in range(a + 1, 8):
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= 6:
                expect[(a, b)] = d
    assert got == expect


def test_spark_audio_roundtrip_and_bands(spark):
    from wallaroo_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog %02d" % i) for i in range(4)],
        "doc_id bigint, text string",
    )
    wav = mm.synth_wav_from_text(docs, rate=8000)
    meta = {r["doc_id"]: r for r in mm.audio_meta_decoded(wav).collect()}
    for i in range(4):
        s = "the quick brown fox jumps over the lazy dog %02d" % i
        codes = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
        samples = (codes - 96) * 256
        assert meta[i]["n_samples"] == len(s)
        assert meta[i]["sample_rate"] == 8000
        assert meta[i]["energy"] == int((samples**2).sum())
    bands = {r["doc_id"]: r["bands"] for r in mm.audio_band_energies(wav, n_bands=4, frame=16).collect()}
    for i in range(4):
        s = "the quick brown fox jumps over the lazy dog %02d" % i
        codes = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
        mono = ((codes - 96) * 256).astype(np.float64) / 32768.0
        expect = mc.band_energies(mono, n_bands=4, frame=16)
        assert np.allclose(np.array(bands[i]), expect)


def test_spark_video_frames_lazy_demux(spark):
    from wallaroo_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz")], "doc_id bigint, text string"
    )
    rv = mm.synth_rvid_from_text(docs, w=4, h=3, n_frames=6)
    rows = mm.sample_video_frames(rv, every=2).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]
    codes = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    for r in rows:
        f = r["frame_idx"]
        expect = codes[f : f + 12]
        assert r["frame_sum"] == int(expect.sum())
        frame = mc.decode_ppm(bytes(r["frame"]))
        assert (frame.reshape(-1) == expect).all()


def test_decoded_image_stats_stream_matches_batch(spark, tmp_path):
    """The REAL decode kernels are stateless mapInPandas stages, so the
    SAME operator runs on a streaming media table (append mode) and must
    emit exactly the batch rows — the multimodal family's stream parity,
    patterned on the DSIR/perplexity gates."""
    from wallaroo_spark.operators import multimodal as mm

    r = np.random.default_rng(11)
    rows = [
        (i, bytearray(mc.encode_ppm(r.integers(0, 256, (5 + i, 7, 3), dtype=np.uint8))))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    want = {tuple(x) for x in mm.decoded_image_stats(df).collect()}

    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path) + "/in")
    sdf = spark.readStream.schema(df.schema).parquet(str(tmp_path) + "/in")
    q = (
        mm.decoded_image_stats(sdf)
        .writeStream.format("memory")
        .queryName("t_mm_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path) + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(x) for x in spark.sql("SELECT * FROM t_mm_stream").collect()}
    assert got == want and want


# ---------------------------------------------------------------------------
# Property tests (hypothesis): codec roundtrips and kernel invariants on
# arbitrary shapes/content — no Spark, pure numpy
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    gray=st.booleans(), seed=st.integers(0, 2**31 - 1),
)
def test_prop_netpbm_bmp_roundtrip_any_shape(h, w, gray, seed):
    r = np.random.default_rng(seed)
    img = r.integers(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    dec = mc.decode_ppm(mc.encode_ppm(img))
    assert (dec[:, :, 0] == img).all() if gray else (dec == img).all()
    if not gray:
        assert (mc.decode_bmp(mc.encode_bmp(img)) == img).all()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 400), ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31 - 1),
)
def test_prop_wav_roundtrip_any_length(n, ch, rate, seed):
    r = np.random.default_rng(seed)
    s = r.integers(-32768, 32767, (n, ch), dtype=np.int16)
    dec, got_rate = mc.decode_wav(mc.encode_wav(s, rate))
    assert got_rate == rate and (dec == s).all()


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 16), w=st.integers(1, 16),
    oh=st.integers(1, 16), ow=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_bilinear_range_and_constant_preservation(h, w, oh, ow, seed):
    r = np.random.default_rng(seed)
    img = r.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = mc.bilinear_resize(img, oh, ow)
    assert out.shape == (oh, ow, 3)
    # interpolation can never exceed the source's value range
    assert out.min() >= img.min() and out.max() <= img.max()
    c = int(r.integers(0, 256))
    const = np.full((h, w, 3), c, np.uint8)
    assert (mc.bilinear_resize(const, oh, ow) == c).all()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 12), h=st.integers(1, 8), w=st.integers(1, 8),
    every=st.integers(1, 5), seed=st.integers(0, 2**31 - 1),
)
def test_prop_rvid_demux_exact_frames(n, h, w, every, seed):
    r = np.random.default_rng(seed)
    fr = r.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    rv = mc.encode_rvid(fr)
    got = list(mc.iter_rvid_frames(rv, every=every))
    assert [i for i, _ in got] == list(range(0, n, every))
    for i, f in got:
        assert (f == fr[i]).all()


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1), d=st.integers(0, 6),
)
def test_prop_banding_lossless_for_ahash64(seed, d):
    """Pigeonhole losslessness of the d+1 banding, checked directly on
    random 64-bit fingerprints: any pair within Hamming distance d must
    share at least one band value (the property hamming_pairs relies on)."""
    r = np.random.default_rng(seed)
    a = int(r.integers(0, 2**63))
    # flip exactly d random bit positions
    pos = r.choice(64, size=d, replace=False) if d else []
    b = a
    for p in pos:
        b ^= 1 << int(p)
    bands = d + 1
    width = 64 // bands
    shared = any(
        ((a >> (k * width)) & ((1 << width) - 1)) == ((b >> (k * width)) & ((1 << width) - 1))
        for k in range(bands)
    )
    assert shared
