

def test_resize_nearest_exact_gather():
    import numpy as np

    from hive_json_spark.operators.multimodal import resize_nearest

    arr = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    small = resize_nearest(arr, 3, 2)
    # y_src = y_out*6//3 = 0,2,4 ; x_src = x_out*4//2 = 0,2
    assert small.shape == (3, 2, 3)
    assert (small == arr[[0, 2, 4]][:, [0, 2]]).all()
    # degenerate 1x1 stays the top-left source pixel
    one = resize_nearest(arr, 1, 1)
    assert (one == arr[[0]][:, [0]]).all()


def test_resize_roundtrip_through_codecs():
    import numpy as np

    from hive_json_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    small = resize_nearest(arr, 4, 3)
    w, h, back = decode_bmp(encode_bmp(np.ascontiguousarray(small)))
    assert (w, h) == (3, 4)
    assert (back == small).all()


def test_png_roundtrip_all_filters():
    """Encoder cycles filter types 0-4 per row; decode must invert all
    five (None/Sub/Up/Average/Paeth) exactly."""
    import numpy as np

    from hive_json_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 3), (10, 17), (23, 8)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, back = decode_png(encode_png(arr))
        assert (w2, h2) == (w, h)
        assert (back == arr).all(), (h, w)


def test_png_rejects_unsupported():
    import pytest as _pytest

    from hive_json_spark.operators.multimodal import decode_png

    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng")


def test_gif_lzw_roundtrip_width_switches_and_reset():
    """LZW round-trips across the 9→10→11-bit width switches (repetitive
    streams grow the table fast) and the 4096-entry mid-stream CLEAR."""
    import random

    from hive_json_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    rnd = random.Random(3)
    cases = [
        b"",
        b"\x00",
        bytes(rnd.randrange(256) for _ in range(500)),     # 9→10 bit switch
        bytes((i % 5) for i in range(4000)),               # heavy repetition
        (bytes(range(64)) * 900)[:40000],                  # 4096-entry reset
        bytes(rnd.randrange(256) for _ in range(30000)),   # random reset path
    ]
    for data in cases:
        assert _lzw_decode_gif(_lzw_encode_gif(data)) == data, len(data)


def test_gif_roundtrip_palette_lookup():
    import numpy as np

    from hive_json_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    for h, w in [(1, 1), (7, 4), (20, 24), (33, 19)]:
        idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
        w2, h2, rgb = decode_gif(encode_gif(idx, pal))
        assert (w2, h2) == (w, h)
        assert (rgb == pal[idx]).all(), (h, w)


def test_gif_rejects_unsupported():
    import pytest as _pytest

    from hive_json_spark.operators.multimodal import decode_gif

    with _pytest.raises(ValueError, match="signature"):
        decode_gif(b"notagif")


def test_gif_truncation_raises_value_error():
    """Every truncation point must surface as ValueError (the codec's
    documented error contract), never IndexError."""
    import numpy as np
    import pytest as _pytest

    from hive_json_spark.operators.multimodal import decode_gif, encode_gif

    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    pal = np.zeros((256, 3), dtype=np.uint8)
    full = encode_gif(idx, pal)
    for cut in range(6, len(full) - 1):
        with _pytest.raises((ValueError, NotImplementedError)):
            decode_gif(full[:cut])


def test_audio_pitch_elects_planted_period(spark):
    """A planted square wave of period 128 must elect lag 128 from the
    candidate grid (autocorrelation at the true period is the global max:
    r(128) = +sum(s^2) while misaligned lags go negative), and a
    sawtooth of period 256 must elect 256 when the clip covers it."""
    import numpy as np
    import pandas as pd

    from hive_json_spark.operators.multimodal import (
        audio_pitch_features,
        encode_wav,
    )

    i = np.arange(1024)
    square = np.where((i // 64) % 2 == 0, 8000, -8000).astype("<i2")
    saw = ((((7 * 13 + i) % 256) - 128) * 256).astype("<i2")
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "content": [encode_wav(square), encode_wav(saw)],
                "format": ["wav", "wav"],
            }
        )
    )
    rows = {r.media_id: r for r in audio_pitch_features(media).collect()}
    assert rows[1].best_lag == 128, rows[1]
    assert rows[2].best_lag == 256, rows[2]
    # square wave crosses zero every 64 samples (1024/64 - 1 boundaries)
    assert rows[1].zcr == 15, rows[1]


def test_jpeg_roundtrip_matches_transform_reference():
    """decode(encode(x)) must equal the pure DCT→quantize→IDCT reference
    bit-for-bit: pins zigzag, DC prediction, category/amplitude coding,
    canonical in-stream Huffman tables, bit packing, and byte stuffing as
    LOSSLESS around the lossy transform — including the AC run-length path
    (random images have dense ACs; ZRL runs appear with coarse quant)."""
    import numpy as np

    from hive_json_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        jpeg_roundtrip_reference,
    )

    rng = np.random.RandomState(42)
    coarse = (np.arange(64).reshape(8, 8) % 16 + 1).astype(np.float64)
    zrl = np.full((8, 8), 200.0)  # kills most ACs → exercises ZRL/EOB runs
    for trial in range(6):
        h, w = 8 * rng.randint(1, 6), 8 * rng.randint(1, 6)
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        for quant in (None, coarse, zrl):
            w2, h2, got = decode_jpeg_gray(encode_jpeg_gray(img, quant))
            assert (w2, h2) == (w, h)
            assert np.array_equal(got, jpeg_roundtrip_reference(img, quant)), (
                f"trial {trial}"
            )


def test_jpeg_constant_blocks_bit_exact():
    import numpy as np

    from hive_json_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    for mid in (0, 3, 17, 255):
        bw_, bh_ = mid % 4 + 2, mid % 3 + 2
        by = np.arange(bh_)[:, None]
        bx = np.arange(bw_)[None, :]
        blocks = ((mid * 37 + by * 5 + bx * 3) % 256).astype(np.uint8)
        img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        _, _, dec = decode_jpeg_gray(encode_jpeg_gray(img))
        assert np.array_equal(dec, img), mid


def test_phash_planted_near_dups(spark, sf_dir):
    """pHash near-dup retrieval on the planted-structure corpus: ids
    sharing `id // 20` are near-duplicates (same base pattern, per-id
    high-frequency noise). At hamming ≤ 6 the pairs must be exactly the
    same-base ones blocking can reach — zero false positives, recall
    measured ≥ 0.5 — and identical-noise ids (k % 4 == 0 on both sides,
    same base) must appear at hamming 0."""
    from hive_json_spark.operators.multimodal import (
        phash_near_dup_pairs,
        synthetic_image_phash,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = synthetic_image_phash(docs, "doc_id").persist()
    rows = hashed.collect()
    ids = sorted(r.media_id for r in rows)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup_pairs(hashed, max_hamming=6).collect()
    }
    assert pairs
    # precision: every returned pair shares the base pattern
    assert all(a // 20 == b // 20 for a, b in pairs)
    # deterministic anchor: same base + zero noise on both sides → hamming 0
    zero_noise = [m for m in ids if (m % 20) % 4 == 0]
    by_base = {}
    for m in zero_noise:
        by_base.setdefault(m // 20, []).append(m)
    anchors = [
        (a, b)
        for ms in by_base.values()
        for a in ms
        for b in ms
        if a < b
    ]
    assert anchors
    assert all(pairs.get(p) == 0 for p in anchors)
    # recall over all same-base pairs within the threshold
    h = {r.media_id: r.phash for r in rows}
    same_base = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if a // 20 == b // 20
    ]
    reachable = [
        p
        for p in same_base
        if bin((h[p[0]] ^ h[p[1]]) & ((1 << 64) - 1)).count("1") <= 6
    ]
    # pigeonhole completeness: blocking found EVERY pair under the bound
    assert set(pairs) == set(reachable)
    assert len(reachable) / len(same_base) >= 0.5
    hashed.unpersist()


def test_phash_band_blocking_pigeonhole(spark):
    """Property: for ANY hash pair within the hamming threshold, band
    blocking must produce the candidate (pigeonhole: #bands > threshold
    ⇒ at least one band is untouched by the differing bits). Random
    64-bit hashes with planted ≤6-bit flips at threshold 6 (8 bands)."""
    import random as _r

    from hive_json_spark.operators.multimodal import phash_near_dup_pairs

    rnd = _r.Random(99)
    rows = []
    base_hashes = [rnd.getrandbits(63) for _ in range(30)]
    mid = 0
    for h in base_hashes:
        rows.append((mid, h)); mid += 1
        flipped = h
        for b in rnd.sample(range(64), rnd.randint(0, 6)):
            flipped ^= 1 << b
        # keep within int64 by using 63-bit bases
        rows.append((mid, flipped & ((1 << 63) - 1))); mid += 1
    df = spark.createDataFrame(rows, "media_id bigint, phash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup_pairs(df, max_hamming=6).collect()
    }
    # brute force over all pairs
    hs = dict(rows)
    expect = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                expect[(a, b)] = d
    assert got == expect  # complete AND sound, with exact hamming values


def test_phash_invariants():
    import numpy as np

    from hive_json_spark.operators.multimodal import box_downsample_gray, phash64

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (48, 80)).astype(np.uint8)
    # deterministic; insensitive to zero-mean high-frequency dither
    assert phash64(img) == phash64(img)
    checker = ((np.indices((48, 80)).sum(axis=0) % 2) * 2 - 1).astype(np.int64)
    dithered = np.clip(img.astype(np.int64) + checker, 0, 255).astype(np.uint8)
    d = bin((phash64(img) ^ phash64(dithered)) & ((1 << 64) - 1)).count("1")
    assert d <= 4
    # box mean of a constant image is that constant
    assert np.allclose(box_downsample_gray(np.full((50, 70), 99, np.uint8)), 99.0)


def test_audio_fingerprint_planted_near_dups(spark, sf_dir):
    """Constellation fingerprint retrieval: ids sharing `id // 20` play
    the same melody under per-id noise. Pairs at >=3 shared hashes must
    all be same-melody (zero cross-melody collisions), recall >= 0.5,
    and zero-noise ids of one melody share their FULL fingerprint set."""
    from hive_json_spark.operators.multimodal import (
        audio_near_dup_pairs,
        spectral_fingerprints,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = spectral_fingerprints(docs, "doc_id").persist()
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in audio_near_dup_pairs(fps, min_shared=3).collect()
    }
    assert pairs
    assert all(a // 20 == b // 20 for a, b in pairs)
    by_id = {}
    for r in fps.collect():
        by_id.setdefault(r.media_id, set()).add(r.fhash)
    ids = sorted(by_id)
    same = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if a // 20 == b // 20
    ]
    hits = [p for p in same if len(by_id[p[0]] & by_id[p[1]]) >= 3]
    assert set(pairs) == set(hits)  # join is complete, not just sound
    assert len(hits) / len(same) >= 0.5
    # zero-noise anchors: identical signal → identical fingerprint set
    anchors = [
        (a, b) for a, b in same if (a % 20) % 4 == 0 and (b % 20) % 4 == 0
    ]
    assert anchors
    for a, b in anchors:
        assert by_id[a] == by_id[b]
    fps.unpersist()


def test_jpeg_rejects_unrepresentable_quant_table():
    """DQT stores 8-bit integers: a table with entries >255 or fractional
    values would quantize with one table and ship another (silent decode
    corruption) — the encoder must refuse instead."""
    import numpy as np
    import pytest

    from hive_json_spark.operators.multimodal import encode_jpeg_gray

    img = np.zeros((8, 8), dtype=np.uint8)
    for bad in (
        np.full((8, 8), 300.0),   # wraps mod 256 under uint8 cast
        np.full((8, 8), 1.5),     # truncates under uint8 cast
        np.full((8, 8), 0.0),     # zero divisor / out of 1..255
        np.ones((4, 4)),          # wrong shape
    ):
        with pytest.raises(ValueError):
            encode_jpeg_gray(img, bad)
    # integral float tables in range stay accepted
    assert encode_jpeg_gray(img, np.full((8, 8), 255.0))


def test_jpeg_quantization_quality_tradeoff():
    """Coarser tables must not catastrophically distort (PSNR floor) and
    the all-ones table must beat them — sanity that quantization, not the
    entropy coder, is the only loss source."""
    import numpy as np

    from hive_json_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    img = np.tile(np.arange(256, dtype=np.uint8), (32, 1))[:, :64]

    def psnr(quant):
        dec = decode_jpeg_gray(encode_jpeg_gray(img, quant))[2]
        mse = float(np.mean((dec.astype(float) - img.astype(float)) ** 2))
        return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)

    fine = psnr(None)
    coarse = psnr(np.full((8, 8), 16.0))
    assert fine >= coarse
    assert coarse > 30.0


def test_jpeg_truncation_and_garbage_rejected():
    import numpy as np
    import pytest as _pytest

    from hive_json_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    img = np.zeros((8, 8), dtype=np.uint8)
    data = encode_jpeg_gray(img)
    with _pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x01" + data[2:])
    with _pytest.raises((ValueError, IndexError)):
        decode_jpeg_gray(data[:40])


# --- FLAC subset codec -------------------------------------------------------

def test_flac_roundtrip_exact_all_signal_shapes():
    """Every subframe type and block shape: constant (CONSTANT), noise
    (VERBATIM wins), smooth (FIXED+Rice), multi-block, partial final
    block, 1-sample, empty, int16 extremes — all decode bit-exact (the
    decoder also verifies CRC-8/CRC-16/MD5, so a pass here proves the
    whole bitstream, not just the sample math)."""
    import numpy as np

    from hive_json_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(7)
    cases = [
        np.zeros(5000, dtype=np.int16),
        np.full(4096, -123, dtype=np.int16),
        (np.arange(10000) % 3000 - 1500).astype(np.int16),
        (8000 * np.sin(2 * np.pi * np.arange(12345) / 256)).astype(np.int16),
        rng.integers(-32768, 32768, 4096).astype(np.int16),
        np.array([5, -7, 9], dtype=np.int16),
        np.array([42], dtype=np.int16),
        np.zeros(0, dtype=np.int16),
        np.array([32767, -32768] * 100, dtype=np.int16),
    ]
    for x in cases:
        sr, back = decode_flac(encode_flac(x, sample_rate=1234))
        assert sr == 1234
        assert np.array_equal(back, x), f"roundtrip mismatch n={len(x)}"


def test_flac_empty_input_emits_zero_frames():
    """n_total=0 → STREAMINFO total=0 and NO frames (a zero-sample frame
    would be malformed for conforming external decoders: its 16-bit end
    blocksize field can't encode 0). Stream = fLaC magic + one 38-byte
    STREAMINFO block and nothing else."""
    import numpy as np

    from hive_json_spark.operators.flac import decode_flac, encode_flac

    b = encode_flac(np.zeros(0, dtype=np.int16))
    assert len(b) == 4 + 4 + 34  # magic + block header + STREAMINFO
    sr, back = decode_flac(b)
    assert len(back) == 0


def test_flac_compresses_smooth_signals():
    import numpy as np

    from hive_json_spark.operators.flac import encode_flac

    sine = (8000 * np.sin(2 * np.pi * np.arange(12000) / 256)).astype(np.int16)
    assert len(encode_flac(sine)) < 0.4 * 2 * len(sine)
    assert len(encode_flac(np.zeros(12000, dtype=np.int16))) < 200


def test_flac_detects_corruption():
    import numpy as np
    import pytest as _pytest

    from hive_json_spark.operators.flac import decode_flac, encode_flac

    x = (1000 * np.sin(np.arange(5000) / 9)).astype(np.int16)
    data = bytearray(encode_flac(x))
    assert data[:4] == b"fLaC"
    with _pytest.raises(ValueError):
        decode_flac(bytes(b"XXXX") + bytes(data[4:]))
    # flip a byte inside the first frame body: CRC-16 must catch it
    corrupt = bytearray(data)
    corrupt[len(corrupt) // 2] ^= 0xFF
    with _pytest.raises((ValueError, NotImplementedError)):
        decode_flac(bytes(corrupt))


def test_flac_query_all_verdicts_true(spark, sf_dir):
    """q_flac_roundtrip: every clip roundtrips exactly, compresses below
    raw PCM, and the decoded RMS matches the direct closed form."""
    import math

    from hive_json_spark.registry import QUERIES

    rows = QUERIES["q_flac_roundtrip"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.roundtrip_exact and r.compressed, r.media_id
        ns = (r.media_id % 10 + 1) * 200
        ss = sum((((r.media_id * 13 + i) % 256 - 128) * 256) ** 2 for i in range(ns))
        assert r.n_samples == ns
        assert abs(r.rms - math.sqrt(ss / ns)) == 0.0, r.media_id
