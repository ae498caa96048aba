"""Tests for the training-data prep operators (dedup, simsearch,
textstats, multimodal plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.textprep.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_col,
)
from fluent_bit_spark.textprep.multimodal import (
    binary_meta,
    extract_features,
    sample_frames,
)
from fluent_bit_spark.textprep.simsearch import cosine_topk, lsh_topk
from fluent_bit_spark.textprep.textstats import (
    fingerprint_col,
    lang_id_col,
    quality_cols,
    token_count_cols,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # near dup
        (3, "completely different words here about spark engines", "en"),
        (4, "der schnelle braune fuchs und der faule hund", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(docs):
    out = {r["digest"]: r for r in exact_dedup(docs).collect()}
    assert len(out) == 4  # 5 docs, one exact dup pair
    dup = [r for r in out.values() if r["n_dups"] == 2]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs  # unrelated
    assert all(a < b for a, b in pairs)


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]


def test_minhash_lsh_recovers_exact_and_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # near-dup must collide in some band
    assert (0, 4) not in pairs


def test_minhash_est_triage_matches_exact_on_clear_pairs(docs):
    """Signature-estimate fast path: exact dups are fast-accepted
    (est=1.0), unrelated docs fast-rejected; borderline pairs fall
    through to the exact verify so the decisive pairs agree with the
    exact-only path."""
    exact = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
    }
    triaged = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in minhash_lsh_pairs(docs, threshold=0.2, est_margin=0.125).collect()
    }
    assert triaged[(0, 1)] == 1.0  # est of identical sigs is exactly 1
    assert (0, 4) not in triaged
    # every exact pair far above threshold is present in the triaged set
    for p, j in exact.items():
        if j >= 0.325:
            assert p in triaged


def test_simhash_near_dup_small_hamming(docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash_col(docs).collect()}
    assert sh[0] == sh[1]
    ham = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham < ham_far


def test_fingerprint_deterministic(docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint_col(docs).collect()}
    assert fp[0] == fp[1] != fp[2]
    fp2 = {r["doc_id"]: r["fingerprint"] for r in fingerprint_col(docs).collect()}
    assert fp == fp2


def test_token_and_quality_stats(docs):
    row = token_count_cols(docs).filter("doc_id = 0").first()
    assert row["ws_tokens"] == 9
    assert row["bpe_tokens"] == 9  # all alpha words
    q = quality_cols(docs).filter("doc_id = 0").first()
    assert q["n_tokens"] == 9
    assert q["stopword_ratio"] > 0  # 'the' twice + 'over'
    assert 0 < q["alpha_ratio"] < 1


def test_length_quantile_card_exact_interpolation(docs):
    from fluent_bit_spark.textprep.textstats import length_quantile_card

    card = {r["lang"]: r for r in length_quantile_card(docs).collect()}
    # en token counts sorted: [8, 9, 9, 9] -> p50 = 9 (midpoint of 9,9),
    # p90 linear-interpolates between index 2.7's neighbors = 9
    en = card["en"]
    assert en["docs"] == 4
    assert en["p50_tokens"] == 9.0
    assert en["p90_tokens"] == 9.0
    de = card["de"]
    assert de["docs"] == 1 and de["p50_tokens"] == 8.0


def test_lang_id_marker_words(docs):
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id_col(docs).collect()}
    assert out[0] == "en"  # 'the' x2
    assert out[4] == "de"  # 'der' x2


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(40):
        base = [math.sin(0.1 * i + j) for j in range(8)]
        rows.append((i, [float(x) for x in base]))
    # vec 100 = near-copy of vec 0
    rows.append((100, [x + 0.001 for x in rows[0][1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vectors):
    queries = vectors.filter("vec_id = 0")
    data = vectors.filter("vec_id > 0")
    out = cosine_topk(data, queries, k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["neighbor_id"] == 100  # the planted near-copy
    assert out[0]["cos"] > 0.999


def test_lsh_topk_finds_planted_neighbor(vectors):
    queries = vectors.filter("vec_id = 0")
    data = vectors.filter("vec_id > 0")
    out = lsh_topk(data, queries, k=3, n_planes=4).collect()
    assert out and out[0]["neighbor_id"] == 100


def test_embedding_neardup_pairs(vectors):
    pairs = embedding_neardup_pairs(vectors, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100) in got


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        (0, b"\xff\xd8\xff\xe0" + b"x" * 600),
        (1, b"\x89PNG\r\n" + b"y" * 100),
        (2, b"plain text payload"),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_binary_meta_sniffs_magic(payloads):
    out = {r["id"]: r for r in binary_meta(payloads).collect()}
    assert out[0]["media_type"] == "jpeg"
    assert out[1]["media_type"] == "png"
    assert out[2]["media_type"] == "unknown"
    assert out[0]["media_bytes"] == 604
    assert out[0]["media_magic"] == "ffd8ffe0"


def test_extract_features_stub_plumbing(payloads):
    out = {r["id"]: r for r in extract_features(payloads).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["n_bytes"] == 604
    assert len(out[0]["feat"]) == 8
    assert abs(sum(out[0]["feat"]) - 1.0) < 0.01
    # decode stub must raise without the deterministic fake
    from fluent_bit_spark.textprep.multimodal import _decode_stub

    with pytest.raises(NotImplementedError):
        _decode_stub(b"x", deterministic_fake=False)


def _real_png(w: int, h: int) -> bytes:
    """A fully valid (CRC-correct) 1-pixel-row PNG built with stdlib."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _real_wav(channels: int, rate: int, n_samples: int) -> bytes:
    """A valid WAV written by the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(b"\x00\x01" * n_samples * channels)
    return buf.getvalue()


def test_decode_header_real_containers():
    """decode_header parses REAL container bytes (valid CRC PNG from
    zlib, valid WAV from the stdlib wave module, handwritten GIF/JPEG
    headers) — no codec library involved."""
    import struct

    from fluent_bit_spark.textprep.multimodal import decode_header

    png = decode_header(_real_png(31, 7))
    assert png == {"media_type": "png", "width": 31, "height": 7}
    wav = decode_header(_real_wav(2, 22050, 100))
    assert wav == {"media_type": "wav", "channels": 2, "sample_rate": 22050}
    gif = decode_header(b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00")
    assert gif == {"media_type": "gif", "width": 320, "height": 200}
    jpg = decode_header(
        b"\xff\xd8"
        + b"\xff\xe0\x00\x04\x00\x00"  # APP0 segment skipped
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 480, 640) + b"\x03"
    )
    assert jpg == {"media_type": "jpeg", "width": 640, "height": 480}
    assert decode_header(b"not a container") is None


def test_extract_features_uses_real_dims_for_containers(spark):
    df = spark.createDataFrame(
        [(0, _real_png(40, 9)), (1, b"opaque bytes")], "id long, payload binary"
    )
    out = {r["id"]: r for r in extract_features(df).collect()}
    assert (out[0]["width"], out[0]["height"]) == (40, 9)  # real decode
    assert out[1]["width"] != 40  # fake path for unknown payloads


def test_decode_meta_dataframe(spark):
    from fluent_bit_spark.textprep.multimodal import decode_meta

    df = spark.createDataFrame(
        [(0, _real_wav(1, 8000, 10)), (1, _real_png(3, 3)), (2, b"zz")],
        "id long, payload binary",
    )
    out = {r["id"]: r for r in decode_meta(df).collect()}
    assert out[0]["media_type"] == "wav" and out[0]["sample_rate"] == 8000
    assert out[1]["media_type"] == "png" and out[1]["width"] == 3
    assert out[2]["media_type"] == "unknown" and out[2]["width"] is None


def test_sample_frames_one_to_n(payloads):
    out = sample_frames(payloads, every_n_bytes=256, max_frames=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[0]) == 2  # 604 bytes -> 2 frames of 256
    assert all(r["frame_bytes"] == 256 for r in by_id[0])
    assert len(by_id[2]) == 1  # short payload -> single frame


def test_embedding_neardup_lsh_finds_planted(vectors):
    from fluent_bit_spark.textprep.dedup import embedding_neardup_lsh

    pairs = embedding_neardup_lsh(vectors, threshold=0.999, n_planes=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100) in got  # near-identical vectors share every sign bit


def test_minhash_null_and_empty_text(spark):
    # null / empty / whitespace text must yield a null signature (the
    # SQL path's semantics), not crash the Arrow batch or corrupt
    # neighboring rows' segment-min
    rows = [
        (0, "the quick brown fox jumps over the dog"),
        (1, None),
        (2, ""),
        (3, "the quick brown fox jumps over the dog"),
        (4, " "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(df).collect()}
    assert sigs[0] == sigs[3]  # identical docs unaffected by nulls between
    assert all(v is None for v in sigs[1])  # null text -> null signature
    sql_sigs = {
        r["id"]: r["sig"] for r in minhash_signatures(df, engine="sql").collect()
    }
    assert sql_sigs == sigs  # arrow path stays bit-identical to the SQL form


def test_embedding_lsh_max_bucket_guard(spark):
    from fluent_bit_spark.textprep.dedup import embedding_neardup_lsh

    # pathological input: every vector identical -> one bucket holds all
    # rows; with max_bucket the bucket is dropped (bounded expansion)
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_neardup_lsh(
        df, threshold=0.9, n_planes=4, dim=4, max_bucket=10
    )
    assert out.count() == 0  # oversized bucket dropped, no quadratic blowup


def test_embedding_lsh_multi_table_recall(vectors):
    from fluent_bit_spark.textprep.dedup import embedding_neardup_lsh

    one = embedding_neardup_lsh(vectors, threshold=0.999, n_planes=8, n_tables=1)
    four = embedding_neardup_lsh(vectors, threshold=0.999, n_planes=8, n_tables=4)
    got1 = {(r["id_a"], r["id_b"]) for r in one.collect()}
    got4 = {(r["id_a"], r["id_b"]) for r in four.collect()}
    assert got1 <= got4  # extra tables only ADD recall
    assert (0, 100) in got4


def test_ivf_topk_finds_planted_neighbor(vectors):
    from fluent_bit_spark.textprep.simsearch import ivf_topk

    queries = vectors.filter("vec_id = 0")
    data = vectors.filter("vec_id > 0")
    out = ivf_topk(data, queries, k=3, n_cells=4, n_probe=2).collect()
    assert out and out[0]["neighbor_id"] == 100  # the planted near-dup


def test_ivf_kmeans_centroids_recall(spark):
    """Sampled spherical k-means refinement: recall@k vs the brute-
    force baseline is at least the seed-centroid recall, and the
    training is deterministic (same input -> same centroids)."""
    import math

    from fluent_bit_spark.textprep.simsearch import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
    )

    rows = []
    for i in range(200):
        base = [math.sin(0.37 * i + 1.7 * j) + 0.2 * math.cos(0.9 * i * j) for j in range(8)]
        rows.append((i, [float(x) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 5")
    data = df.filter("vec_id >= 5")

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(data, queries, k=5).collect()
    }

    def recall(cents):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                data, queries, k=5, n_cells=8, n_probe=3, centroids=cents
            ).collect()
        }
        return len(got & truth) / len(truth)

    seed = ivf_centroids(data, 8)
    trained = ivf_centroids(data, 8, kmeans_rounds=5)
    trained2 = ivf_centroids(data, 8, kmeans_rounds=5)
    assert trained == trained2  # deterministic
    assert trained != seed  # it actually moved
    r_seed, r_trained = recall(seed), recall(trained)
    assert r_trained >= r_seed
    assert r_trained >= 0.5


def _mk_png(w, h, pixels):
    """Minimal PNG encoder for tests: rows of (r,g,b) tuples,
    filter type 0 rows."""
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + b"".join(bytes(p) for p in row) for row in pixels
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_pixel_decode_roundtrip():
    import numpy as np

    from fluent_bit_spark.textprep.multimodal import decode_png_pixels

    pixels = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (200, 210, 220)]]
    px = decode_png_pixels(_mk_png(2, 2, pixels))
    assert px.shape == (2, 2, 3)
    assert px.tolist() == [[list(p) for p in row] for row in pixels]

    # filtered scanlines: Sub (1) and Up (2) must invert correctly
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    row0 = [10, 20, 30, 15, 25, 35]
    row1 = [12, 22, 32, 18, 28, 38]
    sub0 = bytes([1]) + bytes(
        [(row0[i] - (row0[i - 3] if i >= 3 else 0)) & 0xFF for i in range(6)]
    )
    up1 = bytes([2]) + bytes([(row1[i] - row0[i]) & 0xFF for i in range(6)])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(sub0 + up1))
        + chunk(b"IEND", b"")
    )
    px = decode_png_pixels(png)
    assert px.reshape(2, 6).tolist() == [row0, row1]
    assert decode_png_pixels(b"not a png") is None
    assert isinstance(px, np.ndarray)


def test_wav_sample_decode():
    import struct

    from fluent_bit_spark.textprep.multimodal import decode_wav_samples

    samples = [100, -100, 50, -50]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    out, rate, ch = decode_wav_samples(wav)
    assert out.tolist() == samples and rate == 8000 and ch == 1
    assert decode_wav_samples(b"RIFFxxxxWAVE") is None


def _lzw_encode(indices, mcs):
    """Real table-building GIF LZW encoder (test-side reference)."""
    clear = 1 << mcs
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = mcs + 1
    acc = nacc = 0
    out = bytearray()

    def emit(c):
        nonlocal acc, nacc
        acc |= c << nacc
        nacc += code_size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    wbuf = b""
    for px in indices:
        nxt = wbuf + bytes([px])
        if nxt in table:
            wbuf = nxt
        else:
            emit(table[wbuf])
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
            wbuf = bytes([px])
    if wbuf:
        emit(table[wbuf])
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _mk_gif(w, h, palette, indices, interlaced=False, extension=False):
    import struct

    lzw = _lzw_encode(indices, 2)
    blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    pal = b"".join(bytes(p) for p in palette) + b"\x00" * (12 - 3 * len(palette))
    ext = b"\x21\xfe\x05hello\x00" if extension else b""
    iflags = 0x40 if interlaced else 0
    return (
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0x81, 0, 0) + pal + ext
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        + b"\x02" + blocks + b"\x00\x3b"
    )


def test_gif_pixel_decode_roundtrip():
    import numpy as np

    from fluent_bit_spark.textprep.multimodal import decode_gif_pixels

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    # checkerboard exercises the table-building decode path (dict
    # entries + code-width bump), the comment extension the block skip
    idx = [(x + y) % 4 for y in range(20) for x in range(20)]
    px = decode_gif_pixels(_mk_gif(20, 20, pal, idx, extension=True))
    exp = np.array(pal, dtype=np.uint8)[np.array(idx)].reshape(20, 20, 3)
    assert px.shape == (20, 20, 3) and (px == exp).all()

    assert decode_gif_pixels(b"not a gif") is None
    # truncated LZW stream (fewer indices than w*h) -> None, not junk
    assert decode_gif_pixels(_mk_gif(4, 4, pal, [0] * 10)) is None


class _JpegWriter:
    """Test-side reference JPEG encoder (baseline, quant all-1s).

    Huffman tables are flat canonical codes (all DC symbols at 8 bits,
    all AC run/size symbols at 16 bits) — legal per the DHT spec and
    trivially decodable, so the test exercises the decoder's canonical
    code construction without replicating Annex K."""

    DC_SYMS = list(range(12))
    AC_SYMS = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0
        self.dc_codes = {s: (8, i) for i, s in enumerate(self.DC_SYMS)}
        self.ac_codes = {s: (16, i) for i, s in enumerate(self.AC_SYMS)}

    def emit(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = self.acc << 1 | (code >> i & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nacc = 0

    def flush(self):
        while self.nacc:
            self.emit(1, 1)

    def block(self, coefs, pred):
        """Encode one 8x8 block given zigzag-ordered int coefficients;
        returns the new DC predictor."""
        diff = coefs[0] - pred
        t = abs(diff).bit_length()
        length, code = self.dc_codes[t]
        self.emit(code, length)
        if t:
            self.emit(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = coefs[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = self.ac_codes[0xF0]
                self.emit(code, length)
                run -= 16
            s = abs(v).bit_length()
            length, code = self.ac_codes[(run << 4) | s]
            self.emit(code, length)
            self.emit(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            length, code = self.ac_codes[0x00]
            self.emit(code, length)
        return coefs[0]

    def dht(self, cls, tid, syms, length):
        counts = [0] * 16
        counts[length - 1] = len(syms)
        return (
            b"\xff\xc4"
            + (2 + 17 + len(syms)).to_bytes(2, "big")
            + bytes([cls << 4 | tid])
            + bytes(counts)
            + bytes(syms)
        )

    def headers(self, w, h, comps):
        """comps: list of (comp_id, hsamp, vsamp)."""
        zz_q = bytes([1] * 64)
        sof = (
            b"\xff\xc0"
            + (8 + 3 * len(comps)).to_bytes(2, "big")
            + bytes([8])
            + h.to_bytes(2, "big")
            + w.to_bytes(2, "big")
            + bytes([len(comps)])
            + b"".join(bytes([cid, hs << 4 | vs, 0]) for cid, hs, vs in comps)
        )
        sos = (
            b"\xff\xda"
            + (6 + 2 * len(comps)).to_bytes(2, "big")
            + bytes([len(comps)])
            + b"".join(bytes([cid, 0x00]) for cid, _, _ in comps)
            + bytes([0, 63, 0])
        )
        return (
            b"\xff\xd8"
            + b"\xff\xdb" + (2 + 65).to_bytes(2, "big") + b"\x00" + zz_q
            + self.dht(0, 0, self.DC_SYMS, 8)
            + self.dht(1, 0, self.AC_SYMS, 16)
            + sof
            + sos
        )


_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct_quant1(block):
    """Forward orthonormal 8x8 DCT, quant step 1, zigzag order ints."""
    import numpy as np

    u = np.arange(8)
    M = 0.5 * np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16)
    M[0] *= 1 / np.sqrt(2)
    F = M @ (block.astype(np.float64) - 128.0) @ M.T
    flat = np.round(F).astype(int).reshape(64)
    return [int(flat[_JPEG_ZIGZAG[k]]) for k in range(64)]


def _mk_jpeg_gray(img):
    """Encode a grayscale uint8 array (h, w) as baseline JPEG."""
    import numpy as np

    h, w = img.shape
    wr = _JpegWriter()
    head = wr.headers(w, h, [(1, 1, 1)])
    pred = 0
    padded = np.pad(img, ((0, -h % 8), (0, -w % 8)), mode="edge")
    for y0 in range(0, padded.shape[0], 8):
        for x0 in range(0, padded.shape[1], 8):
            pred = wr.block(_fdct_quant1(padded[y0 : y0 + 8, x0 : x0 + 8]), pred)
    wr.flush()
    return head + bytes(wr.out) + b"\xff\xd9"


def _mk_jpeg_flat_color_420(w, h, ycbcr):
    """Flat-color 4:2:0 three-component JPEG (all blocks DC-only)."""
    wr = _JpegWriter()
    head = wr.headers(w, h, [(1, 2, 2), (2, 1, 1), (3, 1, 1)])
    mcux, mcuy = -(-w // 16), -(-h // 16)
    dc = [round(8 * (v - 128)) for v in ycbcr]
    pred = [0, 0, 0]
    for _ in range(mcux * mcuy):
        for comp, nblocks in ((0, 4), (1, 1), (2, 1)):
            coefs = [0] * 64
            coefs[0] = dc[comp]
            for _b in range(nblocks):
                pred[comp] = wr.block(coefs, pred[comp])
    wr.flush()
    return head + bytes(wr.out) + b"\xff\xd9"


def test_gif_interlaced_decode():
    import numpy as np

    from fluent_bit_spark.textprep.multimodal import decode_gif_pixels

    pal = [(1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)]
    h, w = 10, 3
    # source image: row y is palette index y % 4
    img_idx = [[y % 4] * w for y in range(h)]
    # interlaced streams carry rows in pass order 0::8, 4::8, 2::4, 1::2
    pass_rows = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stream = [i for y in pass_rows for i in img_idx[y]]
    px = decode_gif_pixels(_mk_gif(w, h, pal, stream, interlaced=True))
    exp = np.array(pal, dtype=np.uint8)[np.array(img_idx)].repeat(1, axis=1)
    assert px is not None and (px == exp.reshape(h, w, 3)).all()


def test_png_palette_decode():
    import struct
    import zlib

    import numpy as np

    from fluent_bit_spark.textprep.multimodal import decode_png_pixels

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    plte = b"".join(bytes(p) for p in pal)

    # depth 8: one index byte per pixel
    idx8 = [[0, 1, 2], [3, 2, 1]]
    raw8 = b"".join(b"\x00" + bytes(row) for row in idx8)
    png8 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw8))
        + chunk(b"IEND", b"")
    )
    px = decode_png_pixels(png8)
    exp = np.array(pal, dtype=np.uint8)[np.array(idx8)]
    assert px is not None and (px == exp).all()

    # depth 2: four 2-bit indices packed per byte, MSB first
    idx2 = [0, 1, 2, 3, 1]  # 5 pixels -> 2 bytes: 00011011 01xxxxxx
    packed = bytes([0b00011011, 0b01000000])
    png2 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 1, 2, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(b"\x00" + packed))
        + chunk(b"IEND", b"")
    )
    px2 = decode_png_pixels(png2)
    exp2 = np.array(pal, dtype=np.uint8)[np.array(idx2)].reshape(1, 5, 3)
    assert px2 is not None and (px2 == exp2).all()


def test_png_adam7_and_16bit():
    import struct
    import zlib

    import numpy as np

    from fluent_bit_spark.textprep.multimodal import decode_png_pixels

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    # Adam7-interlaced RGB 9x9 gradient: write each pass's sub-image
    # as filter-0 scanlines in pass order, decoder must reassemble
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(9, 9, 3), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, xs, ys in passes:
        sub = img[y0::ys, x0::xs]
        for row in sub:
            raw += b"\x00" + row.tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    px = decode_png_pixels(png)
    assert px is not None and px.shape == (9, 9, 3) and (px == img).all()

    # 16-bit grayscale: decoder keeps the high byte
    img16 = np.array([[0x1234, 0xFF00], [0x0080, 0xABCD]], dtype=">u2")
    raw16 = b"".join(b"\x00" + row.tobytes() for row in img16)
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw16))
        + chunk(b"IEND", b"")
    )
    px16 = decode_png_pixels(png16)
    exp = (img16.astype(np.uint32) >> 8).astype(np.uint8)
    assert px16 is not None and (px16[:, :, 0] == exp).all()


def test_jpeg_restart_interval():
    import numpy as np

    from fluent_bit_spark.textprep.multimodal import decode_jpeg_pixels

    # block-flat 32x8 gray, DRI=2: RST after every 2 MCUs, predictors
    # reset so each segment re-encodes its DC from zero
    blocks = [40, 90, 140, 190]
    img = np.repeat(np.repeat(np.array([blocks], dtype=np.uint8), 8, 0), 8, 1)
    wr = _JpegWriter()
    head = wr.headers(32, 8, [(1, 1, 1)])
    dri = b"\xff\xdd\x00\x04\x00\x02"
    head = head[:-10] + dri + head[-10:]  # insert before the 10-byte SOS
    pred = 0
    for i, v in enumerate(blocks):
        if i and i % 2 == 0:
            wr.flush()
            wr.out += bytes([0xFF, 0xD0 + (i // 2 - 1) % 8])
            pred = 0
        coefs = [0] * 64
        coefs[0] = round(8 * (v - 128))
        pred = wr.block(coefs, pred)
    wr.flush()
    px = decode_jpeg_pixels(head + bytes(wr.out) + b"\xff\xd9")
    assert px is not None and px.shape == (8, 32, 1)
    assert (px[:, :, 0] == img).all()


def test_jpeg_gray_roundtrip_exact():
    import numpy as np

    from fluent_bit_spark.textprep.multimodal import decode_jpeg_pixels

    # block-flat image: every 8x8 block one value -> quant-1 encode is
    # exact, so decode must return the source array bit-for-bit
    blocks = np.array([[10, 200], [128, 255]], dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    px = decode_jpeg_pixels(_mk_jpeg_gray(img))
    assert px is not None and px.shape == (16, 16, 1)
    assert (px[:, :, 0] == img).all()

    # non-flat image with odd dimensions: exercises the AC run-length
    # path and edge cropping; quant-1 round-trip error is sub-half-LSB
    rng = np.random.RandomState(7)
    img2 = rng.randint(0, 256, size=(13, 11), dtype=np.uint8)
    px2 = decode_jpeg_pixels(_mk_jpeg_gray(img2))
    assert px2 is not None and px2.shape == (13, 11, 1)
    assert int(np.abs(px2[:, :, 0].astype(int) - img2.astype(int)).max()) <= 1

    assert decode_jpeg_pixels(b"\xff\xd8junk") is None


def test_jpeg_color_420_flat():
    import numpy as np

    from fluent_bit_spark.textprep.multimodal import decode_jpeg_pixels

    y, cb, cr = 120, 100, 160
    px = decode_jpeg_pixels(_mk_jpeg_flat_color_420(20, 12, (y, cb, cr)))
    assert px is not None and px.shape == (12, 20, 3)
    exp_r = round(y + 1.402 * (cr - 128))
    exp_g = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    exp_b = round(y + 1.772 * (cb - 128))
    flat = px.reshape(-1, 3)
    assert (flat == np.array([exp_r, exp_g, exp_b])).all()


def test_decoders_never_raise_on_malformed_bytes():
    """The decoders run inside mapInPandas on untrusted payloads at
    scale: malformed bytes must yield None, never an exception (one
    raise kills the whole task). Seeded fuzz over random bytes,
    magic-prefixed junk, and bit-flipped/truncated valid files."""
    import random
    import struct

    import numpy as np

    from fluent_bit_spark.textprep.multimodal import (
        decode_gif_pixels,
        decode_header,
        decode_jpeg_pixels,
        decode_png_pixels,
        decode_wav_samples,
    )

    rng = random.Random(20260817)
    wav_data = struct.pack("<h", 100) * 20
    wav_fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    seeds = [
        _mk_png(3, 2, [[(1, 2, 3)] * 3, [(4, 5, 6)] * 3]),
        _mk_gif(5, 4, [(1, 2, 3), (4, 5, 6), (7, 8, 9), (1, 1, 1)],
                [i % 4 for i in range(20)]),
        _mk_jpeg_gray(np.full((10, 9), 77, dtype=np.uint8)),
        _mk_jpeg_flat_color_420(20, 12, (120, 100, 160)),
        b"RIFF" + struct.pack("<I", 36 + len(wav_data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + wav_fmt
        + b"data" + struct.pack("<I", len(wav_data)) + wav_data,
    ]
    decoders = (decode_png_pixels, decode_gif_pixels, decode_jpeg_pixels,
                decode_wav_samples, decode_header)
    for _ in range(4000):
        choice = rng.random()
        if choice < 0.25:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        elif choice < 0.45:
            magic = rng.choice(
                [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8\xff\xe0", b"RIFF"]
            )
            data = magic + bytes(
                rng.randrange(256) for _ in range(rng.randrange(0, 200))
            )
        else:
            base = bytearray(rng.choice(seeds))
            for _ in range(rng.randrange(1, 10)):
                base[rng.randrange(len(base))] = rng.randrange(256)
            if rng.random() < 0.3 and len(base) > 4:
                base = base[: rng.randrange(1, len(base))]
            data = bytes(base)
        for fn in decoders:
            fn(data)  # must return (possibly None), never raise


def test_decode_pixel_stats_spark(spark):
    from fluent_bit_spark.textprep.multimodal import decode_pixel_stats

    png = _mk_png(2, 1, [[(10, 20, 30), (30, 40, 50)]])
    gif = _mk_gif(2, 2, [(10, 20, 30), (50, 60, 70)], [0, 1, 1, 0])
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"junk")), (3, bytearray(gif))],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in decode_pixel_stats(df).collect()}
    assert rows[1]["mean_r"] == 20.0 and rows[1]["mean_b"] == 40.0
    assert rows[1]["width"] == 2 and rows[1]["channels"] == 3
    assert rows[2]["width"] is None and rows[2]["rms"] is None
    assert rows[3]["width"] == 2 and rows[3]["mean_r"] == 30.0
    assert rows[3]["mean_g"] == 40.0 and rows[3]["mean_b"] == 50.0


def test_normalize_text_golden(spark):
    from fluent_bit_spark.textprep.textstats import normalize_text_col

    df = spark.createDataFrame(
        [
            (1, "  HeLLo\t\tWorld \n"),
            (2, "Café Ñandú à la carte"),
            (3, "ctrl\x01char\x1fhere"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["norm_text"] for r in normalize_text_col(df).collect()}
    assert out[1] == "hello world"
    assert out[2] == "cafe nandu a la carte"
    assert out[3] == "ctrlcharhere"


def test_hash_embed_engines_agree(docs):
    from fluent_bit_spark.textprep.simsearch import hash_embed

    arrow = {
        r["doc_id"]: r["embedding"]
        for r in hash_embed(docs, dim=8).select("doc_id", "embedding").collect()
    }
    sql = {
        r["doc_id"]: r["embedding"]
        for r in hash_embed(docs, dim=8, engine="sql")
        .select("doc_id", "embedding")
        .collect()
    }
    assert arrow == sql
    # identical docs -> identical vectors; sum of |v| = token count
    assert arrow[0] == arrow[1]
    assert sum(abs(x) for x in arrow[0]) <= 9  # cancellation allowed
    assert any(x != 0 for x in arrow[0])


def test_resize_nearest_goldens():
    import numpy as np

    from fluent_bit_spark.textprep.multimodal import resize_nearest

    # 2x2 -> 4x4 is pure pixel replication
    px = np.array([[[0], [10]], [[20], [30]]], dtype=np.uint8)
    up = resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 1)
    assert (up[:2, :2, 0] == 0).all() and (up[2:, 2:, 0] == 30).all()
    # 4 rows -> 2 picks source rows (0*4)//2=0 and (1*4)//2=2
    col = np.arange(4, dtype=np.uint8).reshape(4, 1, 1) * 10
    down = resize_nearest(col, 1, 2)
    assert down[:, 0, 0].tolist() == [0, 20]
    # identity when shapes match
    assert (resize_nearest(px, 2, 2) == px).all()


def test_decode_resize_stats_spark(spark):
    from fluent_bit_spark.textprep.multimodal import decode_resize_stats

    # 1x4 vertical gradient 0,10,20,30 -> resize to 4x2 picks rows 0,2
    png = _mk_png(1, 4, [[(v, v, v)] for v in (0, 10, 20, 30)])
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"junk"))], "id long, payload binary"
    )
    rows = {r["id"]: r for r in decode_resize_stats(df, out_w=4, out_h=2).collect()}
    assert rows[1]["src_w"] == 1 and rows[1]["src_h"] == 4
    assert rows[1]["out_w"] == 4 and rows[1]["out_h"] == 2
    assert rows[1]["mean_px"] == 10.0  # (0 + 20) / 2
    assert rows[2]["mean_px"] is None


def test_decode_audio_resample_stats_spark(spark):
    import struct

    from fluent_bit_spark.textprep.multimodal import decode_audio_resample_stats

    def wav(samples):
        data = b"".join(struct.pack("<h", v) for v in samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    df = spark.createDataFrame(
        [(1, bytearray(wav([0, 10, 20, 30]))), (2, bytearray(b"junk"))],
        "id long, payload binary",
    )
    rows = {
        r["id"]: r for r in decode_audio_resample_stats(df, out_n=2).collect()
    }
    # n=4 -> out 2 picks indexes (0*4)//2=0 and (1*4)//2=2: values 0, 20
    assert rows[1]["n_samples"] == 4 and rows[1]["out_n"] == 2
    assert rows[1]["ms_power"] == 200.0
    assert rows[2]["ms_power"] is None


def test_corpus_prep_composite(spark, tmp_path):
    """Composite corpus-prep card: dedup keeps the min-url survivor and
    counts its duplicates; the token gate drops short docs; totals are
    integer-exact."""
    from __spark_entry__ import q_corpus_prep

    rows = [
        # source, doc_id, text, lang
        ("alpha", 1, "the quick brown fox jumps over the lazy dog", "en"),
        ("alpha", 2, "the quick brown fox jumps over the lazy dog", "en"),  # dup of 1
        ("beta", 3, "the quick brown fox jumps over the lazy dog", "en"),   # dup of 1
        ("alpha", 4, "an entirely different document about the sea", "en"),
        ("alpha", 5, "hi", "en"),  # fails ws_tokens >= 3 gate
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, text string, lang string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["domain"], r["pred_lang"]): r
        for r in q_corpus_prep(spark, str(tmp_path)).collect()
    }
    # survivor of the 3-way dup group is min url: https://alpha.com/1
    card = got[("alpha.com", "en")]
    assert card["n_docs"] == 2  # doc 1 (survivor) + doc 4; doc 5 gated out
    assert card["dups_removed"] == 2  # docs 2 and 3 folded into doc 1
    assert card["total_ws_tokens"] == 9 + 7
    assert ("beta.com", "en") not in got  # beta's only doc lost dedup
    total_chars = sum(len(t) for _, d, t, _ in rows if d in (1, 4))
    assert card["total_chars"] == total_chars


def _mk_png_ga(w, h, pixels):
    """Gray+alpha (color type 4) PNG: rows of (gray, alpha) tuples."""
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + b"".join(bytes(p) for p in row) for row in pixels
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_pixel_stats_gray_alpha_channels(spark):
    """2-channel gray+alpha: gray replicates into r/g/b means; the
    alpha plane must never be reported as a color mean."""
    from fluent_bit_spark.textprep.multimodal import decode_pixel_stats

    ga = _mk_png_ga(2, 1, [[(10, 255), (30, 255)]])
    df = spark.createDataFrame([(1, bytearray(ga))], "id long, payload binary")
    row = decode_pixel_stats(df).collect()[0]
    assert row["channels"] == 2
    assert row["mean_r"] == row["mean_g"] == row["mean_b"] == 20.0


def test_lsh_and_ivf_udfs_null_safe(spark):
    """A null or ragged embedding degrades to a null bucket/cell/probe
    (rows drop out of candidate joins), never a task crash."""
    from fluent_bit_spark.textprep.simsearch import (
        bucket_udf,
        cell_assign_udf,
        hyperplanes,
        probe_cells_udf,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, None),
        (3, [0.5, 0.5]),  # ragged: wrong dim
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = hyperplanes(4, 4)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    got = {
        r["vec_id"]: r
        for r in df.select(
            "vec_id",
            bucket_udf(planes)(F.col("embedding")).alias("bucket"),
            cell_assign_udf(cents)(F.col("embedding")).alias("cell"),
            probe_cells_udf(cents, 2)(F.col("embedding")).alias("probes"),
        ).collect()
    }
    assert got[2]["bucket"] is None and got[3]["bucket"] is None
    assert got[2]["cell"] is None and got[3]["cell"] is None
    assert got[2]["probes"] is None and got[3]["probes"] is None
    assert got[1]["cell"] == 0 and got[4]["cell"] == 1
    assert got[1]["bucket"] is not None and got[1]["probes"] is not None


def test_quadratic_baseline_guard(spark):
    """The exact-quadratic baselines refuse oversized inputs unless
    force=True (VERDICT r3 #4) — the probe is an early-out limit scan,
    so it is cheap even when the input is huge."""
    import pytest as _pytest

    from fluent_bit_spark.textprep.dedup import (
        embedding_neardup_pairs,
        ngram_jaccard_pairs,
    )
    from fluent_bit_spark.textprep.simsearch import cosine_topk

    docs = spark.createDataFrame(
        [(i, f"some text {i}", "en") for i in range(8)],
        ["doc_id", "text", "lang"],
    )
    with _pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(docs, 0.5, max_rows=4)
    # force=True runs the exact plan anyway
    assert ngram_jaccard_pairs(docs, 0.99, max_rows=4, force=True).count() == 0

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], ["vec_id", "embedding"]
    )
    with _pytest.raises(ValueError, match="embedding_neardup_lsh"):
        embedding_neardup_pairs(vecs, 0.5, max_rows=4)
    with _pytest.raises(ValueError, match="ivf_topk"):
        cosine_topk(vecs, vecs, k=2, max_queries=4)
    assert cosine_topk(vecs, vecs.limit(2), k=2, max_queries=4).count() == 4
