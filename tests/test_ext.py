"""Semantic checks for [EXT] operators beyond the oracle hash-match:
do the dedup/similarity algorithms actually FIND what they claim to?"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_pgwire_spark.ext.dedup import dedup_exact, dedup_minhash_lsh, dedup_simhash
from duckdb_pgwire_spark.ext.similarity import (
    QUERY_IDS,
    sim_lsh_bucketed,
    sim_topk_bruteforce,
)

from .conftest import SF_DIR


def test_minhash_finds_exact_dups(spark):
    """Every exact-duplicate pair must also be a MinHash/LSH candidate
    (identical docs have identical signatures → share every band)."""
    exact = dedup_exact(spark, SF_DIR)
    groups = [r.content_hash for r in exact.collect()]
    if not groups:
        return  # corpus has no exact dups at this SF
    cand = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_DIR).collect()}
    from duckdb_pgwire_spark.session import load_table

    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    dup_docs = d.filter(F.col("h").isin(groups)).collect()
    by_hash: dict[str, list[int]] = {}
    for r in dup_docs:
        by_hash.setdefault(r.h, []).append(r.doc_id)
    missed = [
        (a, b)
        for ids in by_hash.values()
        for i, a in enumerate(sorted(ids))
        for b in sorted(ids)[i + 1 :]
        if (a, b) not in cand
    ]
    assert not missed, f"exact dups not found by minhash LSH: {missed[:5]}"


def test_simhash_exact_dups_same_fingerprint(spark):
    """Exact duplicates must share a SimHash fingerprint (Hamming 0)."""
    from duckdb_pgwire_spark.session import load_table

    sims = {r.doc_id: r.simhash16 for r in dedup_simhash(spark, SF_DIR).collect()}
    d = load_table(spark, SF_DIR, "documents").select("doc_id", F.md5("text").alias("h"))
    by_hash: dict[str, list[int]] = {}
    for r in d.collect():
        by_hash.setdefault(r.h, []).append(r.doc_id)
    for ids in by_hash.values():
        fps = {sims[i] for i in ids}
        assert len(fps) == 1, f"exact dups {ids} got different simhashes {fps}"


def test_lsh_bucket_contains_near_neighbors(spark):
    """LSH sanity: multi-table candidates must overlap the true top-10
    (a pair is a candidate if ANY of the L tables buckets them
    together). Recall is asserted summed over the three query vectors —
    per-pair probability is ~20% on this near-random corpus, so
    expected hits ≈ 6/30 and P(0) < 1e-3; planes are md5-derived so the
    outcome is deterministic."""
    from duckdb_pgwire_spark.ext.similarity import N_TABLES, lsh_signatures

    truth = sim_topk_bruteforce(spark, SF_DIR)
    top = {(r.query_id, r.vec_id) for r in truth.collect()}
    # recompute per-table bucket membership (the query returns counts)
    b: dict[int, list[int]] = {}
    for r in lsh_signatures(spark, SF_DIR).collect():
        b.setdefault(r.vec_id, [0] * N_TABLES)[r.tbl] = r.bucket
    is_cand = lambda q, v: any(bq == bv for bq, bv in zip(b[q], b[v]))
    hits = sum(1 for (q, v) in top if is_cand(q, v))
    assert hits > 0, "LSH tables share zero true top-10 neighbors — broken hashing"
    # counts query itself must agree with membership map
    counts = {r.query_id: r.n_candidates for r in sim_lsh_bucketed(spark, SF_DIR).collect()}
    for q in QUERY_IDS:
        expected = sum(1 for v in b if v != q and is_cand(q, v))
        assert counts[q] == expected


def test_ivf_kmeans_recall_vs_bruteforce(spark):
    """IVF with k-means centroids (VERDICT r2 item 6): probing the
    N_PROBE nearest of N_CENTROIDS cells must recover a real share of
    the exact top-10 — and the Lloyd iterations must actually move the
    centroids away from the raw seed vectors."""
    import numpy as np

    from duckdb_pgwire_spark.ext.similarity import (
        N_CENTROIDS,
        N_PROBE,
        ivf_candidate_pairs,
    )
    from duckdb_pgwire_spark.session import load_table

    truth = {(r.query_id, r.vec_id) for r in sim_topk_bruteforce(spark, SF_DIR).collect()}
    cand = {(r.query_id, r.vec_id) for r in ivf_candidate_pairs(spark, SF_DIR).collect()}
    recall = len(truth & cand) / len(truth)
    # probing N_PROBE/N_CENTROIDS of the corpus blindly would give
    # ~N_PROBE/N_CENTROIDS recall in expectation; a working index
    # should do at least that, and nontrivially better in practice
    assert recall >= N_PROBE / N_CENTROIDS, f"recall {recall:.2f} below random baseline"
    # Lloyd moves the centroids: one refinement of the raw seeds must
    # change the matrix (means of multi-member cells ≠ a member vector)
    from duckdb_pgwire_spark.ext.similarity import _lloyd_refine

    v = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    seeds = v.filter(F.col("vec_id") < N_CENTROIDS).collect()
    C0 = np.array(
        [list(r.embedding) for r in sorted(seeds, key=lambda r: r.vec_id)],
        dtype=np.float64,
    )
    C1 = _lloyd_refine(spark, v, C0)
    assert not np.allclose(C0, C1), "Lloyd iteration left every centroid unchanged"


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization must preserve most of the exact top-10: 64-dim
    vectors at 127 levels lose little cosine precision."""
    from duckdb_pgwire_spark.ext.similarity import QUERY_IDS, sim_quantized_topk

    exact = {}
    for r in sim_topk_bruteforce(spark, SF_DIR).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    quant = {}
    for r in sim_quantized_topk(spark, SF_DIR).collect():
        quant.setdefault(r.query_id, set()).add(r.vec_id)
    for q in QUERY_IDS:
        overlap = len(exact[q] & quant[q]) / len(exact[q])
        assert overlap >= 0.7, f"query {q}: quantized recall {overlap:.1f}"


def test_cluster_components_match_union_find(spark):
    """dedup_cluster_components must equal a reference union-find over
    the same LSH pairs: transitive closure (A~B, B~C → one cluster) and
    min-doc_id representative."""
    from duckdb_pgwire_spark.ext.dedup import (
        dedup_cluster_components,
        minhash_candidate_pairs,
    )

    pairs = [(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(spark, SF_DIR).collect()]
    assert pairs, "fixture produced no candidate pairs"
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    got = {
        r.doc_id: r.cluster_id
        for r in dedup_cluster_components(spark, SF_DIR).collect()
    }
    assert got == expected
    # at least one transitive merge happened (cluster bigger than a pair)
    from collections import Counter

    assert max(Counter(expected.values()).values()) >= 2


def test_multimodal_decoder_pil_branch_and_fallback():
    """Decoder uses a real codec when one is importable and the payload
    decodes; anything else falls back to the deterministic stub (which
    keeps the oracle green on text-byte fixtures)."""
    from duckdb_pgwire_spark.ext.multimodal import (
        Decoder,
        FakeDecoder,
        _try_import_pil,
    )

    # sandbox has no PIL: import resolves to None, decode == stub
    assert _try_import_pil() is None
    payload = b"hello world"
    assert Decoder.decode(payload, None) == FakeDecoder.decode(payload)

    class _Im:  # what a PIL Image would expose
        width, height, n_frames, format = 640, 480, 1, "PNG"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _PilImage:
        @staticmethod
        def open(buf):
            if buf.read(4) != b"\x89PNG":
                raise ValueError("not an image")
            return _Im()

    # real-image branch: dimensions come from the codec
    fake_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    out = Decoder.decode(fake_png, _PilImage)
    assert out == {"width": 640, "height": 480, "n_frames": 1, "codec": "png"}
    # non-image payload with PIL present: falls back to the stub
    assert Decoder.decode(payload, _PilImage) == FakeDecoder.decode(payload)


def test_salted_join_is_salt_invariant(spark):
    """salted_join must produce exactly the plain join's rows for any
    salt count/seed — salting only changes shuffle layout."""
    from duckdb_pgwire_spark.operators.skew import salted_join
    from duckdb_pgwire_spark.session import load_table

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey")
    for n in (2, 8):
        salted = salted_join(li, o, "l_orderkey", n_salts=n)
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0


def test_lsh_bucket_cap_drops_boilerplate(spark, tmp_path):
    """A band bucket larger than LSH_BUCKET_CAP is dropped entirely
    (boilerplate guard); buckets at or below the cap still pair up."""
    from duckdb_pgwire_spark.ext.dedup import LSH_BUCKET_CAP, minhash_candidate_pairs

    boiler = "the same boilerplate footer text appears on every page"
    rare = "twin document body that appears exactly twice in the corpus"
    rows = [(i, boiler) for i in range(LSH_BUCKET_CAP + 6)]
    rows += [(1000, rare), (1001, rare)]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(1).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    pairs = {
        (r.doc_a, r.doc_b) for r in minhash_candidate_pairs(spark, sf_dir).collect()
    }
    assert pairs == {(1000, 1001)}, (
        f"expected only the under-cap twin pair, got {len(pairs)} pairs"
    )


def test_capped_member_lists_hot_bucket_pre_filtered(spark):
    """r18 skew guard (VERDICT r17 item 1): a degenerate band value
    shared by 1e5 rows must be dropped BEFORE the collect_list — via
    the window count pre-filter on the same exchange — so the hot
    bucket's member array never materializes in one (un-spillable)
    aggregation buffer. Checks both the output (hot bucket gone,
    under-cap bucket intact, singleton pairless) and the plan shape
    (Window + count filter strictly below the collect aggregate)."""
    import re

    from pyspark.sql import functions as F

    from duckdb_pgwire_spark.ext.dedup import capped_member_lists
    from duckdb_pgwire_spark.plans import inspect as I

    hot = spark.range(100_000).selectExpr(
        "CAST(0 AS INT) AS band_idx0", "'hot' AS band_val", "id AS doc_id"
    )
    cold = spark.createDataFrame(
        [(1, "twin", 11), (1, "twin", 12), (2, "lonely", 7)],
        "band_idx0 INT, band_val STRING, doc_id LONG",
    )
    out = capped_member_lists(
        hot.unionByName(cold), ["band_idx0", "band_val"], F.col("doc_id"), cap=64
    )
    plan = I.simple_plan(out)
    # tree prints parents first: the collect agg must appear ABOVE the
    # window count (i.e. the cap filter runs before the collect)
    m_agg = re.search(r"collect_list", plan)
    m_win = re.search(r"\bWindow\b", plan)
    assert m_agg and m_win and m_agg.start() < m_win.start(), plan
    assert plan.count("hashpartitioning") <= 2, plan  # window+agg share one exchange
    rows = out.collect()
    assert [(r.band_idx0, r.band_val, list(r.ms)) for r in rows] == [
        (1, "twin", [11, 12])
    ], rows


def test_ivf_lloyd_sampling_cap_path(spark, monkeypatch):
    """The 100 TB guard: above LLOYD_SAMPLE_MAX the Lloyd refinement
    reads a deterministic modulus sample instead of the full corpus.
    Force the cap below the fixture size and check the index still
    produces candidates for every query (the sampled centroids are a
    valid index, just trained on fewer vectors)."""
    from duckdb_pgwire_spark.ext import similarity

    monkeypatch.setattr(similarity, "LLOYD_SAMPLE_MAX", 50)
    out = {
        r.query_id: r.n_candidates
        for r in similarity.sim_ivf_probe(spark, SF_DIR).collect()
    }
    assert set(out) == set(similarity.QUERY_IDS)
    assert all(n > 0 for n in out.values())


def test_mm_frame_sample_multibyte_chars(spark, tmp_path):
    """r5 verdict item: the frame kernel sliced UTF-8 BYTES while the
    oracle slices CHARS — they agreed only on ASCII fixtures. The kernel
    now decodes before slicing; verify on multibyte text against DuckDB
    running the registry oracle on the same rows."""
    import duckdb

    from duckdb_pgwire_spark.ext.multimodal import mm_frame_sample
    from duckdb_pgwire_spark.registry import load_all

    rows = [
        (1, "héllo wörld — ünïcode ça va? ßßß çœur naïve 日本語テキスト"),
        (2, "数据管道中的多字节文本样本，用于帧切片测试。"),
        (3, "plain ascii text long enough to slice into frames easily"),
    ]
    docdir = tmp_path / "mbdocs"
    spark.createDataFrame(
        [(i, t, "xx", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(docdir / "documents.parquet"))

    got = sorted(
        tuple(r) for r in mm_frame_sample(spark, str(docdir)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docdir}/documents.parquet/*.parquet')"
    )
    oracle = load_all()["mm_frame_sample"].oracle
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    con.close()
    assert got == want


def test_imagecodec_round_trips_and_refusals():
    """Pure-Python BMP/PPM codec (r7 verdict item 3): crafted images
    exercise row padding (odd widths), bottom-up vs top-down rows,
    8-bpp palettes, PPM comment headers, and the loud refusals for
    compressed payloads."""
    import struct

    from duckdb_pgwire_spark.ext.imagecodec import (
        decode_bmp,
        decode_image,
        decode_ppm,
        encode_bmp_gray,
        encode_ppm_gray,
    )

    px = [(11 * i + 3) % 256 for i in range(5 * 7)]
    for enc, dec in ((encode_bmp_gray, decode_bmp), (encode_ppm_gray, decode_ppm)):
        img = dec(enc(5, 7, px))  # width 5 → BMP rows padded to 16 bytes
        assert (img.width, img.height, img.gray.tolist()) == (5, 7, px)
    # sniffing dispatch
    assert decode_image(encode_bmp_gray(2, 2, [1, 2, 3, 4])).codec == "bmp"
    assert decode_image(encode_ppm_gray(2, 2, [1, 2, 3, 4])).codec == "ppm"
    assert decode_image(b"not an image at all") is None
    # top-down BMP (negative height): same decoded pixel order
    b = bytearray(encode_bmp_gray(3, 2, [1, 2, 3, 4, 5, 6]))
    struct.pack_into("<i", b, 22, -2)
    row = (3 * 3 + 3) & ~3
    r0, r1 = bytes(b[54 : 54 + row]), bytes(b[54 + row : 54 + 2 * row])
    b[54 : 54 + row], b[54 + row : 54 + 2 * row] = r1, r0
    assert decode_bmp(bytes(b)).gray.tolist() == [1, 2, 3, 4, 5, 6]
    # 8-bpp palette BMP
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    w, h, rs = 4, 2, (4 + 3) & ~3
    p8 = [10, 20, 30, 40, 50, 60, 70, 80]
    body = b"".join(
        bytes(p8[y * w : (y + 1) * w]) + b"\x00" * (rs - w)
        for y in range(h - 1, -1, -1)
    )
    off = 14 + 40 + len(pal)
    hdr = (
        b"BM" + struct.pack("<IHHI", off + rs * h, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, rs * h, 0, 0, 256, 0)
    )
    assert decode_bmp(hdr + pal + body).gray.tolist() == p8
    # PGM (P5) + comment line in the header
    pgm = b"P5\n# a comment\n3 1\n255\n" + bytes([9, 8, 7])
    assert decode_ppm(pgm).gray.tolist() == [9, 8, 7]
    # compressed BMP refuses loudly, not fake values
    c = bytearray(encode_bmp_gray(3, 2, [0] * 6))
    struct.pack_into("<I", c, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(c))
    # r10: 16-bit (2-byte big-endian) samples + maxval normalization
    wide = b"P5\n2 1\n65535\n" + struct.pack(">HH", 0xABCD, 0x1234)
    assert decode_ppm(wide).gray.tolist() == [
        0xABCD * 255 // 65535, 0x1234 * 255 // 65535
    ]
    wide_rgb = b"P6\n1 1\n65535\n" + struct.pack(">HHH", 65535, 0, 32768)
    from duckdb_pgwire_spark.ext.imagecodec import _luma

    assert decode_ppm(wide_rgb).gray.tolist() == [
        _luma(65535, 0, 32768) * 255 // 65535
    ]
    # sub-255 maxval scales per the Netpbm spec (samples are relative
    # to maxval, not raw bytes)
    assert decode_ppm(b"P5\n3 1\n15\n" + bytes([15, 0, 5])).gray.tolist() == [
        255, 0, 5 * 255 // 15
    ]
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n70000\n" + b"\x00" * 4)  # maxval > 16-bit
    # a sample above maxval would scale past the 8-bit gray contract —
    # refuse loudly (code review r10)
    with pytest.raises(ValueError, match="exceeds"):
        decode_ppm(b"P5\n1 1\n15\n" + bytes([255]))


def test_imagecodec_png():
    """PNG via stdlib zlib (r8 verdict item 4): gray round trip with
    the deterministic stored-block size formula, all five scanline
    filters over RGB/RGBA/gray-alpha (filtered IN-TEST, so the
    unfilter direction is verified independently), palette color,
    and the loud refusals (Adam7 interlace, 16-bit depth)."""
    import random
    import struct
    import zlib

    from duckdb_pgwire_spark.ext.imagecodec import (
        _luma,
        _paeth,
        _PNG_SIG,
        _png_chunk,
        decode_image,
        decode_png,
        encode_png_gray,
    )

    rng = random.Random(7)
    w, h = 13, 9
    px = [rng.randrange(256) for _ in range(w * h)]
    p = encode_png_gray(w, h, px)
    assert len(p) == 68 + h * (w + 1)  # the mm_decode oracle's formula
    d = decode_png(p)
    assert (d.width, d.height, d.codec, d.gray.tolist()) == (w, h, "png", px)
    assert decode_image(p).gray.tolist() == px

    def filt_rows(rows, chans, ftypes):
        # ENCODE-side filtering, written here (not in the codec) so
        # the decoder's unfiltering is checked against an independent
        # implementation of the spec
        stride = len(rows[0])
        prev = bytes(stride)
        out = bytearray()
        for row, ft in zip(rows, ftypes):
            out.append(ft)
            line = bytearray(row)
            for i in range(stride):
                left = line[i - chans] if i >= chans else 0
                up, ul = prev[i], prev[i - chans] if i >= chans else 0
                delta = {
                    0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: _paeth(left, up, ul),
                }[ft]
                out.append((line[i] - delta) & 0xFF)
            prev = bytes(line)
        return bytes(out)

    def make_png(w, h, ctype, raw, plte=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        chunks = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        if plte:
            chunks += _png_chunk(b"PLTE", plte)
        return (
            chunks
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # RGB, one row per filter type
    w, h, chans = 7, 5, 3
    rows = [bytes(rng.randrange(256) for _ in range(w * chans)) for _ in range(h)]
    d = decode_png(make_png(w, h, 2, filt_rows(rows, chans, [0, 1, 2, 3, 4])))
    assert d.gray.tolist() == [
        _luma(r[x * 3], r[x * 3 + 1], r[x * 3 + 2]) for r in rows for x in range(w)
    ]
    # RGBA / gray+alpha (alpha ignored for luma)
    for ctype, chans in ((6, 4), (4, 2)):
        w = h = 3
        rows = [
            bytes(rng.randrange(256) for _ in range(w * chans)) for _ in range(h)
        ]
        d = decode_png(make_png(w, h, ctype, filt_rows(rows, chans, [4, 4, 1])))
        want = (
            [_luma(r[x * 4], r[x * 4 + 1], r[x * 4 + 2]) for r in rows for x in range(w)]
            if ctype == 6
            else [r[x * 2] for r in rows for x in range(w)]
        )
        assert d.gray.tolist() == want, ctype
    # palette
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    raw = b"\x00" + bytes(idx[:4]) + b"\x00" + bytes(idx[4:])
    d = decode_png(make_png(4, 2, 3, raw, plte=pal))
    lut = [_luma(pal[i * 3], pal[i * 3 + 1], pal[i * 3 + 2]) for i in range(4)]
    assert d.gray.tolist() == [lut[i] for i in idx]
    # invalid depth/color-type combinations stay loud (spec matrix)
    for depth, ctype in ((16, 3), (4, 2), (2, 6), (3, 0)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, 0)
        bad = (
            _PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(bad)


def test_imagecodec_png_depths():
    """r10: the non-8-bit depth plane — 16-bit gray/RGB (high-byte
    reduction), sub-byte gray (1/2/4-bit MSB-first packing with
    255/(2^d-1) scaling), and sub-byte palette indices — all crafted
    byte-by-byte from the spec, no encoder shared with the decoder."""
    import struct
    import zlib

    from duckdb_pgwire_spark.ext.imagecodec import (
        _luma,
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    def make_png(w, h, depth, ctype, raw, plte=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        chunks = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        if plte:
            chunks += _png_chunk(b"PLTE", plte)
        return (
            chunks
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # 16-bit gray, 2x2: big-endian samples; decode takes the high byte
    samples = [0x12EF, 0x3400, 0xABCD, 0xFF01]
    raw = (
        b"\x00" + struct.pack(">HH", *samples[:2])
        + b"\x00" + struct.pack(">HH", *samples[2:])
    )
    d = decode_png(make_png(2, 2, 16, 0, raw))
    assert d.gray.tolist() == [s >> 8 for s in samples]
    # 16-bit RGB, 2x1, with a Sub filter (bpp must be 6, not 3 — a
    # byte-offset bug would corrupt the second pixel)
    p0 = (0x11AA, 0x22BB, 0x33CC)
    p1 = (0x4401, 0x5502, 0x6603)
    plain = struct.pack(">HHHHHH", *p0, *p1)
    sub = bytearray(plain)
    for i in range(11, 5, -1):  # encode Sub: subtract byte 6 positions left
        sub[i] = (sub[i] - plain[i - 6]) & 0xFF
    d = decode_png(make_png(2, 1, 16, 2, b"\x01" + bytes(sub)))
    assert d.gray.tolist() == [
        _luma(p0[0] >> 8, p0[1] >> 8, p0[2] >> 8),
        _luma(p1[0] >> 8, p1[1] >> 8, p1[2] >> 8),
    ]
    # 1-bit gray 10x2 (stride 2 bytes, MSB first): 1 → 255, 0 → 0
    bits_r0 = 0b1011001110_000000
    bits_r1 = 0b0100110001_000000
    raw = (
        b"\x00" + struct.pack(">H", bits_r0)
        + b"\x00" + struct.pack(">H", bits_r1)
    )
    d = decode_png(make_png(10, 2, 1, 0, raw))
    want = [255 * ((bits_r0 >> (15 - i)) & 1) for i in range(10)] + [
        255 * ((bits_r1 >> (15 - i)) & 1) for i in range(10)
    ]
    assert d.gray.tolist() == want
    # 2-bit gray 5x1: values 0..3 scale by 85
    vals = [3, 0, 2, 1, 3]
    packed = bytes(
        [
            (vals[0] << 6) | (vals[1] << 4) | (vals[2] << 2) | vals[3],
            vals[4] << 6,
        ]
    )
    d = decode_png(make_png(5, 1, 2, 0, b"\x00" + packed))
    assert d.gray.tolist() == [v * 85 for v in vals]
    # 4-bit palette 3x1: indices into a 16-entry PLTE
    pal = bytes(range(48))  # 16 RGB triples 0..47
    idx = [15, 0, 7]
    packed = bytes([(idx[0] << 4) | idx[1], idx[2] << 4])
    d = decode_png(make_png(3, 1, 4, 3, b"\x00" + packed, plte=pal))
    lut = [_luma(pal[i * 3], pal[i * 3 + 1], pal[i * 3 + 2]) for i in range(16)]
    assert d.gray.tolist() == [lut[i] for i in idx]
    # out-of-range sub-byte palette index is loud
    with pytest.raises(ValueError, match="palette index"):
        decode_png(make_png(1, 1, 4, 3, b"\x00\xf0", plte=bytes(9)))


def test_imagecodec_png_adam7():
    """r10: Adam7 interlace — the spec's 8x8 pass-number grid decoded
    from a hand-laid stream (each pixel's value IS its pass number, so
    any pass-geometry error misplaces a value), plus round trips of
    awkward sizes through an in-test interlaced encoder and equality
    with the non-interlaced decode of the same image."""
    import random
    import struct
    import zlib

    from duckdb_pgwire_spark.ext.imagecodec import (
        _ADAM7,
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png_gray,
    )

    def encode_adam7_gray(w, h, px):
        # independent ENCODER: emits the 7 passes in spec order with
        # filter-0 scanlines (sub-images built by the pass grids)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            for ry in range(ph):
                raw.append(0)
                raw += bytes(
                    px[(y0 + ry * dy) * w + (x0 + rx * dx)]
                    for rx in range(pw)
                )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    # the spec's 8x8 grid: pixel (x, y) belongs to exactly one pass
    grid = [
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ]
    px = [v for row in grid for v in row]
    d = decode_png(encode_adam7_gray(8, 8, px))
    assert d.gray.tolist() == px
    # awkward sizes (passes go empty; partial pass rows): interlaced
    # decode must equal the pixels AND the non-interlaced decode
    rng = random.Random(11)
    for w, h in ((1, 1), (2, 3), (5, 5), (7, 4), (3, 9), (16, 2)):
        px = [rng.randrange(256) for _ in range(w * h)]
        di = decode_png(encode_adam7_gray(w, h, px))
        assert (di.width, di.height, di.gray.tolist()) == (w, h, px), (w, h)
        dp = decode_png(encode_png_gray(w, h, px))
        assert di.gray.tolist() == dp.gray.tolist(), (w, h)


def test_mm_decoder_layers():
    """Decoder.decode: real imagecodec first (no library), FakeDecoder
    only for unrecognized payloads; a recognized-but-compressed payload
    does not silently fall through to fake dimensions."""
    import struct

    from duckdb_pgwire_spark.ext.imagecodec import encode_bmp_gray
    from duckdb_pgwire_spark.ext.multimodal import Decoder

    meta = Decoder.decode(encode_bmp_gray(6, 4, list(range(24))))
    assert (meta["width"], meta["height"], meta["codec"]) == (6, 4, "bmp")
    fake = Decoder.decode(b"plain text payload")
    assert fake["codec"] == "fake"
    c = bytearray(encode_bmp_gray(3, 2, [0] * 6))
    struct.pack_into("<I", c, 30, 1)
    # compressed + no PIL in this container → deterministic fake, but
    # the codec itself refused (covered above); here just no crash
    out = Decoder.decode(bytes(c), pil_image=None)
    assert out["codec"] == "fake"


# ----------------------------------------- hierarchical (two-level) k-means


def test_hier_index_assignment_is_exact_two_level(spark):
    """build_hier_index + hier_assign: every vector's cell must equal
    the two-level rule computed independently on the driver — nearest
    coarse centroid, then nearest fine centroid WITHIN that coarse cell
    (fixture is 500×64: driver verification is trivial; the code path
    is the same one that runs when SemDeDup's k outgrows the flat cap)."""
    import numpy as np

    from duckdb_pgwire_spark.ext.similarity import (
        _cos_to_centroids,
        build_hier_index,
        hier_assign,
        load_table_parallel,
    )

    v = (
        load_table_parallel(spark, SF_DIR, "embeddings", parts=5)
        .select("vec_id", "embedding")
        .cache()
    )
    n = v.count()
    idx = build_hier_index(spark, v, n, n_cent=8)  # kc=3, kf=3
    assert idx.coarse.shape[0] == 3 and idx.kf == 3
    got = {r.vec_id: r.cell for r in hier_assign(v, idx).collect()}
    assert len(got) == n

    fine_rows = idx.fine.collect()
    fine_by_coarse: dict[int, list] = {}
    for r in fine_rows:
        fine_by_coarse.setdefault(r.coarse, []).append(
            (r.fine_id, np.array(r.centroid))
        )
    E = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in v.collect()
    }
    for vid, e in E.items():
        S = _cos_to_centroids(e[None, :], idx.coarse)
        coarse = int(np.argmax(S, axis=1)[0])
        fines = sorted(fine_by_coarse[coarse])
        Cf = np.stack([c for _, c in fines])
        a = int(np.argmax(_cos_to_centroids(e[None, :], Cf), axis=1)[0])
        assert got[vid] == fines[a][0], (vid, coarse)


def test_semdedup_hier_path_semantics(spark, monkeypatch):
    """Force SemDeDup onto the hierarchical path (cap lowered under the
    fixture's k=8) and verify the DEDUP CONTRACT holds for whatever
    assignment the two-level index produced: within every cell, the
    higher-id member of any pair with cosine > TH is dropped, everything
    else kept — recomputed exactly on the driver."""
    import numpy as np

    import duckdb_pgwire_spark.ext.similarity as sim
    from duckdb_pgwire_spark.ext.dedup import SEMDEDUP_TH, dedup_semantic_kmeans
    from duckdb_pgwire_spark.session import load_table

    monkeypatch.setattr(sim, "HIER_K_MAX_FLAT", 4)
    rows = dedup_semantic_kmeans(spark, SF_DIR).collect()
    assert len(rows) == 500 and {r.vec_id for r in rows} == set(range(500))

    E = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def cos(a, b):
        # sequential fold, matching the engine kernels
        s = sa = sb = 0.0
        for i in range(len(a)):
            s += a[i] * b[i]
            sa += a[i] * a[i]
            sb += b[i] * b[i]
        return s / (np.sqrt(sa) * np.sqrt(sb))

    by_cell: dict[int, list[int]] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r.vec_id)
    assert len(by_cell) > 1  # the index actually partitioned the corpus
    dropped = set()
    for members in by_cell.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                if cos(E[a], E[b]) > SEMDEDUP_TH:
                    dropped.add(b)
    got_kept = {r.vec_id: r.kept for r in rows}
    for vid in range(500):
        assert got_kept[vid] == (vid not in dropped), vid


def test_ivf_probe_hier_path(spark, monkeypatch):
    """sim_ivf_probe under a forced two-level index must equal the
    driver-side recomputation of the same deterministic construction:
    coarse/fine argmax assignment + two-level probe lists."""
    import numpy as np

    import duckdb_pgwire_spark.ext.similarity as sim
    from duckdb_pgwire_spark.session import load_table

    monkeypatch.setattr(sim, "HIER_K_MAX_FLAT", 4)
    got = {
        r.query_id: r.n_candidates
        for r in sim.sim_ivf_probe(spark, SF_DIR).collect()
    }

    v = (
        sim.load_table_parallel(spark, SF_DIR, "embeddings", parts=5)
        .select("vec_id", "embedding")
        .cache()
    )
    idx = sim.build_hier_index(spark, v, 500, 8)  # deterministic rebuild
    fine_by_coarse: dict[int, list] = {}
    for r in idx.fine.collect():
        fine_by_coarse.setdefault(r.coarse, []).append(
            (r.fine_id, np.array(r.centroid, dtype=np.float64))
        )
    E = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def two_level_cell(e):
        coarse = int(np.argmax(sim._cos_to_centroids(e[None, :], idx.coarse)))
        fines = sorted(fine_by_coarse[coarse])
        Cf = np.stack([c for _, c in fines])
        return fines[int(np.argmax(sim._cos_to_centroids(e[None, :], Cf)))][0]

    cells = {vid: two_level_cell(e) for vid, e in E.items()}
    ccids = np.arange(idx.coarse.shape[0])
    want = {}
    for qid in sim.QUERY_IDS:
        Sc = sim._cos_to_centroids(E[qid][None, :], idx.coarse)[0]
        pc = [int(c) for c in np.lexsort((ccids, -Sc))[: sim.N_PROBE]]
        cand = sorted(f for c in pc for f in fine_by_coarse.get(c, []))
        Cf = np.stack([c for _, c in cand])
        gids = [g for g, _ in cand]
        Sf = sim._cos_to_centroids(E[qid][None, :], Cf)[0]
        probes = {
            int(gids[i])
            for i in np.lexsort((np.arange(len(gids)), -Sf))[: sim.N_PROBE]
        }
        want[qid] = sum(
            1 for vid, c in cells.items() if c in probes and vid != qid
        )
    assert got == want


def test_audiocodec_round_trips_and_refusals():
    """WAV codec: PCM16 round trip, 8-bit recentring, stereo
    interleave, unknown-chunk walking with word alignment, and loud
    refusals for non-PCM / truncated payloads."""
    import struct

    import pytest

    from duckdb_pgwire_spark.ext.audiocodec import (
        decode_wav,
        encode_wav_pcm16,
    )

    # mono 16-bit round trip, exact samples and header arithmetic
    s = [0, 100, -100, 32767, -32768, 7]
    raw = encode_wav_pcm16(8000, s)
    assert len(raw) == 44 + 2 * len(s)
    au = decode_wav(raw)
    assert (au.sample_rate, au.n_channels, au.bits) == (8000, 1, 16)
    assert au.samples == s and au.n_frames == len(s)

    # stereo: interleaved samples, n_frames halves
    st = encode_wav_pcm16(44100, [1, -1, 2, -2], n_channels=2)
    au2 = decode_wav(st)
    assert (au2.n_channels, au2.n_frames, au2.samples) == (2, 2, [1, -1, 2, -2])

    # unknown chunk BEFORE fmt/data is skipped, odd length word-aligned
    body = raw[12:]
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 → pad to 4
    riffed = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(body)) + b"WAVE" + junk + body
    assert decode_wav(riffed).samples == s

    # 8-bit unsigned PCM recentres to signed
    data8 = bytes([128, 255, 0, 130])
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (
        b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVEfmt "
        + struct.pack("<I", 16) + fmt8 + b"data" + struct.pack("<I", 4) + data8
    )
    assert decode_wav(wav8).samples == [0, 127, -128, 2]

    # IEEE-float WAV (format tag 3, r12): normalized floats scale to
    # the 16-bit grid, clipping out-of-range; 64-bit doubles too
    import numpy as np

    def _wavf(bits, payload):
        fmtf = struct.pack(
            "<HHIIHH", 3, 1, 8000, 8000 * bits // 8, bits // 8, bits
        )
        return (
            b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVEfmt "
            + struct.pack("<I", 16) + fmtf + b"data"
            + struct.pack("<I", len(payload)) + payload
        )

    f32 = np.array([1.0, -1.0, 0.5, 0.0, 2.0, -3.0], dtype="<f4").tobytes()
    auf = decode_wav(_wavf(32, f32))
    assert auf.bits == 16 and auf.samples == [
        32767, -32767, 16384, 0, 32767, -32768,
    ]
    f64 = np.array([0.25, -0.5], dtype="<f8").tobytes()
    assert decode_wav(_wavf(64, f64)).samples == [8192, -16384]

    # 24-bit signed PCM sign-extends; 32-bit decodes as stored
    d24 = b"\x01\x00\x00" + b"\xff\xff\xff" + b"\x00\x00\x80"
    fmt24 = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    wav24 = (
        b"RIFF" + struct.pack("<I", 36 + 9) + b"WAVEfmt "
        + struct.pack("<I", 16) + fmt24 + b"data" + struct.pack("<I", 9)
        + d24
    )
    assert decode_wav(wav24).samples == [1, -1, -(1 << 23)]
    d32 = struct.pack("<ii", 70000, -70000)
    fmt32 = struct.pack("<HHIIHH", 1, 1, 8000, 32000, 4, 32)
    wav32 = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVEfmt "
        + struct.pack("<I", 16) + fmt32 + b"data" + struct.pack("<I", 8)
        + d32
    )
    assert decode_wav(wav32).samples == [70000, -70000]

    # ADPCM (format tag 2) still refuses loudly
    fmta = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    wava = (
        b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVEfmt "
        + struct.pack("<I", 16) + fmta + b"data" + struct.pack("<I", 4)
        + b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError):
        decode_wav(wava)

    # truncated data chunk / non-RIFF refuse
    with pytest.raises(ValueError):
        decode_wav(raw[: len(raw) - 3])
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + raw[4:])
    # encoder input validation
    with pytest.raises(ValueError):
        encode_wav_pcm16(8000, [40000])
    with pytest.raises(ValueError):
        encode_wav_pcm16(8000, [1, 2, 3], n_channels=2)


def test_knn_label_agreement_multibatch_accumulation(spark):
    """The per-partition top-k accumulator must be exact when a
    partition spans MANY Arrow batches (the fixture corpus fits one
    batch, so the fold-across-batches path — including the mid-loop
    truncation to K — would otherwise go untested). Shrinking
    maxRecordsPerBatch to 7 forces ~18 batches per partition; the
    result must be bit-identical to the single-batch run."""
    from duckdb_pgwire_spark.ext.similarity import sim_knn_label_agreement

    sf = "/root/testdata/sf0.01"
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    base = sorted(
        tuple(r) for r in sim_knn_label_agreement(spark, sf).collect()
    )
    try:
        spark.conf.set(key, "7")
        tiny = sorted(
            tuple(r) for r in sim_knn_label_agreement(spark, sf).collect()
        )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert tiny == base
    # 500 vectors, modulus = max(1, 500 // TARGET_ANCHORS) = 5 →
    # vec_ids 0,5,...,495 = 100 anchors (fixed-size mode, r11)
    assert len(base) == 100


def test_jpegcodec_round_trips_and_refusals():
    """Baseline JPEG (ext/jpegcodec, r11): flat images round-trip
    EXACTLY at flat_q=1 (constant block → DC-only DCT, no quantization
    loss); arbitrary content is bounded by DCT rounding (≤1 at q=1,
    small at Annex K tables); restart markers and 3-component
    interleave decode; non-baseline variants refuse loudly."""
    import numpy as np

    from duckdb_pgwire_spark.ext.imagecodec import decode_image
    from duckdb_pgwire_spark.ext.jpegcodec import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    # flat: bit-exact, every block size parity
    for v, (w, h) in [(0, (8, 8)), (128, (16, 8)), (255, (13, 9))]:
        img = decode_jpeg(encode_jpeg_gray(w, h, [v] * (w * h), flat_q=1))
        assert (img.width, img.height, img.codec) == (w, h, "jpeg")
        assert set(img.gray) == {v}

    # noise at q=1: DCT-rounding bound only
    rng = np.random.RandomState(11)
    w, h = 31, 13
    px = rng.randint(0, 256, size=w * h).tolist()
    for kwargs in (
        {},
        {"restart_interval": 2},
        {"color": True},
        {"color": True, "restart_interval": 3},
    ):
        got = decode_jpeg(encode_jpeg_gray(w, h, px, flat_q=1, **kwargs)).gray
        assert max(abs(a - b) for a, b in zip(px, got)) <= 1, kwargs

    # Annex K tables: lossy but bounded on a smooth gradient
    grad = [(x * 3 + y * 5) % 256 for y in range(h) for x in range(w)]
    got = decode_jpeg(encode_jpeg_gray(w, h, grad)).gray
    assert max(abs(a - b) for a, b in zip(grad, got)) <= 8

    # decode_image sniffs the SOI magic
    img = decode_image(encode_jpeg_gray(8, 8, [9] * 64, flat_q=1))
    assert img is not None and img.codec == "jpeg"

    # refusals: progressive SOF2, bad magic
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05aaa\xff\xd9")
    with _pytest.raises(ValueError):
        decode_jpeg(b"GIF89a not a jpeg")

    # undeclared quant table (DQT stripped) is the corrupt-payload
    # class, not a KeyError leak that would kill a mapInPandas task
    full = encode_jpeg_gray(8, 8, [9] * 64, flat_q=1)
    i = full.find(b"\xff\xdb")
    seg_len = int.from_bytes(full[i + 2 : i + 4], "big")
    with _pytest.raises(ValueError):
        decode_jpeg(full[:i] + full[i + 2 + seg_len :])

    # the mm_jpeg_decode FIXTURES must actually carry restart markers
    # on the wide shapes (review r11: the old %3==0 gate forced w=8,
    # too few MCUs for the encoder to ever emit RSTn — the resync
    # path went untested)
    from duckdb_pgwire_spark.ext.multimodal import _mm_fixture_jpeg

    rst = [bytes([0xFF, 0xD0 + k]) for k in range(8)]
    assert any(
        m in _mm_fixture_jpeg(doc_id)
        for doc_id in (2, 5, 8, 11)
        for m in rst
    )
    for doc_id in (2, 5):
        img2 = decode_jpeg(_mm_fixture_jpeg(doc_id))
        w2, h2 = 8 * (1 + doc_id % 3), 8 * (1 + doc_id % 2)
        v, v2 = (doc_id * 37) % 256, (doc_id * 11) % 256
        assert sum(img2.gray) == 64 * v2 + (w2 * h2 - 64) * v


def test_propagate_min_labels_huge_ids(spark):
    """r17 (VERDICT item 4): the monotone-sum convergence statistic
    accumulates in DECIMAL(38,0), so label sums near 2^62 cannot wrap
    modulo 2^64 and alias two different label states. Two components
    with ids around 2^62 must converge to their min-id cluster."""
    from duckdb_pgwire_spark.ext.dedup import propagate_min_labels

    base = 1 << 62
    pairs = spark.createDataFrame(
        [
            (base + 1, base + 2),
            (base + 2, base + 3),  # chain → cluster base+1
            (base + 10, base + 11),  # separate pair → cluster base+10
        ],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in propagate_min_labels(pairs).collect()
    }
    assert got == {
        (base + 1, base + 1),
        (base + 2, base + 1),
        (base + 3, base + 1),
        (base + 10, base + 10),
        (base + 11, base + 10),
    }
