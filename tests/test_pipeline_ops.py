"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — semantics tests on crafted data plus numpy/duckdb
cross-checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from crawler_spark.operators.similarity import brute_force_topk, lsh_topk
from crawler_spark.operators.text_analysis import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " extra tail words here"),  # near dup of 0
        (3, "completely different content about spark shuffle partitions and joins"),
        (4, "la casa de la playa es una de las mejores en la costa para vacaciones"),
        (5, "这是一个中文文档 用于测试语言识别"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_keeps_min_id(self, spark, docs):
        out = exact_dedup(docs).orderBy("doc_id").collect()
        ids = [r["doc_id"] for r in out]
        assert 0 in ids and 1 not in ids  # dup dropped, first id kept
        assert {2, 3, 4, 5, 6} <= set(ids)

    def test_matches_duckdb(self, spark, docs):
        import duckdb

        pdf = docs.toPandas()
        expected = duckdb.sql(
            """
            SELECT min(doc_id) AS doc_id FROM pdf
            GROUP BY md5(text) ORDER BY doc_id
            """
        ).fetchall()
        got = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
        assert got == [e[0] for e in expected]


class TestMinHash:
    def test_identical_docs_identical_signatures(self, spark, docs):
        sigs = {r["doc_id"]: r["minhash"] for r in minhash_signatures(docs).collect()}
        assert sigs[0] == sigs[1]
        assert sigs[0] != sigs[3]

    def test_lsh_finds_exact_and_near_dups(self, spark, docs):
        pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()}
        assert (0, 1) in pairs  # exact dup always collides
        # disjoint docs never collide on a full band
        assert (0, 3) not in pairs and (3, 4) not in pairs


class TestJaccard:
    def test_exact_pairs(self, spark, docs):
        pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
        d = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
        assert d[(0, 1)] == 1.0
        assert (0, 2) in d and 0.5 <= d[(0, 2)] < 1.0
        assert (0, 3) not in d

    def test_matches_python(self, spark, docs):
        def shingles(t, k=3):
            toks = t.lower().split()
            if len(toks) < k:
                return {" ".join(toks)}
            return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

        a, b = shingles("the quick brown fox jumps over the lazy dog and runs far away today"), \
            shingles("the quick brown fox jumps over the lazy dog and runs far away today extra tail words here")
        expect = round(len(a & b) / len(a | b), 6)
        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()}
        assert got[(0, 2)] == expect


class TestTwoStageNearDup:
    def test_verify_filters_false_positives(self, spark, docs):
        from crawler_spark.operators.dedup import near_dup_pairs

        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in near_dup_pairs(docs, threshold=0.5).collect()}
        assert got[(0, 1)] == 1.0          # exact dup survives with jaccard 1
        assert (0, 3) not in got           # disjoint docs never verified in
        # every verified pair is an LSH candidate (stage 2 only filters)
        from crawler_spark.operators.dedup import minhash_lsh_pairs

        cand = {(r["id_a"], r["id_b"])
                for r in minhash_lsh_pairs(docs).collect()}
        assert set(got) <= cand

    def test_jaccard_matches_exact_op(self, spark, docs):
        from crawler_spark.operators.dedup import near_dup_pairs, ngram_jaccard_pairs

        exact = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()}
        for pair, j in {(r["id_a"], r["id_b"]): r["jaccard"]
                        for r in near_dup_pairs(docs, threshold=0.1).collect()}.items():
            assert exact[pair] == j


class TestSimHash:
    def test_identical_distance_zero(self, spark, docs):
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in simhash_near_dup_pairs(docs, max_hamming=10).collect()}
        assert pairs[(0, 1)] == 0

    def test_different_docs_not_near(self, spark, docs):
        pairs = {(r["id_a"], r["id_b"])
                 for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()}
        assert (0, 3) not in pairs


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rng = np.random.RandomState(42)
        data = rng.randn(200, 16).astype(np.float32)
        rows = [(i, [float(x) for x in data[i]]) for i in range(200)]
        return data, spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_brute_force_matches_numpy(self, spark, vecs):
        data, df = vecs
        q = data[0]
        sims = data @ q / (np.linalg.norm(data, axis=1) * np.linalg.norm(q))
        order = np.argsort(-sims)
        expected = [(int(i), round(float(sims[i]), 6)) for i in order[:5]]
        got = [(r["vec_id"], r["cosine"]) for r in
               brute_force_topk(df, [float(x) for x in q], k=5).collect()]
        for (ei, es), (gi, gs) in zip(expected, got):
            assert ei == gi
            assert abs(es - gs) < 1e-4

    def test_lsh_topk_contains_self(self, spark, vecs):
        data, df = vecs
        q = data[0]
        got = lsh_topk(df, [float(x) for x in q], k=5).collect()
        assert got[0]["vec_id"] == 0  # query vector is its own best match
        assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-5)

    def test_ivf_assign_is_nearest_centroid(self, spark, vecs):
        from crawler_spark.operators.similarity import ivf_assign, ivf_centroids

        data, df = vecs
        cents = [
            (r["centroid_id"], list(r["c_emb"]))
            for r in ivf_centroids(df, k=4).collect()
        ]
        assert len(cents) == 4
        got = {
            r["vec_id"]: r["centroid_id"]
            for r in ivf_assign(df, cents).select("vec_id", "centroid_id").collect()
        }
        assert len(got) == 200  # every vector lands in exactly one list
        cmat = np.array([e for _, e in cents], dtype=np.float64)
        cids = np.array([c for c, _ in cents])
        for i in range(200):
            d2 = ((data[i].astype(np.float64) - cmat) ** 2).sum(axis=1)
            assert got[i] == cids[int(np.argmin(d2))]

    def test_ivf_topk_probes_own_list(self, spark, vecs):
        from crawler_spark.operators.similarity import ivf_topk

        data, df = vecs
        q = [float(x) for x in data[7]]
        got = ivf_topk(df, q, k=5, n_centroids=4, nprobe=2).collect()
        # the query IS corpus vector 7, so its own inverted list is the
        # nearest one and must be probed: exact self-match survives
        assert got[0]["vec_id"] == 7
        assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-5)
        assert len(got) == 5


class TestTextAnalysis:
    def test_lang_id(self, spark, docs):
        out = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
        assert out[0] == "en"
        assert out[4] == "es"
        assert out[5] == "zh"

    def test_quality_monotone_in_length(self, spark, docs):
        out = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
        assert out[0] > out[6]

    def test_token_count(self, spark, docs):
        out = {r["doc_id"]: (r["ws_tokens"], r["bpe_ish_tokens"])
               for r in token_count(docs).collect()}
        assert out[0][0] == 14
        # bpe-ish >= word count (every word yields >= 1 piece)
        assert out[0][1] >= out[0][0]

    def test_fingerprint_deterministic_and_discriminative(self, spark, docs):
        out = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
        assert out[0] == out[1]
        assert out[0] != out[3]


class TestMultimodal:
    def test_feature_plumbing(self, spark):
        from crawler_spark.operators.multimodal import (
            extract_media_features,
            frame_sample_plan,
        )

        rows = [
            (1, "image", b"\x89PNGfakebytes", "image/png", {}),
            (2, "audio", b"RIFFfakeaudio", "audio/wav", {}),
            (3, "video", b"\x00\x00ftypfake", "video/mp4", {"duration_ms": "3500"}),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, kind string, payload binary, mime string, meta map<string,string>",
        )
        feats = {r["media_id"]: r for r in
                 extract_media_features(media, deterministic_fake=True).collect()}
        assert feats[1]["width"] is not None and feats[1]["duration_ms"] is None
        assert feats[2]["duration_ms"] is not None and feats[2]["width"] is None
        assert len(feats[3]["feature"]) == 8
        assert feats[1]["n_bytes"] == len(b"\x89PNGfakebytes")

        frames = frame_sample_plan(media, every_ms=1000).collect()
        assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [
            (3, 0), (3, 1000), (3, 2000), (3, 3000)
        ]

    def test_decode_stub_refuses_without_fake(self):
        from crawler_spark.operators.multimodal import decode_stub

        with pytest.raises(NotImplementedError):
            decode_stub(b"bytes", "image")

    def test_thumbnail_dims_exact(self):
        from crawler_spark.operators.multimodal import thumbnail_dims

        assert thumbnail_dims(100, 50, 256) == (100, 50)   # never upscale
        assert thumbnail_dims(640, 480, 256) == (256, 192)
        assert thumbnail_dims(480, 640, 256) == (192, 256)
        assert thumbnail_dims(1000, 1, 256) == (256, 1)    # floor, min 1
        assert thumbnail_dims(1, 1000, 10) == (1, 10)
        assert thumbnail_dims(257, 255, 256) == (256, 254)  # floor division

    def test_resize_images_plumbing(self, spark):
        import hashlib
        import struct as _s

        from crawler_spark.operators.multimodal import resize_images

        png = (
            b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR"
            + _s.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
        )
        rows = [(1, png), (2, b"not-an-image")]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {
            r["media_id"]: r
            for r in resize_images(
                media, max_dim=256, deterministic_fake=True
            ).collect()
        }
        r1 = got[1]
        assert (r1["width"], r1["height"]) == (640, 480)        # real header
        assert (r1["thumb_width"], r1["thumb_height"]) == (256, 192)
        assert r1["thumb_is_fake"] is True                       # honest flag
        assert bytes(r1["thumb_payload"]) == hashlib.md5(
            png + b"|thumb|" + _s.pack(">II", 256, 192)
        ).digest()
        d = hashlib.md5(b"not-an-image").digest()
        assert (got[2]["width"], got[2]["height"]) == (
            d[0] % 64 + 1, d[1] % 64 + 1
        )

    def test_resize_refuses_unparseable_without_fake(self, spark):
        from crawler_spark.operators.multimodal import resize_images

        media = spark.createDataFrame(
            [(1, b"junk")], "media_id long, payload binary"
        )
        with pytest.raises(Exception):  # NotImplementedError crosses py4j
            resize_images(media, deterministic_fake=False).collect()


class TestNgramJaccardMaxDF:
    @pytest.fixture(scope="class")
    def hot_corpus(self, spark):
        # 40 docs whose ONLY shared shingle is a universal trigram: without a
        # DF cap the inverted-index self-join materializes 40*39/2 rows for
        # that one shingle (the quadratic hot-bucket blowup at corpus scale)
        rows = [
            (i, f"common shared shingle unique{i} tail{i} words{i} here{i}")
            for i in range(40)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cap_drops_hot_bucket(self, spark, hot_corpus):
        uncapped = ngram_jaccard_pairs(hot_corpus, threshold=0.01).collect()
        assert len(uncapped) == 40 * 39 // 2  # the blowup, observed
        capped = ngram_jaccard_pairs(hot_corpus, threshold=0.01, max_df=10)
        assert capped.count() == 0  # hot shingle out of the index -> no pairs

    def test_cap_noop_when_nothing_hot(self, spark, docs):
        base = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()
        }
        capped = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.1, max_df=100).collect()
        }
        assert base == capped

    def test_sizes_stay_exact_under_cap(self, spark, spark_docs_pair=None):
        # two docs sharing one hot + one cold shingle: reported jaccard uses
        # the FULL union size (exact denominator), intersection counts only
        # the cold shingle
        rows = [(i, "hot one two cold three four") for i in range(2)] + [
            (i, f"hot one two only{i} x{i} y{i}") for i in range(2, 12)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # "hot one two" appears in all 12 docs; cap at 5 drops it
        out = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, threshold=0.01, max_df=5).collect()
        }
        # docs 0,1 are identical (4 shingles each); hot shingle dropped from
        # the index -> intersection 3, union 4+4-3=5
        assert out[(0, 1)] == round(3 / 5, 6)


class TestSimHashBanding:
    def test_banding_equals_brute_force(self, spark):
        # planted near-dups (one appended token) + brute force ground truth:
        # with max_hamming 3 <= bands-1 the banded join must lose nothing —
        # including pairs whose differing bits fall in the top band, which
        # the round-1 prefix-16 blocking missed by construction
        import itertools

        from crawler_spark.operators.dedup import simhash64

        base = [
            f"alpha{i} beta{i} gamma delta epsilon zeta{i} eta theta iota kappa{i}"
            for i in range(60)
        ]
        rows = [(i, t) for i, t in enumerate(base)] + [
            (1000 + i, t + " zz") for i, t in enumerate(base)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sh = {
            r["doc_id"]: r["h"]
            for r in df.select("doc_id", simhash64(F.col("text")).alias("h")).collect()
        }
        expect = set()
        for a, b in itertools.combinations(sorted(sh), 2):
            d = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                expect.add((a, b, d))
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_dup_pairs(df, max_hamming=3, bands=4).collect()
        }
        assert got == expect
        assert expect, "scenario must produce at least one near-dup pair"
        # at least one pair must differ ONLY inside the top 16 bits — the
        # case prefix blocking missed
        top_only = [
            (a, b) for (a, b, d) in expect
            if d > 0 and ((sh[a] ^ sh[b]) & ((1 << 48) - 1)) == 0
        ]
        # not guaranteed per-seed; assert the stronger equality above instead


class TestAnnScale:
    def test_planes_scale_with_corpus(self):
        from crawler_spark.operators.similarity import planes_for_corpus

        # expected bucket size stays ~target as N grows 256x
        p1 = planes_for_corpus(1 << 20, target_bucket_rows=1024)
        p2 = planes_for_corpus(1 << 28, target_bucket_rows=1024)
        assert p2 - p1 == 8  # 256x rows -> 8 more planes -> same bucket size
        assert planes_for_corpus(100) == 4  # floor
        assert planes_for_corpus(10**12) <= 28  # ceiling

    def test_adaptive_bucket_fraction_bounded(self, spark):
        # random corpus: adaptive planes keep the hottest bucket a bounded
        # fraction; with the round-1 fixed 8 planes a 100x corpus would
        # concentrate ~N/256 rows per bucket regardless of N
        from crawler_spark.operators.similarity import (
            bucket_stats,
            hyperplane_signature,
            planes_for_corpus,
        )

        rng = np.random.RandomState(7)
        n = 4096
        rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(n)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        planes = planes_for_corpus(n, target_bucket_rows=64)  # -> 6 planes
        sig = hyperplane_signature(df, dim=16, n_planes=planes, seed=42)
        stats = bucket_stats(sig)
        assert stats["n_rows"] == n
        # random gaussian directions: hottest bucket stays within a small
        # multiple of the expected bucket size
        assert stats["max_bucket_rows"] <= 6 * (n / (1 << planes))

    def test_skew_guardrail_detects_cluster(self, spark):
        # 15% near-identical cluster: more planes CANNOT split it (identical
        # vectors agree on every sign bit) — the guardrail metric must
        # surface it so the pipeline pre-dedups instead of re-hashing
        from crawler_spark.operators.similarity import bucket_stats, hyperplane_signature

        rng = np.random.RandomState(11)
        base = rng.randn(16)
        rows = [
            (i, [float(x) for x in base + rng.randn(16) * 1e-4])
            for i in range(150)
        ] + [
            (1000 + i, [float(x) for x in rng.randn(16)]) for i in range(850)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        stats = bucket_stats(hyperplane_signature(df, dim=16, n_planes=10, seed=42))
        assert stats["max_bucket_fraction"] >= 0.15

    def test_near_dups_adaptive_matches_fixed(self, spark):
        # n_planes=None derives the same plane count planes_for_corpus gives,
        # so results are reproducible (and identical to the explicit call)
        from crawler_spark.operators.similarity import (
            embedding_near_dup_pairs,
            planes_for_corpus,
        )

        rng = np.random.RandomState(3)
        rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(300)]
        rows += [(900 + i, list(rows[i][1])) for i in range(10)]  # exact dups
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        p = planes_for_corpus(310, target_bucket_rows=32)
        auto = embedding_near_dup_pairs(
            df, dim=16, threshold=0.99, n_planes=None, target_bucket_rows=32
        )
        fixed = embedding_near_dup_pairs(df, dim=16, threshold=0.99, n_planes=p)
        a = {(r["id_a"], r["id_b"]) for r in auto.collect()}
        b = {(r["id_a"], r["id_b"]) for r in fixed.collect()}
        assert a == b
        assert {(i, 900 + i) for i in range(10)} <= a  # dups always collide


class TestImageHeaders:
    def test_png_gif_jpeg_dims(self):
        import struct

        from crawler_spark.operators.multimodal import parse_image_dims

        png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
               + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4)
        assert parse_image_dims(png) == (640, 480)
        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
        assert parse_image_dims(gif) == (320, 200)
        # JPEG: SOI, APP0 segment, then SOF0 (height before width)
        jpeg = (b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
                + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
                + struct.pack(">HH", 768, 1024) + b"\x03" + b"\x00" * 4)
        assert parse_image_dims(jpeg) == (1024, 768)
        assert parse_image_dims(b"\x89PNGnothdr") is None
        assert parse_image_dims(b"plain text") is None

    def test_real_dims_flow_through_spark(self, spark):
        import hashlib
        import struct

        from crawler_spark.operators.multimodal import extract_media_features

        png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
               + struct.pack(">II", 17, 42) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4)
        media = spark.createDataFrame(
            [(1, "image", png, "image/png", {})],
            "media_id long, kind string, payload binary, mime string, meta map<string,string>",
        )
        # no deterministic_fake needed: the parse is real
        r = extract_media_features(media).collect()[0]
        assert (r["width"], r["height"]) == (17, 42)
        assert r["content_md5"] == hashlib.md5(png).hexdigest()
        assert r["feature"][0] == 17 / 255.0 and r["feature"][2] == (17 * 42) / 65025.0

    def test_audio_refuses_without_fake(self):
        from crawler_spark.operators.multimodal import decode_payload

        with pytest.raises(NotImplementedError):
            decode_payload(b"RIFFbytes", "audio")


class TestAudioVideoHeaders:
    def test_wav_roundtrip_and_header_only(self):
        from crawler_spark.operators.multimodal import (
            make_wav_bytes,
            parse_wav_meta,
        )

        full = make_wav_bytes(sample_rate=44100, channels=2, bits=16,
                              n_samples=44100)
        assert parse_wav_meta(full) == (2, 44100, 1000)
        # triage contract: declared data size suffices, body absent
        hdr = make_wav_bytes(sample_rate=8000, channels=1, bits=16,
                             n_samples=1234, header_only=True)
        assert len(hdr) == 44
        assert parse_wav_meta(hdr) == (1, 8000, 154)  # 2468 B / 16000 B/s
        assert parse_wav_meta(b"RIFFbytes") is None
        assert parse_wav_meta(b"RIFF\x00\x00\x00\x00WAVE") is None  # no fmt
        assert parse_wav_meta(full[:20]) is None  # truncated mid-fmt

    def test_mp4_roundtrip_and_corrupt(self):
        from crawler_spark.operators.multimodal import (
            make_mp4_bytes,
            parse_mp4_meta,
        )

        m = make_mp4_bytes(640, 480, 3500)
        assert parse_mp4_meta(m) == (640, 480, 3500)
        # timescale other than 1000 still lands on exact ms
        assert parse_mp4_meta(make_mp4_bytes(1920, 1080, 250,
                                             timescale=90000))[2] == 250
        assert parse_mp4_meta(b"\x00\x00ftypfake") is None
        assert parse_mp4_meta(m[:40]) is None  # moov size overruns buffer
        # box whose declared size is smaller than its header: walk stops
        assert parse_mp4_meta(b"\x00\x00\x00\x04moov") is None

    def test_real_audio_video_flow_through_spark(self, spark):
        from crawler_spark.operators.multimodal import (
            extract_media_features,
            make_mp4_bytes,
            make_wav_bytes,
        )

        rows = [
            (1, "audio", make_wav_bytes(16000, 1, 16, n_samples=8000), "audio/wav", {}),
            (2, "video", make_mp4_bytes(320, 240, 2000), "video/mp4", {}),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, kind string, payload binary, mime string, meta map<string,string>",
        )
        # no deterministic_fake needed: the parses are real
        feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
        assert (feats[1]["sample_rate"], feats[1]["channels"],
                feats[1]["duration_ms"]) == (16000, 1, 500)
        assert feats[1]["width"] is None
        assert (feats[2]["width"], feats[2]["height"],
                feats[2]["duration_ms"]) == (320, 240, 2000)
        assert feats[2]["sample_rate"] is None

    def test_fake_fallback_still_covers_other_codecs(self):
        from crawler_spark.operators.multimodal import decode_payload

        out = decode_payload(b"OggS not a wav", "audio", deterministic_fake=True)
        assert out["duration_ms"] is not None and out["sample_rate"] is None
        with pytest.raises(NotImplementedError):
            decode_payload(b"\x1aE\xdf\xa3 webm", "video")


class TestIvfRefine:
    @pytest.fixture(scope="class")
    def vecs2(self, spark):
        rng = np.random.RandomState(9)
        # two well-separated blobs: refinement must pull centroids toward
        # the blob means
        a = rng.randn(60, 8) + 6.0
        b = rng.randn(60, 8) - 6.0
        data = np.vstack([a, b]).astype(np.float32)
        rows = [(i, [float(x) for x in data[i]]) for i in range(120)]
        return data, spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_refine_is_parallelism_invariant(self, spark, vecs2):
        from crawler_spark.operators.similarity import ivf_centroids, ivf_refine

        data, df = vecs2
        cents = [
            (r["centroid_id"], list(r["c_emb"]))
            for r in ivf_centroids(df, k=2).collect()
        ]
        r3 = ivf_refine(df.repartition(3), cents, iters=2)
        r17 = ivf_refine(df.repartition(17), cents, iters=2)
        assert r3 == r17  # bit-identical means at any partitioning

    def test_refine_reduces_quantization_error(self, spark, vecs2):
        from crawler_spark.operators.similarity import (
            ivf_assign,
            ivf_centroids,
            ivf_refine,
        )

        data, df = vecs2
        cents = [
            (r["centroid_id"], list(r["c_emb"]))
            for r in ivf_centroids(df, k=2).collect()
        ]

        def sse(centroid_rows):
            got = {
                r["vec_id"]: r["centroid_id"]
                for r in ivf_assign(df, centroid_rows)
                .select("vec_id", "centroid_id")
                .collect()
            }
            cmap = {c: np.array(e) for c, e in centroid_rows}
            return sum(
                float(((data[i].astype(np.float64) - cmap[got[i]]) ** 2).sum())
                for i in range(len(data))
            )

        refined = ivf_refine(df, cents, iters=2)
        assert sse(refined) < sse(cents)


class TestSemanticDedup:
    @pytest.fixture(scope="class")
    def planted(self, spark):
        """Random vectors plus planted near-copies of vec 0 and vec 1."""
        rng = np.random.RandomState(7)
        data = rng.randn(150, 16).astype(np.float32)
        data[148] = data[0] * 1.001  # near-copy, same direction as vec 0
        data[149] = data[1] * 0.999
        rows = [(i, [float(x) for x in data[i]]) for i in range(150)]
        return data, spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    @staticmethod
    def _replay(data, centroid_rows, threshold):
        """Pure-numpy replay of the cluster-bounded min-id drop rule."""
        cmap = {c: np.array(e, dtype=np.float64) for c, e in centroid_rows}
        cids = sorted(cmap)

        def assign(v):
            v64 = v.astype(np.float64)
            return min((float(((v64 - cmap[c]) ** 2).sum()), c) for c in cids)[1]

        cluster = {i: assign(data[i]) for i in range(len(data))}
        norms = np.linalg.norm(data.astype(np.float64), axis=1)
        keep = set(range(len(data)))
        for j in range(len(data)):
            for i in range(j):
                if cluster[i] != cluster[j]:
                    continue
                denom = norms[i] * norms[j]
                cos = 0.0 if denom == 0 else float(
                    data[i].astype(np.float64) @ data[j].astype(np.float64)
                ) / denom
                if round(cos, 6) >= threshold:
                    keep.discard(j)
                    break
        return keep

    def test_matches_numpy_replay_and_drops_planted_copies(self, spark, planted):
        from crawler_spark.operators.similarity import (
            ivf_centroids,
            semantic_dedup,
        )

        data, df = planted
        cents = [
            (r["centroid_id"], list(r["c_emb"]))
            for r in ivf_centroids(df, 4).collect()
        ]
        out = semantic_dedup(df, threshold=0.9, centroid_rows=cents)
        got_keep = {r["vec_id"] for r in out.collect() if r["keep"]}
        assert got_keep == self._replay(data, cents, 0.9)
        # planted near-copies are dominated by their originals
        assert 148 not in got_keep and 149 not in got_keep
        assert 0 in got_keep and 1 in got_keep
        # keep-flag shape: every input row comes back exactly once
        assert out.count() == 150

    def test_partition_invariant_and_jvm_only(self, spark, planted):
        from crawler_spark.operators.similarity import semantic_dedup

        _, df = planted
        a = {
            (r["vec_id"], r["keep"], r["centroid_id"])
            for r in semantic_dedup(df.repartition(1), n_clusters=4,
                                    threshold=0.9).collect()
        }
        b = {
            (r["vec_id"], r["keep"], r["centroid_id"])
            for r in semantic_dedup(df.repartition(7), n_clusters=4,
                                    threshold=0.9).collect()
        }
        assert a == b
        out = semantic_dedup(df, n_clusters=4, threshold=0.9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_clusters_scale_with_corpus(self):
        from crawler_spark.operators.similarity import clusters_for_corpus

        assert clusters_for_corpus(100) == 8  # floor
        assert clusters_for_corpus(4096 * 100) == 100
        # expected cluster size stays bounded as the corpus grows 100x
        assert clusters_for_corpus(4096 * 10_000) == 10_000


class TestProductQuantization:
    @pytest.fixture(scope="class")
    def vecs_pq(self, spark):
        rng = np.random.RandomState(13)
        data = rng.randn(200, 16).astype(np.float32)
        data[199] = data[0]  # exact duplicate pair for rank sanity
        rows = [(i, [float(x) for x in data[i]]) for i in range(200)]
        return data, spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    @staticmethod
    def _np_encode(data, books):
        d_sub = len(books[0][0][1])
        codes = np.empty((len(data), len(books)), dtype=np.int64)
        for j, book in enumerate(books):
            mat = np.array([e for _, e in sorted(book)], dtype=np.float64)
            sub = data[:, j * d_sub : (j + 1) * d_sub].astype(np.float64)
            d2 = ((sub[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return codes

    def test_expression_and_pandas_encoders_match_numpy_replay(
        self, spark, vecs_pq
    ):
        from crawler_spark.operators.similarity import (
            pq_encode,
            pq_encode_pandas,
            pq_train,
        )

        data, df = vecs_pq
        books = pq_train(df, m=4, k=8)
        assert len(books) == 4 and all(len(b) == 8 for b in books)
        want = self._np_encode(data, books)
        got_expr = {
            r["vec_id"]: list(r["pq_code"])
            for r in pq_encode(df, books).collect()
        }
        got_pd = {
            r["vec_id"]: list(r["pq_code"])
            for r in pq_encode_pandas(df, books).collect()
        }
        assert got_expr == got_pd
        for i in range(len(data)):
            assert got_expr[i] == list(want[i])

    def test_adc_topk_matches_numpy_and_ranks_duplicate_with_query(
        self, spark, vecs_pq
    ):
        from crawler_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        data, df = vecs_pq
        books = pq_train(df, m=4, k=8)
        q = [float(x) for x in data[0]]
        codes = pq_encode(df, books)
        got = [(r["vec_id"], r["adc_d2"])
               for r in pq_topk(codes, q, books, k=20).collect()]

        # numpy replay of the ADC scan
        np_codes = self._np_encode(data, books)
        d_sub = 4
        luts = []
        for j, book in enumerate(books):
            qs = np.array(q[j * d_sub : (j + 1) * d_sub], dtype=np.float64)
            mat = np.array([e for _, e in sorted(book)], dtype=np.float64)
            luts.append(((mat - qs) ** 2).sum(axis=1))
        dists = np.array(
            [sum(luts[j][np_codes[i, j]] for j in range(4))
             for i in range(len(data))]
        )
        want = sorted(
            ((round(float(d), 6), i) for i, d in enumerate(dists))
        )[:20]
        assert [(i, d) for d, i in want] == got
        # vec 199 is byte-identical to the query vector (vec 0): both get
        # the same codes, hence the same (minimal possible for that code
        # combination) ADC distance — both must appear in the top-k
        ids = [i for i, _ in got]
        assert 0 in ids and 199 in ids

    def test_partition_invariant_and_scan_is_jvm_only(self, spark, vecs_pq):
        from crawler_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        data, df = vecs_pq
        books = pq_train(df, m=4, k=8)
        q = [float(x) for x in data[3]]
        a = [
            (r["vec_id"], r["adc_d2"])
            for r in pq_topk(pq_encode(df.repartition(1), books), q, books,
                             k=15).collect()
        ]
        b = [
            (r["vec_id"], r["adc_d2"])
            for r in pq_topk(pq_encode(df.repartition(7), books), q, books,
                             k=15).collect()
        ]
        assert a == b
        plan = (
            pq_topk(pq_encode(df, books), q, books, k=15)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_ivfpq_composition_prunes_then_reranks(self, spark, vecs_pq):
        from crawler_spark.operators.similarity import (
            brute_force_topk,
            ivfpq_topk,
        )

        data, df = vecs_pq
        q = [float(x) for x in data[0]]
        # rerank path: survivors re-scored with exact cosine — the planted
        # duplicate (vec 199 == vec 0) must surface with cosine 1.0
        out = ivfpq_topk(df, q, k=5, n_centroids=4, nprobe=4, m=4, pq_k=8,
                         rerank=30)
        rows = out.collect()
        assert {r["vec_id"] for r in rows} >= {0, 199}
        assert all(abs(r["cosine"] - 1.0) < 1e-9
                   for r in rows if r["vec_id"] in (0, 199))
        # with every list probed and a deep rerank, the exact-rerank result
        # must agree with brute force on the full corpus
        exact = brute_force_topk(df, q, k=5).collect()
        deep = ivfpq_topk(df, q, k=5, n_centroids=4, nprobe=4, m=4, pq_k=8,
                          rerank=200).collect()
        assert [(r["vec_id"], r["cosine"]) for r in deep] == [
            (r["vec_id"], r["cosine"]) for r in exact
        ]
        # ADC-only path keeps the approximate-distance column
        adc = ivfpq_topk(df, q, k=5, n_centroids=4, nprobe=2, m=4, pq_k=8)
        assert "adc_d2" in adc.columns


class TestCuration:
    def test_funnel_matches_stages(self, spark, docs):
        from crawler_spark.operators.curation import curate, curation_stats

        row = curation_stats(docs, min_quality=0.0, langs=("en", "es", "zh")).collect()[0]
        assert row["n_input"] == 7
        assert row["n_quality"] <= row["n_input"]
        assert row["n_lang"] <= row["n_quality"]
        assert row["n_deduped"] <= row["n_lang"]
        survivors = curate(docs, min_quality=0.0, langs=("en", "es", "zh")).count()
        assert survivors == row["n_deduped"]

    def test_dedup_runs_after_gates(self, spark, docs):
        from crawler_spark.operators.curation import curate

        # docs 0 and 1 are identical: only the min id survives curation
        ids = {r["doc_id"] for r in
               curate(docs, min_quality=0.0, langs=("en",)).collect()}
        assert 0 in ids and 1 not in ids

    def test_single_shuffle_plan(self, spark, docs):
        from crawler_spark.operators.curation import curate
        from tests.test_plan_shapes import plan_of

        import re

        plan = plan_of(curate(docs, min_quality=0.0, langs=("en",)))
        # quality + language gates fold into the scan-side projection; the
        # only exchanges are the dedup's content-hash aggregation + the two
        # sides of its survivor join — never an extra shuffle per stage
        n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchanges <= 3
        assert "BatchEvalPython" not in plan


class TestHashedVector:
    def test_feeds_similarity_stack(self, spark, docs):
        from crawler_spark.operators.similarity import brute_force_topk
        from crawler_spark.operators.text_analysis import hashed_vector

        vecs = hashed_vector(docs, dim=32).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        q = [r["embedding"] for r in vecs.filter("vec_id = 0").collect()][0]
        got = brute_force_topk(vecs, [float(x) for x in q], k=3)
        rows = got.collect()
        # docs 0 and 1 are identical text: both at cosine 1.0
        top2 = {rows[0]["vec_id"], rows[1]["vec_id"]}
        assert top2 == {0, 1}
        assert rows[0]["cosine"] == pytest.approx(1.0, abs=1e-6)

    def test_unit_norm_and_determinism(self, spark, docs):
        from crawler_spark.operators.text_analysis import hashed_vector

        out = {r["doc_id"]: r["embedding"]
               for r in hashed_vector(docs, dim=32).collect()}
        v0 = out[0]
        assert sum(x * x for x in v0) == pytest.approx(1.0, abs=1e-9)
        out2 = {r["doc_id"]: r["embedding"]
                for r in hashed_vector(docs.repartition(5), dim=32).collect()}
        assert out == out2  # per-row expression: partitioning-invariant


def test_vocab_topk_order_and_plan(spark):
    from crawler_spark.operators.text_analysis import vocab_topk

    docs = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a z z z")], "doc_id int, text string"
    )
    rows = vocab_topk(docs, k=3).collect()
    # freq desc, token asc on ties: a=3, b=3, z=3 -> a, b, z
    assert [(r["token"], r["freq"]) for r in rows] == [
        ("a", 3), ("b", 3), ("z", 3)
    ]
    plan = vocab_topk(docs, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heaps, never a global sort


def test_tfidf_keywords_downweights_ubiquitous_tokens(spark):
    from crawler_spark.operators.text_analysis import tfidf_keywords

    # 'the' appears in every doc (df=3); 'rare' in one (df=1). Same tf
    # within doc 0, so idf must decide the ranking.
    docs = spark.createDataFrame(
        [(0, "the rare"), (1, "the cat"), (2, "the dog")],
        "doc_id int, text string",
    )
    top = {
        (r["doc_id"], r["rank"]): r["token"]
        for r in tfidf_keywords(docs, k=2).collect()
    }
    assert top[(0, 1)] == "rare" and top[(0, 2)] == "the"
    one = sorted(tfidf_keywords(docs, k=2).collect())
    many = sorted(tfidf_keywords(docs.repartition(5), k=2).collect())
    assert one == many


# --------------------------------------------------------------------------
# corpus_report (per-source health stats, exact + approx percentile paths)
# --------------------------------------------------------------------------

def test_corpus_report_exact_values(spark):
    from crawler_spark.operators.text_analysis import corpus_report

    rows = [
        (i, "s1", "en", " ".join("w" for _ in range(i + 1))) for i in range(5)
    ] + [(10, "s2", "de", "a b c"), (11, "s2", "fr", "a")]
    df = spark.createDataFrame(
        rows, "doc_id int, source string, lang string, text string"
    )
    out = {r["source"]: r for r in corpus_report(df).collect()}
    s1 = out["s1"]  # token counts 1..5
    assert (s1["n_docs"], s1["n_tokens"], s1["n_langs"]) == (5, 15, 1)
    assert s1["p50_tokens"] == 3.0 and s1["max_tokens"] == 5
    assert s1["p90_tokens"] == pytest.approx(4.6)
    assert s1["mean_tokens"] == 3.0
    s2 = out["s2"]
    assert (s2["n_docs"], s2["n_tokens"], s2["n_langs"]) == (2, 4, 2)


def test_corpus_report_approx_near_exact_and_invariant(spark):
    from crawler_spark.operators.text_analysis import corpus_report

    rows = [
        (i, f"s{i % 3}", "en", " ".join("w" for _ in range(1 + i % 50)))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, source string, lang string, text string"
    )
    exact = {r["source"]: r for r in corpus_report(df).collect()}
    approx = {
        r["source"]: r for r in corpus_report(df, exact=False).collect()
    }
    for s in exact:
        # high-accuracy sketch: within one rank step of exact on 100 rows
        assert abs(approx[s]["p50_tokens"] - exact[s]["p50_tokens"]) <= 1.0
        assert abs(approx[s]["p99_tokens"] - exact[s]["p99_tokens"]) <= 1.0
        assert approx[s]["n_docs"] == exact[s]["n_docs"]
    a = sorted(map(tuple, corpus_report(df.repartition(1)).collect()))
    b = sorted(map(tuple, corpus_report(df.repartition(7, "doc_id")).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

import math as _math

from crawler_spark.operators.text_analysis import pmi_collocations


def _py_pmi(texts, k, min_count):
    from collections import Counter

    uni, bg = Counter(), Counter()
    for t in texts:
        toks = [w for w in t.lower().strip().split() if w]
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    n_u, n_b = sum(uni.values()), sum(bg.values())
    rows = []
    for (p, c), n in bg.items():
        if n < min_count:
            continue
        pmi = round(
            _math.log(n) + 2 * _math.log(n_u) - _math.log(n_b)
            - _math.log(uni[p]) - _math.log(uni[c]),
            6,
        )
        rows.append((p, c, n, uni[p], uni[c], pmi))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:k]


def test_pmi_matches_python_replay(spark):
    texts = [
        "new york is big",
        "new york city has new people",
        "york has a new city hall",
        "big city big people big new york",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in pmi_collocations(docs, k=10, min_count=2).collect()]
    assert got == _py_pmi(texts, 10, 2)
    # the glued pair outranks the incidental ones
    assert got[0][:2] == ("new", "york")


def test_pmi_min_count_guards_rare_pairs(spark):
    docs = spark.createDataFrame(
        [("unique hapax pair",), ("common word common word common word",)],
        "text string",
    )
    got = pmi_collocations(docs, k=10, min_count=2).collect()
    assert all(r["bg_n"] >= 2 for r in got)
    assert not any((r["prev"], r["cur"]) == ("unique", "hapax") for r in got)


def test_pmi_partition_invariant(spark):
    texts = [f"alpha beta gamma w{i} alpha beta" for i in range(30)]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    runs = [
        [tuple(r) for r in pmi_collocations(
            docs.repartition(n), k=5, min_count=3).collect()]
        for n in (1, 7)
    ]
    assert runs[0] == runs[1] == _py_pmi(texts, 5, 3)


def test_pmi_plan_jvm_only(spark):
    docs = spark.createDataFrame([("a b a b",)], "text string")
    df = pmi_collocations(docs, k=5, min_count=1)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Unicode script profile
# ---------------------------------------------------------------------------

from crawler_spark.operators.text_analysis import script_profile

_SCRIPT_DOCS = [
    (0, "hello world 123"),
    (1, "привет мир"),                      # cyrillic
    (2, "你好世界"),        # cjk
    (3, "안녕하세요"),  # hangul
    (4, "mixed 你好 latin heavy text here"),
    (5, ""),
    (6, "!!! ... ???"),                     # nothing classified
    (7, "αβγ alpha"),        # greek + latin tie broken by order
]


def test_script_profile_hand_checked(spark):
    docs = spark.createDataFrame(_SCRIPT_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in script_profile(docs).collect()}
    assert got[0]["script_pred"] == "latin" and got[0]["n_latin"] == 10
    assert got[0]["n_digit"] == 3
    assert got[1]["script_pred"] == "cyrillic" and got[1]["n_cyrillic"] == 9
    assert got[2]["script_pred"] == "cjk" and got[2]["n_cjk"] == 4
    assert got[3]["script_pred"] == "hangul"
    assert got[4]["script_pred"] == "latin" and got[4]["n_cjk"] == 2
    assert got[5]["script_pred"] == "other" and got[5]["script_ratio"] == 0.0
    assert got[6]["script_pred"] == "other"
    # 3 greek chars vs 5 latin ("alpha"): latin dominates
    assert got[7]["n_greek"] == 3 and got[7]["n_latin"] == 5
    assert got[7]["script_pred"] == "latin"


def test_script_profile_tie_breaks_by_range_order(spark):
    docs = spark.createDataFrame(
        [(0, "abc абв")], "doc_id long, text string"
    )  # 3 latin vs 3 cyrillic
    got = script_profile(docs).collect()[0]
    assert got["n_latin"] == got["n_cyrillic"] == 3
    assert got["script_pred"] == "latin"


def test_script_profile_ratio(spark):
    docs = spark.createDataFrame(
        [(0, "ab你")], "doc_id long, text string"
    )  # 2 latin, 1 cjk -> ratio 2/3
    got = script_profile(docs).collect()[0]
    assert got["script_ratio"] == round(2 / 3, 6)


def test_script_profile_no_shuffle_no_python(spark):
    docs = spark.createDataFrame(_SCRIPT_DOCS, "doc_id long, text string")
    df = script_profile(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# n-gram containment pairs
# ---------------------------------------------------------------------------

from crawler_spark.operators.dedup import ngram_containment_pairs, ngram_jaccard_pairs


def _shingle_set(text, k=3):
    toks = [t for t in text.lower().strip().split() if t]
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def test_containment_catches_subset_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon"
    long_doc = short + " " + " ".join(f"filler{i} pad{i} tok{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, short), (1, long_doc)], "doc_id long, text string"
    )
    cont = ngram_containment_pairs(docs, threshold=0.8).collect()
    jac = ngram_jaccard_pairs(docs, threshold=0.8).collect()
    assert len(jac) == 0  # size mismatch hides the quote from jaccard
    assert len(cont) == 1
    r = cont[0]
    sa, sb = _shingle_set(short), _shingle_set(long_doc)
    inter = len(sa & sb)
    assert r["containment"] == round(inter / min(len(sa), len(sb)), 6)
    assert r["jaccard"] == round(inter / len(sa | sb), 6)
    assert r["containment"] >= 0.8 > r["jaccard"]


def test_containment_equals_jaccard_on_identical_docs(spark):
    docs = spark.createDataFrame(
        [(0, "one two three four five"), (1, "one two three four five")],
        "doc_id long, text string",
    )
    r = ngram_containment_pairs(docs, threshold=0.5).collect()[0]
    assert r["containment"] == 1.0 and r["jaccard"] == 1.0


def test_containment_partition_invariant(spark):
    rows = [(i, f"common phrase core w{i} common phrase core") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    runs = [
        sorted(
            map(tuple, ngram_containment_pairs(
                docs.repartition(n), threshold=0.3).collect())
        )
        for n in (1, 7)
    ]
    assert runs[0] == runs[1]


# ---------------------------------------------------------------------------
# k-means Lloyd step sufficient statistics
# ---------------------------------------------------------------------------


def test_kmeans_step_sums_matches_numpy(spark):
    from crawler_spark.operators.similarity import kmeans_step_sums

    rng = np.random.RandomState(7)
    data = rng.randn(60, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in data[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    cents = [(0, [float(x) for x in data[0]]), (1, [float(x) for x in data[1]])]
    got = {
        (r["centroid_id"], r["pos"]): (r["qsum"], r["n"])
        for r in kmeans_step_sums(df, cents, quant_bits=20).collect()
    }
    # numpy replay: argmin squared-L2 with id tie-break, then quantized sums
    d = data.astype(np.float64)
    cmat = np.array([c for _, c in cents], dtype=np.float64)
    assign = np.argmin(((d[:, None, :] - cmat[None]) ** 2).sum(-1), axis=1)
    scale = float(1 << 20)
    exp = {}
    for cid in (0, 1):
        rows = d[assign == cid]
        q = np.floor(rows * scale + 0.5).astype(np.int64)  # round-half-up
        q = np.where(rows < 0, -np.floor(-rows * scale + 0.5), q).astype(np.int64)
        for pos in range(8):
            exp[(cid, pos)] = (int(q[:, pos].sum()), rows.shape[0])
    assert got == exp


def test_kmeans_step_sums_partition_invariant(spark):
    from crawler_spark.operators.similarity import kmeans_step_sums

    rng = np.random.RandomState(11)
    data = rng.randn(50, 4).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in data[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    cents = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 1.0, 1.0, 1.0])]
    runs = [
        sorted(map(tuple, kmeans_step_sums(
            df.repartition(n), cents).collect()))
        for n in (1, 9)
    ]
    assert runs[0] == runs[1]


# ---------------------------------------------------------------------------
# Unicode normalization
# ---------------------------------------------------------------------------

from crawler_spark.operators.text_analysis import normalize_text


def test_normalize_text_composes_and_matches_duckdb(spark):
    import duckdb
    import unicodedata

    rows = [
        (0, "école"),            # decomposed é
        (1, "école"),             # composed é
        (2, "ﬁle ﬁne"),           # U+FB01 ligature (NFKC-sensitive)
        (3, ""),
        (4, None),
        (5, "plain ascii"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["norm_text"]
           for r in normalize_text(docs, form="NFC").collect()}
    # decomposed == composed after NFC; hashes would now agree
    assert got[0] == got[1] == "école"
    assert got[4] is None
    # cross-check every non-null value against DuckDB's nfc_normalize
    for did, t in rows:
        if t is None:
            continue
        exp = duckdb.sql("SELECT nfc_normalize(?)", params=[t]).fetchone()[0]
        assert got[did] == exp, did
    # NFKC folds the ligature, NFC does not
    nfkc = {r["doc_id"]: r["norm_text"]
            for r in normalize_text(docs, form="NFKC").collect()}
    assert nfkc[2] == "file fine" and got[2] != "file fine"


def test_normalize_text_strip_accents_matches_duckdb(spark):
    import duckdb

    rows = [(0, "école ÀÉÎÕÜ naïve"), (1, "no accents here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["norm_text"]
           for r in normalize_text(docs, strip_accents=True).collect()}
    for did, t in rows:
        exp = duckdb.sql("SELECT strip_accents(?)", params=[t]).fetchone()[0]
        assert got[did] == exp, did


def test_normalize_text_invalid_form(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        normalize_text(docs, form="NFX")


def test_normalize_text_is_arrow_not_rowpython(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = (
        normalize_text(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# token entropy (unigram diversity signal)
# ---------------------------------------------------------------------------

from crawler_spark.operators.text_analysis import token_entropy


class TestTokenEntropy:
    def _replay(self, text):
        import math
        from collections import Counter

        toks = [t for t in text.lower().strip().split() if t]
        if not toks:
            return None
        n = len(toks)
        s = 0.0
        # token-sorted fold order, matching the engine and the oracle
        for t in sorted(set(toks)):
            c = toks.count(t)
            s += float(c) * math.log(float(c))
        return round(math.log(float(n)) - s / n, 6)

    def test_matches_pure_python_replay(self, spark):
        rows = [
            (1, "a b c d"),                 # uniform: ln(4)
            (2, "a a a a"),                 # degenerate: 0
            (3, "a a b"),                   # mixed
            (4, ""),                        # empty: null
            (5, "The the THE tail"),        # case folding collapses
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy"])
               for r in token_entropy(df).collect()}
        import math
        assert got[1] == (4, 4, round(math.log(4.0), 6))
        assert got[2] == (4, 1, 0.0)
        assert got[3] == (3, 2, self._replay("a a b"))
        assert got[4] == (0, 0, None)
        assert got[5] == (4, 2, self._replay("the the the tail"))

    def test_partition_invariance(self, spark):
        rows = [(i, " ".join(f"w{j % (i + 1)}" for j in range(30)))
                for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, token_entropy(df.repartition(1)).collect()))
        b = sorted(map(tuple, token_entropy(df.repartition(7)).collect()))
        assert a == b
        for r in a:
            assert r[3] == self._replay(
                " ".join(f"w{j % (r[0] + 1)}" for j in range(30)))

    def test_zero_shuffle_jvm_plan(self, spark):
        df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        plan = (token_entropy(df)._jdf.queryExecution()
                .executedPlan().toString())
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCompressionRatio:
    def test_matches_zlib_replay_and_ordering(self, spark):
        from crawler_spark.operators.text_analysis import compression_ratio
        import zlib

        rows = [
            (1, "natural prose with varied words and structure here"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, ""),
            (4, "ünïcode bytes — emoji 🎉 compress too"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_bytes"], r["zlib_ratio"])
               for r in compression_ratio(df).collect()}
        for i, t in rows:
            raw = t.encode("utf-8")
            exp = (len(raw),
                   round(len(zlib.compress(raw, 6)) / len(raw), 6)
                   if raw else 0.0)
            assert got[i] == exp
        # the repetitive doc compresses harder than the varied one
        assert got[2][1] < got[1][1]

    def test_partition_invariance(self, spark):
        from crawler_spark.operators.text_analysis import compression_ratio

        rows = [(i, ("word%d " % (i % 7)) * (i + 1)) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, compression_ratio(df.repartition(1)).collect()))
        b = sorted(map(tuple, compression_ratio(df.repartition(9)).collect()))
        assert a == b

    def test_arrow_batched_not_row_python(self, spark):
        from crawler_spark.operators.text_analysis import compression_ratio

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = (compression_ratio(df)._jdf.queryExecution()
                .executedPlan().toString())
        assert "ArrowEvalPython" in plan        # vectorized pandas UDF
        assert "BatchEvalPython" not in plan    # never row-at-a-time


class TestScalarQuantization:
    """SQ8 (operators/similarity.py sq_params/sq_encode/sq_topk): exact
    numpy replay of codes and ADC ranking, reconstruction error bound,
    clamping, rerank == brute force, partition invariance, JVM-only plan."""

    SCALE = 1 << 14

    @pytest.fixture(scope="class")
    def vecs_sq(self, spark):
        rng = np.random.RandomState(29)
        data = rng.randn(150, 12).astype(np.float32)
        data[149] = data[3]  # exact duplicate for rank sanity
        rows = [(i, [float(x) for x in data[i]]) for i in range(150)]
        return data, spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def _np_params(self, data):
        fx = np.floor(data.astype(np.float64) * self.SCALE).astype(np.int64)
        return fx, fx.min(axis=0), fx.max(axis=0)

    def test_codes_match_numpy_replay(self, spark, vecs_sq):
        from crawler_spark.operators.similarity import sq_encode, sq_params

        data, df = vecs_sq
        params = sq_params(df)
        fx, mn, mx = self._np_params(data)
        assert params == list(zip(mn.tolist(), mx.tolist()))
        span = np.maximum(mx - mn, 1)
        exp = np.clip(((fx - mn) * 255) // span, 0, 255)
        got = np.array(
            [r["sq_code"] for r in
             sq_encode(df, params).orderBy("vec_id").collect()]
        )
        assert (got == exp).all()
        assert got.min() >= 0 and got.max() == 255

    def test_reconstruction_error_bounded(self, spark, vecs_sq):
        from crawler_spark.operators.similarity import sq_encode, sq_params

        data, df = vecs_sq
        params = sq_params(df)
        mn = np.array([m for m, _ in params], dtype=np.float64)
        span = np.array([max(x - m, 1) for m, x in params], dtype=np.float64)
        got = np.array(
            [r["sq_code"] for r in
             sq_encode(df, params).orderBy("vec_id").collect()],
            dtype=np.float64,
        )
        recon = (mn + got * span / 255.0) / self.SCALE
        # left-edge decode: error < one cell + one fixed-point step
        cell = span / 255.0 / self.SCALE
        assert (np.abs(recon - data.astype(np.float64))
                <= cell + 1.0 / self.SCALE + 1e-12).all()

    def test_out_of_range_clamps(self, spark):
        from crawler_spark.operators.similarity import sq_encode

        df = spark.createDataFrame(
            [(0, [5.0]), (1, [-5.0]), (2, [0.5])],
            "vec_id long, embedding array<float>",
        )
        params = [(0, 1 << 14)]  # trained on [0, 1] only
        got = {
            r["vec_id"]: r["sq_code"][0]
            for r in sq_encode(df, params).collect()
        }
        assert got == {0: 255, 1: 0, 2: 127}

    def test_adc_topk_matches_numpy_and_is_exact_integer(self, spark, vecs_sq):
        from crawler_spark.operators.similarity import (
            sq_encode,
            sq_params,
            sq_topk,
        )

        data, df = vecs_sq
        params = sq_params(df)
        codes = sq_encode(df, params)
        q = [float(x) for x in data[3]]
        got = [(r["vec_id"], r["sq_d2"]) for r in sq_topk(codes, q, params, k=6).collect()]
        fx, mn, mx = self._np_params(data)
        span = np.maximum(mx - mn, 1)
        cexp = np.clip(((fx - mn) * 255) // span, 0, 255)
        qfx = np.floor(np.array(q, dtype=np.float64) * self.SCALE).astype(np.int64)
        dd = 255 * (qfx - mn) - cexp * span
        d2 = (dd * dd).sum(axis=1)
        order = np.lexsort((np.arange(len(d2)), d2))[:6]
        assert [v for v, _ in got] == order.tolist()
        assert got[0][1] == int(d2[order[0]])
        # the duplicate pair (3, 149) leads with identical distances
        assert {got[0][0], got[1][0]} == {3, 149}
        assert got[0][1] == got[1][1]

    def test_rerank_matches_brute_force(self, spark, vecs_sq):
        from crawler_spark.operators.similarity import (
            brute_force_topk,
            sq_encode,
            sq_params,
            sq_topk,
        )

        data, df = vecs_sq
        params = sq_params(df)
        codes = sq_encode(df, params)
        q = [float(x) for x in data[7]]
        got = [
            (r["vec_id"], r["cos"])
            for r in sq_topk(
                codes, q, params, k=5, rerank=df, rerank_mult=30
            ).collect()
        ]
        exact = [
            (r["vec_id"], r["cosine"])
            for r in brute_force_topk(df, q, k=5).collect()
        ]
        assert got == exact

    def test_partition_invariance(self, spark, vecs_sq):
        from crawler_spark.operators.similarity import (
            sq_encode,
            sq_params,
            sq_topk,
        )

        data, df = vecs_sq
        q = [float(x) for x in data[11]]
        base = None
        for n in (1, 7):
            d = df.repartition(n)
            params = sq_params(d)
            got = [
                tuple(r)
                for r in sq_topk(sq_encode(d, params), q, params, k=8).collect()
            ]
            if base is None:
                base = got
            assert got == base

    def test_plan_jvm_only_zero_shuffle_encode(self, spark, vecs_sq):
        from crawler_spark.operators.similarity import sq_encode, sq_params, sq_topk

        data, df = vecs_sq
        params = sq_params(df)
        plan = sq_encode(df, params)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan
        tplan = (
            sq_topk(sq_encode(df, params), [0.0] * 12, params, k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in tplan and "Python" not in tplan


# ---------------------------------------------------------------------------
# corpus snapshot diff
# ---------------------------------------------------------------------------


def test_corpus_diff_statuses_hand_checked(spark):
    from crawler_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [
            (1, "a", "kept text"),
            (2, "a", "will change"),
            (3, "b", "will vanish three tokens"),
        ],
        "doc_id int, source string, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "kept text"),
            (2, "a", "did change"),
            (4, "b", "brand new"),
        ],
        "doc_id int, source string, text string",
    )
    out = {
        (r["source"], r["status"]): (r["n_docs"], r["n_tokens"])
        for r in corpus_diff(old, new).collect()
    }
    assert out == {
        ("a", "kept"): (1, 2),
        ("a", "changed"): (1, 2),
        ("b", "removed"): (1, 4),
        ("b", "added"): (1, 2),
    }


def test_corpus_diff_null_text_conventions(spark):
    from crawler_spark.operators.curation import corpus_diff

    # NULL text hashes as '' (never as a row-presence signal): NULL -> ''
    # is 'kept'; NULL -> 'x' is 'changed'; token counts are 0 for NULL
    old = spark.createDataFrame(
        [(1, "s", None), (2, "s", None)], "doc_id int, source string, text string"
    )
    new = spark.createDataFrame(
        [(1, "s", ""), (2, "s", "x")], "doc_id int, source string, text string"
    )
    out = {r["status"]: (r["n_docs"], r["n_tokens"])
           for r in corpus_diff(old, new).collect()}
    assert out == {"kept": (1, 0), "changed": (1, 1)}


def test_corpus_diff_identical_snapshots_all_kept(spark):
    from crawler_spark.operators.curation import corpus_diff

    d = spark.createDataFrame(
        [(i, f"s{i % 3}", f"text {i} body") for i in range(30)],
        "doc_id int, source string, text string",
    )
    out = corpus_diff(d, d).collect()
    assert all(r["status"] == "kept" for r in out)
    assert sum(r["n_docs"] for r in out) == 30


# ---------------------------------------------------------------------------
# sign-random-projection JL reduction
# ---------------------------------------------------------------------------


def test_srp_preserves_cosine_structure(spark):
    import math
    import random as _random

    from crawler_spark.operators.similarity import srp_project

    # three well-separated directions in 64-d, plus near-copies: the
    # projection must keep near-copies nearer than cross-direction pairs
    rng = _random.Random(3)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(3)]
    rows = []
    for i, b in enumerate(base):
        rows.append((i * 10, b))
        rows.append((i * 10 + 1, [x + rng.gauss(0, 0.05) for x in b]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["vec_id"]: list(r["rp_emb"])
           for r in srp_project(df, dim=64, out_dim=16).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))

    for i in range(3):
        near = cos(out[i * 10], out[i * 10 + 1])
        for j in range(3):
            if j != i:
                assert near > cos(out[i * 10], out[j * 10]) + 0.3


def test_srp_deterministic_and_row_local(spark):
    from crawler_spark.operators.similarity import srp_project

    df = spark.createDataFrame(
        [(i, [float((i * 13 + j) % 7) for j in range(8)]) for i in range(20)],
        "vec_id int, embedding array<double>",
    )
    one = sorted(srp_project(df, dim=8, out_dim=4).collect())
    many = sorted(srp_project(df.repartition(9), dim=8, out_dim=4).collect())
    assert one == many
    # zero shuffle: the plan has no Exchange
    plan = srp_project(df, dim=8, out_dim=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_srp_matrix_is_seed_stable(spark):
    from crawler_spark.operators.similarity import srp_matrix

    a = srp_matrix(16, 4, seed=7)
    b = srp_matrix(16, 4, seed=7)
    c = srp_matrix(16, 4, seed=8)
    assert a == b and a != c
    assert all(x in (1, -1) for row in a for x in row)


def test_srp_dim_mismatch_raises(spark):
    from crawler_spark.operators.similarity import srp_project

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(Exception, match="srp_project: expected dim 8"):
        srp_project(df, dim=8, out_dim=4).collect()


# ---------------------------------------------------------------------------
# per-paragraph language profile + CCNet-style strip
# ---------------------------------------------------------------------------

from crawler_spark.operators.text_analysis import (  # noqa: E402
    paragraph_lang_profile,
    strip_foreign_paragraphs,
)

_PLP_ROWS = [
    (1, "the cat and the dog is a pet\nde la casa en la montana\n"
        "the end of the story"),
    (2, "de la en con para\nuna de las casas"),
    (3, ""),
    (4, "zzz qqq xxx\nthe of and to"),   # unknown vs en 1:1 -> 'en' (asc)
    (5, "一二三\nthe and of"),  # zh vs en 1:1 -> 'en' (asc)
]


def _plp_df(spark):
    return spark.createDataFrame(_PLP_ROWS, "doc_id long, text string")


def test_paragraph_lang_profile_majority_and_ties(spark):
    got = {
        r["doc_id"]: (r["n_paras"], r["majority_lang"], r["majority_frac"])
        for r in paragraph_lang_profile(_plp_df(spark)).collect()
    }
    assert got == {
        1: (3, "en", 0.666667),
        2: (2, "es", 1.0),
        3: (0, "unknown", 0.0),   # empty doc: no paragraphs
        4: (2, "en", 0.5),        # count tie resolved lang-ascending
        5: (2, "en", 0.5),
    }


def test_strip_foreign_paragraphs_majority_and_target(spark):
    got = {
        r["doc_id"]: r["kept_text"]
        for r in strip_foreign_paragraphs(_plp_df(spark)).collect()
    }
    assert got[1] == (
        "the cat and the dog is a pet\nthe end of the story"
    )  # Spanish middle paragraph removed, order/delim preserved
    assert got[2] == "de la en con para\nuna de las casas"
    assert got[3] == ""
    es_only = {
        r["doc_id"]: r["kept_text"]
        for r in strip_foreign_paragraphs(
            _plp_df(spark), target_lang="es"
        ).collect()
    }
    assert es_only[1] == "de la casa en la montana"
    assert es_only[4] == ""  # no Spanish paragraph anywhere


def test_paragraph_lang_profile_partition_invariance_and_no_shuffle(spark):
    df = _plp_df(spark)
    a = sorted(map(tuple, paragraph_lang_profile(df).collect()))
    b = sorted(
        map(tuple, paragraph_lang_profile(df.repartition(5, "text")).collect())
    )
    assert a == b
    # row-local: the profile must add no Exchange beyond the repartition
    plan = paragraph_lang_profile(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Exchange" not in plan


# ----------------------------------------------- embedding divergence

def _div_corpora(spark):
    import random

    rng = random.Random(11)
    # corpus A: clustered near axis e0 and e1; corpus B: shifted toward e2
    def vec(axis, n):
        rows = []
        for i in range(n):
            v = [rng.uniform(-0.05, 0.05) for _ in range(8)]
            v[axis] += 1.0
            rows.append((len(rows) + axis * 1000 + i, v))
        return rows

    a = spark.createDataFrame(vec(0, 30) + vec(1, 30),
                              "vec_id long, embedding array<double>")
    b = spark.createDataFrame(vec(0, 10) + vec(2, 50),
                              "vec_id long, embedding array<double>")
    cents = [(i, [1.0 if j == i else 0.0 for j in range(8)]) for i in range(4)]
    return a, b, cents


def test_embedding_divergence_python_replay(spark):
    import math

    from crawler_spark.operators.similarity import (
        cluster_histograms,
        embedding_divergence,
    )

    a, b, cents = _div_corpora(spark)
    h = {r["centroid_id"]: (r["n_a"], r["n_b"])
         for r in cluster_histograms(a, b, cents).collect()}
    assert set(h) == {0, 1, 2, 3}
    assert h[0] == (30, 10) and h[1] == (60 - 30, 0) and h[2] == (0, 50)
    assert h[3] == (0, 0)  # zero-count centroid still present
    k, alpha = 4, 1.0
    ta, tb = sum(v[0] for v in h.values()), sum(v[1] for v in h.values())
    jsd = 0.0
    for na, nb in h.values():
        p = (na + alpha) / (ta + alpha * k)
        q = (nb + alpha) / (tb + alpha * k)
        m = (p + q) / 2.0
        jsd += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    r = embedding_divergence(a, b, cents).collect()[0]
    assert (r["k"], r["n_a"], r["n_b"]) == (4, 60, 60)
    assert r["jsd"] == round(jsd, 6)


def test_embedding_divergence_bounds(spark):
    import math

    from crawler_spark.operators.similarity import embedding_divergence

    a, b, cents = _div_corpora(spark)
    same = embedding_divergence(a, a, cents).collect()[0]
    assert same["jsd"] == 0.0  # identical corpora
    cross = embedding_divergence(a, b, cents).collect()[0]
    assert 0.0 < cross["jsd"] < math.log(2.0)
    # order symmetry: JS is symmetric in its arguments
    rev = embedding_divergence(b, a, cents).collect()[0]
    assert rev["jsd"] == cross["jsd"]


def test_embedding_divergence_plan_zero_corpus_shuffle(spark):
    from crawler_spark.operators.similarity import cluster_histograms

    a, b, cents = _div_corpora(spark)
    plan = (
        cluster_histograms(a, b, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # assignment is an expression scan: no join/exchange touches vectors;
    # the only joins stitch k-row count tables
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
