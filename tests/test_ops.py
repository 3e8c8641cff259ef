"""Tests for the training-data op family over the driver testdata tables
(sf0.001) and the entities parallel-list table."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def _read(table):
    return ray.data.read_parquet(os.path.join(SF, f"{table}.parquet"))


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches) if batches else ds.schema().empty_table()


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
class TestTextOps:
    def test_token_stats(self):
        from pdf_entity_extraction_ray.ops.text import token_stats_batch

        t = _collect(_read("documents").map_batches(token_stats_batch, batch_format="pyarrow"))
        assert t.num_rows == _read("documents").count()
        assert min(t.column("n_tokens").to_pylist()) >= 0

    def test_fingerprint_matches_hashlib(self):
        import hashlib

        from pdf_entity_extraction_ray.ops.text import fingerprint_batch

        docs = _collect(_read("documents"))
        fp = _collect(_read("documents").map_batches(fingerprint_batch, batch_format="pyarrow"))
        by_id = dict(zip(fp.column("doc_id").to_pylist(), fp.column("fingerprint").to_pylist()))
        for doc_id, text in list(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))[:20]:
            assert by_id[doc_id] == hashlib.md5(text.encode()).hexdigest()


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
class TestDedupOps:
    def test_exact_dedup_keeps_min_doc_per_text(self):
        from pdf_entity_extraction_ray.ops.dedup import exact_dedup

        docs = _collect(_read("documents"))
        out = _collect(exact_dedup(_read("documents")))
        best: dict[str, int] = {}
        for doc_id, text in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
            best[text] = min(best.get(text, doc_id), doc_id)
        assert sorted(out.column("doc_id").to_pylist()) == sorted(best.values())

    def test_minhash_pairs_match_exact_jaccard(self):
        from pdf_entity_extraction_ray.ops.dedup import _word_shingles, minhash_lsh_pairs
        from pdf_entity_extraction_ray.functions.similarity import jaccard

        docs = _collect(_read("documents"))
        texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
        expected = set()
        ids = sorted(texts)
        sh = {i: _word_shingles(texts[i]) for i in ids}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if jaccard(sh[ids[i]], sh[ids[j]]) >= 0.7:
                    expected.add((ids[i], ids[j]))
        out = _collect(minhash_lsh_pairs(_read("documents"), 0.7))
        got = set(zip(out.column("doc_a").to_pylist(), out.column("doc_b").to_pylist()))
        assert got == expected and expected  # testdata plants near-dups

    def test_ngram_pairs_match_exact_jaccard(self):
        from pdf_entity_extraction_ray.functions.similarity import jaccard
        from pdf_entity_extraction_ray.ops.dedup import _word_shingles, ngram_jaccard_pairs

        docs = _collect(_read("documents"))
        texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
        ids = sorted(texts)
        sh = {i: _word_shingles(texts[i]) for i in ids}
        expected = {
            (ids[i], ids[j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if jaccard(sh[ids[i]], sh[ids[j]]) >= 0.7
        }
        out = _collect(ngram_jaccard_pairs(_read("documents"), 0.7))
        got = set(zip(out.column("doc_a").to_pylist(), out.column("doc_b").to_pylist()))
        assert got == expected and expected  # prefix blocking is lossless

    def test_ngram_pairs_exact_boundary_jaccard(self):
        """A nested pair with J exactly 7/10 = threshold must be emitted —
        regression for the float trap 0.7*10 == 7.000000000000001 (naive
        ceil would shorten the prefix below the lossless bound and the
        naive size filter would prune the (7, 10) size pair)."""
        from pdf_entity_extraction_ray.ops.dedup import ngram_jaccard_pairs

        words = [f"w{i}" for i in range(12)]
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    " ".join(words[:9]),   # 7 shingles, subset of doc 2's
                    " ".join(words),       # 10 shingles -> J = 7/10
                    "completely different words here nothing shared at all",
                ],
            }
        )
        out = _collect(ngram_jaccard_pairs(ray.data.from_arrow(docs), 0.7))
        got = set(zip(out.column("doc_a").to_pylist(), out.column("doc_b").to_pylist()))
        assert got == {(1, 2)}

    def test_ngram_prefix_orders_agree(self):
        """Both prefix total orders ("df" rarest-first and "hash") are
        lossless: identical pair sets, equal to brute force, on a
        hot-shingle corpus where the two orders pick very different
        prefix tokens."""
        from pdf_entity_extraction_ray.functions.similarity import jaccard
        from pdf_entity_extraction_ray.ops.dedup import _word_shingles, ngram_jaccard_pairs

        rng = np.random.RandomState(7)
        vocab = np.array([f"t{i}" for i in range(12)])
        p = 1.0 / np.arange(1, 13)
        p /= p.sum()  # zipf skew: hot shingles dominate the hash-order prefixes
        texts = [" ".join(rng.choice(vocab, 20, p=p)) for _ in range(30)]
        texts += [t + " extratok" for t in texts[:5]]  # planted near-dups
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        sh = [_word_shingles(t) for t in texts]
        expected = {
            (i, j)
            for i in range(len(texts))
            for j in range(i + 1, len(texts))
            if jaccard(sh[i], sh[j]) >= 0.7
        }
        got = {}
        for order in ("df", "hash", "cms"):
            out = _collect(ngram_jaccard_pairs(ray.data.from_arrow(docs), 0.7, order=order))
            got[order] = set(
                zip(out.column("doc_a").to_pylist(), out.column("doc_b").to_pylist())
            )
        assert got["df"] == got["hash"] == got["cms"] == expected and expected

    def test_cms_sketch_bounded_and_overestimates(self):
        """The distributed count-min DF sketch is a fixed-size array
        (bounded driver state) and its estimate never UNDERestimates the
        true document frequency of any shingle."""
        from pdf_entity_extraction_ray.functions.similarity import _stable_hash64
        from pdf_entity_extraction_ray.ops.dedup import (
            CMS_DEPTH,
            CMS_WIDTH,
            _cms_estimate,
            _word_shingles,
            build_df_sketch,
        )

        docs = _collect(_read("documents"))
        sketch = build_df_sketch(ray.data.from_arrow(docs))
        assert sketch.shape == (CMS_DEPTH * CMS_WIDTH,)
        true_df: dict[str, int] = {}
        for text in docs.column("text").to_pylist():
            for s in _word_shingles(text):
                true_df[s] = true_df.get(s, 0) + 1
        shingles = sorted(true_df)
        hvs = np.array([_stable_hash64(s.encode("utf-8")) for s in shingles], dtype=np.uint64)
        est = _cms_estimate(hvs, sketch)
        truth = np.array([true_df[s] for s in shingles], dtype=np.int64)
        assert (est >= truth).all()

    def test_prefix_rows_length_bound(self):
        """Prefix length is n - ceil(t*n) + 1 per doc (4 of 10 shingles at
        t=0.7) and zero-shingle docs emit nothing."""
        from pdf_entity_extraction_ray.ops.dedup import prefix_rows_batch

        words = " ".join(f"w{i}" for i in range(12))  # 10 shingles
        batch = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()), "text": [words, "!!!"]}
        )
        rows = prefix_rows_batch(batch, threshold=0.7)
        assert rows.column("doc_id").to_pylist() == [1] * 4
        assert rows.column("size").to_pylist() == [10] * 4

    def test_neardup_keep_method_equivalence(self):
        """Both candidate generators feed the same exact verify, so the
        transitively-kept set is identical."""
        from pdf_entity_extraction_ray.ops.dedup import near_dedup_keep

        def kept(method):
            out = _collect(near_dedup_keep(_read("documents"), 0.7, method=method))
            return sorted(out.column("doc_id").to_pylist())

        assert kept("ngram") == kept("minhash")

    def test_simhash_pairs_complete_within_hamming3(self):
        from pdf_entity_extraction_ray.functions.similarity import hamming64, simhash64
        from pdf_entity_extraction_ray.ops.dedup import simhash_pairs
        from pdf_entity_extraction_ray.ops.text import TOKEN_RE

        docs = _collect(_read("documents"))
        texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
        sims = {i: simhash64(TOKEN_RE.findall(t.lower())) for i, t in texts.items()}
        ids = sorted(sims)
        expected = {
            (ids[i], ids[j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if hamming64(sims[ids[i]], sims[ids[j]]) <= 3
        }
        out = _collect(simhash_pairs(_read("documents"), 3))
        got = set(zip(out.column("doc_a").to_pylist(), out.column("doc_b").to_pylist()))
        assert got == expected  # pigeonhole blocking is lossless


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
class TestSkew:
    def test_salted_equals_combiner_path(self):
        from pdf_entity_extraction_ray.ops.relational import event_type_counts
        from pdf_entity_extraction_ray.ops.skew import event_type_counts_salted

        def rows(ds):
            t = _collect(ds)
            return sorted(zip(*[t.column(c).to_pylist() for c in sorted(t.column_names)]))

        assert rows(event_type_counts_salted(_read("events"), salt_buckets=16)) == rows(
            event_type_counts(_read("events"))
        )

    def test_salted_aggregate_on_zipf_skew(self):
        """90%-hot-key synthetic: salted result == exact per-key answer,
        and stage 1 actually splinters the hot key across salts."""
        from pdf_entity_extraction_ray.ops.skew import salt_batch, salted_aggregate

        n = 5000
        keys = ["hot" if i % 10 != 9 else f"cold{i % 100}" for i in range(n)]
        vals = list(range(n))
        tbl = pa.table({"k": keys, "v": pa.array(vals, pa.int64())})
        out = _collect(
            salted_aggregate(
                ray.data.from_arrow(tbl),
                ["k"],
                [("v", "count", "n"), ("v", "sum", "total"),
                 ("v", "min", "lo"), ("v", "max", "hi")],
                salt_buckets=8,
            )
        )
        got = {
            k: (n_, t, lo, hi)
            for k, n_, t, lo, hi in zip(
                out.column("k").to_pylist(), out.column("n").to_pylist(),
                out.column("total").to_pylist(), out.column("lo").to_pylist(),
                out.column("hi").to_pylist(),
            )
        }
        expect: dict = {}
        for k, v in zip(keys, vals):
            c, t, lo, hi = expect.get(k, (0, 0, v, v))
            expect[k] = (c + 1, t + v, min(lo, v), max(hi, v))
        assert got == expect
        salted = salt_batch(tbl, 8)
        hot = salted.filter(pa.compute.equal(salted.column("k"), "hot"))
        assert len(set(hot.column("_salt").to_pylist())) == 8


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
class TestAnn:
    def test_bruteforce_matches_numpy(self):
        from pdf_entity_extraction_ray.ops.ann import knn_bruteforce

        emb = _collect(_read("embeddings"))
        ids = np.asarray(emb.column("vec_id").to_pylist())
        M = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        order = np.argsort(ids)
        ids, M = ids[order], M[order]
        out = _collect(knn_bruteforce(_read("embeddings"), [0, 1], k=5))
        for q in (0, 1):
            qv = M[ids == q][0]
            sims = M @ qv
            sims[ids == q] = -np.inf
            expected = [int(ids[i]) for i in sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:5]]
            mask = pa.compute.equal(out.column("query_id"), pa.scalar(q))
            rows = out.filter(mask)
            ranked = [n for _, n in sorted(zip(rows.column("rank").to_pylist(), rows.column("neighbor_id").to_pylist()))]
            assert ranked == expected

    def test_ivf_recall_reasonable(self):
        from pdf_entity_extraction_ray.ops.ann import knn_bruteforce, knn_ivf

        exact = _collect(knn_bruteforce(_read("embeddings"), [0, 1, 2], k=10))
        approx = _collect(knn_ivf(_read("embeddings"), [0, 1, 2], k=10, n_probe=16))
        e = set(zip(exact.column("query_id").to_pylist(), exact.column("neighbor_id").to_pylist()))
        a = set(zip(approx.column("query_id").to_pylist(), approx.column("neighbor_id").to_pylist()))
        assert len(e & a) / len(e) >= 0.3  # coarse quantizer, generous bound

    def test_ivf_reads_strict_partition_subset(self, tmp_path):
        """The probe must read only the queries' probed bucket partitions —
        the property that makes the IVF an IVF rather than brute force."""
        import numpy as np

        from pdf_entity_extraction_ray.ops.ann import (
            build_ivf_index,
            ivf_probe_buckets,
            knn_ivf,
        )

        index_dir = str(tmp_path / "ivf")
        emb = _read("embeddings")
        build_ivf_index(emb, index_dir)
        all_buckets = {d for d in os.listdir(index_dir) if d.startswith("bucket=")}
        assert len(all_buckets) > 8  # quantizer actually spreads the data

        out = _collect(knn_ivf(emb, [0, 1], k=5, n_probe=2, index_dir=index_dir))
        # recompute the probe union independently and check every returned
        # neighbor lives in a probed bucket (nothing outside was read)
        qvecs = {}
        for b in emb.iter_batches(batch_format="pyarrow"):
            for vid, vec in zip(b.column("vec_id").to_pylist(), b.column("embedding").to_pylist()):
                qvecs[vid] = vec
        Q = np.asarray([qvecs[0], qvecs[1]], dtype=np.float64)
        probes = ivf_probe_buckets(Q, 2)
        union = probes[0] | probes[1]
        assert len(union) < len(all_buckets)  # strict subset of partitions
        for nid in out.column("neighbor_id").to_pylist():
            b = int(np.argmax(np.abs(np.asarray(qvecs[nid]))))
            assert b in union


class TestEntitiesTable:
    def test_parallel_lists_aligned(self, small_corpus):
        from pdf_entity_extraction_ray.sources.corpus import make_catalog, catalog_gazetteer
        from pdf_entity_extraction_ray.stages.entities import build_entities
        from pdf_entity_extraction_ray.stages.extract import extract_segments_batch
        from pdf_entity_extraction_ray.stages.tagger import GazetteerTagger

        gaz = catalog_gazetteer(make_catalog(42, 25))
        mentions = (
            ray.data.read_parquet(f"{small_corpus}/pages")
            .map_batches(extract_segments_batch, batch_format="pyarrow")
            .map_batches(
                GazetteerTagger,
                fn_constructor_kwargs={"gazetteer": gaz, "use_windows": False},
                concurrency=2,
                batch_format="pyarrow",
            )
        )
        ents = _collect(build_entities(mentions, max_per_entity=16))
        assert ents.num_rows > 0
        total = 0
        for row in ents.to_pylist():
            k = len(row["pages"])
            assert k <= 16
            assert len(row["mentions"]) == k == len(row["mention_starts"]) == len(row["mention_ends"]) == len(row["segment_numbers"])
            assert row["n_mentions"] >= k
            total += row["n_mentions"]
        # total mention count is preserved exactly even when lists are capped
        assert total == mentions.count()


def _media_row(mime: str, kind: str, payload: bytes = b"xx", **kw):
    return pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array([kind], pa.string()),
            "payload": pa.array([payload], pa.binary()),
            "mime": pa.array([mime], pa.string()),
            "width": pa.array([kw.get("width", -1)], pa.int32()),
            "height": pa.array([kw.get("height", -1)], pa.int32()),
            "duration_ms": pa.array([kw.get("duration_ms", -1)], pa.int32()),
        }
    )


class TestMultimodal:
    def test_image_features_deterministic(self):
        from pdf_entity_extraction_ray.ops.multimodal import (
            ImageFeatureExtractor,
            synthesize_media_batch,
        )

        media = synthesize_media_batch(pa.table({"id": pa.array(range(30), pa.int64())}))
        ext = ImageFeatureExtractor(fake=True)
        out1, out2 = ext(media), ext(media)
        assert out1.equals(out2)
        assert out1.num_rows == 10  # every 3rd row is an image
        assert all(len(f) == ImageFeatureExtractor.FEATURE_DIM for f in out1.column("features").to_pylist())

    def test_raw_image_features_exact(self):
        """REAL kernel on a raw RGB8 payload: a constant-color image gives
        exact channel means, zero stds and a single-bin histogram."""
        import numpy as np

        from pdf_entity_extraction_ray.ops.multimodal import RAW_IMAGE, ImageFeatureExtractor

        img = np.full((4, 5, 3), [51, 102, 204], dtype=np.uint8)
        row = _media_row(RAW_IMAGE, "image", img.tobytes(), width=5, height=4)
        (feats,) = ImageFeatureExtractor()(row).column("features").to_pylist()
        assert feats[0] == pytest.approx(51 / 255)
        assert feats[1] == pytest.approx(102 / 255)
        assert feats[2] == pytest.approx(204 / 255)
        assert feats[3] == feats[4] == feats[5] == 0.0
        hist = feats[6:]
        assert sum(hist) == pytest.approx(1.0) and max(hist) == 1.0

    def test_compressed_decode_is_import_gated(self):
        # jpeg and png are REAL decode paths now (ops/jpegc, ops/pngc);
        # formats without an in-sandbox codec stay gated
        from pdf_entity_extraction_ray.ops.multimodal import ImageFeatureExtractor

        row = _media_row("image/webp", "image")
        with pytest.raises(NotImplementedError):
            ImageFeatureExtractor(fake=False)(row)

    def test_jpeg_features_match_single_process_decode(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.jpegc import decode_jpeg
        from pdf_entity_extraction_ray.ops.multimodal import (
            JPEG_IMAGE,
            ImageFeatureExtractor,
            rgb8_features,
            synthesize_media_batch,
        )

        media = synthesize_media_batch(pa.table({"id": pa.array(range(60), pa.int64())}))
        jpeg_rows = media.filter(pa.compute.equal(media.column("mime"), JPEG_IMAGE))
        assert jpeg_rows.num_rows >= 4  # both subsamplings present
        out = ImageFeatureExtractor(fake=False)(jpeg_rows)
        for mid, feats, payload in zip(
            out.column("media_id").to_pylist(),
            out.column("features").to_pylist(),
            jpeg_rows.column("payload").to_pylist(),
        ):
            want = rgb8_features(decode_jpeg(payload))
            assert np.allclose(feats, want, atol=0), mid  # bit-identical

    def test_png_features_match_single_process_decode(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.multimodal import (
            PNG_IMAGE,
            ImageFeatureExtractor,
            rgb8_features,
            synthesize_media_batch,
        )
        from pdf_entity_extraction_ray.ops.pngc import decode_png

        media = synthesize_media_batch(pa.table({"id": pa.array(range(60), pa.int64())}))
        png_rows = media.filter(pa.compute.equal(media.column("mime"), PNG_IMAGE))
        assert png_rows.num_rows >= 4
        out = ImageFeatureExtractor(fake=False)(png_rows)
        for mid, feats, payload in zip(
            out.column("media_id").to_pylist(),
            out.column("features").to_pylist(),
            png_rows.column("payload").to_pylist(),
        ):
            img = decode_png(payload)
            want = rgb8_features(img)
            assert np.allclose(feats, want, atol=0), mid  # bit-identical
            # png is LOSSLESS: features must equal the pre-encode raw's
            raw = synthesize_media_batch(
                pa.table({"id": pa.array([mid], pa.int64())})
            )
            assert np.array_equal(
                img.reshape(-1),
                np.frombuffer(
                    __import__(
                        "pdf_entity_extraction_ray.ops.multimodal",
                        fromlist=["_raw_image_payload"],
                    )._raw_image_payload(mid),
                    dtype=np.uint8,
                ),
            )

    def test_frame_sampler_slices_raw_frames(self):
        from pdf_entity_extraction_ray.ops.multimodal import (
            _RAW_H,
            _RAW_W,
            FrameSampler,
            synthesize_media_batch,
        )

        media = synthesize_media_batch(pa.table({"id": pa.array(range(30), pa.int64())}))
        frames = FrameSampler(every_ms=250)(media)
        assert set(frames.column("frame_ms").to_pylist()) == {0, 250, 500, 750}
        # raw sampling carries the actual frame bytes
        assert all(
            len(p) == _RAW_W * _RAW_H * 3 for p in frames.column("frame_payload").to_pylist()
        )


class TestCatalogRobustness:
    def test_catalog_valid_at_other_seeds_and_sizes(self):
        from pdf_entity_extraction_ray.sources.corpus import make_catalog, validate_catalog

        for seed, n in ((7, 40), (123, 60)):
            cat = make_catalog(seed, n)
            assert validate_catalog(cat) == []
            assert len(cat) >= 3 * n  # rejection sampling keeps most clusters


def test_top_orders_scalable_matches_sort_limit(ray_session):
    import ray.data

    from pdf_entity_extraction_ray.ops.relational import top_orders, top_orders_scalable

    orders = ray.data.read_parquet(os.path.join(SF, "orders.parquet"))
    a = _collect(top_orders(orders, 10)).column("o_orderkey").to_pylist()
    orders = ray.data.read_parquet(os.path.join(SF, "orders.parquet"))
    b = _collect(top_orders_scalable(orders, 10)).column("o_orderkey").to_pylist()
    assert sorted(a) == sorted(b)


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
class TestTfidf:
    def test_idf_matches_single_process(self):
        import math

        from pdf_entity_extraction_ray.ops.text import TOKEN_RE
        from pdf_entity_extraction_ray.ops.tfidf import train_idf

        docs = _collect(_read("documents"))
        texts = docs.column("text").to_pylist()
        df: dict[str, int] = {}
        for t in texts:
            for term in set(TOKEN_RE.findall(t.lower())):
                df[term] = df.get(term, 0) + 1
        expected = {t: math.log((1 + len(texts)) / (1 + c)) + 1.0 for t, c in df.items()}
        idf, n = train_idf(_read("documents"))
        assert n == len(texts)
        assert set(idf) == set(expected)
        for t in list(expected)[:50]:
            assert abs(idf[t] - expected[t]) < 1e-12

    def test_knn_matches_single_process(self):
        from pdf_entity_extraction_ray.ops.tfidf import (
            sparse_cosine,
            tfidf_knn,
            train_idf,
            vectorize,
        )

        docs = _collect(_read("documents"))
        texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
        idf, _ = train_idf(_read("documents"))
        vecs = {i: vectorize(t, idf) for i, t in texts.items()}
        out = _collect(tfidf_knn(_read("documents"), [0, 1], k=5))
        for q in (0, 1):
            scored = sorted(
                ((sparse_cosine(vecs[q], v), i) for i, v in vecs.items() if i != q),
                key=lambda t: (-t[0], t[1]),
            )[:5]
            expected = [i for _, i in scored]
            rows = out.filter(pa.compute.equal(out.column("query_id"), pa.scalar(q)))
            ranked = [
                n
                for _, n in sorted(
                    zip(rows.column("rank").to_pylist(), rows.column("neighbor_id").to_pylist())
                )
            ]
            assert ranked == expected


class TestMultimodalResizeAudio:
    def test_resizer_contract(self):
        from pdf_entity_extraction_ray.ops.multimodal import ImageResizer, synthesize_media_batch

        media = synthesize_media_batch(pa.table({"id": pa.array(range(30), pa.int64())}))
        out = ImageResizer(width=16, height=16)(media)
        assert out.num_rows == 10
        assert set(out.column("width").to_pylist()) == {16}
        assert all(len(p) == 16 * 16 * 3 for p in out.column("payload").to_pylist())
        assert out.equals(ImageResizer(width=16, height=16)(media))  # deterministic

    def test_raw_resize_nearest_exact(self):
        """REAL nearest-neighbor resize: 2x2 -> 4x4 must replicate each
        source pixel into a 2x2 block."""
        import numpy as np

        from pdf_entity_extraction_ray.ops.multimodal import RAW_IMAGE, ImageResizer

        src_img = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], dtype=np.uint8
        )
        row = _media_row(RAW_IMAGE, "image", src_img.tobytes(), width=2, height=2)
        out = ImageResizer(width=4, height=4)(row)
        got = np.frombuffer(out.column("payload")[0].as_py(), dtype=np.uint8).reshape(4, 4, 3)
        expected = np.kron(src_img, np.ones((2, 2, 1), dtype=np.uint8))
        assert np.array_equal(got, expected)
        with pytest.raises(NotImplementedError):
            ImageResizer(fake=False)(_media_row("image/webp", "image"))

    def test_png_resize_is_lossless_roundtrip(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.multimodal import RAW_IMAGE, ImageResizer
        from pdf_entity_extraction_ray.ops.pngc import encode_png

        rng = np.random.RandomState(5)
        src = rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
        row = _media_row(
            "image/png", "image", encode_png(src, filter_mode="cycle"),
            width=16, height=12,
        )
        out = ImageResizer(width=8, height=8, fake=False)(row)
        assert out.column("mime").to_pylist() == [RAW_IMAGE]
        got = np.frombuffer(out.column("payload")[0].as_py(), np.uint8).reshape(8, 8, 3)
        ys = (np.arange(8) * 12) // 8
        xs = (np.arange(8) * 16) // 8
        assert np.array_equal(got, src[ys[:, None], xs[None, :], :])  # lossless

    def test_jpeg_resize_goes_through_real_decode(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.jpegc import decode_jpeg, encode_jpeg
        from pdf_entity_extraction_ray.ops.multimodal import RAW_IMAGE, ImageResizer

        rng = np.random.RandomState(3)
        src = rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
        payload = encode_jpeg(src, quality=90)
        row = _media_row("image/jpeg", "image", payload, width=16, height=12)
        out = ImageResizer(width=8, height=8, fake=False)(row)
        assert out.column("mime").to_pylist() == [RAW_IMAGE]
        got = np.frombuffer(out.column("payload")[0].as_py(), np.uint8).reshape(8, 8, 3)
        dec = decode_jpeg(payload)
        ys = (np.arange(8) * 12) // 8
        xs = (np.arange(8) * 16) // 8
        assert np.array_equal(got, dec[ys[:, None], xs[None, :], :])

    def test_audio_features_exploded_and_exact(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.multimodal import (
            AUDIO_SAMPLE_RATE,
            RAW_AUDIO,
            AudioFeatureExtractor,
            synthesize_media_batch,
        )

        media = synthesize_media_batch(pa.table({"id": pa.array(range(30), pa.int64())}))
        out = AudioFeatureExtractor(frame_ms=250)(media)
        # 10 audio rows x 4 frames of 250ms over 1000ms
        assert out.num_rows == 40
        assert set(out.column("frame_ms").to_pylist()) == {0, 250, 500, 750}

        # REAL kernel on a known signal: a full-scale square wave has
        # RMS ~ 1.0 and a zero-crossing on every other sample transition
        n = AUDIO_SAMPLE_RATE // 4
        square = (np.tile([1, -1], n // 2) * 32767).astype(np.int16)
        row = _media_row(RAW_AUDIO, "audio", square.tobytes(), duration_ms=250)
        (feats,) = AudioFeatureExtractor(frame_ms=250)(row).column("features").to_pylist()
        rms, zcr = feats
        assert rms == pytest.approx(32767 / 32768, rel=1e-6)
        assert zcr == pytest.approx(1.0, rel=1e-3)  # alternating signs
        # audio/wav now takes the REAL stdlib decode path (round-3); the
        # import gate remains for truly-compressed formats
        with pytest.raises(NotImplementedError):
            AudioFeatureExtractor(fake=False)(_media_row("audio/mp3", "audio", duration_ms=100))


class TestNearDedupKeep:
    def test_transitive_cluster_keeps_only_min(self):
        """Star cluster a~c, b~c (a !~ b directly): the transitive policy
        keeps ONLY the minimum member — a pair-side filter would keep two."""
        from pdf_entity_extraction_ray.ops.dedup import near_dedup_keep

        base = "alpha beta gamma delta epsilon theta lambda sigma omega kappa"
        mid = base + " river stone cloud"
        docs = pa.table(
            {
                "doc_id": [10, 20, 30, 40],
                "text": [base + " river stone", mid, mid + " extra", "totally different words here entirely now ok fine yes"],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": pa.array([1, 1, 1, 1], pa.int32()),
            }
        )
        kept = _collect(near_dedup_keep(ray.data.from_arrow(docs), 0.7))
        assert sorted(kept.column("doc_id").to_pylist()) == [10, 40]

    def test_components_from_int_edges_chain(self):
        from pdf_entity_extraction_ray.stages.linking import components_from_int_edges

        edges = pa.table({"doc_a": [5, 7, 100], "doc_b": [7, 9, 101]})
        labels = _collect(
            components_from_int_edges(ray.data.from_arrow(edges), "doc_a", "doc_b")
        )
        got = dict(zip(labels.column("node").to_pylist(), labels.column("label").to_pylist()))
        assert got == {5: 5, 7: 5, 9: 5, 100: 100, 101: 100}


def test_embedding_lsh_matches_exact(ray_session):
    """Sub-quadratic LSH cosine pairs == the exact block-nested-loop result
    on the planted testdata (deterministic at the fixed plane seed)."""
    from pdf_entity_extraction_ray.ops.dedup import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_lsh,
    )

    def pairs(ds):
        out = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                out.update(zip(b.column("vec_a").to_pylist(), b.column("vec_b").to_pylist()))
        return out

    exact = pairs(embedding_cosine_pairs(_read("embeddings"), 0.3))
    lsh = pairs(embedding_cosine_pairs_lsh(_read("embeddings"), 0.3))
    assert exact  # threshold 0.3 yields pairs even at sf0.001
    assert lsh == exact


class TestEventsFunnel:
    """Ordered conversion funnel (ops/relational.events_funnel)."""

    @staticmethod
    def _events(rows):
        import datetime

        return ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [datetime.datetime(2024, 1, 1, 0, 0, r[1]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "event_type": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )

    def test_attrition_and_order_strictness(self):
        from pdf_entity_extraction_ray.ops.relational import events_funnel

        rows = [
            # user 1 completes A -> B -> C in order
            (1, 1, "A"), (1, 2, "B"), (1, 3, "C"),
            # user 2 does B before A: B must not count (strictly after A)
            (2, 1, "B"), (2, 2, "A"),
            # user 3 does A, B but no C
            (3, 5, "A"), (3, 6, "B"),
            # user 4 same-second A and B: strict > excludes the tie
            (4, 7, "A"), (4, 7, "B"),
        ]
        out = {r["step"]: (r["event_type"], r["n_users"])
               for r in events_funnel(self._events(rows), steps=("A", "B", "C")).take_all()}
        assert out == {1: ("A", 4), 2: ("B", 2), 3: ("C", 1)}

    def test_greedy_earliest_is_complete(self):
        from pdf_entity_extraction_ray.ops.relational import events_funnel

        # A@1, B@2, A@3, C@4: greedy (A@1 -> B@2 -> C@4) completes
        rows = [(9, 1, "A"), (9, 2, "B"), (9, 3, "A"), (9, 4, "C")]
        out = {r["step"]: r["n_users"]
               for r in events_funnel(self._events(rows), steps=("A", "B", "C")).take_all()}
        assert out == {1: 1, 2: 1, 3: 1}

    def test_split_invariant(self):
        from pdf_entity_extraction_ray.ops.relational import events_funnel

        rows = [(u, s, t) for u in range(40)
                for s, t in [(u % 7, "A"), (u % 7 + 2, "B"), (u % 7 + 4, "C")]
                if (u % 3 != 0 or t != "C")]
        a = sorted((r["step"], r["n_users"])
                   for r in events_funnel(self._events(rows), steps=("A", "B", "C")).take_all())
        b = sorted((r["step"], r["n_users"])
                   for r in events_funnel(self._events(rows).repartition(11),
                                          steps=("A", "B", "C")).take_all())
        assert a == b and a[0][1] == 40


class TestEventsRetention:
    """Cohort retention matrix (ops/relational.events_retention)."""

    @staticmethod
    def _events(rows):
        import datetime

        return ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [datetime.datetime(2024, 1, r[1], r[2] if len(r) > 2 else 12)
                         for r in rows],
                        pa.timestamp("us"),
                    ),
                }
            )
        )

    def test_hand_computed_matrix(self):
        from pdf_entity_extraction_ray.ops.relational import events_retention

        rows = [
            (1, 1), (1, 2), (1, 4),       # cohort d1: offsets 0, 1, 3
            (2, 1), (2, 4),               # cohort d1: offsets 0, 3
            (3, 2), (3, 3),               # cohort d2: offsets 0, 1
            (1, 1, 23),                   # same-day repeat: still one user-day
        ]
        out = {(r["day_offset"],): 0 for r in []}
        got = {}
        for r in events_retention(self._events(rows)).take_all():
            got[(r["cohort_day"], r["day_offset"])] = r["n_users"]
        d1 = 19723  # 2024-01-01 epoch day
        assert got == {
            (d1, 0): 2, (d1, 1): 1, (d1, 3): 2,
            (d1 + 1, 0): 1, (d1 + 1, 1): 1,
        }

    def test_split_invariant(self):
        from pdf_entity_extraction_ray.ops.relational import events_retention

        rows = [(u, 1 + (u + k) % 20) for u in range(50) for k in range(6)]
        a = sorted((r["cohort_day"], r["day_offset"], r["n_users"])
                   for r in events_retention(self._events(rows)).take_all())
        b = sorted((r["cohort_day"], r["day_offset"], r["n_users"])
                   for r in events_retention(self._events(rows).repartition(13)).take_all())
        assert a == b and sum(n for _, o, n in a if o == 0) == 50


class TestRelationalReviewFixes:
    """Round-4 review fixes over the relational family."""

    def test_quantiles_tolerate_all_null_group(self):
        import datetime

        from pdf_entity_extraction_ray.ops.relational import events_value_quantiles

        t = pa.table(
            {
                "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
                "value": pa.array([None, None, 1.0, 3.0], pa.float64()),
            }
        )
        out = {r["event_type"]: (r["p50"], r["p90"], r["p99"])
               for r in events_value_quantiles(ray.data.from_arrow(t)).take_all()}
        assert out["a"] == (None, None, None)  # group kept, NULL quantiles
        assert out["b"][0] == 1.0 and out["b"][1] == 3.0

    def test_quantile_label_rounding(self):
        from pdf_entity_extraction_ray.ops.relational import events_value_quantiles

        t = pa.table(
            {
                "event_type": pa.array(["x"] * 10, pa.string()),
                "value": pa.array([float(i) for i in range(10)], pa.float64()),
            }
        )
        out = events_value_quantiles(ray.data.from_arrow(t), qs=(0.29,)).take_all()
        assert "p29" in out[0]  # int(0.29*100) would mislabel as p28

    def test_json_agg_null_and_missing_k(self):
        from pdf_entity_extraction_ray.ops.relational import events_json_agg

        t = pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
                "props": pa.array(
                    ['{"k": 2}', None, '{"other": 1}', '{"k": 5}'], pa.string()
                ),
            }
        )
        out = {r["event_type"]: (r["n"], r["k_sum"], r["k_min"], r["k_max"])
               for r in events_json_agg(ray.data.from_arrow(t)).take_all()}
        # count(*) counts every row; k-aggregates skip NULL/missing
        assert out["a"] == (3, 2, 2, 2)
        assert out["b"] == (1, 5, 5, 5)

    def test_shard_pow2_normalization(self):
        from pdf_entity_extraction_ray.ops.relational import _shard_pow2

        assert _shard_pow2(100) == 128
        assert _shard_pow2(256) == 256
        assert _shard_pow2(1) == 1
        # non-power-of-two shards must still partition users correctly
        import datetime

        from pdf_entity_extraction_ray.ops.relational import event_sessions

        rows = [(u, datetime.datetime(2024, 1, 1, 0, 0, u % 50)) for u in range(300)]
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        out = event_sessions(ray.data.from_arrow(t), shards=100).take_all()
        assert len(out) == 300  # every user exactly once

    def test_build_side_size_fails_closed(self):
        from pdf_entity_extraction_ray.ops.relational import _build_side_bytes

        class Broken:
            def size_bytes(self):
                raise RuntimeError("no metadata")

        assert _build_side_bytes(Broken()) > 10**12  # -> shuffle path


class TestEventsDailyAnomaly:
    def _events(self, counts_by_day, event_type="click"):
        """counts_by_day: {day_offset: n_events} -> events table."""
        import datetime

        ts, et = [], []
        base = datetime.datetime(2024, 1, 1)
        for off, n in counts_by_day.items():
            for i in range(n):
                ts.append(base + datetime.timedelta(days=off, seconds=i))
                et.append(event_type)
        return ray.data.from_arrow(
            pa.table(
                {
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "event_type": pa.array(et, pa.string()),
                }
            )
        )

    def test_planted_spike_flagged(self):
        from pdf_entity_extraction_ray.ops.relational import events_daily_anomaly

        # 20 quiet days at ~10 events, one day at 300 -> z >> 3
        counts = {i: 10 + (i % 3) for i in range(20)}
        counts[20] = 300
        rows = {r["day"]: r["is_outlier"]
                for r in events_daily_anomaly(self._events(counts)).take_all()}
        assert rows["2024-01-21"] == 1
        assert sum(rows.values()) == 1  # only the spike

    def test_uniform_counts_unflagged(self):
        from pdf_entity_extraction_ray.ops.relational import events_daily_anomaly

        counts = {i: 50 for i in range(10)}
        rows = events_daily_anomaly(self._events(counts)).take_all()
        assert len(rows) == 10
        assert all(r["is_outlier"] == 0 for r in rows)

    def test_integer_exactness_at_boundary(self):
        from pdf_entity_extraction_ray.ops.relational import events_daily_anomaly

        # counts chosen so (n*x - S)^2 == 9*(n*Q - S^2) exactly for the
        # high day: strict > must NOT flag (a float z-score computation
        # would be at the mercy of rounding here).
        # days: [1, 1, 4] -> n=3, S=6, Q=18; x=4: (12-6)^2=36, 9*(54-36)=162 -> no
        # use [2, 2, 8]: n=3 S=12 Q=72; x=8: (24-12)^2=144, 9*(216-144)=648 -> no
        # equality case: x such that (3x-S)^2 == 9*(3Q-S^2) is irrational here,
        # so assert the near-boundary integer cases stay exact and unflagged
        counts = {0: 1, 1: 1, 2: 4}
        rows = events_daily_anomaly(self._events(counts)).take_all()
        assert all(r["is_outlier"] == 0 for r in rows)

    def test_multiple_types_independent(self):
        from pdf_entity_extraction_ray.ops.relational import events_daily_anomaly
        import datetime

        base = datetime.datetime(2024, 1, 1)
        ts, et = [], []
        # 'a': quiet 15 days then a spike; 'b': uniform
        for off in range(15):
            for i in range(5):
                ts.append(base + datetime.timedelta(days=off, seconds=i))
                et.append("a")
            for i in range(7):
                ts.append(base + datetime.timedelta(days=off, seconds=100 + i))
                et.append("b")
        for i in range(200):
            ts.append(base + datetime.timedelta(days=15, seconds=i))
            et.append("a")
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "event_type": pa.array(et, pa.string()),
                }
            )
        ).repartition(4)
        from collections import defaultdict

        flagged = defaultdict(int)
        for r in events_daily_anomaly(ds).take_all():
            flagged[r["event_type"]] += r["is_outlier"]
        assert flagged["a"] == 1 and flagged["b"] == 0


class TestChunkDocs:
    def _ds(self, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_layout(self):
        from pdf_entity_extraction_ray.ops.packing import chunk_docs

        # 10 tokens, chunk 4, overlap 1 -> stride 3 -> starts 0,3,6 (k=3)
        # lens 4,4,4 ... wait n=10: ceil((10-4)/3)+1 = 3; last len = 10-6=4
        text = " ".join(f"w{i}" for i in range(10))
        rows = sorted(
            (r["chunk_id"], r["start_tok"], r["n_tokens"])
            for r in chunk_docs(self._ds([text]), 4, 1).take_all()
        )
        assert rows == [(0, 0, 4), (1, 3, 4), (2, 6, 4)]

    def test_short_doc_single_chunk(self):
        from pdf_entity_extraction_ray.ops.packing import chunk_docs

        rows = chunk_docs(self._ds(["one two three"]), 10, 2).take_all()
        assert len(rows) == 1
        r = rows[0]
        assert (r["chunk_id"], r["start_tok"], r["n_tokens"]) == (0, 0, 3)

    def test_tail_shortened_never_contained(self):
        from pdf_entity_extraction_ray.ops.packing import chunk_docs

        # n=11, chunk 4, overlap 1 -> stride 3 -> k = ceil(7/3)+1 = 4,
        # starts 0,3,6,9, last len 2
        text = " ".join(f"w{i}" for i in range(11))
        rows = sorted(
            (r["start_tok"], r["n_tokens"])
            for r in chunk_docs(self._ds([text]), 4, 1).take_all()
        )
        assert rows == [(0, 4), (3, 4), (6, 4), (9, 2)]
        # every chunk covers at least one token not in the previous chunk
        ends = [s + n for s, n in rows]
        assert all(ends[i] > ends[i - 1] for i in range(1, len(ends)))

    def test_empty_doc_no_chunks(self):
        from pdf_entity_extraction_ray.ops.packing import chunk_docs

        assert chunk_docs(self._ds(["", "   "]), 4, 1).take_all() == []

    def test_overlap_validation(self):
        from pdf_entity_extraction_ray.ops.packing import chunk_docs

        with pytest.raises(ValueError):
            chunk_docs(self._ds(["x"]), 4, 4)

    def test_oracle_mirror(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from pdf_entity_extraction_ray.ops.packing import chunk_docs, chunk_oracle_sql

        texts = [" ".join(f"t{i}" for i in range(n)) for n in (0, 3, 4, 5, 9, 40)]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        con = duckdb.connect()
        con.execute(f"create view documents as select * from '{tmp_path}/documents.parquet'")
        want = sorted(map(tuple, con.execute(chunk_oracle_sql(4, 1)).fetchall()))
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"])
            for r in chunk_docs(ray.data.from_arrow(tbl), 4, 1).take_all()
        )
        assert got == want


class TestKeyphrases:
    def _ds(self, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_rare_term_wins(self):
        from pdf_entity_extraction_ray.ops.tfidf import keyphrases

        # 'unique' appears once in the corpus, 'common' everywhere:
        # doc 0's top keyphrase must be 'unique' despite equal tf
        texts = ["unique common", "common filler", "common words", "common stuff"]
        rows = [
            (r["doc_id"], r["term"], r["rank"])
            for r in keyphrases(self._ds(texts), 1).take_all()
        ]
        top0 = [t for d, t, r in rows if d == 0 and r == 1]
        assert top0 == ["unique"]

    def test_k_bound_and_tie_break(self):
        from pdf_entity_extraction_ray.ops.tfidf import keyphrases

        # all terms equally rare -> equal scores -> lexicographic ties
        texts = ["zebra apple mango", "other words here"]
        rows = sorted(
            (r["rank"], r["term"])
            for r in keyphrases(self._ds(texts), 2).take_all()
            if r["doc_id"] == 0
        )
        assert rows == [(1, "apple"), (2, "mango")]

    def test_oracle_mirror(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from pdf_entity_extraction_ray.ops.tfidf import (
            keyphrases,
            keyphrases_oracle_sql,
        )

        texts = [
            "red green blue red",
            "green green blue",
            "yellow pink yellow",
            "",
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from '{tmp_path}/documents.parquet'"
        )
        want = sorted(map(tuple, con.execute(keyphrases_oracle_sql(2)).fetchall()))
        got = sorted(
            (r["doc_id"], r["term"], r["rank"])
            for r in keyphrases(ray.data.from_arrow(tbl).repartition(3), 2).take_all()
        )
        assert got == want


class TestEventsValueHistogram:
    def _ds(self, vals, types=None):
        n = len(vals)
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(types or ["t"] * n, pa.string()),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        )

    def test_buckets_and_counts(self):
        from pdf_entity_extraction_ray.ops.relational import events_value_histogram

        ds = self._ds([0.0, 49.9, 50.0, 99.9, 150.0, -0.1])
        got = {
            (r["event_type"], r["bucket"]): r["n"]
            for r in events_value_histogram(ds, 50.0).take_all()
        }
        assert got == {("t", 0): 2, ("t", 1): 2, ("t", 3): 1, ("t", -1): 1}

    def test_null_values_dropped(self):
        from pdf_entity_extraction_ray.ops.relational import events_value_histogram

        ds = self._ds([10.0, None, 20.0])
        total = sum(r["n"] for r in events_value_histogram(ds, 50.0).take_all())
        assert total == 2

    def test_per_type_and_partition_invariance(self):
        from pdf_entity_extraction_ray.ops.relational import events_value_histogram

        vals = [float(i) for i in range(200)]
        types = ["a" if i % 2 else "b" for i in range(200)]
        a = sorted(map(repr, events_value_histogram(self._ds(vals, types), 25.0).take_all()))
        b = sorted(
            map(
                repr,
                events_value_histogram(
                    self._ds(vals, types).repartition(7), 25.0
                ).take_all(),
            )
        )
        assert a == b
        assert len(a) == 16  # 8 buckets x 2 types


class TestEventsTransitions:
    def _ds(self, rows):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array(
                        [base + dt.timedelta(minutes=m) for m, _, _ in rows],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([u for _, u, _ in rows], pa.int64()),
                    "event_type": pa.array([t for _, _, t in rows], pa.string()),
                }
            )
        )

    def test_basic_bigrams(self):
        from pdf_entity_extraction_ray.ops.relational import events_transitions

        rows = [
            (0, 1, "view"), (1, 1, "click"), (2, 1, "view"),
            (0, 2, "view"), (5, 2, "click"),
            (0, 3, "signup"),  # single event: no transition
        ]
        got = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in events_transitions(self._ds(rows)).take_all()
        }
        assert got == {("view", "click"): 2, ("click", "view"): 1}

    def test_tie_breaks_on_event_id(self):
        """Equal timestamps order by event_id — the deterministic tiebreak
        the SQL mirror's (ts, event_id) window uses."""
        from pdf_entity_extraction_ray.ops.relational import events_transitions

        rows = [(0, 1, "a"), (0, 1, "b"), (0, 1, "c")]
        got = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in events_transitions(self._ds(rows)).take_all()
        }
        assert got == {("a", "b"): 1, ("b", "c"): 1}

    def test_partition_invariance(self):
        from pdf_entity_extraction_ray.ops.relational import events_transitions

        rows = [(m, u, "t%d" % (m % 3)) for u in range(20) for m in range(10)]
        a = sorted(map(repr, events_transitions(self._ds(rows)).take_all()))
        b = sorted(map(repr, events_transitions(self._ds(rows).repartition(7)).take_all()))
        assert a == b


class TestOrdersRunningTotal:
    def _ds(self, rows):
        import datetime as dt

        return ray.data.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([k for k, _, _, _ in rows], pa.int64()),
                    "o_custkey": pa.array([c for _, c, _, _ in rows], pa.int64()),
                    "o_orderdate": pa.array(
                        [dt.datetime(2024, 1, d) for _, _, d, _ in rows],
                        pa.timestamp("us"),
                    ),
                    "o_totalprice": pa.array([p for _, _, _, p in rows], pa.float64()),
                }
            )
        )

    def test_cumsum_resets_per_customer(self):
        from pdf_entity_extraction_ray.ops.relational import orders_running_total

        rows = [
            (1, 10, 1, 10.00), (2, 10, 2, 5.50), (3, 10, 3, 0.01),
            (4, 20, 1, 100.00),
        ]
        got = {r["o_orderkey"]: r["running_cents"]
               for r in orders_running_total(self._ds(rows)).take_all()}
        assert got == {1: 1000, 2: 1550, 3: 1551, 4: 10000}

    def test_date_then_key_ordering(self):
        """Same-date orders accumulate in o_orderkey order; an earlier
        date with a larger key still comes first."""
        from pdf_entity_extraction_ray.ops.relational import orders_running_total

        rows = [(9, 1, 1, 1.00), (2, 1, 2, 2.00), (3, 1, 2, 4.00)]
        got = {r["o_orderkey"]: r["running_cents"]
               for r in orders_running_total(self._ds(rows)).take_all()}
        assert got == {9: 100, 2: 300, 3: 700}

    def test_half_cent_rounds_away_from_zero(self):
        from pdf_entity_extraction_ray.ops.relational import orders_running_total

        rows = [(1, 1, 1, 0.005)]
        got = orders_running_total(self._ds(rows)).take_all()
        assert got[0]["running_cents"] == 1


class TestGramNovelty:
    def _docs(self, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_first_doc_all_novel_echo_none(self):
        from pdf_entity_extraction_ray.ops.vocab import gram_novelty

        texts = ["a b c d", "a b c d", "a b c x"]
        got = {r["doc_id"]: (r["novel_grams"], r["total_grams"])
               for r in gram_novelty(self._docs(texts)).take_all()}
        # doc0: grams {abc, bcd} both first-seen; doc1: exact echo, 0 novel;
        # doc2: shares abc, introduces bcx
        assert got == {0: (2, 2), 1: (0, 2), 2: (1, 2)}

    def test_short_docs_absent(self):
        from pdf_entity_extraction_ray.ops.vocab import gram_novelty

        texts = ["one two", "", "x y z"]
        got = {r["doc_id"] for r in gram_novelty(self._docs(texts)).take_all()}
        assert got == {2}

    def test_within_doc_repeat_counts_once(self):
        """Distinct grams per doc: a gram repeated inside one doc is one
        row, and its novelty credit goes to the smallest doc_id."""
        from pdf_entity_extraction_ray.ops.vocab import gram_novelty

        texts = ["p q r p q r", "p q r"]
        got = {r["doc_id"]: (r["novel_grams"], r["total_grams"])
               for r in gram_novelty(self._docs(texts)).take_all()}
        # doc0 grams: pqr, qrp, rpq (distinct) all novel; doc1: pqr only
        assert got == {0: (3, 3), 1: (0, 1)}


class TestSegmentRevenue:
    def _tables(self):
        import datetime as dt

        li = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
                "l_extendedprice": pa.array([100.00, 50.005, 10.0, 1.0], pa.float64()),
                "l_discount": pa.array([0.10, 0.0, 0.05, 0.0], pa.float64()),
            }
        )
        od = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([7, 8, 9], pa.int64()),
            }
        )
        cu = pa.table(
            {
                "c_custkey": pa.array([7, 8], pa.int64()),  # cust 9 missing
                "c_mktsegment": pa.array(["AUTO", "HOME"], pa.string()),
            }
        )
        return (ray.data.from_arrow(li), ray.data.from_arrow(od), ray.data.from_arrow(cu))

    def _expect(self):
        # order 1 -> AUTO: 10000c*90 + 5001c*100 = 900000 + 500100
        # order 2 -> HOME: 1000c*95; order 3 -> no customer, dropped
        return {"AUTO": (2, 1400100), "HOME": (1, 95000)}

    def test_broadcast_path(self):
        from pdf_entity_extraction_ray.ops.relational import segment_revenue

        got = {r["c_mktsegment"]: (r["n_items"], r["revenue_e4"])
               for r in segment_revenue(*self._tables()).take_all()}
        assert got == self._expect()

    def test_shuffle_path_identical(self):
        from pdf_entity_extraction_ray.ops.relational import segment_revenue

        got = {r["c_mktsegment"]: (r["n_items"], r["revenue_e4"])
               for r in segment_revenue(
                   *self._tables(), broadcast_limit_bytes=0, num_partitions=2
               ).take_all()}
        assert got == self._expect()


class TestLineDedup:
    def _docs(self, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_global_first_occurrence_wins(self):
        from pdf_entity_extraction_ray.ops.dedup import line_dedup

        texts = ["alpha. beta. alpha", "beta. gamma", "alpha. beta"]
        got = {r["doc_id"]: r["clean_text"] for r in line_dedup(self._docs(texts)).take_all()}
        # doc0 keeps alpha+beta, drops its own pos-3 'alpha' repeat;
        # doc1 keeps only 'gamma'; doc2 keeps nothing -> absent entirely
        assert got == {0: "alpha. beta", 1: "gamma"}

    def test_all_unique_passthrough(self):
        from pdf_entity_extraction_ray.ops.dedup import line_dedup

        texts = ["one. two", "three. four"]
        got = {r["doc_id"]: r["clean_text"] for r in line_dedup(self._docs(texts)).take_all()}
        assert got == {0: "one. two", 1: "three. four"}


class TestWinnow:
    def _docs(self, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_short_doc_emits_nothing(self):
        from pdf_entity_extraction_ray.ops.text import winnow_batch

        ds = self._docs(["a b c d e"])  # 3 grams < w=4
        assert ds.map_batches(winnow_batch, batch_format="pyarrow").count() == 0

    def test_shared_substring_shares_fingerprint(self):
        """The winnowing guarantee: two docs sharing a >= w+k-1 = 6-word
        run share at least one fingerprint VALUE."""
        from pdf_entity_extraction_ray.ops.text import winnow_batch

        shared = "quick brown fox jumps over lazy"
        ds = self._docs([f"aaa bbb ccc {shared} ddd eee fff",
                         f"xxx yyy {shared} zzz www"])
        rows = ds.map_batches(winnow_batch, batch_format="pyarrow").take_all()
        fp0 = {r["fp"] for r in rows if r["doc_id"] == 0}
        fp1 = {r["fp"] for r in rows if r["doc_id"] == 1}
        assert fp0 & fp1

    def test_matches_bruteforce(self):
        import hashlib as hl

        import numpy as np

        from pdf_entity_extraction_ray.ops.text import _ROLL_MOD, winnow_batch

        text = "the cat sat on the mat and the cat ran off the mat again today"
        words = text.split()
        n = len(words) - 2
        h = [int.from_bytes(hl.md5(" ".join(words[i:i+3]).encode()).digest()[:8],
                            "little") % _ROLL_MOD for i in range(n)]
        want = set()
        for e in range(3, n):
            win = h[e-3:e+1]
            m = min(win)
            pos = e - list(reversed(win)).index(m)  # rightmost min, 0-based
            want.add((pos + 1, m))
        got = {(r["pos"], r["fp"])
               for r in self._docs([text]).map_batches(
                   winnow_batch, batch_format="pyarrow").take_all()}
        assert got == want


class TestEventsCube:
    def _ds(self, rows):
        import datetime as dt

        return ray.data.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([t for t, _, _ in rows], pa.string()),
                    "ts": pa.array(
                        [dt.datetime(2024, 1, d) for _, d, _ in rows],
                        pa.timestamp("us"),
                    ),
                    "value": pa.array([v for _, _, v in rows], pa.float64()),
                }
            )
        )

    def test_all_four_rollup_levels(self):
        from pdf_entity_extraction_ray.ops.relational import events_cube

        rows = [("a", 1, 1.00), ("a", 1, 2.00), ("a", 2, 4.00), ("b", 1, 8.00)]
        got = {(r["event_type"], r["day"]): (r["n"], r["sum_cents"])
               for r in events_cube(self._ds(rows)).take_all()}
        assert got == {
            ("a", "2024-01-01"): (2, 300),
            ("a", "2024-01-02"): (1, 400),
            ("b", "2024-01-01"): (1, 800),
            ("a", "<all>"): (3, 700),
            ("b", "<all>"): (1, 800),
            ("<all>", "2024-01-01"): (3, 1100),
            ("<all>", "2024-01-02"): (1, 400),
            ("<all>", "<all>"): (4, 1500),
        }

    def test_null_value_counts_but_adds_zero(self):
        from pdf_entity_extraction_ray.ops.relational import events_cube

        rows = [("a", 1, 1.00), ("a", 1, None)]
        got = {(r["event_type"], r["day"]): (r["n"], r["sum_cents"])
               for r in events_cube(self._ds(rows)).take_all()}
        assert got[("a", "2024-01-01")] == (2, 100)
        assert got[("<all>", "<all>")] == (2, 100)


class TestCdcChunks:
    def _docs(self, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def _run(self, texts, **kw):
        from functools import partial

        from pdf_entity_extraction_ray.ops.text import cdc_chunks_batch

        return self._docs(texts).map_batches(
            partial(cdc_chunks_batch, **kw), batch_format="pyarrow"
        ).take_all()

    def test_short_doc_single_chunk(self):
        rows = self._run(["one two three"])
        assert len(rows) == 1
        assert rows[0]["chunk_id"] == 1 and rows[0]["n_tokens"] == 3

    def test_token_count_conserved(self):
        from pdf_entity_extraction_ray.ops.text import TOKEN_RE

        text = " ".join(f"tok{i % 97}" for i in range(4000))
        rows = self._run([text], mask=15)  # denser cuts
        assert sum(r["n_tokens"] for r in rows) == len(TOKEN_RE.findall(text))
        assert [r["chunk_id"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) > 1  # 4000 tokens at ~1/16 cut rate must cut

    def test_boundaries_resynchronize_after_insertion(self):
        """The CDC property: prepending tokens changes early chunks but
        the chunk-fingerprint TAIL re-synchronizes."""
        base = " ".join(f"w{i * 7 % 211}" for i in range(2000))
        a = self._run([base], mask=15)
        b = self._run(["inserted prefix tokens " + base], mask=15)
        fps_a = [r["chunk_fp"] for r in a]
        fps_b = [r["chunk_fp"] for r in b]
        # common suffix of at least half of a's chunks
        k = 0
        while k < min(len(fps_a), len(fps_b)) and fps_a[-1 - k] == fps_b[-1 - k]:
            k += 1
        assert k >= len(fps_a) // 2


class TestSnapshotDiff:
    def test_added_removed_stable(self):
        import hashlib as hl

        from pdf_entity_extraction_ray.ops.graph_stats import snapshot_diff

        def side(url):
            return int.from_bytes(hl.md5(url.encode()).digest()[:8], "little") % 2

        urls = [f"https://ex.com/{i}" for i in range(10)]
        a_urls = [u for u in urls if side(u) == 0]
        b_urls = [u for u in urls if side(u) == 1]
        assert a_urls and b_urls
        rows = []
        # stable triple: on one url of each side
        rows.append((a_urls[0], "x", "p", "y"))
        rows.append((b_urls[0], "x", "p", "y"))
        # removed: only side A (twice, to exercise distinct)
        rows.append((a_urls[0], "old", "p", "z"))
        rows.append((a_urls[0], "old", "p", "z"))
        # added: only side B
        rows.append((b_urls[0], "new", "p", "z"))
        t = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "subj_canonical": pa.array([r[1] for r in rows], pa.string()),
                "pred": pa.array([r[2] for r in rows], pa.string()),
                "obj_canonical": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        got = {(r["subj_canonical"], r["status"])
               for r in snapshot_diff(ray.data.from_arrow(t)).take_all()}
        assert got == {("old", "removed"), ("new", "added")}
