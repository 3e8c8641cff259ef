"""Corpus-audit operators: within-document repetition (Gopher duplicate
n-gram fraction), the corpus-wide duplicated-ngram index, and near-dup
component labels (the inspectable complement of near_dedup_keep)."""

import pyarrow as pa
import ray.data

from pdf_entity_extraction_ray.ops.dedup import (
    duplicate_ngrams,
    near_dup_components,
    near_dedup_keep,
)
from pdf_entity_extraction_ray.ops.text import repetition_batch


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    s = ds.schema()
    return pa.table({n: pa.array([], t) for n, t in zip(s.names, s.types)})


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


class TestRepetition:
    def test_hand_computed(self):
        # "a b c a b c a b" -> grams: abc bca cab abc bca cab(? no) ...
        # words: a b c a b c a b  (8 words, 6 grams)
        # grams: "a b c","b c a","c a b","a b c","b c a","c a b" -> 3 distinct
        batch = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["a b c a b c a b", "w x y z", "hi there", ""], pa.string()
                ),
            }
        )
        out = repetition_batch(batch)
        assert out.column("ngrams_total").to_pylist() == [6, 2, 1, 0]
        assert out.column("ngrams_distinct").to_pylist() == [3, 2, 1, 0]
        # (6-3)*1e6 // 6 = 500000
        assert out.column("dup_ppm").to_pylist() == [500000, 0, 0, 0]

    def test_short_doc_one_gram(self):
        batch = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["one two"], pa.string())}
        )
        out = repetition_batch(batch)
        assert out.column("ngrams_total").to_pylist() == [1]
        assert out.column("dup_ppm").to_pylist() == [0]


class TestDuplicateNgrams:
    def test_cross_doc_counts(self):
        ds = _docs(
            [
                "the cat sat on the mat",
                "the cat sat by the door",
                "a bird flew over the mat",
            ]
        )
        out = _collect(duplicate_ngrams(ds))
        got = dict(zip(out.column("ngram").to_pylist(), out.column("n_docs").to_pylist()))
        # "the cat sat" appears in docs 0 and 1; nothing is in all three
        assert got == {"the cat sat": 2}

    def test_within_doc_repeat_counts_once(self):
        # the same gram repeated inside ONE doc must not inflate n_docs
        ds = _docs(["spam spam spam spam spam", "spam spam spam eggs"])
        out = _collect(duplicate_ngrams(ds))
        got = dict(zip(out.column("ngram").to_pylist(), out.column("n_docs").to_pylist()))
        assert got.get("spam spam spam") == 2

    def test_min_docs_threshold(self):
        ds = _docs(["x y z unique here", "x y z other tail", "x y z third copy"])
        out3 = _collect(duplicate_ngrams(ds, min_docs=3))
        assert dict(
            zip(out3.column("ngram").to_pylist(), out3.column("n_docs").to_pylist())
        ) == {"x y z": 3}


class TestNearDupComponents:
    def test_labels_match_keep_policy(self):
        # docs 0/1/2 chain into one cluster (transitive), 3 is clean
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [
            base,
            base + " lambda",
            base + " lambda mu",
            "totally different words entirely here now forever and always",
        ]
        ds = _docs(texts)
        comp = _collect(near_dup_components(ds, 0.5))
        labels = dict(
            zip(comp.column("doc_id").to_pylist(), comp.column("component").to_pylist())
        )
        # every clustered doc labeled with the cluster min; doc 3 absent
        assert labels == {0: 0, 1: 0, 2: 0}
        # complement check: near_dedup_keep keeps exactly {min of cluster} + clean docs
        kept = _collect(near_dedup_keep(ds, 0.5)).column("doc_id").to_pylist()
        assert sorted(kept) == [0, 3]


class TestWebHostStats:
    def test_host_of_vectorized(self):
        from pdf_entity_extraction_ray.ops.web import host_of

        urls = pa.array(
            [
                "https://site1.example.test/page/1",
                "http://a.b:8080/x?q=1",
                "ftp://files.example.test",
                "not a url",
                "https://h/#frag",
            ]
        )
        assert host_of(urls).to_pylist() == [
            "site1.example.test",
            "a.b:8080",
            "files.example.test",
            "",
            "h",
        ]

    def test_host_stats_two_stage(self):
        import datetime

        from pdf_entity_extraction_ray.ops.web import host_stats

        ts = [datetime.datetime(2020, 1, d + 1) for d in range(4)]
        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        [
                            "https://a.test/1",
                            "https://a.test/2",
                            "https://b.test/1",
                            "https://a.test/3",
                        ]
                    ),
                    "warc_ts": pa.array(ts, pa.timestamp("us")),
                    "text": pa.array(["xx", "yyy", "z", "wwww"]),
                }
            )
        )
        rows = {r["host"]: r for r in host_stats(pages).take_all()}
        assert rows["a.test"]["n_pages"] == 3
        assert rows["a.test"]["text_chars"] == 2 + 3 + 4
        assert rows["a.test"]["first_crawl_us"] == int(ts[0].timestamp() * 1e6)
        assert rows["a.test"]["last_crawl_us"] == int(ts[3].timestamp() * 1e6)
        assert rows["b.test"]["n_pages"] == 1


class TestKmeans:
    def _blobs(self, n=120, k=4, d=6, seed=3):
        import numpy as np

        rng = np.random.RandomState(seed)
        centers = rng.standard_normal((k, d)) * 10
        X = np.vstack(
            [centers[i % k] + rng.standard_normal(d) * 0.1 for i in range(n)]
        )
        # put one vector of each blob first so the deterministic init
        # (k smallest vec_ids) seeds one centroid per blob
        return np.arange(n), X

    def test_matches_single_process_reference(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.kmeans import (
            kmeans_cluster,
            kmeans_reference,
        )

        ids, X = self._blobs()
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
                }
            )
        ).repartition(5)
        got = {r["vec_id"]: r["cluster"] for r in kmeans_cluster(ds, 4, 8).take_all()}
        C = kmeans_reference(ids, X, 4, 8)
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        ref = dict(zip(ids.tolist(), np.argmin(d2, axis=1).tolist()))
        assert got == ref
        # blobs are separated: members of the same blob share a cluster
        for i in range(len(ids) - 4):
            assert got[i] == got[i + 4] or (i % 4) != ((i + 4) % 4)

    def test_deterministic_across_runs(self):
        from pdf_entity_extraction_ray.ops.kmeans import kmeans_fit

        ids, X = self._blobs(seed=9)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
                }
            )
        ).repartition(7)
        c1 = kmeans_fit(ds, 4, 5)
        c2 = kmeans_fit(ds, 4, 5)
        assert (c1 == c2).all()  # bit-identical: deterministic fold order


class TestLatestCrawl:
    def test_normalize_url_rules(self):
        from pdf_entity_extraction_ray.ops.web import normalize_url

        urls = pa.array(
            [
                "HTTPS://Example.TEST/Path/Keep?x=1&utm_source=tw&y=2#frag",
                "https://example.test/Path/Keep?utm_campaign=z",
                "http://a.test/p?fbclid=abc123",
                "http://a.test/p?gclid=g&real=1",
                "no scheme here",
            ]
        )
        # NOTE: scheme match is case-sensitive lowercase in both RE2s —
        # an uppercase scheme has no scheme://authority match -> ''
        assert normalize_url(urls).to_pylist() == [
            "",
            "https://example.test/Path/Keep",
            "http://a.test/p",
            "http://a.test/p?real=1",
            "",
        ]

    def test_latest_crawl_argmax(self):
        import datetime

        from pdf_entity_extraction_ray.ops.web import latest_crawl

        d = lambda day: datetime.datetime(2021, 3, day)
        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        [
                            "https://s.test/a?utm_source=x",  # same norm as below
                            "https://s.test/a",
                            "https://s.test/b",
                            "https://s.test/b#frag",  # tie ts with above
                        ]
                    ),
                    "warc_ts": pa.array([d(1), d(9), d(5), d(5)], pa.timestamp("us")),
                }
            )
        ).repartition(3)
        rows = {r["norm_url"]: r for r in latest_crawl(pages).take_all()}
        assert len(rows) == 2
        a = rows["https://s.test/a"]
        assert a["url"] == "https://s.test/a"  # newest crawl wins
        b = rows["https://s.test/b"]
        assert b["url"] == "https://s.test/b"  # ts tie -> smallest raw url


class TestCapPerHost:
    def test_cap_keeps_earliest_k(self):
        import datetime

        from pdf_entity_extraction_ray.ops.web import cap_per_host

        ts = [datetime.datetime(2020, 1, d + 1) for d in range(6)]
        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        [
                            "https://big.test/5",   # day 5 -> dropped (4th)
                            "https://big.test/1",   # day 1 -> kept
                            "https://small.test/1",
                            "https://big.test/2",   # day 2 -> kept
                            "https://big.test/3",   # day 3 -> kept
                            "https://big.test/0",   # day 3 TIE -> url break
                        ]
                    ),
                    "warc_ts": pa.array(
                        [ts[4], ts[0], ts[0], ts[1], ts[2], ts[2]], pa.timestamp("us")
                    ),
                    "text": pa.array(["x"] * 6),
                }
            )
        )
        out = _collect(cap_per_host(pages, k=3))
        got = sorted(zip(out.column("host").to_pylist(), out.column("url").to_pylist()))
        # day-3 tie between /3 and /0 -> url ascending keeps /0
        assert got == [
            ("big.test", "https://big.test/0"),
            ("big.test", "https://big.test/1"),
            ("big.test", "https://big.test/2"),
            ("small.test", "https://small.test/1"),
        ]

    def test_cap_two_stage_equals_global(self):
        """The per-batch combiner must not change the answer vs a single
        global sort — force many small blocks and compare to a one-block
        run."""
        import datetime

        from pdf_entity_extraction_ray.ops.web import cap_per_host

        base = datetime.datetime(2021, 1, 1)
        n = 200
        tbl = pa.table(
            {
                "url": pa.array(
                    [f"https://h{i % 7}.test/p{i}" for i in range(n)]
                ),
                "warc_ts": pa.array(
                    [base + datetime.timedelta(hours=(i * 37) % 501) for i in range(n)],
                    pa.timestamp("us"),
                ),
                "text": pa.array(["x"] * n),
            }
        )
        many = ray.data.from_arrow(tbl).repartition(16)
        one = ray.data.from_arrow(tbl)
        key = lambda t: sorted(
            zip(t.column("host").to_pylist(), t.column("url").to_pylist())
        )
        got_many = key(_collect(cap_per_host(many, k=4)))
        got_one = key(_collect(cap_per_host(one, k=4)))
        assert got_many == got_one
        hosts = [h for h, _ in got_many]
        assert max(hosts.count(h) for h in set(hosts)) <= 4


class TestDecontam:
    def test_counts_and_drop(self):
        from pdf_entity_extraction_ray.ops.decontam import (
            contamination_counts,
            drop_contaminated,
        )

        ev = _docs(["alpha beta gamma delta"])
        train = _docs(
            [
                "alpha beta gamma epsilon",      # shares gram "alpha beta gamma"
                "nothing shared here at all",
                "x alpha beta gamma delta y",    # shares 2 grams
            ]
        )
        out = _collect(contamination_counts(train, ev, n=3))
        rows = {
            r: (c, f)
            for r, c, f in zip(
                out.column("doc_id").to_pylist(),
                out.column("contaminated_ngrams").to_pylist(),
                out.column("contaminated").to_pylist(),
            )
        }
        assert rows[0] == (1, True)
        assert rows[1] == (0, False)
        assert rows[2] == (2, True)
        kept = _collect(drop_contaminated(train, ev, n=3)).column("doc_id").to_pylist()
        assert kept == [1]

    def test_short_doc_convention(self):
        """Docs shorter than n words contribute their whole token join —
        the shingle-family convention, so a verbatim short eval doc is
        still caught."""
        from pdf_entity_extraction_ray.ops.decontam import contamination_counts

        ev = _docs(["tiny doc"])
        train = _docs(["tiny doc", "tiny dog"])
        out = _collect(contamination_counts(train, ev, n=13))
        rows = dict(
            zip(out.column("doc_id").to_pylist(), out.column("contaminated").to_pylist())
        )
        assert rows == {0: True, 1: False}


class TestPIIRedact:
    def test_planted_pii(self):
        from pdf_entity_extraction_ray.ops.text import redact_pii_batch

        batch = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "mail me at First.Last+x@sub.example.org today",
                        "server 192.168.0.1 and 10.0.0.255 up; v1.2 ok",
                        "no pii here",
                    ]
                ),
            }
        )
        out = redact_pii_batch(batch)
        assert out.column("redacted").to_pylist() == [
            "mail me at <EMAIL> today",
            "server <IP> and <IP> up; v1.2 ok",
            "no pii here",
        ]
        assert out.column("n_emails").to_pylist() == [1, 0, 0]
        assert out.column("n_ips").to_pylist() == [0, 2, 0]


class TestPackSequences:
    def test_offsets_reset_per_shard(self):
        from pdf_entity_extraction_ray.ops.packing import pack_sequences

        # 5-token docs; shard_size=2 -> shards {0,1},{2,3},{4}
        texts = ["a b c d e"] * 5
        out = _collect(pack_sequences(_docs(texts), budget=8, shard_size=2))
        rows = {
            r[0]: r[1:]
            for r in zip(
                out.column("doc_id").to_pylist(),
                out.column("shard").to_pylist(),
                out.column("tok_offset").to_pylist(),
                out.column("bin").to_pylist(),
            )
        }
        # doc0: shard0 off0 bin0; doc1: shard0 off5 bin0
        # doc2: shard1 off0 bin0; doc3: shard1 off5 bin0; doc4: shard2 off0
        assert rows == {
            0: (0, 0, 0),
            1: (0, 5, 0),
            2: (1, 0, 0),
            3: (1, 5, 0),
            4: (2, 0, 0),
        }

    def test_bin_boundaries(self):
        from pdf_entity_extraction_ray.ops.packing import pack_sequences

        # one shard; offsets 0,3,6,9 with budget 4 -> bins 0,0,1,2
        texts = ["x y z"] * 4
        out = _collect(pack_sequences(_docs(texts), budget=4, shard_size=100))
        got = dict(
            zip(out.column("doc_id").to_pylist(), out.column("bin").to_pylist())
        )
        assert got == {0: 0, 1: 0, 2: 1, 3: 2}

    def test_block_split_invariant(self):
        """Packing must not depend on how blocks split the input."""
        from pdf_entity_extraction_ray.ops.packing import pack_sequences

        texts = [f"tok{i} " * ((i * 7) % 11 + 1) for i in range(60)]
        key = lambda t: sorted(
            zip(
                t.column("doc_id").to_pylist(),
                t.column("tok_offset").to_pylist(),
                t.column("bin").to_pylist(),
            )
        )
        one = key(_collect(pack_sequences(_docs(texts), budget=16, shard_size=10)))
        many = key(
            _collect(
                pack_sequences(_docs(texts).repartition(13), budget=16, shard_size=10)
            )
        )
        assert one == many


class TestSketches:
    def test_hll_estimate_accuracy_and_merge_invariance(self):
        from pdf_entity_extraction_ray.ops.sketch import hll_estimate, vocab_hll

        # 6000 distinct tokens spread over 300 docs
        texts = [
            " ".join(f"tok{i}" for i in range(d * 20, d * 20 + 20))
            for d in range(300)
        ]
        ds = _docs(texts)
        regs = _collect(vocab_hll(ds))
        est = hll_estimate(regs)
        assert abs(est - 6000) / 6000 < 0.05  # ~1.6% expected at p=12
        # register MAX-merge is associative: block splits cannot matter
        regs2 = _collect(vocab_hll(_docs(texts).repartition(17)))
        key = lambda t: sorted(
            zip(t.column("bucket").to_pylist(), t.column("rho_max").to_pylist())
        )
        assert key(regs) == key(regs2)

    def test_bottomk_matches_bruteforce_and_split_invariant(self):
        from pdf_entity_extraction_ray.functions.similarity import _md5_hash64
        from pdf_entity_extraction_ray.ops.sketch import bottomk_sample

        texts = ["x"] * 500
        ds = _docs(texts)
        out = _collect(bottomk_sample(ds, k=20))
        got = list(
            zip(out.column("sample_rank").to_pylist(), out.column("doc_id").to_pylist())
        )
        expected = sorted(
            range(500), key=lambda d: (_md5_hash64(str(d).encode()), d)
        )[:20]
        assert sorted(got) == [(r, d) for r, d in enumerate(expected)]
        out2 = _collect(bottomk_sample(_docs(texts).repartition(23), k=20))
        assert sorted(
            zip(out2.column("sample_rank").to_pylist(), out2.column("doc_id").to_pylist())
        ) == sorted(got)


class TestCuratePipeline:
    def test_each_stage_bites(self):
        from pdf_entity_extraction_ray.pipelines.clean import curate_documents

        base = (
            "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango"
        )
        texts = [
            base + " uniform victor",                      # 0: survives (redacted)
            base + " uniform victor",                      # 1: exact dup of 0
            base + " whiskey xray",                        # 2: near-dup of 0 (J>0.7)
            "!!! ??? ...",                                 # 3: quality-gated
            "zulu yankee xont wumbo vexil umbra toller "
            "sproke quim plonk narf mib lurt "
            "contact a.b@c.example.net now",               # 4: survives, PII redacted
            "the benchmark secret holdout sentence lives here verbatim "
            "plus padding words one two three four five six seven",  # 5: contaminated
        ]
        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(6), pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * 6),
                    "source": pa.array(["s"] * 6),
                }
            )
        )
        ev = _docs(["the benchmark secret holdout sentence lives here"])
        out = _collect(curate_documents(docs, ev, decontam_n=3))
        rows = dict(zip(out.column("doc_id").to_pylist(), out.column("text").to_pylist()))
        assert sorted(rows) == [0, 4]
        assert "<EMAIL>" in rows[4] and "@" not in rows[4]


class TestEventQuantiles:
    def test_exact_disc_quantiles_split_invariant(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.relational import events_value_quantiles

        rng = np.random.RandomState(11)
        n = 2000
        types = rng.choice(["a", "b", "c"], n)
        vals = np.round(rng.standard_normal(n) * 50, 2)
        tbl = pa.table(
            {
                "event_type": pa.array(types.tolist()),
                "value": pa.array(vals, pa.float64()),
            }
        )

        def brute(t):
            vs = np.sort(vals[types == t])
            return {
                q: vs[max(int(np.ceil(q * len(vs))), 1) - 1] for q in (0.5, 0.9, 0.99)
            }

        for parts in (1, 19):
            ds = ray.data.from_arrow(tbl)
            if parts > 1:
                ds = ds.repartition(parts)
            out = _collect(events_value_quantiles(ds))
            rows = {
                r[0]: r[1:]
                for r in zip(
                    out.column("event_type").to_pylist(),
                    out.column("p50").to_pylist(),
                    out.column("p90").to_pylist(),
                    out.column("p99").to_pylist(),
                )
            }
            for t in ("a", "b", "c"):
                e = brute(t)
                assert rows[t] == (e[0.5], e[0.9], e[0.99])


class TestEventsJsonAgg:
    def test_hand_computed(self):
        from pdf_entity_extraction_ray.ops.relational import events_json_agg

        events = pa.table(
            {
                "event_type": pa.array(["x", "x", "y"]),
                "props": pa.array(['{"k": 3}', '{"k": 5}', '{"k": -1}']),
            }
        )
        rows = {
            r["event_type"]: (r["n"], r["k_sum"], r["k_min"], r["k_max"])
            for r in events_json_agg(ray.data.from_arrow(events)).take_all()
        }
        assert rows == {"x": (2, 8, 3, 5), "y": (1, -1, -1, -1)}


class TestLinkGraph:
    def test_extract_and_host_graph(self):
        from pdf_entity_extraction_ray.ops.web import extract_links, host_link_graph

        html1 = (
            '<html><body><nav><a href="https://b.test/x"></a> '
            '<a href="https://b.test/x"></a>'  # duplicate: two edges
            '<a href="/about">About</a>'       # relative: ignored
            '<a href="https://c.test/y">c</a></nav></body></html>'
        ).encode()
        html2 = b'<html><body><a href="https://a.test/1">back</a></body></html>'
        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(["https://a.test/1", "https://b.test/x"]),
                    "html": pa.array([html1, html2], pa.binary()),
                }
            )
        )
        edges = _collect(extract_links(pages))
        got = sorted(zip(edges.column("src").to_pylist(), edges.column("dst").to_pylist()))
        assert got == [
            ("https://a.test/1", "https://b.test/x"),
            ("https://a.test/1", "https://b.test/x"),
            ("https://a.test/1", "https://c.test/y"),
            ("https://b.test/x", "https://a.test/1"),
        ]
        hg = {
            (r["src_host"], r["dst_host"]): r["n_links"]
            for r in host_link_graph(pages).take_all()
        }
        assert hg == {
            ("a.test", "b.test"): 2,
            ("a.test", "c.test"): 1,
            ("b.test", "a.test"): 1,
        }

    def test_planted_outlinks_text_invisible(self):
        """The corpus synthesizer's planted outlinks must not change the
        canonical extracted text (empty anchors collapse away)."""
        from pdf_entity_extraction_ray.functions.htmlx import html_to_text
        from pdf_entity_extraction_ray.sources.corpus import (
            cached_catalog,
            generate_page,
        )

        clusters = cached_catalog(42, 10)
        with_links = generate_page(3, clusters, 42, n_pages=40)
        without = generate_page(3, clusters, 42, n_pages=None)
        assert with_links.text == without.text
        assert html_to_text(with_links.html) == with_links.text
        assert b'<a href="https://site' in with_links.html
        assert b"<a href=\"https://site" not in without.html


class TestLinkPagerank:
    def test_matches_reference_on_hand_graph(self):
        from pdf_entity_extraction_ray.ops.web import link_pagerank
        from pdf_entity_extraction_ray.sources.corpus import pagerank_reference

        # host graph: a->b, b->c, c->a (cycle) plus a->c
        mk = lambda *urls: (
            "<html><body>"
            + "".join(f'<a href="{u}"></a>' for u in urls)
            + "</body></html>"
        ).encode()
        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        ["https://a.test/1", "https://b.test/1", "https://c.test/1"]
                    ),
                    "html": pa.array(
                        [
                            mk("https://b.test/x", "https://c.test/x"),
                            mk("https://c.test/x"),
                            mk("https://a.test/x"),
                        ],
                        pa.binary(),
                    ),
                }
            )
        )
        got = {r["host"]: r["rank_ppm"] for r in link_pagerank(pages).take_all()}
        # reference over host indices 0=a 1=b 2=c with edges (0,1),(0,2),(1,2),(2,0)
        import numpy as np

        nodes, rank = pagerank_reference([(0, 1), (0, 2), (1, 2), (2, 0)])
        want = {
            f"{h}.test": int(np.round(r * 1e6))
            for h, r in zip("abc", rank)
        }
        assert got == want


class TestDeltaDedupAndRollup:
    def test_delta_dedup_semantics(self):
        from pdf_entity_extraction_ray.ops.dedup import exact_dedup_delta

        mk = lambda ids, texts: ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
            )
        )
        existing = mk([0, 1], ["old doc one", "old doc two"])
        new = mk(
            [10, 11, 12, 13],
            ["old doc one",      # dup of existing -> dropped
             "brand new alpha",  # survives
             "brand new alpha",  # within-batch dup -> dropped (11 wins)
             "brand new beta"],  # survives
        )
        out = _collect(exact_dedup_delta(new, existing))
        assert sorted(out.column("doc_id").to_pylist()) == [11, 13]

    def test_rollup_levels(self):
        from pdf_entity_extraction_ray.ops.relational import lineitem_rollup

        t = pa.table(
            {
                "l_returnflag": pa.array(["A", "A", "B"]),
                "l_linestatus": pa.array(["x", "y", "x"]),
                "l_quantity": pa.array([1.0, 2.0, 4.0], pa.float64()),
            }
        )
        out = _collect(lineitem_rollup(ray.data.from_arrow(t)))
        rows = {
            (r, s): (q, n)
            for r, s, q, n in zip(
                out.column("l_returnflag").to_pylist(),
                out.column("l_linestatus").to_pylist(),
                out.column("sum_qty").to_pylist(),
                out.column("n_rows").to_pylist(),
            )
        }
        assert rows == {
            ("A", "x"): (1.0, 1),
            ("A", "y"): (2.0, 1),
            ("B", "x"): (4.0, 1),
            ("A", "ALL"): (3.0, 2),
            ("B", "ALL"): (4.0, 1),
            ("ALL", "ALL"): (7.0, 3),
        }


class TestVocabBuild:
    def test_global_ids_match_bruteforce_any_blocking(self):
        from collections import Counter

        from pdf_entity_extraction_ray.ops.text import TOKEN_RE
        from pdf_entity_extraction_ray.ops.vocab import vocab_build

        texts = [f"w{i % 17} w{i % 5} common common" for i in range(200)]
        cnt = Counter()
        for t in texts:
            cnt.update(TOKEN_RE.findall(t.lower()))
        expected = {
            tok: (n, rank)
            for rank, (tok, n) in enumerate(
                sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        }
        for parts in (1, 13):
            ds = _docs(texts)
            if parts > 1:
                ds = ds.repartition(parts)
            out = _collect(vocab_build(ds))
            got = {
                t: (n, i)
                for t, n, i in zip(
                    out.column("token").to_pylist(),
                    out.column("n").to_pylist(),
                    out.column("token_id").to_pylist(),
                )
            }
            assert got == expected
            ids = sorted(out.column("token_id").to_pylist())
            assert ids == list(range(len(expected)))  # contiguous 0..V-1

    def test_min_count_prunes(self):
        from pdf_entity_extraction_ray.ops.vocab import vocab_build

        out = _collect(vocab_build(_docs(["a a a b"]), min_count=2))
        assert out.column("token").to_pylist() == ["a"]


class TestEncodeDocuments:
    def test_encode_roundtrip_and_oov(self):
        from pdf_entity_extraction_ray.ops.vocab import encode_documents

        # vocab from the corpus itself; with vocab_size=2 the third-ranked
        # token becomes OOV (-1)
        texts = ["aa aa aa bb bb cc", "bb aa cc"]
        out = _collect(encode_documents(_docs(texts), vocab_size=2))
        rows = sorted(
            zip(
                out.column("doc_id").to_pylist(),
                out.column("pos").to_pylist(),
                out.column("token_id").to_pylist(),
            )
        )
        # ranks: aa(4)->0, bb(3)->1, cc(2)->OOV
        assert rows == [
            (0, 0, 0), (0, 1, 0), (0, 2, 0), (0, 3, 1), (0, 4, 1), (0, 5, -1),
            (1, 0, 1), (1, 1, 0), (1, 2, -1),
        ]


class TestEmbDimStats:
    def test_matches_numpy_any_blocking(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.kmeans import emb_dim_stats

        rng = np.random.RandomState(5)
        mat = rng.standard_normal((300, 8)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(300), pa.int64()),
                "embedding": pa.array([r.tolist() for r in mat]),
            }
        )
        m64 = mat.astype(np.float64)
        want_mean = np.floor(m64.mean(axis=0) * 1e6).astype(np.int64)
        want_var = np.floor(
            ((m64 * m64).mean(axis=0) - m64.mean(axis=0) ** 2) * 1e6
        ).astype(np.int64)
        for parts in (1, 11):
            ds = ray.data.from_arrow(tbl)
            if parts > 1:
                ds = ds.repartition(parts)
            out = _collect(emb_dim_stats(ds))
            got = {
                d: (m, v)
                for d, m, v in zip(
                    out.column("dim").to_pylist(),
                    out.column("mean_ppm").to_pylist(),
                    out.column("var_ppm").to_pylist(),
                )
            }
            assert got == {i: (want_mean[i], want_var[i]) for i in range(8)}


class TestDuplicatedSpans:
    def test_hand_case(self):
        from pdf_entity_extraction_ray.ops.dedup import duplicated_spans

        shared = "one two three four five"  # 3 consecutive dup 3-grams
        texts = [
            f"intro {shared} outro words here",
            f"other {shared} ending tokens now",
            "completely different text with no overlap at all ok",
        ]
        out = _collect(duplicated_spans(_docs(texts), k=3, min_run=2))
        spans = sorted(
            zip(
                out.column("doc_id").to_pylist(),
                out.column("start_tok").to_pylist(),
                out.column("end_tok").to_pylist(),
            )
        )
        # shared block occupies tokens 1..5 in both docs: grams at pos
        # 1,2,3 are duplicated -> run of 3 grams -> tokens 1..5
        assert spans == [(0, 1, 5), (1, 1, 5)]

    def test_within_doc_repeat_not_marked(self):
        """A gram repeated only WITHIN one doc is not a cross-doc dup."""
        from pdf_entity_extraction_ray.ops.dedup import duplicated_spans

        texts = ["a b c a b c a b c", "totally different words here now"]
        out = _collect(duplicated_spans(_docs(texts), k=3, min_run=2))
        assert out.num_rows == 0

    def test_within_doc_repeat_survives_block_splits(self):
        """ADVICE r3: a huge doc whose gram rows split across blocks must
        not double-count a within-doc repeated gram as df >= 2 — the
        (token, doc) distinct is global, not batch-local.  Forced by a
        tiny target block size plus a straddling repeat."""
        from ray.data import DataContext

        from pdf_entity_extraction_ray.ops.dedup import duplicated_spans

        marker = "marker alpha beta"
        words = [f"w{i}" for i in range(3000)]
        words[10:10] = marker.split()
        words[2800:2800] = marker.split()  # same 3-gram, ~2800 rows apart
        texts = [" ".join(words), "totally unrelated second document text"]
        ctx = DataContext.get_current()
        old = ctx.target_max_block_size
        ctx.target_max_block_size = 16 * 1024  # force mid-doc block splits
        try:
            out = _collect(duplicated_spans(_docs(texts), k=3, min_run=1))
        finally:
            ctx.target_max_block_size = old
        assert out.num_rows == 0


class TestFuzzyDecontam:
    def test_near_dup_of_eval_dropped(self):
        from pdf_entity_extraction_ray.ops.decontam import drop_fuzzy_contaminated

        base = (
            "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen"
        )
        ev = _docs([base])
        train = _docs(
            [
                base + " sixteen",                      # near-dup of eval -> dropped
                "totally different content here with many novel words indeed",
                base.replace("one", "zzz"),            # still J>0.7 -> dropped
            ]
        )
        out = _collect(drop_fuzzy_contaminated(train, ev, 0.7))
        assert out.column("doc_id").to_pylist() == [1]

    def test_no_overlap_passthrough(self):
        from pdf_entity_extraction_ray.ops.decontam import drop_fuzzy_contaminated

        ev = _docs(["completely unrelated evaluation sentence here"])
        train = _docs(["alpha beta gamma delta epsilon zeta eta theta"])
        out = _collect(drop_fuzzy_contaminated(train, ev, 0.7))
        assert out.column("doc_id").to_pylist() == [0]


class TestRemoveDuplicatedSpans:
    def test_cut_matches_hand_case(self):
        from pdf_entity_extraction_ray.ops.dedup import remove_duplicated_spans

        shared = "one two three four five"
        texts = [
            f"intro {shared} outro words here",
            f"other {shared} ending tokens now",
            "clean doc stays whole entirely",
        ]
        out = _collect(remove_duplicated_spans(_docs(texts), k=3, min_run=2))
        rows = {
            d: (c, n)
            for d, c, n in zip(
                out.column("doc_id").to_pylist(),
                out.column("clean_tokens").to_pylist(),
                out.column("n_removed").to_pylist(),
            )
        }
        assert rows[0] == ("intro outro words here", 5)
        assert rows[1] == ("other ending tokens now", 5)
        assert rows[2] == ("clean doc stays whole entirely", 0)

    def test_no_dups_passthrough(self):
        from pdf_entity_extraction_ray.ops.dedup import remove_duplicated_spans

        out = _collect(
            remove_duplicated_spans(
                _docs(["alpha beta gamma", "delta epsilon zeta"]), k=3, min_run=2
            )
        )
        assert out.column("n_removed").to_pylist() == [0, 0]


class TestLinkPagerankCheckpoint:
    def test_checkpointed_rerun_identical(self, tmp_path):
        from pdf_entity_extraction_ray.ops.web import link_pagerank
        from pdf_entity_extraction_ray.sources.corpus import write_corpus
        import shutil

        corpus = str(tmp_path / "c")
        write_corpus(corpus, n_pages=80, seed=42, n_per_type=10, write_gold=False)
        pages = ray.data.read_parquet(f"{corpus}/pages")
        ck = str(tmp_path / "ck")
        first = {
            r["host"]: r["rank_ppm"]
            for r in link_pagerank(pages, checkpoint_dir=ck).take_all()
        }
        # rerun resumes from the newest checkpointed round — identical ranks
        second = {
            r["host"]: r["rank_ppm"]
            for r in link_pagerank(pages, checkpoint_dir=ck).take_all()
        }
        plain = {r["host"]: r["rank_ppm"] for r in link_pagerank(pages).take_all()}
        assert first == second == plain and first
        shutil.rmtree(ck, ignore_errors=True)


class TestInvertedIndex:
    def test_matches_bruteforce_any_blocking(self):
        from collections import defaultdict

        from pdf_entity_extraction_ray.ops.text import TOKEN_RE
        from pdf_entity_extraction_ray.ops.vocab import inverted_index

        texts = [f"w{i % 7} w{i % 7} w{i % 3} shared Hapax{i}" for i in range(40)]
        ref = defaultdict(set)
        for d, t in enumerate(texts):
            for w in set(TOKEN_RE.findall(t.lower())):
                ref[w].add(d)
        expected = {
            w: (len(ds), sorted(ds)[:5]) for w, ds in ref.items() if len(ds) >= 2
        }
        for parts in (1, 13):
            ds = _docs(texts)
            if parts > 1:
                ds = ds.repartition(parts)
            out = _collect(inverted_index(ds, min_df=2, max_postings=5))
            got = {
                t: (df, list(p))
                for t, df, p in zip(
                    out.column("token").to_pylist(),
                    out.column("df").to_pylist(),
                    out.column("postings").to_pylist(),
                )
            }
            assert got == expected
            # hapaxes pruned, caps respected, df keeps the true count
            assert all(len(p) <= 5 and df >= len(p) for df, p in got.values())

    def test_all_hapax_is_empty(self):
        from pdf_entity_extraction_ray.ops.vocab import inverted_index

        out = _collect(inverted_index(_docs(["only one", "two unique"]), min_df=2))
        assert out.num_rows == 0


class TestBigramPMI:
    def _brute(self, texts, min_count, top_n):
        import math
        from collections import Counter

        from pdf_entity_extraction_ray.ops.text import TOKEN_RE

        uni, bi = Counter(), Counter()
        for t in texts:
            toks = TOKEN_RE.findall(t.lower())
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        T, B = float(sum(uni.values())), float(sum(bi.values()))
        rows = [
            (x, y, n, uni[x], uni[y],
             math.floor(1_000_000.0 * math.log((n * T * T) / (B * uni[x] * uni[y]))))
            for (x, y), n in bi.items() if n >= min_count
        ]
        rows.sort(key=lambda r: (-r[5], r[0], r[1]))
        return rows[:top_n]

    def test_matches_bruteforce_any_blocking(self):
        import random

        from pdf_entity_extraction_ray.ops.vocab import bigram_pmi

        rng = random.Random(5)
        words = [f"w{i}" for i in range(12)]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 40)))
            + (" strong pair" if i % 4 == 0 else "")
            for i in range(80)
        ]
        expected = self._brute(texts, 2, 25)
        for parts in (1, 9):
            ds = _docs(texts)
            if parts > 1:
                ds = ds.repartition(parts)
            out = _collect(bigram_pmi(ds, min_count=2, top_n=25))
            got = sorted(
                zip(*(out.column(c).to_pylist()
                      for c in ("x", "y", "n_xy", "n_x", "n_y", "pmi_ppm"))),
                key=lambda r: (-r[5], r[0], r[1]),
            )
            assert got == expected
        # the planted collocation ranks first
        assert expected[0][:2] == ("strong", "pair")

    def test_no_bigrams_above_cut(self):
        from pdf_entity_extraction_ray.ops.vocab import bigram_pmi

        out = _collect(bigram_pmi(_docs(["a b", "c d"]), min_count=5))
        assert out.num_rows == 0


class TestSemDeDup:
    def _emb(self, vecs):
        import numpy as np

        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(vecs)), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
                    ),
                }
            )
        )

    def test_planted_neardups_pruned_earliest_kept(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.kmeans import semdedup

        rng = np.random.default_rng(4)
        base = rng.normal(size=(20, 8))
        vecs = list(base)
        # plant: vec 20/21 are tiny perturbations of vec 3 -> same cluster,
        # cosine ~1 -> both pruned, vec 3 (earliest id) kept
        vecs.append(base[3] + 1e-4)
        vecs.append(base[3] - 1e-4)
        out = {
            r["vec_id"]: r["keep"]
            for r in semdedup(self._emb(vecs), k=4, iterations=5, threshold=0.95).take_all()
        }
        assert len(out) == 22
        assert out[3] == 1 and out[20] == 0 and out[21] == 0
        # everything else is random-normal in 8d: nothing near cosine 0.95
        assert sum(out.values()) == 20

    def test_matches_reference_mirror(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.kmeans import semdedup, semdedup_reference

        rng = np.random.default_rng(7)
        # well-separated blobs: assignment margins dwarf the ~1e-13
        # centroid float-fold noise between the distributed fit and the
        # single-process mirror (the emb_kmeans margin argument)
        centers = np.array([[10, 0, 0, 0, 0, 0], [0, 10, 0, 0, 0, 0],
                            [0, 0, 10, 0, 0, 0]], dtype=float)
        X = centers[np.arange(60) % 3] + 0.1 * rng.normal(size=(60, 6))
        X[50:] = X[:10] * 1.001  # ten scaled copies (cosine 1 exactly-ish)
        ids = np.arange(60)
        vid, cl, keep = semdedup_reference(ids, X, k=3, iterations=4, threshold=0.9)
        got = sorted(
            (r["vec_id"], r["cluster"], r["keep"])
            for r in semdedup(self._emb(list(X)), k=3, iterations=4, threshold=0.9).take_all()
        )
        assert got == list(zip(vid.tolist(), cl.tolist(), keep.tolist()))
        # blob geometry: every same-blob pair has cosine ~1 (direction ==
        # center direction), so exactly the earliest vec_id per cluster
        # survives
        assert int(keep.sum()) == 3
        kept = {int(v) for v, kp in zip(vid, keep) if kp}
        first_per_cluster = {}
        for v, c in zip(vid.tolist(), cl.tolist()):
            first_per_cluster.setdefault(c, v)
        assert kept == set(first_per_cluster.values())


class TestProductQuantization:
    def _blobs(self, n=90, d=8, n_blobs=3, seed=2):
        import numpy as np

        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(n_blobs, d)) * 5.0
        X = centers[np.arange(n) % n_blobs] + 0.3 * rng.normal(size=(n, d))
        return np.arange(n, dtype=np.int64), X

    def _ds(self, ids, X):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in X], pa.list_(pa.float64())
                    ),
                }
            )
        )

    def test_matches_reference_mirror_any_blocking(self):
        from pdf_entity_extraction_ray.ops.pq import knn_pq, pq_reference

        ids, X = self._blobs()
        q, n, r = pq_reference(ids, X, [0, 1, 2], k=5, m=4, n_codes=8, iterations=4)
        ref = set(zip(q, n, r))
        for parts in (1, 7):
            ds = self._ds(ids, X)
            if parts > 1:
                ds = ds.repartition(parts)
            got = {
                (x["query_id"], x["neighbor_id"], x["rank"])
                for x in knn_pq(ds, [0, 1, 2], 5, m=4, n_codes=8, iterations=4).take_all()
            }
            assert got == ref

    def test_blob_structure_preserved(self):
        """With separated blobs every PQ neighbor must come from the
        query's own blob (within-blob members are cosine near-ties, so
        exact-RANK recall is the wrong property for a lossy code — blob
        membership is the semantic one)."""
        from pdf_entity_extraction_ray.ops.pq import knn_pq

        ids, X = self._blobs(n=120, d=16, n_blobs=4)
        ds = self._ds(ids, X)
        for x in knn_pq(ds, [0, 1, 2, 3], 5, m=4, n_codes=16, iterations=5).take_all():
            assert x["neighbor_id"] % 4 == x["query_id"] % 4

    def test_encode_shape_and_code_range(self):
        import numpy as np

        from pdf_entity_extraction_ray.ops.pq import pq_encode, pq_fit

        ids, X = self._blobs(n=40, d=8)
        ds = self._ds(ids, X)
        books = pq_fit(ds, m=4, n_codes=8, iterations=3)
        assert books.shape == (4, 8, 2)
        out = _collect(pq_encode(ds, books))
        assert out.num_rows == 40
        codes = out.column("codes").to_pylist()
        assert all(len(c) == 4 and all(0 <= v < 8 for v in c) for c in codes)


class TestHeavyTokens:
    """Two-pass Misra-Gries exact heavy hitters (ops/sketch.heavy_tokens)."""

    def test_matches_bruteforce_on_zipf_stream(self):
        import collections

        import numpy as np

        from pdf_entity_extraction_ray.ops.sketch import heavy_tokens

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(400)]
        # zipf-ish: token i drawn with weight 1/(i+1)
        w = 1.0 / (np.arange(len(vocab)) + 1)
        draws = rng.choice(len(vocab), size=20000, p=w / w.sum())
        texts = [
            " ".join(vocab[j] for j in draws[k : k + 50])
            for k in range(0, len(draws), 50)
        ]
        phi = 0.01
        out = _collect(heavy_tokens(_docs(texts), phi=phi, capacity=64))
        got = dict(zip(out.column("token").to_pylist(), out.column("n").to_pylist()))

        truth = collections.Counter(t for s in texts for t in s.split())
        thresh = int(np.ceil(phi * sum(truth.values())))
        want = {t: c for t, c in truth.items() if c >= thresh}
        assert got == want  # exact set AND exact counts

    def test_block_split_invariant(self):
        from pdf_entity_extraction_ray.ops.sketch import heavy_tokens

        texts = ["alpha beta alpha"] * 30 + ["gamma delta"] * 3
        a = _collect(heavy_tokens(_docs(texts), phi=0.05, capacity=64))
        b = _collect(
            heavy_tokens(_docs(texts).repartition(13), phi=0.05, capacity=64)
        )
        assert sorted(zip(a.column("token").to_pylist(), a.column("n").to_pylist())) == \
            sorted(zip(b.column("token").to_pylist(), b.column("n").to_pylist()))

    def test_empty_and_no_heavy(self):
        from pdf_entity_extraction_ray.ops.sketch import heavy_tokens

        out = _collect(heavy_tokens(_docs([""] * 4), phi=0.5))
        assert out.num_rows == 0
        # uniform stream where nothing reaches phi=0.9
        out2 = _collect(heavy_tokens(_docs([f"u{i}" for i in range(40)]), phi=0.9))
        assert out2.num_rows == 0


class TestStripBoilerplate:
    """Cross-document sentence-df boilerplate removal (ops/web)."""

    @staticmethod
    def _pages(texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        [f"https://h{i}.test/p" for i in range(len(texts))],
                        pa.string(),
                    ),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_planted_boilerplate_stripped_order_kept(self):
        from pdf_entity_extraction_ray.ops.web import strip_boilerplate

        texts = [f"FOOTER. unique {i} body. MID. tail {i}" for i in range(20)]
        out = _collect(strip_boilerplate(self._pages(texts), df_frac=0.5))
        assert out.num_rows == 20
        for u, c, k, r in zip(
            out.column("url").to_pylist(),
            out.column("clean_text").to_pylist(),
            out.column("n_kept").to_pylist(),
            out.column("n_removed").to_pylist(),
        ):
            i = int(u.split("//h")[1].split(".")[0])
            assert c == f"unique {i} body. tail {i}"  # order preserved
            assert (k, r) == (2, 2)

    def test_fully_boilerplate_page_drops(self):
        from pdf_entity_extraction_ray.ops.web import strip_boilerplate

        texts = ["SAME. SAME2"] * 10 + ["SAME. keep me"]
        out = _collect(strip_boilerplate(self._pages(texts), df_frac=0.5))
        assert out.num_rows == 1
        assert out.column("clean_text").to_pylist() == ["keep me"]

    def test_rare_sentences_survive_and_split_invariant(self):
        from pdf_entity_extraction_ray.ops.web import strip_boilerplate

        texts = [f"only {i} here. also {i}" for i in range(12)]
        a = _collect(strip_boilerplate(self._pages(texts), df_frac=0.5))
        assert a.column("clean_text").to_pylist() == texts  # nothing df>=6
        b = _collect(
            strip_boilerplate(self._pages(texts).repartition(7), df_frac=0.5)
        )
        assert sorted(a.column("url").to_pylist()) == sorted(b.column("url").to_pylist())
        assert dict(zip(a.column("url").to_pylist(), a.column("clean_text").to_pylist())) == \
            dict(zip(b.column("url").to_pylist(), b.column("clean_text").to_pylist()))

    def test_within_page_repeat_counts_once(self):
        from pdf_entity_extraction_ray.ops.web import strip_boilerplate

        # "dup" repeats within ONE page only -> df=1 -> kept everywhere
        texts = ["dup. dup. x"] + [f"y {i}" for i in range(9)]
        out = _collect(strip_boilerplate(self._pages(texts), df_frac=0.3))
        m = dict(zip(out.column("url").to_pylist(), out.column("clean_text").to_pylist()))
        assert m["https://h0.test/p"] == "dup. dup. x"


class TestGroupwiseHLL:
    """Per-group HyperLogLog registers (ops/sketch.groupwise_hll)."""

    @staticmethod
    def _events(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([r[0] for r in rows], pa.string()),
                    "user_id": pa.array([r[1] for r in rows], pa.int64()),
                }
            )
        )

    def test_registers_match_single_process_and_split_invariant(self):
        from pdf_entity_extraction_ray.functions.similarity import _md5_hash64
        from pdf_entity_extraction_ray.ops.sketch import groupwise_hll

        rows = [("click", i % 37) for i in range(200)] + [
            ("view", i % 113) for i in range(300)
        ]
        p = 8
        out = _collect(groupwise_hll(self._events(rows), "event_type", "user_id", p=p))
        got = {
            (g, b): r
            for g, b, r in zip(
                out.column("event_type").to_pylist(),
                out.column("bucket").to_pylist(),
                out.column("rho_max").to_pylist(),
            )
        }
        # single-process reference registers
        want: dict = {}
        w_bits = 64 - p
        for g, u in set(rows):
            h = _md5_hash64(str(u).encode())
            b, w = h >> w_bits, h & ((1 << w_bits) - 1)
            rho = w_bits - w.bit_length() + 1 if w else 0
            if rho and rho > want.get((g, b), 0):
                want[(g, b)] = rho
        assert got == want
        out2 = _collect(
            groupwise_hll(self._events(rows).repartition(11), "event_type", "user_id", p=p)
        )
        got2 = {
            (g, b): r
            for g, b, r in zip(
                out2.column("event_type").to_pylist(),
                out2.column("bucket").to_pylist(),
                out2.column("rho_max").to_pylist(),
            )
        }
        assert got2 == got

    def test_estimate_close_to_exact(self):
        from pdf_entity_extraction_ray.ops.sketch import groupwise_hll, hll_estimate

        rows = [("t", i) for i in range(1000)]
        out = _collect(groupwise_hll(self._events(rows), "event_type", "user_id"))
        est = hll_estimate(out.drop_columns(["event_type"]))
        assert abs(est - 1000) / 1000 < 0.08


class TestContainmentPairs:
    """Overlap-coefficient near-dup pairs (ops/dedup.ngram_containment_pairs)."""

    def test_doc_inside_doc_found_jaccard_misses(self):
        from pdf_entity_extraction_ray.ops.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        small = "alpha beta gamma delta epsilon zeta eta theta"
        big = ("intro words here " + small + " then a long unrelated tail "
               + " ".join(f"w{i}" for i in range(60)))
        ds = _docs([small, big, "totally different text entirely now"])
        cont = _collect(ngram_containment_pairs(ds, 0.8))
        assert sorted(zip(cont.column("doc_a").to_pylist(),
                          cont.column("doc_b").to_pylist())) == [(0, 1)]
        jac = _collect(ngram_jaccard_pairs(ds, 0.8))
        assert jac.num_rows == 0  # Jaccard structurally misses it

    def test_matches_bruteforce(self):
        import itertools

        from pdf_entity_extraction_ray.ops.dedup import (
            _word_shingles,
            ngram_containment_pairs,
            overlap_coefficient,
        )

        base = "one two three four five six seven eight nine ten"
        texts = [
            base,
            base + " eleven twelve",
            "one two three four five STOP completely different tail here",
            "unrelated words entirely " + " ".join(f"z{i}" for i in range(10)),
            base,  # exact dup of 0
        ]
        t = 0.7
        out = _collect(ngram_containment_pairs(_docs(texts), t))
        got = sorted(zip(out.column("doc_a").to_pylist(), out.column("doc_b").to_pylist()))
        want = sorted(
            (i, j)
            for i, j in itertools.combinations(range(len(texts)), 2)
            if overlap_coefficient(_word_shingles(texts[i]), _word_shingles(texts[j])) >= t
        )
        assert got == want and len(want) >= 2

    def test_split_invariant_and_empty(self):
        from pdf_entity_extraction_ray.ops.dedup import ngram_containment_pairs

        texts = ["a b c d e f g", "x a b c d e f g y", ""] * 4
        a = _collect(ngram_containment_pairs(_docs(texts), 0.9))
        b = _collect(ngram_containment_pairs(_docs(texts).repartition(9), 0.9))
        pa_ = sorted(zip(a.column("doc_a").to_pylist(), a.column("doc_b").to_pylist()))
        pb_ = sorted(zip(b.column("doc_a").to_pylist(), b.column("doc_b").to_pylist()))
        assert pa_ == pb_ and len(pa_) > 0
        none = _collect(ngram_containment_pairs(_docs(["", ""]), 0.5))
        assert none.num_rows == 0


class TestHostQuality:
    """Domain-level quality keep rates (ops/web.host_quality)."""

    def test_junk_host_flagged(self):
        from pdf_entity_extraction_ray.ops.web import host_quality

        rows = []
        for i in range(6):
            rows.append((f"https://good.test/p{i}", "clean readable words " * 4))
        for i in range(6):
            # punct-heavy junk fails the gates
            rows.append((f"https://junk.test/p{i}", "!!! ??? ### $$$ %%% a b c d e"))
        # mixed host: 2 good / 2 junk at min_keep_ppm=500000 -> kept
        rows += [
            ("https://mixed.test/1", "clean readable words here now ok"),
            ("https://mixed.test/2", "clean readable words here now ok"),
            ("https://mixed.test/3", "!!! ??? ### $$$ %%% a b c d e"),
            ("https://mixed.test/4", "!!! ??? ### $$$ %%% a b c d e"),
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )
        out = {r["host"]: (r["n_pages"], r["n_keep"], r["keep_host"])
               for r in host_quality(ds).take_all()}
        assert out["good.test"] == (6, 6, True)
        assert out["junk.test"] == (6, 0, False)
        assert out["mixed.test"] == (4, 2, True)

    def test_split_invariant(self):
        from pdf_entity_extraction_ray.ops.web import host_quality

        rows = [(f"https://h{i % 5}.test/p{i}", f"some body text {i} ok fine") for i in range(40)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )
        a = sorted((r["host"], r["n_pages"], r["n_keep"]) for r in host_quality(ds).take_all())
        b = sorted((r["host"], r["n_pages"], r["n_keep"])
                   for r in host_quality(ds.repartition(7)).take_all())
        assert a == b and all(n == k for _, n, k in a)


class TestOracleEdgeParity:
    """Edge cases where op and SQL-oracle semantics must agree (from the
    round-4 review): empty page text in strip_boilerplate, uppercase
    schemes in host_quality, empty input in events_funnel."""

    def test_boilerplate_empty_text_counts_like_sql(self):
        from pdf_entity_extraction_ray.ops.web import strip_boilerplate

        # ''.split('. ') == [''] — empty pages contribute a ''-sentence,
        # and (below threshold) come back with clean_text=''
        texts = ["", "", "real content here"] + [f"u{i}" for i in range(10)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([f"https://h{i}.t/p" for i in range(len(texts))]),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        out = {r["url"]: r["clean_text"]
               for r in strip_boilerplate(ds, df_frac=0.9).take_all()}
        assert out["https://h0.t/p"] == "" and out["https://h1.t/p"] == ""
        # above threshold the ''-sentence IS boilerplate: empty pages drop
        texts2 = [""] * 10 + ["keep me"]
        ds2 = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([f"https://h{i}.t/p" for i in range(len(texts2))]),
                    "text": pa.array(texts2, pa.string()),
                }
            )
        )
        out2 = {r["url"]: r["clean_text"]
                for r in strip_boilerplate(ds2, df_frac=0.5).take_all()}
        assert out2 == {"https://h10.t/p": "keep me"}

    def test_host_quality_uppercase_scheme_buckets_empty(self):
        from pdf_entity_extraction_ray.ops.web import host_quality

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        ["HTTPS://Example.Test/p", "https://ok.test/p"]
                    ),
                    "text": pa.array(["clean words here ok fine x"] * 2),
                }
            )
        )
        out = {r["host"]: r["n_pages"] for r in host_quality(ds).take_all()}
        assert out == {"": 1, "ok.test": 1}

    def test_funnel_empty_input_emits_zero_rows_per_step(self):
        from pdf_entity_extraction_ray.ops.relational import events_funnel

        empty = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                }
            )
        )
        out = {r["step"]: (r["event_type"], r["n_users"])
               for r in events_funnel(empty, steps=("A", "B")).take_all()}
        assert out == {1: ("A", 0), 2: ("B", 0)}


class TestDedupReviewFixes:
    """Round-4 review fixes over the dedup family."""

    def test_blank_docs_never_minhash_pair(self):
        from pdf_entity_extraction_ray.ops.dedup import (
            minhash_lsh_pairs,
            near_dedup_keep,
        )

        texts = ["", "... !!! ???", "", "real words over here now ok fine yes"] * 2
        pairs = _collect(minhash_lsh_pairs(_docs(texts), 0.7))
        blank_ids = {0, 1, 2, 4, 5, 6}
        got = set(zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()))
        assert not any(a in blank_ids and b in blank_ids for a, b in got
                       if not (a == 3 or b == 3 or a == 7 or b == 7)) or True
        # blank docs must not pair with each other at all
        assert all(not (a in blank_ids and b in blank_ids) for a, b in got)
        # and the keep policy retains every blank doc (nothing to dedup)
        kept = set(_collect(near_dedup_keep(_docs(texts), 0.7)).column("doc_id").to_pylist())
        assert blank_ids <= kept

    def test_cosine_pairs_tolerates_empty_block(self):
        import ray.data as rd

        from pdf_entity_extraction_ray.ops.dedup import embedding_cosine_pairs

        full = pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array([[1.0, 0.0], [1.0, 0.0]], pa.list_(pa.float64())),
            }
        )
        empty = full.slice(0, 0)
        ds = rd.from_arrow([full, empty])
        out = _collect(embedding_cosine_pairs(ds, 0.99))
        assert sorted(zip(out.column("vec_a").to_pylist(), out.column("vec_b").to_pylist())) == [(1, 2)]

    def test_simhash_radius_guard(self):
        import pytest

        from pdf_entity_extraction_ray.ops.dedup import simhash_pairs

        with pytest.raises(ValueError):
            simhash_pairs(_docs(["a b c"]), max_hamming=4)

    def test_jaccard_cms_prune_keeps_pair_set(self):
        import itertools

        from pdf_entity_extraction_ray.functions.similarity import jaccard
        from pdf_entity_extraction_ray.ops.dedup import (
            _word_shingles,
            ngram_jaccard_pairs,
        )

        base = "one two three four five six seven eight nine ten eleven twelve"
        texts = [base, base + " extra", base.replace("five", "FIVE"),
                 "entirely different words " + " ".join(f"q{i}" for i in range(12)),
                 base]
        t = 0.6
        out = _collect(ngram_jaccard_pairs(_docs(texts), t))  # default cms order
        got = sorted(zip(out.column("doc_a").to_pylist(), out.column("doc_b").to_pylist()))
        want = sorted(
            (i, j) for i, j in itertools.combinations(range(len(texts)), 2)
            if jaccard(_word_shingles(texts[i]), _word_shingles(texts[j])) >= t
        )
        assert got == want and len(want) >= 3
