"""Round-5 regression tests: observation-aware gold clusters and the
q4 shuffle-join fallback (VERDICT r4 + ADVICE items)."""

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# observation-aware gold clusters (sources/corpus.split_observed_components)


def _cluster(cid, typ, canonical, aliases):
    from pdf_entity_extraction_ray.sources.corpus import Cluster

    return Cluster(cid, typ, canonical, aliases)


class TestSplitObservedComponents:
    FAMILY = [
        "Brightwater Energy Partners",   # hub: pairwise-matches all others
        "Brightwater Energy",            # subset of the hub ONLY
        "Brightwater-Energy Partners",   # punct variant, similar to hub+typo
        "Brinhtwater Energy Partners",   # typo, similar to hub+punct variant
    ]

    def test_hub_observed_is_noop(self):
        from pdf_entity_extraction_ray.sources.corpus import (
            split_observed_components,
        )

        cl = _cluster(7, "ORG", self.FAMILY[0], list(self.FAMILY))
        observed = {("ORG", a) for a in self.FAMILY}
        out = split_observed_components([cl], observed)
        assert len(out) == 1
        assert sorted(out[0].aliases) == sorted(self.FAMILY)

    def test_unobserved_hub_splits(self):
        """Without the hub, the subset alias is predicate-disconnected
        from the punct/typo pair — gold must carry TWO components (the
        sf0.001 kg_nodes 377-vs-376 regression)."""
        from pdf_entity_extraction_ray.sources.corpus import (
            split_observed_components,
        )
        from pdf_entity_extraction_ray.stages.linking import surfaces_match

        # precondition of the scenario: hubless observed graph disconnects
        assert not surfaces_match(self.FAMILY[1], self.FAMILY[2])
        assert not surfaces_match(self.FAMILY[1], self.FAMILY[3])
        assert surfaces_match(self.FAMILY[2], self.FAMILY[3])

        cl = _cluster(7, "ORG", self.FAMILY[0], list(self.FAMILY))
        observed = {("ORG", a) for a in self.FAMILY[1:]}
        out = split_observed_components([cl], observed)
        assert len(out) == 2
        comps = sorted([sorted(c.aliases) for c in out])
        assert comps == [
            ["Brightwater Energy"],
            sorted(self.FAMILY[2:]),
        ]
        # ids deterministic and distinct, derived from the planted id
        assert sorted(c.cluster_id for c in out) == [7 * 64, 7 * 64 + 1]
        # each component's canonical follows the engine representative rule
        from pdf_entity_extraction_ray.stages.linking import representative

        for c in out:
            assert c.canonical == representative(sorted(c.aliases))

    def test_fully_unobserved_family_dropped(self):
        from pdf_entity_extraction_ray.sources.corpus import (
            split_observed_components,
        )

        cl = _cluster(3, "ORG", self.FAMILY[0], list(self.FAMILY))
        assert split_observed_components([cl], set()) == []

    def test_unobserved_alias_dropped_from_component(self):
        from pdf_entity_extraction_ray.sources.corpus import (
            split_observed_components,
        )

        cl = _cluster(5, "ORG", self.FAMILY[0], list(self.FAMILY))
        observed = {("ORG", self.FAMILY[0]), ("ORG", self.FAMILY[1])}
        out = split_observed_components([cl], observed)
        assert len(out) == 1
        assert sorted(out[0].aliases) == sorted(self.FAMILY[:2])


# ---------------------------------------------------------------------------
# q4_order_priority: the shuffle fallback must be live and equal the
# broadcast path (ADVICE r4: it was dead code behind an unconditional
# driver collect)


def _q4_rows(result_ds):
    t = pa.concat_tables(list(result_ds.iter_batches(batch_format="pyarrow")))
    return sorted(
        zip(
            t.column("o_orderpriority").to_pylist(),
            t.column("n_orders").to_pylist(),
        )
    )


class TestCsvNullContract:
    def test_write_rejects_nulls(self, tmp_path):
        import ray.data

        from pdf_entity_extraction_ray.sources.csvio import write_docs_csv

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a", None], pa.string()),
                    "lang": pa.array(["en", "en"], pa.string()),
                    "source": pa.array(["s", "s"], pa.string()),
                    "n_chars": pa.array([1, 0], pa.int64()),
                }
            )
        )
        with pytest.raises(Exception) as exc:
            write_docs_csv(ds, str(tmp_path / "csv"))
        assert "null" in str(exc.value)


class TestQ4ShuffleFallback:
    def test_paths_agree(self):
        import ray.data

        from pdf_entity_extraction_ray.ops.relational import q4_order_priority

        li = ray.data.read_parquet(f"{SF}/lineitem.parquet")
        orders = ray.data.read_parquet(f"{SF}/orders.parquet")
        broadcast = _q4_rows(q4_order_priority(li, orders))
        shuffled = _q4_rows(
            q4_order_priority(li, orders, broadcast_limit_bytes=0, num_partitions=2)
        )
        assert broadcast == shuffled
        assert len(broadcast) > 0
        assert all(n > 0 for _, n in broadcast)
