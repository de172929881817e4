"""Connected components / dedup cluster assignment (SURVEY.md §2.11 T16)."""

import pytest

from lyrics_crawler_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


def test_components_chain_cycle_and_islands(spark):
    # chain 1-2-3-4 (multi-round propagation), triangle 5-6-7 (cycle),
    # island pair 10-11; edges given in arbitrary orientation
    edges = [(2, 1), (2, 3), (3, 4), (5, 6), (7, 6), (7, 5), (11, 10)]
    comp = {
        r.id: r.comp
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 10: 10, 11: 10}


def test_components_long_chain_converges(spark):
    # a 13-node path has diameter 12: min-label propagation moves the
    # label one hop per round, so this exercises the iteration + the
    # changed-count convergence detection well past round 2
    edges = [(i, i + 1) for i in range(100, 112)]
    comp = connected_components(_pairs(spark, edges)).collect()
    assert {r.comp for r in comp} == {100}
    assert len(comp) == 13


def test_components_divergence_guard(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, [(i, i + 1) for i in range(5)]),
                             max_iter=1)


def test_dedup_clusters_keepers(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    rows = {r.doc_id: r for r in dedup_clusters(_pairs(spark, edges)).collect()}
    assert {d: r.component for d, r in rows.items()} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
    }
    assert {d: r.n_members for d, r in rows.items()} == {
        1: 3, 2: 3, 3: 3, 10: 2, 11: 2,
    }
    # exactly one keeper per component, and it is the min id
    assert [d for d, r in sorted(rows.items()) if r.is_keeper == 1] == [1, 10]


def test_release_checkpoint_actually_drops_blocks(spark):
    """Version-pin the private-accessor block release (VERDICT r04 wrong
    #2): `_release_checkpoint` reaches through `df._jdf.queryExecution()
    .analyzed().rdd()` — a non-public path that would silently stop
    releasing on a Spark upgrade, leaving iterative loops to accumulate
    O(rounds) of block-manager state. This asserts the persisted-RDD
    count measurably DROPS after release, so an upgrade that breaks the
    accessor fails loudly here instead of silently leaking."""
    from lyrics_crawler_spark.operators.clusters import _release_checkpoint

    jsc = spark.sparkContext._jsc.sc()

    def n_cached():
        return jsc.getPersistentRDDs().size()

    before = n_cached()
    df = spark.range(1000).localCheckpoint(eager=True)
    assert df.count() == 1000
    assert n_cached() > before, "localCheckpoint did not register blocks"
    _release_checkpoint(df)
    assert n_cached() == before, (
        "_release_checkpoint no longer drops the checkpointed RDD — the "
        "private accessor broke (Spark upgrade?); iterative operators "
        "will leak block-manager memory"
    )
