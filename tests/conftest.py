import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from lyrics_crawler_spark.session import get_spark

    s = get_spark("lcs-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_store():
    d = tempfile.mkdtemp(prefix="lcs_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_both(spark, specs, base_dir, max_waves=400, **eng_kwargs):
    """Run oracle + engine over the same specs; return comparison views."""
    from lyrics_crawler_spark.engine import CrawlEngine
    from lyrics_crawler_spark.oracle import ReferenceOracle

    oracles = {s.start_url: ReferenceOracle(s).run() for s in specs}
    eng = CrawlEngine(spark, specs, base_dir, **eng_kwargs)
    eng.run(max_waves=max_waves)
    return oracles, eng


def assert_golden(spark, specs, base_dir, **eng_kwargs):
    """The north-rule check: exact crawl order, URL-seen set, and
    span-sequence equality for every site."""
    oracles, eng = run_both(spark, specs, base_dir, **eng_kwargs)

    trace = eng.trace().orderBy("site", "seq").collect()
    eng_traces: dict[str, list] = {}
    for r in trace:
        eng_traces.setdefault(r.site, []).append(
            (r.url, r.task_type, r.action, r.n_errors)
        )
    docs = {
        (r.start_url, r.song_url): r.asDict(recursive=True)
        for r in eng.documents().collect()
    }

    for site, oracle in oracles.items():
        assert eng_traces.get(site, []) == oracle.trace_tuples(), (
            f"visit-order mismatch for {site}"
        )
    eng_seen = {(d["start_url"], d["song_url"]) for d in docs.values()}
    ora_seen = set().union(*(o.seen for o in oracles.values()))
    assert eng_seen == ora_seen, "URL-seen set mismatch"

    for site, oracle in oracles.items():
        for k, od in oracle.docs.items():
            ed = docs[k]
            ospans = [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in od["spans"]
            ]
            espans = [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in ed["spans"]
            ]
            assert espans == ospans, f"span mismatch for {k}"
            assert ed["song"] == od["song"], k
            assert ed["movie"] == od["movie"], k
            assert ed["movie_url"] == od["movie_url"], k
    return oracles, eng
