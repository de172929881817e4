"""Golden-trace equality: Spark engine vs single-threaded reference oracle.

This is the north-rule correctness gate (BASELINE.json): same seed list +
robots rules + politeness budget ⇒ identical visit order, identical final
URL-seen set, identical per-document span sequences.
"""

import pytest

from lyrics_crawler_spark.sitegen.graph import SiteSpec, default_specs
from tests.conftest import assert_golden


@pytest.mark.parametrize("dialect", ["hindilyrics", "smriti", "lyricsmasti"])
def test_type0_clean(spark, tmp_store, dialect):
    spec = SiteSpec(dialect, f"http://{dialect}.example", seed=11, n_seeds=2,
                    branch1=2, branch2=2)
    assert_golden(spark, [spec], tmp_store)


def test_type0_errors_dups_empty(spark, tmp_store):
    spec = SiteSpec("hindilyrics", "http://h.example", seed=7, n_seeds=3,
                    branch1=3, branch2=3, error_rate=0.2, dup_link_rate=0.5,
                    empty_movie_rate=0.3, max_err=3)
    assert_golden(spark, [spec], tmp_store)


def test_type1_azlyrics(spark, tmp_store):
    spec = SiteSpec("azlyrics", "http://az.example", seed=3, n_seeds=2,
                    branch1=2, albums_per_artist=2, songs_per_album=2,
                    dup_link_rate=0.4, error_rate=0.2, max_err=3,
                    delay_request=True)
    assert_golden(spark, [spec], tmp_store)


def test_type2_metrolyrics(spark, tmp_store):
    spec = SiteSpec("metrolyrics", "http://ml.example", seed=13, n_seeds=2,
                    branch1=2, n_pages=3, songs_per_page=2,
                    dup_link_rate=0.4, error_rate=0.15)
    assert_golden(spark, [spec], tmp_store)


def test_pipelined_commits_golden(spark, tmp_store):
    """pipeline_commits=True (wave N's background writes drain behind
    wave N+1's foreground; manifest commits stay wave-ordered) must be
    bit-identical to the serial default — same trace, seen set, spans.
    The flag is off by default at sandbox scale (measured slower here —
    BENCH.md 'pipelined commits'), but the overlay read path has to
    stay correct for the real-cluster regime it exists for."""
    spec = SiteSpec("hindilyrics", "http://h.example", seed=7, n_seeds=3,
                    branch1=3, branch2=3, error_rate=0.2, dup_link_rate=0.5,
                    empty_movie_rate=0.3, max_err=3)
    assert_golden(spark, [spec], tmp_store, pipeline_commits=True)


def test_all_five_sites_with_robots(spark, tmp_store):
    """The full fixture: five sites in ONE frontier (multi-host
    partitioning), robots rules, dups, errors, empty movies."""
    specs = default_specs(seed=42)
    oracles, eng = assert_golden(spark, specs, tmp_store)
    # robots actually filtered something: no /private URL anywhere
    assert eng.frontier().where("url like '%private%'").count() == 0
    # media spans actually interleave
    docs = eng.documents()
    n_media = docs.selectExpr(
        "size(filter(spans, s -> s.kind = 'media')) as m"
    ).groupBy().sum("m").collect()[0][0]
    assert n_media > 0
