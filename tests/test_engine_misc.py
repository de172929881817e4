"""Engine surface tests: S8 point lookup, bloom-config resume guard."""

import pytest

from lyrics_crawler_spark.engine import CrawlEngine
from lyrics_crawler_spark.sitegen.graph import SiteSpec


def _spec(url="http://misc.example"):
    return SiteSpec("smriti", url, seed=11, n_seeds=2, branch1=2, branch2=2)


def test_point_lookup_load(spark, tmp_store):
    """S8: CrawlEngine.load(doc_id) — db_operations.py:107-122."""
    eng = CrawlEngine(spark, [_spec()], tmp_store)
    eng.run()
    any_doc = eng.documents().select("doc_id").first()["doc_id"]
    rows = eng.load(any_doc).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == any_doc
    assert eng.load("http://misc.example/never-seen").count() == 0


def test_bloom_config_mismatch_fails_fast(spark, tmp_store):
    """Resuming a store with a different bloom config would re-fetch
    already-seen URLs (missing/mismatched bloom deltas) — must refuse."""
    eng = CrawlEngine(spark, [_spec()], tmp_store)
    eng.run(max_waves=1)
    # same config resumes fine
    CrawlEngine(spark, [_spec()], tmp_store)
    with pytest.raises(ValueError, match="bloom config mismatch"):
        CrawlEngine(spark, [_spec()], tmp_store, bloom_seen=True)


def test_bloom_param_change_fails_fast(spark, tmp_store):
    eng = CrawlEngine(spark, [_spec()], tmp_store, bloom_seen=True,
                      bloom_m_bits=1 << 16)
    eng.run(max_waves=1)
    CrawlEngine(spark, [_spec()], tmp_store, bloom_seen=True,
                bloom_m_bits=1 << 16)  # identical → ok
    with pytest.raises(ValueError, match="bloom config mismatch"):
        CrawlEngine(spark, [_spec()], tmp_store, bloom_seen=True,
                    bloom_m_bits=1 << 18)


def test_unescape_fast_path_matches_html_unescape(spark):
    """unescape_col/unescape_arr_col must equal html.unescape exactly,
    including the adversarial shapes that must NOT take the JVM fast
    path: bare '&', '&amp' sans semicolon, '&AMP;', numeric charrefs,
    unknown names, '&amp;amp;' double-encoding, and overlap-ish runs."""
    from html import unescape

    from pyspark.sql import functions as F

    from lyrics_crawler_spark.functions.textops import (
        unescape_arr_col, unescape_col,
    )

    cases = [
        None, "", "plain words", "a &amp; b", "&amp;", "&amp;amp;",
        "&amp;&amp;", "x&amp;", "&", "& ", "a & b", "&amp", "&AMP;",
        "&Amp;", "&lt;tag&gt;", "&#38;", "&#x26;", "&#x26", "&nosuch;",
        "&am&amp;p;", "&&amp;", "&amp;lt;", "tail&", "&;", "&#;",
        "mixed &amp; and &lt; here", "&ampamp;;", "a&ampb",
        "&quot;q&quot;", "&apos;", "&nbsp;", "é &amp; café",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [
        r["u"]
        for r in df.select(unescape_col(F.col("s")).alias("u")).collect()
    ]
    want = [unescape(c) if c is not None else None for c in cases]
    assert got == want

    arrays = [None, [], [None], cases, ["&amp;", None, "&", "clean"]]
    adf = spark.createDataFrame([(a,) for a in arrays], "a array<string>")
    agot = [
        r["u"]
        for r in adf.select(unescape_arr_col(F.col("a")).alias("u")).collect()
    ]
    awant = [
        [unescape(x) if x is not None else None for x in a]
        if a is not None
        else None
        for a in arrays
    ]
    assert agot == awant
