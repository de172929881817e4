"""Fast unit tests: parsers against generated pages, span assembly,
priority-key encoding, hashing parity, URL rules (SURVEY.md §5 item 2)."""

from html import unescape

from lyrics_crawler_spark.functions.hashing import py_hash64, stable_hash
from lyrics_crawler_spark.functions.spans import build_spans
from lyrics_crawler_spark.functions.urls import canonicalize, compose_url, robots_allowed
from lyrics_crawler_spark.operators.priority import seed_key
from lyrics_crawler_spark.parsers import adapters
from lyrics_crawler_spark.sitegen.graph import SiteGraph, SiteSpec


def _graph(dialect, **kw):
    return SiteGraph(SiteSpec(dialect, f"http://{dialect}.test", seed=77, **kw))


def test_hindilyrics_parsers_roundtrip():
    g = _graph("hindilyrics", n_seeds=1, branch1=3, branch2=2)
    idx = g.html("http://hindilyrics.test/idx-0.html")
    movies = adapters.hindilyrics_movies_with_url(idx)
    assert len(movies) == 3
    murl, mname = movies[0]
    assert murl.startswith("/movie-") and mname
    mhtml = g.html(f"http://hindilyrics.test{murl}")
    songs = adapters.hindilyrics_songs_with_url(mhtml)
    surl, _ = songs[0]
    shtml = g.html(f"http://hindilyrics.test{surl}")
    lyrics, singers, music_by, lyricists = adapters.hindilyrics_song_details(shtml)
    sid = int(surl.split("-")[1].split(".")[0])
    p = g.song_people(sid)
    assert singers == p["singers"]
    assert music_by == [p["director"]]
    assert lyricists == p["lyricists"]
    # lyrics keep raw verse text (the discarded-replace quirk)
    assert g.verses(sid)[0].split("\n")[0] in lyrics


def test_smriti_song_and_dots():
    g = _graph("smriti", n_seeds=1, branch1=2, branch2=2)
    idx = g.html("http://smriti.test/idx-0.html")
    (murl, _), *_ = adapters.smriti_movies_with_url(idx)
    mhtml = g.html(f"http://smriti.test{murl}")
    songs = adapters.smriti_songs_with_url(mhtml)
    assert songs and all(u.startswith("/song-") for u, _ in songs)
    shtml = g.html(f"http://smriti.test{songs[0][0]}")
    lyrics, singers, directors, lyricists = adapters.smriti_song_details(shtml)
    assert "<p>" not in lyrics and "<br>" not in lyrics
    assert singers and directors and lyricists


def test_azlyrics_albums_and_other():
    g = _graph("azlyrics", n_seeds=1, branch1=2, albums_per_artist=2,
               songs_per_album=2)
    idx = g.html("http://azlyrics.test/idx-0.html")
    artists = adapters.azlyrics_artists_with_url(idx)
    assert artists and not artists[0][0].startswith("/")
    ahtml = g.html(f"http://azlyrics.test/{artists[0][0]}")
    albums = adapters.azlyrics_albums_with_songs(ahtml)
    assert len(albums) == 2
    for name, songs in albums:
        assert name == "other" or name
        assert all(u.startswith("/song-") for u, _ in songs)
    surl = albums[0][1][0][0]
    lyr = adapters.azlyrics_song_details(g.html(f"http://azlyrics.test{surl}"))
    assert "<i>" not in lyr and "<br>" not in lyr


def test_metrolyrics_pages_and_fallback():
    g = _graph("metrolyrics", n_seeds=1, branch1=2, n_pages=3, songs_per_page=2)
    idx = g.html("http://metrolyrics.test/idx-0.html")
    artists = adapters.metrolyrics_artist_with_url(idx)
    assert artists and " Lyrics" not in artists[0][1]
    ahtml = g.html(f"http://metrolyrics.test{artists[0][0]}")
    pages = adapters.metrolyrics_pages_for_artist(ahtml)
    assert len(pages) == 3 and pages[0] == artists[0][0]
    songs = adapters.metrolyrics_songs(ahtml)
    assert songs and " Lyrics" not in songs[0][1]
    # both lyric div shapes parse
    seen_shapes = set()
    for sid in g.shared_song_ids(int(artists[0][0].split("-")[1].split(".")[0]), 50, "pg1"):
        html = g.html(f"http://metrolyrics.test/song-{sid}.html")
        album, lyrics, lyricists, other = adapters.metrolyrics_song_details(html)
        seen_shapes.add("primary" if g._u("shape", sid) < 0.6 else "fallback")
        assert isinstance(lyricists, list)
    assert seen_shapes == {"primary", "fallback"}


def test_build_spans_interleave_and_unescape():
    spans = build_spans(
        "Mov &amp; ie", ["S1"], ["D1"], ["L1", "L2"],
        'verse one<media src="media://h/s/0.png"/>verse two',
    )
    kinds = [s["kind"] for s in spans]
    assert kinds == ["album", "singer", "director", "lyricist", "lyricist",
                     "lyric", "media", "lyric"]
    assert spans[0]["text"] == "Mov & ie"
    assert spans[6]["media_ref"] == "media://h/s/0.png"
    assert [s["offset"] for s in spans] == list(range(8))
    # media at string end produces a trailing empty lyric span (re.split)
    spans2 = build_spans(None, [], [], [], 'x<media src="m"/>')
    assert [s["kind"] for s in spans2][-3:] == ["lyric", "media", "lyric"]
    assert spans2[-1]["text"] == ""


def test_priority_seed_key_order():
    # seeds pushed 0..n-1 pop in reverse: key(i) must sort descending in i
    keys = [seed_key(i, 4) for i in range(4)]
    assert keys == sorted(keys, reverse=True)


def test_url_rules():
    assert compose_url("http://a", "/x.html", 0, 2) == "http://a/x.html"
    assert compose_url("http://a", "x.html", 1, 1) == "http://a/x.html"
    assert canonicalize("HTTP://Az.Example//a//b.html#frag") == "http://az.example/a/b.html"
    assert not robots_allowed("/private-1.html", ("/private",))
    assert robots_allowed("/song-1.html", ("/private",))


def test_stable_hash_determinism():
    assert stable_hash("a", 1) == stable_hash("a", 1)
    assert stable_hash("a", 1) != stable_hash("a", 2)
    assert py_hash64("abc") == int("900150983cd24fb", 16)


def test_fetch_error_model():
    g = _graph("hindilyrics", error_rate=1.0, max_err=3)
    url = "http://hindilyrics.test/idx-0.html"
    f = g.fail_count(url)
    assert f >= 1
    import pytest as _pytest
    from lyrics_crawler_spark.sitegen.graph import FetchError

    with _pytest.raises(FetchError):
        g.fetch(url, 0)
    assert g.fetch(url, f) == g.html(url)


def test_synthetic_corpus_structure():
    """Big-corpus generator (scripts/bench_big_corpus.py input): pure
    function of (seed, doc_id) — block base, exact copies, mutated
    near-dups, independent tail."""
    from lyrics_crawler_spark.sitegen.corpus import _tokens_for

    args = (100, 2, 3, 0.05)
    base = _tokens_for(11, 0, *args)
    assert _tokens_for(11, 1, *args) == base  # exact copy
    assert _tokens_for(11, 2, *args) == base
    mut = _tokens_for(11, 3, *args)
    assert mut != base and len(mut) == len(base)  # near-dup, same length
    n_diff = sum(1 for x, y in zip(mut, base) if x != y)
    assert 0 < n_diff < len(base) // 4  # ~5% token mutations
    assert _tokens_for(11, 0, *args) == base  # deterministic


def test_clustered_embeddings_deterministic(spark):
    """Clustered-corpus generator: byte-identical under repartitioning
    (counter-based Philox), realized intra-cluster cosine near target."""
    from lyrics_crawler_spark.sitegen.embeddings import (
        clustered_embeddings,
        corpus_geometry,
    )

    a = clustered_embeddings(spark, 200, dim=16, n_clusters=10)
    b = clustered_embeddings(spark, 200, dim=16, n_clusters=10).repartition(7)
    ra = {r.vec_id: tuple(r.embedding) for r in a.collect()}
    rb = {r.vec_id: tuple(r.embedding) for r in b.collect()}
    assert ra == rb
    geo = corpus_geometry(a, 10, sample=200)
    assert 0.7 < geo["intra_cos"] < 0.9
    assert abs(geo["inter_cos"]) < 0.2


def test_hex_key_dec_order_isomorphic(spark):
    """hex_key_dec (the read-time decimal twin) must be injective and
    order-isomorphic to the hex path key's lexicographic order — the
    property _resolve_documents' win-rule aggregation rests on."""
    import random

    from pyspark.sql import functions as F

    from lyrics_crawler_spark.operators.priority import hex_key_dec

    random.seed(11)
    keys = set()

    def gen(prefix, depth):
        keys.add(prefix)
        if depth >= 4:
            return
        for r in random.sample(range(0, 3000), 3):
            gen(prefix + format(r, "08x"), depth + 1)

    for i in range(4):
        gen(format(i, "08x"), 1)

    df = spark.createDataFrame([(k,) for k in sorted(keys)], "k string")
    rows = (
        df.select("k", hex_key_dec(F.col("k")).alias("d"))
        .orderBy("d")
        .collect()
    )
    assert [r.k for r in rows] == sorted(keys)  # order-isomorphic
    assert len({r.d for r in rows}) == len(keys)  # injective


def test_bmp_wav_codec_roundtrip():
    """Real-container codecs (T13): encode→decode round-trips exactly,
    including non-multiple-of-4 row widths (BMP padding) and odd-length
    RIFF chunk walking; malformed payloads fail loudly."""
    import numpy as np
    import pytest as _pt

    from lyrics_crawler_spark.operators.multimodal import (
        decode_bmp, decode_wav, encode_bmp, encode_wav, resize_px,
        synth_payload,
    )

    rng = np.random.RandomState(3)
    for w, h in [(1, 1), (3, 2), (17, 5), (64, 64)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all(), (w, h)

    s = (rng.randint(-32768, 32768, size=999)).astype(np.int16)
    rate, back = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and (back == s).all()

    with _pt.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    with _pt.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 40)

    # resize: exact nearest-neighbor integer index map
    px = rng.randint(0, 256, size=(8, 4, 3), dtype=np.uint8)
    r = resize_px(px, 2)
    assert r.shape == (2, 2, 3)
    assert (r[0, 0] == px[0, 0]).all() and (r[1, 1] == px[4, 2]).all()

    # synth is a pure function of the ref and returns a decodable container
    p1, w1, h1, _ = synth_payload("http://a/x.png", "image")
    p2, *_ = synth_payload("http://a/x.png", "image")
    assert p1 == p2
    assert decode_bmp(p1).shape == (h1, w1, 3)
    pa_, _, _, dur = synth_payload("http://a/y.mp3", "audio")
    rate, samples = decode_wav(pa_)
    assert len(samples) * 1000 // rate == dur


def test_ivf_index_persist_roundtrip(spark, tmp_store):
    """build_ivf_index → persist (partitioned by list_id) → reload →
    ann_ivf_probe must equal the one-shot ann_ivf_topk exactly — the
    amortization contract (VERDICT r04 next-round #5): at scale the
    index is built once and every query batch probes the bucketed
    files."""
    from lyrics_crawler_spark.operators.similarity import (
        ann_ivf_probe, ann_ivf_topk, build_ivf_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    one_shot = {
        tuple(r) for r in ann_ivf_topk(
            e, queries_max_id=10, corpus_max_id=300, k=5,
            centroid_mod=16, n_probe=4,
        ).collect()
    }
    cents, lists = build_ivf_index(e, corpus_max_id=300, centroid_mod=16)
    cents.write.parquet(tmp_store + "/cents")
    lists.repartition("list_id").write.partitionBy("list_id").parquet(
        tmp_store + "/lists"
    )
    got = {
        tuple(r) for r in ann_ivf_probe(
            spark.read.parquet(tmp_store + "/cents"),
            spark.read.parquet(tmp_store + "/lists"),
            e, queries_max_id=10, k=5, n_probe=4,
        ).collect()
    }
    assert got == one_shot and len(got) > 0
