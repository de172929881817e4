"""Reference-exact page parsers (the P1–P16 operator family, SURVEY.md §2.4).

Each function reproduces one subclass-override hook of the reference,
regex-for-regex, including its quirks:

- hindilyrics: /root/reference/crawler/hindilyrics-crawler.py:13-48
  (P3's `lyrics.replace(...)` result is discarded in the reference — so we
  keep the raw capture, byte-for-byte);
- smriti: /root/reference/crawler/smriti-crawler.py:12-80;
- lyricsmasti: /root/reference/crawler/lyricsmasti-crawler.py:12-89
  (the ' &amp;' → ', ' rewrite *before* splitting, which can leave
  leading-space artist names — preserved);
- azlyrics: /root/reference/crawler/azlyrics-crawler.py:15-82 (the
  `shuffle()` calls are excluded from the determinism contract, SURVEY.md
  §2.8 R4 — parse order is document order);
- metrolyrics: /root/reference/crawler/metrolyrics-crawler.py:12-139
  (two-pattern lyrics fallback; author-div scrub whose leftover junk is
  preserved; hardcoded domain strip; ' Lyrics' suffix strip).

These run inside the engine's Arrow-batched ``mapInPandas`` stage (one
Python batch per partition — never a per-row Spark UDF) and inside the
single-threaded reference-semantics oracle, guaranteeing parse parity by
construction while the *scheduling* semantics are tested independently.
"""

from __future__ import annotations

from re import DOTALL, findall, sub

# ---------------- hindilyrics (CrawlerType0) ----------------


def hindilyrics_movies_with_url(raw_html: str):
    # hindilyrics-crawler.py:13-14
    return findall(r"<li>.*?\"(.*?)\">(.*?)<", raw_html)


def hindilyrics_songs_with_url(raw_html: str):
    # hindilyrics-crawler.py:16-17
    return findall(r"<li>.*?\"(.*?)\">(.*?)<", raw_html)


def _hindilyrics_modify_artist(artist):
    # hindilyrics-crawler.py:41-48
    if len(artist) > 0:
        return findall(r"\">(.*?)<", artist[0])
    return []


def hindilyrics_song_details(raw_html: str):
    # hindilyrics-crawler.py:19-38 — note the discarded replace (:30-36):
    # the reference computes lyrics.replace(...) and throws it away, so the
    # raw capture is what gets saved.
    singers = _hindilyrics_modify_artist(
        findall(r"Singer\(s\).*?:(.*?)<br>", raw_html)
    )
    music_by = _hindilyrics_modify_artist(findall(r"Music By.*?:(.*?)<br>", raw_html))
    lyricists = _hindilyrics_modify_artist(findall(r"Lyricist.*?:(.*?)<br>", raw_html))
    lyrics = findall(r'<font face="verdana\">(.*?)</font', raw_html, DOTALL)[0]
    return lyrics, singers, music_by, lyricists


# ---------------- smriti (CrawlerType0) ----------------


def smriti_movies_with_url(raw_html: str):
    # smriti-crawler.py:12-19
    main_content = findall(
        r"<a href=\"/hindi-songs/\">main index</a>(.*?)</div>", raw_html, DOTALL
    )[0]
    return findall(r"<a href=\"(.*?)\">(.*?)</a>", main_content)


def smriti_songs_with_url(raw_html: str):
    # smriti-crawler.py:21-28 — (name, url) tuple swap + dot strip
    return [
        (b, a.replace(".", ""))
        for a, b in findall(
            r'<div class="onesong">(.*?): <a href=.*?<a href="(.*?)">',
            raw_html,
            DOTALL,
        )
    ]


def _smriti_modify_artist(artist):
    # smriti-crawler.py:76-80
    if len(artist) > 0:
        return artist[0].split(", ")
    return []


def smriti_song_details(raw_html: str):
    # smriti-crawler.py:30-73
    singers = _smriti_modify_artist(
        findall(r"<li><b>Singer\(s\):</b> <.*?>(.*?)</", raw_html, DOTALL)
    )
    directors = _smriti_modify_artist(
        findall(r"<li><b>Mu.*?:</b> <.*?>(.*?)</", raw_html, DOTALL)
    )
    lyricists = _smriti_modify_artist(
        findall(r"<li><b>L.*?:</b> <.*?>(.*?)</", raw_html, DOTALL)
    )
    lyrics = (
        findall(r"<div class=\"son.*?>(.*?)</div>", raw_html, DOTALL)[0]
        .replace("<br>", "\n")
        .replace("<p>", "")
        .replace("</p>", "\n\n")
        .replace("<br/>", "\n")
    )
    return lyrics, singers, directors, lyricists


# ---------------- lyricsmasti (CrawlerType0) ----------------


def lyricsmasti_movies_with_url(raw_html: str):
    # lyricsmasti-crawler.py:12-25
    refined = findall(
        r'<ul class="list-group list-group-flush">(.*?)</ul>', raw_html, DOTALL
    )[0]
    url_movie = findall(r"<a href=\"(.*?)\">\n(.*?)</a>", refined, DOTALL)
    return [(url, movie.strip(" \t\n\r")) for url, movie in url_movie]


def lyricsmasti_songs_with_url(raw_html: str):
    # lyricsmasti-crawler.py:27-40
    refined = findall(r'<ol class="custom-counter">(.*?)</ol>', raw_html, DOTALL)[0]
    song_url = findall(r"<a.*?href=\"(.*?)\".*?3>(.*?)<", refined, DOTALL)
    return [(url, song.strip(" \t\n\r")) for url, song in song_url]


def _lyricsmasti_modify_artist(artist):
    # lyricsmasti-crawler.py:82-89 — ' &amp;' → ', ' then split(', ')
    if len(artist) > 0:
        return artist[0].strip(" \t\n\r").replace(" &amp;", ", ").split(", ")
    return []


def lyricsmasti_song_details(raw_html: str):
    # lyricsmasti-crawler.py:42-79
    refined = findall(r"<ul>(.*?)</ul>", raw_html, DOTALL)[0]
    singers = _lyricsmasti_modify_artist(
        findall(r"<h4>S.*?set.*?>(.*?)<", refined, DOTALL)
    )
    lyricists = _lyricsmasti_modify_artist(
        findall(r"<h4>L.*?set.*?>(.*?)<", refined, DOTALL)
    )
    directors = _lyricsmasti_modify_artist(
        findall(r"<h4>M.*?set.*?>(.*?)<", refined, DOTALL)
    )
    lyrics = findall(r"v><code.*?>(.*?)</", raw_html, DOTALL)[0]
    return lyrics, singers, directors, lyricists


# ---------------- azlyrics (CrawlerType1) ----------------


def azlyrics_artists_with_url(raw_html: str):
    # azlyrics-crawler.py:15-31 (shuffle dropped — document order)
    refined = findall(
        r"<div class=\"col-sm-6 text-center artist-col\">(.*?)</div>  "
        r"<!-- container main-page -->",
        raw_html,
        DOTALL,
    )[0]
    return findall(r"<a href=\"(.*?)\">(.*?)<", refined, DOTALL)


def azlyrics_albums_with_songs(raw_html: str):
    # azlyrics-crawler.py:33-66 (shuffle dropped)
    data = []
    album_html = findall(r"iv class=\"album\">(.*?)<d", raw_html, DOTALL)
    for content in album_html:
        album_name = findall(r"<b>\"(.*?)\"", content, DOTALL)
        album_name = "other" if len(album_name) == 0 else album_name[0]
        songs_with_url = findall(
            r"<a href=\"\.\.(.*?)\" target=\"_blank\">(.*?)</a><br>", content
        )
        data.append((album_name, songs_with_url))
    return data


def azlyrics_song_details(song_html: str):
    # azlyrics-crawler.py:68-82
    return (
        findall(r"<div>.*?-->(.*?)</div>", song_html, DOTALL)[0]
        .replace("<br>", "\n")
        .replace("<i>", "")
        .replace("</i>", "")
    )


# ---------------- metrolyrics (CrawlerType2) ----------------


def metrolyrics_song_details(raw_html: str):
    # metrolyrics-crawler.py:12-69
    lyrics = findall(
        r'<div id="lyrics-body-text" class="js-lyric-text">\n(.*?)</div>\n</div>\n<p',
        raw_html,
        DOTALL,
    )
    if len(lyrics) == 0:
        lyrics = findall(
            r'<div id="lyrics-body-text" class="js-lyric-text">(.*?)</div>',
            raw_html,
            DOTALL,
        )[0]
    else:
        lyrics = lyrics[0]

    lyrics = (
        sub(r'<div class="author">.*?</div>.*?<p class=.*?', "", lyrics)
        .replace("<p class='verse'>", "")
        .replace("<br>", "\n")
        .replace("</p>", "\n\n")
    )

    album = findall(r"<em>from.*?>(.*?)<", raw_html, DOTALL)
    album = album[0] if len(album) > 0 else ""

    lyricists = findall(
        r'<p class="writers"><strong>Songwriters</strong><br/>(.*?)</',
        raw_html,
        DOTALL,
    )
    lyricists = lyricists[0].strip(" \n").split(", ") if len(lyricists) > 0 else []

    other_artists = findall(r'<p class="fea.*?span.*?>(.*?)</', raw_html, DOTALL)
    other_artists = other_artists[0].split(", ") if len(other_artists) > 0 else []

    return album, lyrics, lyricists, other_artists


def metrolyrics_artist_with_url(raw_html: str):
    # metrolyrics-crawler.py:71-89
    data = findall(
        r'<tr itemscope itemtype="http://schema.org/MusicGroup">.*?<a '
        r'href="(.*?)".*?">(.*?)</a>.*?</tr>',
        raw_html,
        DOTALL,
    )
    return [
        (
            url.replace("http://www.metrolyrics.com", ""),
            artist.replace(" Lyrics", "").strip(" \n"),
        )
        for url, artist in data
    ]


def metrolyrics_pages_for_artist(raw_html: str):
    # metrolyrics-crawler.py:91-110
    area = findall(r'<span class="pages">(.*?)</span>', raw_html, DOTALL)
    if len(area) == 0:
        return []
    links = findall(r'<a href="(.*?)"', area[0], DOTALL)
    return [link.replace("http://www.metrolyrics.com", "") for link in links]


def metrolyrics_songs(raw_html: str):
    # metrolyrics-crawler.py:112-139
    area = findall(r"<tbody>(.*?)</tbody>", raw_html, DOTALL)
    if len(area) == 0:
        return []
    rows = findall(r'<tr>.*?<td>.*?<a href="(.*?)" .*?>(.*?)</a>', area[0], DOTALL)
    return [
        (
            url.replace("http://www.metrolyrics.com", ""),
            song.replace(" Lyrics", "").strip(" \n"),
        )
        for url, song in rows
    ]


# ---------------- uniform dispatch (engine F2) ----------------

ADAPTERS = {
    "hindilyrics": {
        "movies": hindilyrics_movies_with_url,
        "songs": hindilyrics_songs_with_url,
        "details": hindilyrics_song_details,
    },
    "smriti": {
        "movies": smriti_movies_with_url,
        "songs": smriti_songs_with_url,
        "details": smriti_song_details,
    },
    "lyricsmasti": {
        "movies": lyricsmasti_movies_with_url,
        "songs": lyricsmasti_songs_with_url,
        "details": lyricsmasti_song_details,
    },
    "azlyrics": {
        "artists": azlyrics_artists_with_url,
        "albums": azlyrics_albums_with_songs,
        "details": azlyrics_song_details,
    },
    "metrolyrics": {
        "artists": metrolyrics_artist_with_url,
        "pages": metrolyrics_pages_for_artist,
        "songs": metrolyrics_songs,
        "details": metrolyrics_song_details,
    },
}


def parse_page(dialect: str, topology: int, task_type: int, html: str) -> dict:
    """Uniform parse contract (SURVEY.md §2.10): every page parse yields
    outlinks to enqueue and/or leaf details. Returns a dict with keys:

    - ``links``:  list[(url, label)] — child links in document order
    - ``albums``: list[(album, [(url, song)])] (Type1 artist pages)
    - ``pages``:  list[url] (Type2 pagination)
    - ``details``: normalized leaf dict(album, lyrics, singers, directors,
      lyricists) — list-valued fields as real lists (reference stringifies
      at db_operations.py:40-42; we keep arrays per SURVEY.md §1.2)
    """
    a = ADAPTERS[dialect]
    if topology == 0:
        if task_type == 0:
            return {"links": a["movies"](html)}
        if task_type == 1:
            return {"links": a["songs"](html)}
        lyrics, singers, music_by, lyricists = a["details"](html)
        return {
            "details": {
                "album": None,
                "lyrics": lyrics,
                "singers": list(singers),
                "directors": list(music_by),
                "lyricists": list(lyricists),
            }
        }
    if topology == 1:
        if task_type == 0:
            return {"links": a["artists"](html)}
        if task_type == 1:
            return {"albums": a["albums"](html)}
        # Type1 leaf: single lyrics string; singer/director/lyricist are
        # filled from the *task's* artist (base_crawler.py:464-474).
        return {"details": {"lyrics": a["details"](html)}}
    if topology == 2:
        if task_type == 0:
            return {"links": a["artists"](html)}
        if task_type == 1:
            return {"pages": a["pages"](html), "links": a["songs"](html)}
        if task_type == 2:
            return {"links": a["songs"](html)}
        album, lyrics, lyricists, other_artists = a["details"](html)
        return {
            "details": {
                "album": album,
                "lyrics": lyrics,
                "lyricists": list(lyricists),
                "other_artists": list(other_artists),
            }
        }
    raise AssertionError((dialect, topology, task_type))
