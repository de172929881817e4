"""Deterministic synthetic lyrics-site graph (the simulated web).

Every page is a pure function of ``(spec.seed, url)``, so the graph can be
"fetched" on any executor without coordination, at any parallelism, and a
re-fetch always returns identical bytes. The five dialects emit HTML shaped
to satisfy the exact regexes of the reference adapters:

- hindilyrics  → /root/reference/crawler/hindilyrics-crawler.py:13-38
- smriti       → /root/reference/crawler/smriti-crawler.py:12-73
- lyricsmasti  → /root/reference/crawler/lyricsmasti-crawler.py:12-79
- azlyrics     → /root/reference/crawler/azlyrics-crawler.py:15-82
- metrolyrics  → /root/reference/crawler/metrolyrics-crawler.py:12-139

The URL id space is parameterized by ``url_space`` (default 10^10 — the
frontier-address-space scale from BASELINE.json); tests run tiny slices,
bench runs larger slices of the same space.

Injected phenomena (all hash-deterministic):
- duplicate links (dedup exercise — reference `exists_song`,
  db_operations.py:214-229),
- empty movies (the "no new songs" skip, base_crawler.py:160-172),
- transient/permanent fetch errors (retry + dead-letter,
  base_crawler.py:102-110, :55-62),
- interleaved ``<media src="…"/>`` refs inside lyrics bodies (the
  interleaved text+media span payload from BASELINE.json input_hint),
- HTML entities (the unescape-at-save path, db_operations.py:37-42).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from lyrics_crawler_spark.functions.hashing import stable_hash, stable_unit

DIALECTS = ("hindilyrics", "smriti", "lyricsmasti", "azlyrics", "metrolyrics")

# Topology per dialect (reference: CrawlerType0/1/2 in base_crawler.py).
TOPOLOGY = {
    "hindilyrics": 0,
    "smriti": 0,
    "lyricsmasti": 0,
    "azlyrics": 1,
    "metrolyrics": 2,
}

_LEXICON = (
    "aankhon dil mera tera pyaar sapna raat chand sitare mehfil jaan "
    "dost safar manzil baarish khushi gham yaadein ishq junoon awaaz "
    "dhadkan nazar saans kahani subah shaam hawa badal kinara lehron "
    "deewana parwana raahein chalte gungunate milenge bichhde naino"
).split()

_NAME_WORDS = (
    "Arjun Meera Kabir Naina Veer Tara Aman Riya Dev Sia Ravi Lata "
    "Kishore Asha Rafi Alka Sonu Shreya Arijit Neha Udit Kavita"
).split()


class FetchError(RuntimeError):
    """Simulated network failure (reference: urllib errors bubbling to
    base_crawler.py:102-110)."""


@dataclass(frozen=True)
class SiteSpec:
    dialect: str
    start_url: str
    seed: int = 42
    n_seeds: int = 3
    branch1: int = 3  # movies/artists per index page
    branch2: int = 3  # songs per movie (Type0)
    albums_per_artist: int = 2  # azlyrics
    songs_per_album: int = 2  # azlyrics
    n_pages: int = 2  # metrolyrics pages per artist (incl. page 1)
    songs_per_page: int = 2  # metrolyrics
    n_verses: int = 3
    media_rate: float = 0.5
    dup_link_rate: float = 0.0
    empty_movie_rate: float = 0.0
    error_rate: float = 0.0
    entity_rate: float = 0.25
    max_err: int = 10  # reference default, base_crawler.py:11
    delay_request: bool = False  # reference R2, network_manager.py:44-53
    politeness_budget: int | None = None  # per-wave per-host fetch cap
    url_space: int = 10**10
    robots_disallow: tuple = ()
    # realistic page weight: KB of deterministic filler markup appended to
    # every page (real lyrics pages are 20-100 KB of boilerplate the
    # reference's DOTALL regexes scan through). 0 = bare pages (tests).
    page_pad_kb: int = 0

    def __post_init__(self):
        assert self.dialect in DIALECTS, self.dialect

    @property
    def host(self) -> str:
        return re.sub(r"^https?://", "", self.start_url)

    @property
    def topology(self) -> int:
        return TOPOLOGY[self.dialect]


_PATHS = {
    "idx": re.compile(r"^/idx-(\d+)\.html$"),
    "movie": re.compile(r"^/movie-(\d+)\.html$"),
    "song": re.compile(r"^/song-(\d+)\.html$"),
    "artist": re.compile(r"^/artist-(\d+)\.html$"),
    "artist_page": re.compile(r"^/artist-(\d+)-p(\d+)\.html$"),
}


class SiteGraph:
    """Serves deterministic pages for one synthetic site."""

    def __init__(self, spec: SiteSpec):
        self.spec = spec
        self._pool_cache: dict = {}

    # ---------------- URL / structure helpers ----------------

    def seeds(self) -> list[str]:
        """Site-relative seed URLs, in the order the reference would push
        them (hindilyrics-crawler.py:52-99 etc. build the list in order;
        azlyrics' shuffle is excluded from the determinism contract,
        SURVEY.md §2.8 R4)."""
        return [f"/idx-{k}.html" for k in range(self.spec.n_seeds)]

    def _h(self, *parts) -> int:
        return stable_hash(self.spec.seed, self.spec.dialect, *parts)

    def _u(self, *parts) -> float:
        return stable_unit(self.spec.seed, self.spec.dialect, *parts)

    def _pop_pool(self, kind: str, size: int) -> list[int]:
        # memoized: pools are re-requested for every generated page
        pool = self._pool_cache.get((kind, size))
        if pool is None:
            pool = [
                self._h("pop", kind, i) % self.spec.url_space for i in range(size)
            ]
            self._pool_cache[(kind, size)] = pool
        return pool

    def _name(self, kind: str, ident: int, words, n: int, entity_ok=False) -> str:
        toks = [words[self._h("w", kind, ident, i) % len(words)] for i in range(n)]
        name = " ".join(toks)
        if entity_ok and self._u("ent", kind, ident) < self.spec.entity_rate:
            name += " &amp; co"
        return name

    def movie_ids(self, k: int) -> list[int]:
        """Level-1 ids (movies or artists) linked from index page k.
        Cross-page duplicates come from a small popular pool
        (dup_link_rate)."""
        s = self.spec
        pool = self._pop_pool("l1", max(1, (s.n_seeds * s.branch1) // 3))
        out = []
        for j in range(s.branch1):
            if self._u("dup1", k, j) < s.dup_link_rate:
                out.append(pool[self._h("dupsel1", k, j) % len(pool)])
            else:
                out.append(self._h("l1", k, j) % s.url_space)
        return out

    def movie_name(self, m: int) -> str:
        return self._name("movie", m, _LEXICON, 2, entity_ok=False).title()

    def artist_name(self, a: int) -> str:
        return self._name("artist", a, _NAME_WORDS, 2)

    def song_ids(self, m: int) -> list[int]:
        """Songs of movie m (Type0). Unique per movie by construction —
        duplicates are only *within* the same movie page (same url listed
        twice), which keeps the reference's count-equality skip
        (base_crawler.py:160-172) analyzable. Cross-parent song sharing is
        exercised in Type1/Type2 instead (no count check there)."""
        s = self.spec
        if self._u("empty", m) < s.empty_movie_rate:
            return []
        out = []
        for j in range(s.branch2):
            if j > 0 and self._u("dups0", m, j) < s.dup_link_rate:
                out.append(out[j - 1])
            else:
                out.append(self._h("s0", m, j) % s.url_space)
        return out

    def shared_song_ids(self, parent: int, slot_count: int, tag: str) -> list[int]:
        """Songs for Type1/Type2 parents; may duplicate across parents."""
        s = self.spec
        pool = self._pop_pool("sshare", max(1, s.n_seeds * s.branch1))
        out = []
        for j in range(slot_count):
            if self._u("dups12", tag, parent, j) < s.dup_link_rate:
                out.append(pool[self._h("dupsel12", tag, parent, j) % len(pool)])
            else:
                out.append(self._h("s12", tag, parent, j) % s.url_space)
        return out

    def song_name(self, sid: int) -> str:
        base = self._name("song", sid, _LEXICON, 3).title()
        if self._u("ent", "song", sid) < self.spec.entity_rate:
            base += " &amp; Co"
        return base

    # ---------------- song details (ground truth) ----------------

    def song_people(self, sid: int) -> dict:
        n_singers = 1 + self._h("nsing", sid) % 2
        singers = [
            self._name("singer", self._h("sg", sid, i), _NAME_WORDS, 2)
            for i in range(n_singers)
        ]
        director = self._name("director", self._h("md", sid), _NAME_WORDS, 2)
        n_lyr = 1 + self._h("nlyr", sid) % 2
        lyricists = [
            self._name("lyricist", self._h("ly", sid, i), _NAME_WORDS, 2)
            for i in range(n_lyr)
        ]
        return {"singers": singers, "director": director, "lyricists": lyricists}

    def verses(self, sid: int) -> list[str]:
        out = []
        for v in range(self.spec.n_verses):
            lines = []
            for li in range(2):
                n = 3 + self._h("vl", sid, v, li) % 3
                words = [
                    _LEXICON[self._h("vw", sid, v, li, i) % len(_LEXICON)]
                    for i in range(n)
                ]
                if self._u("vent", sid, v, li) < self.spec.entity_rate:
                    words.append("&amp;")
                    words.append(_LEXICON[self._h("vw2", sid, v, li) % len(_LEXICON)])
                lines.append(" ".join(words))
            out.append("\n".join(lines))
        return out

    def media_refs(self, sid: int) -> list[str | None]:
        """media_refs[i] sits between verse i and verse i+1 (None = no
        media there). Interleaved text+media is the payload axis from
        BASELINE.json (input_hint)."""
        s = self.spec
        out: list[str | None] = []
        for i in range(s.n_verses - 1):
            if self._u("med", sid, i) < s.media_rate:
                ext = "png" if self._h("medx", sid, i) % 2 == 0 else "mp3"
                out.append(f"media://{s.host}/song-{sid}/{i}.{ext}")
            else:
                out.append(None)
        return out

    def lyrics_body(self, sid: int, verse_wrap=None, verse_sep="\n\n") -> str:
        """Interleave verses and media markers. ``verse_wrap`` maps a verse
        string to dialect HTML; media markers are emitted verbatim (they
        survive every reference replace-chain)."""
        parts = []
        vs = self.verses(sid)
        refs = self.media_refs(sid)
        for i, v in enumerate(vs):
            parts.append(verse_wrap(v) if verse_wrap else v)
            if i < len(refs) and refs[i] is not None:
                parts.append(f'<media src="{refs[i]}"/>')
        return verse_sep.join(parts)

    # ---------------- error model ----------------

    def fail_count(self, abs_url: str) -> int:
        """Number of leading attempts that raise for this URL. A count
        >= max_err means the task dead-letters (base_crawler.py:55-62)."""
        s = self.spec
        r = self._h("err", abs_url)
        if (r % 10_000) / 10_000.0 >= s.error_rate:
            return 0
        f = 1 + (r // 10_000) % (s.max_err + 2)
        return f

    # ---------------- fetch ----------------

    def fetch(self, abs_url: str, attempt: int) -> str:
        """Simulated open_request (network_manager.py:33-41): raises for
        the first fail_count attempts, then returns deterministic HTML."""
        if attempt < self.fail_count(abs_url):
            raise FetchError(f"synthetic fetch error {attempt} for {abs_url}")
        return self.html(abs_url)

    def html(self, abs_url: str) -> str:
        rel = self._rel(abs_url)
        for kind, pat in _PATHS.items():
            mm = pat.match(rel)
            if mm:
                fn = getattr(self, f"_page_{kind}")
                page = fn(*[int(g) for g in mm.groups()])
                pad = self._pad()
                if pad:
                    # boilerplate BEFORE the payload: lazy DOTALL regexes
                    # must scan across it, like on real pages
                    page = page.replace("<html>", "<html>" + pad, 1)
                return page
        raise FetchError(f"404 synthetic page: {abs_url}")

    _pad_cache: str | None = None

    def _pad(self) -> str:
        if self.spec.page_pad_kb <= 0:
            return ""
        if self._pad_cache is None:
            # deterministic filler free of every marker the parsers key on
            # (no <li>, <a href, <div class=..., quotes, '-->', '<d')
            unit = "<span>" + "pad " * 24 + "</span>\n"
            n = (self.spec.page_pad_kb * 1024) // len(unit) + 1
            object.__setattr__(self, "_pad_cache", "<!-- boilerplate -->\n" + unit * n)
        return self._pad_cache

    def _rel(self, abs_url: str) -> str:
        su = self.spec.start_url
        if abs_url.startswith(su):
            rel = abs_url[len(su):]
            if not rel.startswith("/"):
                rel = "/" + rel
            return rel
        raise FetchError(f"wrong host for {self.spec.host}: {abs_url}")

    # ---------------- per-dialect page builders ----------------

    def _page_idx(self, k: int) -> str:
        d = self.spec.dialect
        ids = self.movie_ids(k)
        if d == "hindilyrics":
            rows = [
                f'<li><a href="/movie-{m}.html">{self.movie_name(m)}</a></li>'
                for m in ids
            ]
            if self.spec.robots_disallow:
                rows.append(
                    f'<li><a href="/private-{k}.html">Private Area</a></li>'
                )
            return "<html><h2>Movies</h2>\n" + "\n".join(rows) + "\n</html>"
        if d == "smriti":
            rows = [
                f'<a href="/movie-{m}.html">{self.movie_name(m)}</a>' for m in ids
            ]
            if self.spec.robots_disallow:
                rows.append(f'<a href="/private-{k}.html">Private</a>')
            return (
                '<html><a href="/hindi-songs/">main index</a>\n'
                + "\n".join(rows)
                + "\n</div><div>footer</div></html>"
            )
        if d == "lyricsmasti":
            rows = [
                f'<li><a href="/movie-{m}.html">\n {self.movie_name(m)}</a></li>'
                for m in ids
            ]
            if self.spec.robots_disallow:
                rows.append(f'<li><a href="/private-{k}.html">\n Private</a></li>')
            return (
                '<html><ul class="list-group list-group-flush">\n'
                + "\n".join(rows)
                + "\n</ul></html>"
            )
        if d == "azlyrics":
            rows = [
                f'<a href="artist-{a}.html">{self.artist_name(a)}</a>' for a in ids
            ]
            if self.spec.robots_disallow:
                rows.append(f'<a href="private-{k}.html">Private</a>')
            return (
                '<html><div class="col-sm-6 text-center artist-col">\n'
                + "\n".join(rows)
                + "\n</div>  <!-- container main-page --></html>"
            )
        if d == "metrolyrics":
            rows = [
                '<tr itemscope itemtype="http://schema.org/MusicGroup">\n'
                f'<td><a href="/artist-{a}.html" class="image">'
                f"{self.artist_name(a)} Lyrics</a></td>\n</tr>"
                for a in ids
            ]
            if self.spec.robots_disallow:
                rows.append(
                    '<tr itemscope itemtype="http://schema.org/MusicGroup">\n'
                    f'<td><a href="/private-{k}.html" class="image">'
                    "Private Lyrics</a></td>\n</tr>"
                )
            return "<html><table>\n" + "\n".join(rows) + "\n</table></html>"
        raise AssertionError(d)

    def _page_movie(self, m: int) -> str:
        d = self.spec.dialect
        sids = self.song_ids(m)
        if d == "hindilyrics":
            rows = [
                f'<li><a href="/song-{s}.html">{self.song_name(s)}</a></li>'
                for s in sids
            ]
            return "<html><h2>Songs</h2>\n" + "\n".join(rows) + "\n</html>"
        if d == "smriti":
            rows = [
                f'<div class="onesong">{self.song_name(s)}: '
                f'<a href="#meta">info</a> <a href="/song-{s}.html">listen</a></div>'
                for s in sids
            ]
            return "<html>\n" + "\n".join(rows) + "\n</html>"
        if d == "lyricsmasti":
            rows = [
                f'<li><a class="song" href="/song-{s}.html">'
                f"<h3>{self.song_name(s)}</h3></a></li>"
                for s in sids
            ]
            return (
                '<html><ol class="custom-counter">\n'
                + "\n".join(rows)
                + "\n</ol></html>"
            )
        raise AssertionError(f"movie page in dialect {d}")

    def _page_artist(self, a: int) -> str:
        d = self.spec.dialect
        if d == "azlyrics":
            blocks = []
            for b in range(self.spec.albums_per_artist):
                sids = self.shared_song_ids(a, self.spec.songs_per_album, f"alb{b}")
                has_name = self._u("albname", a, b) > 0.25
                head = (
                    f'<div class="album"><b>"{self.movie_name(self._h("alb", a, b) % self.spec.url_space)}"</b><br>\n'
                    if has_name
                    else '<div class="album"><br>\n'
                )
                songs = "\n".join(
                    f'<a href="../song-{s}.html" target="_blank">'
                    f"{self.song_name(s)}</a><br>"
                    for s in sids
                )
                blocks.append(head + songs + "\n")
            return (
                "<html>\n"
                + "\n".join(blocks)
                + '\n<div class="albums-end"></div></html>'
            )
        if d == "metrolyrics":
            pages = [f"/artist-{a}.html"] + [
                f"/artist-{a}-p{k}.html" for k in range(2, self.spec.n_pages + 1)
            ]
            span = (
                '<span class="pages">'
                + "".join(f'<a href="{p}">{i + 1}</a>' for i, p in enumerate(pages))
                + "</span>"
            )
            return (
                "<html>"
                + span
                + "\n<table><tbody>\n"
                + self._metro_song_rows(a, 1)
                + "\n</tbody></table></html>"
            )
        raise AssertionError(f"artist page in dialect {d}")

    def _page_artist_page(self, a: int, page: int) -> str:
        assert self.spec.dialect == "metrolyrics"
        return (
            "<html><table><tbody>\n"
            + self._metro_song_rows(a, page)
            + "\n</tbody></table></html>"
        )

    def _metro_song_rows(self, a: int, page: int) -> str:
        sids = self.shared_song_ids(a, self.spec.songs_per_page, f"pg{page}")
        return "\n".join(
            f'<tr><td><a href="/song-{s}.html" class="title">'
            f"{self.song_name(s)} Lyrics</a></td></tr>"
            for s in sids
        )

    def _page_song(self, s: int) -> str:
        d = self.spec.dialect
        p = self.song_people(s)
        if d == "hindilyrics":
            sing = ", ".join(f'<a href="#">{x}</a>' for x in p["singers"])
            lyr = ", ".join(f'<a href="#">{x}</a>' for x in p["lyricists"])
            body = self.lyrics_body(s, verse_sep="\n\n")
            return (
                f"<html><h1>{self.song_name(s)}</h1>\n"
                f"Singer(s) :{sing}<br>\n"
                f'Music By :<a href="#">{p["director"]}</a><br>\n'
                f"Lyricist :{lyr}<br>\n"
                f'<font face="verdana">{body}</font></html>'
            )
        if d == "smriti":
            body = self.lyrics_body(
                s,
                verse_wrap=lambda v: "<p>" + v.replace("\n", "<br>") + "</p>",
                verse_sep="\n",
            )
            if self._u("br2", s) < 0.5:
                body = body.replace("<br>", "<br/>", 1)
            return (
                "<html><ul>\n"
                f'<li><b>Singer(s):</b> <span>{", ".join(p["singers"])}</span></li>\n'
                f'<li><b>Music:</b> <span>{p["director"]}</span></li>\n'
                f'<li><b>Lyrics by:</b> <span>{", ".join(p["lyricists"])}</span></li>\n'
                "</ul>\n"
                f'<div class="song-text">{body}</div></html>'
            )
        if d == "lyricsmasti":
            joiner = " &amp; " if self._u("amp", s) < 0.4 else ", "
            body = self.lyrics_body(s, verse_sep="\n\n")
            return (
                "<html><ul>\n"
                f'<li><h4>Singers</h4><span class="set">{joiner.join(p["singers"])}</span></li>\n'
                f'<li><h4>Lyricist</h4><span class="set">{joiner.join(p["lyricists"])}</span></li>\n'
                f'<li><h4>Music</h4><span class="set">{p["director"]}</span></li>\n'
                "</ul>\n"
                f'<div><code class="lyrics">{body}</code></div></html>'
            )
        if d == "azlyrics":
            wrap = None
            if self._u("ital", s) < 0.4:
                wrap = lambda v: "<i>" + v.replace("\n", "<br>") + "</i>"  # noqa: E731
            else:
                wrap = lambda v: v.replace("\n", "<br>")  # noqa: E731
            body = self.lyrics_body(s, verse_wrap=wrap, verse_sep="<br><br>")
            return (
                "<html><div>\n"
                "<!-- Usage of azlyrics.com content by any third-party is prohibited -->\n"
                f"{body}\n"
                "</div></html>"
            )
        if d == "metrolyrics":
            wrap = lambda v: "<p class='verse'>" + v.replace("\n", "<br>") + "</p>"  # noqa: E731
            body = self.lyrics_body(s, verse_wrap=wrap, verse_sep="\n")
            if self._u("auth", s) < 0.3:
                body = (
                    f'<div class="author">By {p["director"]}</div>' + body
                )
            has_album = self._u("hasalb", s) < 0.7
            album_html = (
                f'<em>from <strong>{self.movie_name(self._h("salb", s) % self.spec.url_space)}</strong></em>\n'
                if has_album
                else ""
            )
            writers = ", ".join(p["lyricists"])
            feat = ""
            if self._u("feat", s) < 0.4:
                feats = ", ".join(
                    self._name("feat", self._h("ft", s, i), _NAME_WORDS, 2)
                    for i in range(1 + self._h("nft", s) % 2)
                )
                feat = f'<p class="featured"><span>{feats}</span></p>\n'
            primary = self._u("shape", s) < 0.6
            if primary:
                lyr_html = (
                    '<div id="lyrics-body-text" class="js-lyric-text">\n'
                    f"{body}</div>\n</div>\n<p class=\"after\">x</p>\n"
                )
            else:
                lyr_html = (
                    '<div id="lyrics-body-text" class="js-lyric-text">'
                    f"{body}</div>\n"
                )
            return (
                "<html>"
                + album_html
                + lyr_html
                + f'<p class="writers"><strong>Songwriters</strong><br/>{writers}</p>\n'
                + feat
                + "</html>"
            )
        raise AssertionError(d)


def default_specs(
    seed: int = 42,
    scale: float = 1.0,
    error_rate: float = 0.05,
    dup_link_rate: float = 0.15,
    empty_movie_rate: float = 0.1,
    robots: bool = True,
) -> list[SiteSpec]:
    """The five-site fixture mirroring the reference's adapters. ``scale``
    multiplies seed/branch counts (1.0 ≈ a few hundred pages)."""

    def n(x):
        return max(1, round(x * scale))

    rb = ("/private",) if robots else ()
    return [
        SiteSpec(
            "hindilyrics", "http://hindilyrics.example", seed=seed,
            n_seeds=n(3), branch1=n(3), branch2=n(3),
            error_rate=error_rate, dup_link_rate=dup_link_rate,
            empty_movie_rate=empty_movie_rate, max_err=10, robots_disallow=rb,
        ),
        SiteSpec(
            "smriti", "http://smriti.example", seed=seed + 1,
            n_seeds=n(2), branch1=n(3), branch2=n(3),
            error_rate=error_rate, dup_link_rate=dup_link_rate,
            empty_movie_rate=empty_movie_rate, max_err=10, robots_disallow=rb,
        ),
        SiteSpec(
            "lyricsmasti", "http://lyricsmasti.example", seed=seed + 2,
            n_seeds=n(2), branch1=n(3), branch2=n(2),
            error_rate=error_rate, dup_link_rate=dup_link_rate,
            empty_movie_rate=empty_movie_rate, max_err=10, robots_disallow=rb,
        ),
        SiteSpec(
            "azlyrics", "http://azlyrics.example", seed=seed + 3,
            n_seeds=n(2), branch1=n(2), albums_per_artist=2, songs_per_album=2,
            error_rate=error_rate, dup_link_rate=dup_link_rate,
            max_err=5, delay_request=True, politeness_budget=None,
            robots_disallow=rb,
        ),
        SiteSpec(
            "metrolyrics", "http://metrolyrics.example", seed=seed + 4,
            n_seeds=n(2), branch1=n(2), n_pages=2, songs_per_page=2,
            error_rate=error_rate, dup_link_rate=dup_link_rate,
            max_err=10, robots_disallow=rb,
        ),
    ]
