"""Deterministic synthetic PTT site: ``html_for(url)`` is a pure function of
the URL (plus the site spec), so any worker at any scale regenerates the same
page with no shared state and no stored corpus — the property that lets the
bench run a large frontier without materializing a site.

Covers the reference's fixture cases (FIXTURES.md F2/F3/F6): 爆/99/X5/empty
nrec values, deleted rows, 公告 announcements, all four image-link rules,
duplicate links (D1), album/non-image rejects, paging buttons with the
max-page +1 rule, robots.txt, and scripted fetch behaviors (429s, 404s,
oversize bodies) keyed off the URL."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from ..functions.parse import PTT_BASE_URL


def _h(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


@dataclass
class SiteSpec:
    boards: dict[str, int] = field(default_factory=lambda: {"Beauty": 10})  # board → max_page
    articles_per_page: int = 6
    seed: int = 42
    # behavior scripting (F6): predicates keyed by url substring
    status_429_then_200: set[str] = field(default_factory=set)  # first hit 429, then 200
    always_429: set[str] = field(default_factory=set)
    not_found: set[str] = field(default_factory=set)
    oversize: set[str] = field(default_factory=set)
    robots_disallow: list[str] = field(default_factory=list)  # path prefixes
    robots_crawl_delay: float | None = None  # Crawl-delay line (seconds)
    real_png_media: bool = False  # media bodies are genuine PNGs (stdlib
    # codec) instead of tagged filler bytes — lets crawl → decode pipelines
    # exercise the REAL PngBackend end-to-end; off by default so existing
    # size-sensitive oracles (50 MB cap tests, byte counts) are untouched


def mock_transport_factory(spec: "SiteSpec | None" = None, latency_s: float = 0.0,
                           transport_error_urls: frozenset | None = None,
                           handshake_s: float = 0.0, pool_size: int = 20):
    """Library-level factory for fetch stages: partial(mock_transport_factory,
    spec, ...) is picklable BY REFERENCE into Ray workers (a factory defined
    in a test module or script is not importable there)."""
    from ..stages.fetch import MockTransport

    return MockTransport(
        SyntheticSite(spec),
        transport_error_urls=set(transport_error_urls or ()),
        latency_s=latency_s,
        handshake_s=handshake_s,
        pool_size=pool_size,
    )


class SyntheticSite:
    def __init__(self, spec: SiteSpec | None = None):
        self.spec = spec or SiteSpec()

    # -- URL helpers --------------------------------------------------------

    def index_url(self, board: str, page: int) -> str:
        return f"{PTT_BASE_URL}/bbs/{board}/index{page}.html"

    def article_id(self, board: str, page: int, slot: int) -> str:
        return f"M.{1700000000 + page * 100 + slot}.A.{_h(f'{self.spec.seed}/{board}/{page}/{slot}') % 1000:03d}"

    def article_url(self, board: str, page: int, slot: int) -> str:
        return f"{PTT_BASE_URL}/bbs/{board}/{self.article_id(board, page, slot)}.html"

    # -- page content -------------------------------------------------------

    def html_for(self, url: str) -> tuple[int, bytes]:
        """(status, body) for a URL; deterministic."""
        s = self.spec
        if any(sub in url for sub in s.not_found):
            return 404, b"not found"
        if url.endswith("/robots.txt"):
            lines = ["User-agent: *"] + [f"Disallow: {p}" for p in s.robots_disallow]
            if s.robots_crawl_delay is not None:
                lines.append(f"Crawl-delay: {s.robots_crawl_delay}")
            return 200, "\n".join(lines).encode()
        for board, max_page in s.boards.items():
            prefix = f"{PTT_BASE_URL}/bbs/{board}/"
            if url.startswith(prefix):
                rest = url[len(prefix):]
                if rest.startswith("index") and rest.endswith(".html"):
                    # bare index.html = newest page (PTT behavior; its prev
                    # button points at max_page-1 so ParseMaxPage → max_page)
                    page = int(rest[5:-5]) if rest != "index.html" else max_page
                    if page < 1 or page > max_page:
                        return 404, b"no such page"
                    return 200, self._board_page(board, page, max_page).encode()
                return 200, self._article_page(board, url).encode()
        if self._is_media(url):
            if any(sub in url for sub in s.oversize):
                return 200, b"\xff" * (1 << 20)  # bench-scale "oversize" marker body
            return 200, self._media_bytes(url)
        return 404, b"unknown"

    def _is_media(self, url: str) -> bool:
        return url.endswith((".jpg", ".jpeg", ".png", ".gif"))

    def _media_bytes(self, url: str) -> bytes:
        h = _h(url)
        if self.spec.real_png_media:
            import numpy as np

            from ..functions.png import encode_png

            hh = 8 + h % 24
            ww = 8 + (h >> 8) % 24
            px = np.random.default_rng(h % (1 << 32)).integers(
                0, 256, size=(hh, ww, 3), dtype=np.uint8
            )
            return encode_png(px)
        return (url + "|").encode() + bytes([h % 251]) * (100 + h % 900)

    def _board_page(self, board: str, page: int, max_page: int) -> str:
        s = self.spec
        rows = []
        for slot in range(s.articles_per_page):
            h = _h(f"{s.seed}|{board}|{page}|{slot}")
            kind = h % 10
            if kind == 0:  # deleted article — no title link
                rows.append(
                    '<div class="r-ent"><div class="nrec"></div>'
                    "<div class=\"title\"> (本文已被刪除) </div>"
                    '<div class="meta"><div class="author">-</div></div></div>'
                )
                continue
            href = f"/bbs/{board}/{self.article_id(board, page, slot)}.html"
            if kind == 1:  # announcement — parser must skip
                title = f"[公告] 板規 {page}-{slot}"
            else:
                title = f"[貼圖] {board} 文章 {page}-{slot}"
            nrec = ["爆", "99", "X5", "12", "", "7", "X1", "55", "3"][h % 9]
            rows.append(
                f'<div class="r-ent"><div class="nrec"><span>{nrec}</span></div>'
                f'<div class="title"><a href="{href}">{title}</a></div>'
                f'<div class="meta"><div class="author">user{h % 100}</div></div></div>'
            )
        paging = (
            '<div class="btn-group btn-group-paging">'
            f'<a href="/bbs/{board}/index1.html">最舊</a>'
            f"<a href=\"/bbs/{board}/index{page - 1}.html\">&lsaquo; 上頁</a>"
            "</div>"
        )
        return f"<html><body>{paging}{''.join(rows)}</body></html>"

    def _article_page(self, board: str, url: str) -> str:
        s = self.spec
        h = _h(f"{s.seed}|article|{url}")
        n_imgs = h % 5  # 0..4 images; 0 ⇒ no task fan-out (crawler.go:471-473)
        links = []
        for i in range(n_imgs):
            hi = _h(f"{url}|img|{i}")
            style = hi % 6
            name = f"i{hi % 100000:05d}"
            if style == 0:
                href = f"https://i.imgur.com/{name}.jpg"
            elif style == 1:
                href = f"//cdn.example.com/{name}.png"
            elif style == 2:
                href = f"http://pics.example.com/{name}.gif"
            elif style == 3:
                href = f"https://imgur.com/{name}"  # no-ext imgur → .jpg
            elif style == 4 and links:
                href = links[-1]  # duplicate of previous link (D1)
            else:
                href = f"https://i.imgur.com/{name}.jpeg"
            links.append(href)
        rejects = (
            f'<a href="https://imgur.com/a/alb{h % 100}">album</a>'
            f'<a href="https://example.com/doc{h % 100}.pdf">pdf</a>'
        )
        body_links = "".join(
            f'<a href="{href}">{href}</a>\n段落文字 {i}。\n' for i, href in enumerate(links)
        )
        title = f"[貼圖] 內文標題 {h % 10000}"
        return (
            "<html><body><div id=\"main-content\">"
            '<div class="article-metaline"><span class="article-meta-tag">作者</span>'
            f'<span class="article-meta-value">user{h % 100}</span></div>'
            '<div class="article-metaline"><span class="article-meta-tag">標題</span>'
            f'<span class="article-meta-value">{title}</span></div>'
            f"開頭文字。\n{body_links}{rejects}結尾文字。"
            "</div></body></html>"
        )
