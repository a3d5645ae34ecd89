"""Plain-Python crawl oracle: replays the engine's ordering contract —
round-based dispatch of the globally smallest (priority, seq) pending rows,
deterministic lineage seq encoding, sorted first-wins candidate dedup —
using only the pure parse functions and the synthetic site. Independent of
Ray and of the frontier/fetch machinery it checks."""

import heapq

from ptt_spider_go_ray.functions.parse import (
    PTT_BASE_URL,
    board_page_urls,
    canonicalize_url,
    determine_final_title,
    parse_article_spans,
    parse_board_html,
    parse_max_page,
    unique_stable,
)
from ptt_spider_go_ray.state.frontier import child_seq


def oracle_crawl(site, board, pages, push_threshold=0, batch_urls=256,
                 fetch_media=True, file_lines=None):
    pending = []  # (priority, seq, url, kind, list_title, push_rate, author)
    seen = set()

    def offer(cands):
        for prio, seq, url, kind, title, push, author in sorted(cands):
            c = canonicalize_url(url)
            if c in seen:
                continue
            seen.add(c)
            heapq.heappush(pending, (prio, seq, url, kind, title, push, author))

    if file_lines is not None:
        seeds = []
        i = 0
        for line in file_lines:
            line = line.strip()
            if line.startswith(PTT_BASE_URL + "/bbs/"):
                seeds.append((1, i, line, "article", "", 0, ""))
                i += 1
        offer(seeds)
        file_mode = True
    else:
        boards = board.split(",") if isinstance(board, str) else list(board)
        seeds = []
        offset = 0
        for b in boards:
            _, body = site.html_for(f"{PTT_BASE_URL}/bbs/{b}/index.html")
            max_page = parse_max_page(body.decode())
            urls = board_page_urls(b, max_page, pages)
            seeds.extend((0, offset + i, u, "index", "", 0, "") for i, u in enumerate(urls))
            offset += len(urls)
        offer(seeds)
        file_mode = False

    ledger = []
    docs = {}
    media_fetched = []
    media_meta = {}
    while pending:
        batch = [heapq.heappop(pending) for _ in range(min(batch_urls, len(pending)))]
        ledger.extend((p, s, u) for p, s, u, *_ in batch)
        cands = []
        for prio, seq, url, kind, list_title, push, author in batch:
            status, body = site.html_for(url)
            if status != 200:
                continue
            if kind == "index":
                idx = 0
                for art in parse_board_html(body.decode()):
                    if art["push_rate"] < push_threshold:
                        continue
                    cands.append(
                        (1, child_seq(seq, idx), art["url"], "article",
                         art["title"], art["push_rate"], art["author"])
                    )
                    idx += 1
            elif kind == "article":
                parsed_title, spans = parse_article_spans(body.decode())
                refs = unique_stable(
                    [s["media_ref"] for s in spans if s["kind"] == "media"]
                )
                # engine span normalization replay: per-doc first-occurrence
                # media dedup, offsets reassigned 0..n-1 (parse_stages.py)
                span_idx_of, _seen_refs, norm_spans = {}, set(), []
                for sp in spans:
                    if sp["kind"] == "media":
                        if sp["media_ref"] in _seen_refs:
                            continue
                        _seen_refs.add(sp["media_ref"])
                        span_idx_of[sp["media_ref"]] = len(norm_spans)
                    norm_spans.append({**sp, "offset": len(norm_spans)})
                doc_id = url.split("/bbs/")[-1]
                doc_id = "bbs/" + (doc_id[:-5] if doc_id.endswith(".html") else doc_id)
                title = determine_final_title(list_title, parsed_title, file_mode)
                docs[doc_id] = {"title": title, "media_refs": refs, "push": push,
                                "author": author, "url": url, "seq": seq,
                                "spans": norm_spans}
                if fetch_media:
                    for i, ref in enumerate(refs):
                        # author slot carries the provenance meta for media
                        # rows (doc_id|span_idx, parse_stages.py:166-172)
                        cands.append((2, child_seq(seq, i), ref, "media", "", 0,
                                      f"{doc_id}|{span_idx_of[ref]}"))
            else:  # media
                media_fetched.append(url)
                media_meta[url] = author  # the winning candidate's meta
        offer(cands)
    return {
        "ledger": ledger,
        "seen": sorted(seen),
        "docs": docs,
        "media_fetched": sorted(media_fetched),
        "media_meta": media_meta,
    }
