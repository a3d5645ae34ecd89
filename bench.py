#!/usr/bin/env python
"""Benchmark harness. Default: run the headline crawl bench (synthetic PTT
frontier, MockTransport with simulated network latency — deterministic, no
external network) plus the full query suite over $GRAFT_SF_DIR, and print ONE
JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "crawl": {...pages/s, verified...}}

--scaling: run the crawl bench twice in FRESH processes at num_cpus=8 and 32
(the sandbox stand-in for N and 4N cluster sizes; see BASELINE.md) and report
both throughputs plus scaling efficiency.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# crawl bench spec: enough URLs that simulated network latency dominates
# scheduling overhead (the workload must be latency-bound, not CPU-bound, for
# the two-parallelism scaling ratio to be meaningful on a 1-physical-CPU box).
CRAWL_PAGES = 120
CRAWL_ARTICLES_PER_PAGE = 10
CRAWL_LATENCY_S = 0.10
SCALING_PAGES = 250
SCALING_LATENCY_S = 0.60
SCALING_BATCH = 6


def load_1m() -> float:
    """1-minute load average — recorded next to every bench row so a
    contended measurement self-labels (the round-4 16v64 scaling spread
    0.625-0.860 was host contention, visible only in prose before)."""
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        return -1.0


def warm_up(num_cpus: int) -> None:
    """Force worker-process spawn before timing starts (cluster warm-up; a
    long-lived cluster has warm workers, so excluding spawn from the timed
    region mirrors steady-state throughput)."""
    import time as _time

    import ray.data

    ds = ray.data.from_items(list(range(num_cpus * 4)), override_num_blocks=num_cpus * 4)
    ds.map_batches(lambda b: (_time.sleep(0.05), b)[1], batch_size=1).materialize()


def run_crawl_bench(pages: int, latency_s: float, num_cpus: int,
                    batch_size: int = 8, verify: bool = True,
                    handshake_s: float = 0.0, pool_size: int = 20) -> dict:
    from ptt_spider_go_ray.config import Config
    from ptt_spider_go_ray.pipelines.crawl import run_crawl
    from ptt_spider_go_ray.sources.synthetic import (
        SiteSpec,
        SyntheticSite,
        mock_transport_factory,
    )

    spec = SiteSpec(boards={"Beauty": pages}, articles_per_page=CRAWL_ARTICLES_PER_PAGE)
    cfg = Config()
    cc = cfg.crawler
    cc.frontier_shards = 4
    cc.batch_urls = 1_000_000      # one round per BFS wave
    cc.fetch_batch_size = batch_size
    cc.parser_count = num_cpus
    cc.robots = False
    cc.seen_capacity = 1 << 20

    factory = functools.partial(mock_transport_factory, spec, latency_s,
                                handshake_s=handshake_s, pool_size=pool_size)
    warm_up(num_cpus)
    t0 = time.time()
    res = run_crawl(
        cfg,
        transport_factory=factory,
        board="Beauty",
        pages=pages,
        push_threshold=0,
        fetch_media=False,          # headline metric: pages fetched+parsed/s
        fetch_via="tasks",
    )
    elapsed = time.time() - t0
    n_pages = res.dispatched
    out = {
        "pages": n_pages,
        "docs": res.docs.num_rows if res.docs is not None else 0,
        "seconds": round(elapsed, 2),
        "setup_seconds": round(res.setup_seconds, 2),   # actor spawn + seeding
        "loop_seconds": round(res.loop_seconds, 2),     # steady-state crawl
        "pages_per_sec": round(n_pages / res.loop_seconds, 2),
        "rounds": res.rounds,
        "cuckoo_false_positives": res.metrics["cuckoo_false_positives"],
    }
    if verify:
        # span-sequence verification vs the plain-Python oracle (not timed)
        from ptt_spider_go_ray.oracle.crawl_oracle import oracle_crawl

        want = oracle_crawl(
            SyntheticSite(spec), "Beauty", pages, push_threshold=0,
            batch_urls=cc.batch_urls, fetch_media=False,
        )
        got_docs = {r["doc_id"]: r for r in res.docs.to_pylist()}
        ok = res.ledger == want["ledger"] and res.seen_set == want["seen"]
        ok = ok and set(got_docs) == set(want["docs"])
        if ok:
            for doc_id, w in want["docs"].items():
                media = [
                    s["media_ref"] for s in got_docs[doc_id]["spans"] if s["kind"] == "media"
                ]
                if media != w["media_refs"]:
                    ok = False
                    break
        out["verified"] = bool(ok)
    return out


def run_query_suite(sf_dir: str) -> dict:
    import __ray_entry__ as E

    qs = E.queries()
    times = {}
    for name in sorted(qs):
        t0 = time.time()
        res = qs[name](sf_dir)
        # consume the way a production sink would: stream blocks to
        # completion (executes the whole plan, no driver-side concat —
        # unpivot_measures alone is 1.8M rows at sf0.1)
        if hasattr(res, "iter_batches"):
            # batch_size=None yields whole blocks zero-copy (the default
            # 256-row rebatch costs 8x on wide results like unpivot)
            for _ in res.iter_batches(batch_size=None, batch_format="pyarrow"):
                pass
        times[name] = round(time.time() - t0, 3)
    return times


def init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # keep stdout pure for the one-JSON-line contract: without this,
            # worker log replication occasionally interleaves "(MapBatches
            # ...)" lines into the driver's stdout mid-print
            log_to_driver=False,
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--pages", type=int, default=CRAWL_PAGES)
    ap.add_argument("--latency", type=float, default=CRAWL_LATENCY_S)
    # batch 6 balances per-task overhead against fetch-latency overlap on
    # the mock-latency workload (2026-08-20 sweep: 5/6/7/8/10/12 →
    # 216/214-222/200/194/185/195 p/s; the round-2 sweep preferred 8 —
    # re-sweep when the box changes)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--scale-levels", default="4,16",
                    help="comma-separated num_cpus pair for --scaling (N,4N)")
    ap.add_argument("--pool-ab", action="store_true",
                    help="reproduce the reference's optimized-vs-unoptimized "
                         "HTTP-pool A/B (benchmark.sh) on the mock transport: "
                         "keep-alive pool vs handshake-per-request")
    args = ap.parse_args()

    if args.pool_ab:
        # The reference publishes 45 s (default client) vs 28 s (pooled
        # keep-alive) on a live 2-page crawl. Same shape here: identical
        # crawl, identical simulated per-request latency, but the
        # un-optimized side pays a TLS/TCP handshake on EVERY request
        # (pool_size=0) while the optimized side amortizes it via the
        # keep-alive pool (one handshake per worker process).
        init_ray(args.cpus)
        import ray

        handshake = 0.08
        results = {}
        for label, pool in (("pooled", 20), ("no_keepalive", 0)):
            r = run_crawl_bench(
                args.pages, args.latency, args.cpus, batch_size=args.batch,
                handshake_s=handshake, pool_size=pool,
            )
            results[label] = r
        print(json.dumps({
            "metric": "crawl pool A/B: pooled keep-alive vs handshake-per-request "
                      f"(handshake_s={handshake}, same crawl + latency)",
            "unit": "pages_per_sec",
            "value": results["pooled"]["pages_per_sec"],
            "pooled": {k: results["pooled"][k]
                       for k in ("pages_per_sec", "loop_seconds", "verified")},
            "no_keepalive": {k: results["no_keepalive"][k]
                             for k in ("pages_per_sec", "loop_seconds", "verified")},
            "speedup": round(results["pooled"]["pages_per_sec"]
                             / results["no_keepalive"]["pages_per_sec"], 2),
            "num_cpus": args.cpus,
            "load_1m": load_1m(),
        }))
        ray.shutdown()
        return

    if args.scaling:
        levels = tuple(int(x) for x in args.scale_levels.split(","))
        if len(levels) != 2 or levels[0] == levels[1]:
            ap.error("--scale-levels needs exactly two distinct num_cpus "
                     f"values, got {args.scale_levels!r}")
        # explicit --pages/--latency/--batch override the scaling defaults:
        # higher cpu levels need MORE tasks per wave (pages/batch ≥ slots)
        # or the first BFS wave alone caps the measurable efficiency
        s_pages = args.pages if args.pages != CRAWL_PAGES else SCALING_PAGES
        s_latency = args.latency if args.latency != CRAWL_LATENCY_S else SCALING_LATENCY_S
        s_batch = args.batch if args.batch != 8 else SCALING_BATCH
        results = {}
        for cpus in levels:
            cmd = [
                sys.executable, __file__, "--crawl-only",
                "--cpus", str(cpus),
                "--pages", str(s_pages),
                "--latency", str(s_latency),
                "--batch", str(s_batch),
            ]
            out = subprocess.run(cmd, capture_output=True, text=True, check=True)
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        lo, hi = sorted(results)
        r_lo = results[lo]["crawl"]["pages_per_sec"]
        r_hi = results[hi]["crawl"]["pages_per_sec"]
        eff = r_hi / ((hi / lo) * r_lo)
        print(json.dumps({
            "metric": f"crawl scaling: pages fetched+parsed/sec at num_cpus={lo} vs {hi} "
                      "(N vs 4N stand-in, fresh processes, same input)",
            "value": round(eff, 3),
            "unit": "scaling_efficiency",
            "num_cpus": [lo, hi],
            "pages_per_sec": {str(lo): r_lo, str(hi): r_hi},
            "verified": [results[lo]["crawl"].get("verified"),
                         results[hi]["crawl"].get("verified")],
            "load_1m": {str(lo): results[lo].get("load_1m"),
                        str(hi): results[hi].get("load_1m"),
                        "now": load_1m()},
            "sf": SF_DIR,
        }))
        return

    load_start = load_1m()
    init_ray(args.cpus)
    import ray

    t_start = time.time()
    crawl = run_crawl_bench(args.pages, args.latency, args.cpus, batch_size=args.batch)
    detail = {}
    if not args.crawl_only:
        detail = run_query_suite(SF_DIR)
        detail["crawl_bench"] = crawl["seconds"]
    total = time.time() - t_start
    # The driver captures only the last ~2 KB of stdout; a 200-entry inline
    # per-query map overflows that and loses the headline number (round-3
    # BENCH_r03 "parsed": null). Keep the final line compact and write the
    # full per-query timing map to a sidecar next to this script.
    queries_summary = {}
    if detail:
        vals = sorted(detail.values())
        queries_summary = {
            "suite_total": round(sum(vals), 2),
            "suite_median": round(vals[len(vals) // 2], 3),
            "suite_max": round(vals[-1], 3),
            "n_queries": len(detail),
            "crawl_bench": crawl["seconds"],
        }
        sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
        with open(sidecar, "w") as f:
            json.dump({"sf": SF_DIR, "num_cpus": args.cpus,
                       "queries": detail, "crawl": crawl}, f, indent=1, sort_keys=True)
    print(json.dumps({
        "metric": "end-to-end seconds: synthetic-frontier crawl bench "
                  "(pages fetched+parsed, span-sequence-verified) + query suite"
                  " (per-query map in BENCH_DETAIL.json)",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries_summary,
        "sf": SF_DIR,
        "num_cpus": args.cpus,
        "load_1m": {"start": load_start, "end": load_1m()},
        "crawl": crawl,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
