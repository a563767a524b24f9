"""Job-submittable CLI: the entrypoint a cluster runs via

    ray job submit --working-dir . -- python -m crawler_ray crawl --out /data/run1

Subcommands own the Ray session (guarded init — under `ray job submit`
the cluster connection already exists); library code never calls
ray.init (driver contract).

    crawl     run the flagship crawl over a synthetic web tier
              (--resume continues a killed run from its latest manifest)
    recrawl   incremental refetch (changed-content delta)
    verify    engine-vs-oracle conformance on a small deterministic web
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        # no explicit address: auto-connects via RAY_ADDRESS when a cluster
        # connection exists (ray job submit sets it), starts local otherwise —
        # a hard-coded "local" would silently shrink a submitted job to one node
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _params(args):
    from crawler_ray.sources.synthetic_web import WebParams, bench_params, unit_params

    if args.tier == "unit":
        return unit_params(args.seed)
    if args.tier == "bench":
        return bench_params(args.seed, props_per_host=args.props)
    return WebParams(seed=args.seed, props_per_host=args.props)


def cmd_crawl(args) -> int:
    from crawler_ray.pipelines.crawl import run_crawl
    from crawler_ray.sources.synthetic_web import build_web_control

    _init_ray()
    p = _params(args)
    run = run_crawl(build_web_control(p), p, args.out, resume=args.resume)
    print(json.dumps({"out": args.out, "waves": run.waves, "counts": run.counts}))
    return 0


def cmd_recrawl(args) -> int:
    from crawler_ray.pipelines.recrawl import run_recrawl
    from crawler_ray.sources.synthetic_web import build_web_control

    _init_ray()
    p = _params(args)
    stats = run_recrawl(build_web_control(p), p, args.out)
    print(json.dumps({"out": args.out, "recrawl": stats}))
    return 0


def cmd_verify(args) -> int:
    from crawler_ray.oracle import run_oracle
    from crawler_ray.pipelines.crawl import run_crawl
    from crawler_ray.sources.synthetic_web import build_web, unit_params

    _init_ray()
    p = unit_params(args.seed)
    web = build_web(p)
    run = run_crawl(web, p, args.out)
    oracle = run_oracle(web, p)
    t = run.read("seen")
    seen_ok = dict(zip(t["url"].to_pylist(), t["url_hash"].to_pylist())) == oracle["seen"]
    eng = sorted((r["url"], r["wave"], r["priority"], r["host_shard"], r["seq"])
                 for r in run.read("order").to_pylist())
    orc = sorted((r["url"], r["wave"], r["priority"], r["host_shard"], r["seq"])
                 for r in oracle["order"])
    order_ok = eng == orc
    print(json.dumps({"seen_ok": seen_ok, "order_ok": order_ok,
                      "n_urls": len(oracle["seen"])}))
    return 0 if (seen_ok and order_ok) else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="crawler_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("crawl", cmd_crawl), ("recrawl", cmd_recrawl),
                     ("verify", cmd_verify)):
        s = sub.add_parser(name)
        s.add_argument("--out", required=(name != "verify"),
                       default="/tmp/crawler_ray_job")
        s.add_argument("--seed", type=int, default=42)
        s.add_argument("--tier", choices=["unit", "conformance", "bench"],
                       default="conformance")
        s.add_argument("--props", type=int, default=40)
        s.add_argument("--resume", action="store_true")
        s.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
