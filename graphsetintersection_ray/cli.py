"""CLI entry point — the ``ray job submit`` surface.

    python -m graphsetintersection_ray.cli run <query> [--sf-dir DIR] [--out DIR]
    python -m graphsetintersection_ray.cli pagerank [--sf-dir DIR] [--ckpt DIR]
        [--tol 1e-6] [--max-iters 100] [--out DIR]
    python -m graphsetintersection_ray.cli list

On a real cluster the same commands run via
``ray job submit --working-dir . -- python -m graphsetintersection_ray.cli ...``
(the module only calls ray.init when no session exists, so the job
driver's session is respected). Results stream to partitioned Parquet
under --out; iterative runs checkpoint per superstep under --ckpt and
resume automatically.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="graphsetintersection_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run a named query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--out", default=None, help="write result parquet here")

    prp = sub.add_parser("pagerank", help="converged PageRank with checkpoints")
    prp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    prp.add_argument("--ckpt", default=None)
    prp.add_argument("--tol", type=float, default=1e-6)
    prp.add_argument("--max-iters", type=int, default=100)
    prp.add_argument("--out", default=None)

    sub.add_parser("list", help="list available queries")

    args = p.parse_args(argv)

    if args.cmd == "list":
        from graphsetintersection_ray.pipelines.queries import QUERIES, ORACLE_SQL

        for name in QUERIES:
            print(f"{name:24s} oracle={'sql' if name in ORACLE_SQL else 'pytest'}")
        return 0

    _ensure_ray()

    if args.cmd == "run":
        from graphsetintersection_ray.pipelines.queries import QUERIES

        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        t0 = time.time()
        res = QUERIES[args.query](args.sf_dir)
        if args.out is not None and hasattr(res, "write_parquet"):
            res.write_parquet(args.out)
            n = "written"
        else:
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            n = len(df)
            print(df if n <= 50 else df.head(20))
        print(
            json.dumps(
                {"query": args.query, "rows": n, "sec": round(time.time() - t0, 3)}
            )
        )
        return 0

    if args.cmd == "pagerank":
        from graphsetintersection_ray.pipelines.graph import build_graph
        from graphsetintersection_ray.pipelines.iterative import pagerank

        t0 = time.time()
        art = build_graph(args.sf_dir)
        out, stats = pagerank(
            art,
            max_iters=args.max_iters,
            tol=args.tol,
            ckpt_dir=args.ckpt,
            resume=True,
        )
        if args.out:
            import ray.data as rd

            rd.from_arrow(out).write_parquet(args.out)
        print(
            json.dumps(
                {
                    "vertices": art.n_vertices,
                    "edges": art.n_edges,
                    "iters": stats["iters"],
                    "sec": round(time.time() - t0, 3),
                }
            )
        )
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
