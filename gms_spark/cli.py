"""spark-submit entrypoint: run a kernel over an edge table or pages table.

Examples (cluster: spark-submit --py-files gms_spark.zip; sandbox: python):

  spark-submit --py-files gms_spark.zip -m gms_spark/cli.py \
      --kernel pagerank --input edges.parquet --output out/ \
      --checkpoint ckpt/ --run-id prod1 --tol 1e-6

  python -m gms_spark.cli --kernel pagerank --input tests/data/triangles_3.el

Inputs: .parquet edge tables (src,dst), classic edge-list formats
(.el/.wel/.gr/.mtx/.graph), or --pages a pages parquet/Iceberg dir (url
extraction runs first). Kernels: pagerank | components | labelprop |
triangles | triangles_vertex. A checkpoint dir makes the run resumable
(kill → relaunch with the same --run-id continues from the last
committed superstep).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kernel", required=True,
                   choices=["pagerank", "components", "labelprop", "triangles", "triangles_vertex"])
    p.add_argument("--input", required=True, help="edge table (.parquet/.el/.wel/.gr/.mtx/.graph)")
    p.add_argument("--pages", action="store_true", help="input is a pages table; extract links first")
    p.add_argument("--output", default=None, help="result parquet dir")
    p.add_argument("--checkpoint", default=None, help="TableIO root for superstep checkpoints + lineage")
    p.add_argument("--run-id", default=None)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--lp-iters", type=int, default=5)
    p.add_argument("--no-symmetrize", action="store_true")
    args = p.parse_args(argv)

    from gms_spark.session import get_spark

    spark = get_spark(f"gms-{args.kernel}")

    from gms_spark.graph.build import build_undirected, edges_from_pages
    from gms_spark.io.readers import read_edge_list
    from gms_spark.io.tableio import TableIO

    if args.pages:
        _, edges = edges_from_pages(spark.read.parquet(args.input))
    elif args.input.rsplit(".", 1)[-1].lower() in ("el", "wel", "gr", "mtx", "graph"):
        edges = read_edge_list(spark, args.input).select("src", "dst")
    else:  # parquet file or directory
        edges = spark.read.parquet(args.input).select("src", "dst")

    graph = edges if args.no_symmetrize else build_undirected(edges)
    io = TableIO(args.checkpoint) if args.checkpoint else None
    t0 = time.time()

    if args.kernel == "pagerank":
        from gms_spark.graph.pagerank import pagerank

        res = pagerank(graph, tol=args.tol, max_iters=args.iters, io=io, run_id=args.run_id)
        out, iters = res.scores, res.iterations
    elif args.kernel == "components":
        from gms_spark.graph.components import connected_components

        res = connected_components(graph, max_iters=args.iters, io=io, run_id=args.run_id)
        out, iters = res.components, res.iterations
    elif args.kernel == "labelprop":
        from gms_spark.graph.labelprop import label_propagation

        res = label_propagation(graph, iters=args.lp_iters, io=io, run_id=args.run_id)
        out, iters = res.labels, res.iterations
    elif args.kernel == "triangles":
        from gms_spark.graph.triangles import triangle_count_total

        t = triangle_count_total(graph)
        out, iters = spark.createDataFrame([(t,)], "triangles long"), 1
    else:
        from gms_spark.graph.triangles import triangle_count_per_vertex

        out, iters = triangle_count_per_vertex(graph), 1

    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = out.count()
        out.show(20, truncate=False)
    print(f"@@@ kernel={args.kernel} rows={n} iterations={iters} wall_s={time.time()-t0:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
