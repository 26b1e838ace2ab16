"""CLI for the engine — the reference client's verb surface as a module
entry point (dfs/client/cli.go:121-166 drives PUT/GET/ls/rm/COMPUTE from
the command line; dfs/mapreduce_plugin_mock/*.go are its compiled plugin
binaries, here a plain Python file defining the plugin contract).

    python -m hdfs_mapreduce_spark --warehouse WH put LOCAL NAME [--fmt f]
    python -m hdfs_mapreduce_spark --warehouse WH get NAME OUT [--order-by c]
    python -m hdfs_mapreduce_spark --warehouse WH ls | stats
    python -m hdfs_mapreduce_spark --warehouse WH rm NAME
    python -m hdfs_mapreduce_spark --warehouse WH compact NAME [--target-files n]
    python -m hdfs_mapreduce_spark --warehouse WH sql "SELECT ..."
    python -m hdfs_mapreduce_spark --warehouse WH compute NAME \
        --plugin plugin.py --output NAME

A plugin file defines ``mapper(rec)`` (yield dicts), ``reducer(key, pdf)``
(return a pandas DataFrame), and the ``MAP_SCHEMA`` / ``REDUCE_SCHEMA``
strings — the Python analog of the reference's plugin .so contract.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys


_MODULE_PLUGIN_ATTRS = ("mapper", "reducer", "MAP_SCHEMA", "REDUCE_SCHEMA")


def _is_module_plugin(path: str) -> bool:
    """Side-effect-free probe: does this .py file look like a module
    plugin (any of mapper/reducer/MAP_SCHEMA/REDUCE_SCHEMA bound at top
    level)? A .py file can also be an EXECUTABLE plugin speaking the
    reference's binary protocol (e.g. the repo's own WORDCOUNT_PLUGIN_SRC
    materialized as a .py script) — importing one would RUN its protocol
    loop (it reads sys.argv/stdin at top level), so the routing decision
    must come from the AST, never from an import. Defining ANY of the
    four names routes to the module loader (so an incomplete module
    plugin still gets the precise \"missing <attr>\" error rather than a
    confusing binary-protocol failure); defining none routes to
    compute_binary."""
    import ast
    import os

    if not os.path.isfile(path):
        raise SystemExit(f"plugin file not found: {path}")
    try:
        with open(path, encoding="utf-8", errors="replace") as f:
            tree = ast.parse(f.read())
    except SyntaxError:
        return False
    bound: set[str] = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    bound.add(t.id)
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            if isinstance(node.target, ast.Name):
                bound.add(node.target.id)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                bound.add((alias.asname or alias.name).split(".")[0])
    return any(a in bound for a in _MODULE_PLUGIN_ATTRS)


def _load_plugin(path: str):
    spec = importlib.util.spec_from_file_location("mapreduce_plugin", path)
    if spec is None or spec.loader is None:
        raise SystemExit(f"cannot load plugin {path} as a Python module")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for attr in _MODULE_PLUGIN_ATTRS:
        if not hasattr(mod, attr):
            raise SystemExit(f"plugin {path} is missing {attr!r}")
    return mod


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m hdfs_mapreduce_spark")
    p.add_argument("--warehouse", required=True)
    sub = p.add_subparsers(dest="verb", required=True)

    sp = sub.add_parser("put")
    sp.add_argument("local_path")
    sp.add_argument("name")
    sp.add_argument("--fmt", default="text")
    sp.add_argument("--partition-by", default=None)
    sp.add_argument("--header", action="store_true")

    sg = sub.add_parser("get")
    sg.add_argument("name")
    sg.add_argument("save_as")
    sg.add_argument("--order-by", default=None)

    sub.add_parser("ls")
    sub.add_parser("stats")

    sr = sub.add_parser("rm")
    sr.add_argument("name")

    sc = sub.add_parser("compact")
    sc.add_argument("name")
    sc.add_argument("--target-files", type=int, default=1)

    sq = sub.add_parser("sql")
    sq.add_argument("query")
    sq.add_argument("--limit", type=int, default=100)

    sm = sub.add_parser("compute")
    sm.add_argument("name")
    sm.add_argument("--plugin", required=True)
    sm.add_argument("--output", required=True)

    sh = sub.add_parser(
        "shell",
        help="interactive menu client (reference dfs/client/cli.go parity)",
    )
    sh.add_argument("--home-dir", default=None)
    return p


def run(argv: list[str], spark=None, out=sys.stdout) -> int:
    """Execute one verb. ``spark`` defaults to get_spark() (reuses any
    active session — tests drive the CLI in-process; standalone
    invocations start their own)."""
    args = build_parser().parse_args(argv)
    from hdfs_mapreduce_spark.engine import Engine
    from hdfs_mapreduce_spark.session import get_spark

    spark = spark or get_spark("cli")
    eng = Engine(spark, args.warehouse)

    if args.verb == "put":
        opts = {"header": True, "inferSchema": True} if args.header else {}
        eng.put(
            args.local_path,
            args.name,
            fmt=args.fmt,
            partition_by=args.partition_by.split(",") if args.partition_by else None,
            **opts,
        )
        print(f"put {args.name}", file=out)
    elif args.verb == "get":
        eng.get_file(
            args.name,
            args.save_as,
            order_by=args.order_by.split(",") if args.order_by else None,
        )
        print(f"got {args.name} -> {args.save_as}", file=out)
    elif args.verb == "ls":
        for name in eng.ls():
            print(name, file=out)
    elif args.verb == "stats":
        print(json.dumps(eng.stats(), indent=1, sort_keys=True), file=out)
    elif args.verb == "rm":
        eng.rm(args.name)
        print(f"rm {args.name}", file=out)
    elif args.verb == "compact":
        print(
            json.dumps(eng.compact(args.name, args.target_files)), file=out
        )
    elif args.verb == "sql":
        from hdfs_mapreduce_spark.engine import format_row_tsv

        rows = eng.sql(args.query).limit(args.limit + 1).collect()
        for r in rows[: args.limit]:
            print(format_row_tsv(r), file=out)
        if len(rows) > args.limit:
            print(
                f"... output truncated at --limit {args.limit}; raise it "
                "for the full result",
                file=sys.stderr,
            )
    elif args.verb == "shell":
        from hdfs_mapreduce_spark.shell import Shell

        return Shell(eng, out=out, home_dir=args.home_dir).run()
    elif args.verb == "compute":
        # Routing is by SHAPE, not filename suffix: a .py file defining
        # the module-plugin surface runs in-process; any other plugin —
        # including a .py script that is really an executable speaking
        # the reference's binary protocol — runs via compute_binary.
        if args.plugin.endswith(".py") and _is_module_plugin(args.plugin):
            plugin = _load_plugin(args.plugin)
            eng.compute(
                args.name,
                plugin.mapper,
                plugin.reducer,
                map_schema=plugin.MAP_SCHEMA,
                reduce_schema=plugin.REDUCE_SCHEMA,
                output_name=args.output,
                on_status=lambda m: print(m, file=out),
            )
        else:
            eng.compute_binary(
                args.name,
                args.plugin,
                args.output,
                on_status=lambda m: print(m, file=out),
            )
    return 0


def main() -> int:
    return run(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
