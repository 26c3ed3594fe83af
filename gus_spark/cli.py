"""Command-line entry point — parity with the reference's CLI
(reference: src/cli.rs:8-25, src/cli/index.rs).

- ``gus_spark server -m <models-path> [-p port] [-w warehouse]`` starts
  the HTTP server exposing the REST + GraphQL APIs over a ParquetStore.
  Arg validation ports cli/index.rs:115-179: the port must be a valid
  u16 > 0 and the models path must be an existing directory.
- ``gus_spark create-model -m <models-path>`` runs the interactive
  model-authoring wizard (model_cli.rs:36-205).
- ``gus_spark configure-storages -s <file>`` runs the storage-config
  dialogue (storage_handler.rs:102-138).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="gus_spark")
    sub = parser.add_subparsers(dest="command", required=True)
    server = sub.add_parser("server", help="serve REST + GraphQL APIs")
    server.add_argument(
        "-m", "--models-path", required=True,
        help="directory of model definition JSON files",
    )
    server.add_argument("-p", "--port", type=int, default=8080)
    server.add_argument(
        "-w", "--warehouse", default="./warehouse",
        help="table storage directory",
    )
    server.add_argument(
        "-s", "--storage-definitions", default=None,
        help="storage config JSON (configure-storages output); its"
        " parquet.warehouse_dir overrides --warehouse",
    )
    server.add_argument("--host", default="127.0.0.1")
    create = sub.add_parser(
        "create-model", help="interactive model definition wizard"
    )
    create.add_argument(
        "-m", "--models-path", required=True,
        help="directory the wizard writes <name>.json into",
    )
    storages = sub.add_parser(
        "configure-storages", help="interactive storage configuration"
    )
    storages.add_argument(
        "-s", "--storage-definitions", required=True,
        help="path of the storage config JSON to create/update",
    )
    maintain = sub.add_parser(
        "maintain",
        help="compact degraded tables + expire old snapshots "
        "(metadata-only no-op when healthy)",
    )
    maintain.add_argument("-m", "--models-path", required=True)
    maintain.add_argument("-w", "--warehouse", default="./warehouse")
    maintain.add_argument(
        "--model", default=None,
        help="maintain one model (default: every registered model)",
    )
    maintain.add_argument("--max-files", type=int, default=16)
    maintain.add_argument("--max-overlap", type=float, default=0.25)
    maintain.add_argument("--keep-snapshots", type=int, default=3)
    return parser


def validate(args) -> str | None:
    """Returns an error string, or None (cli/index.rs:115-179 rules)."""
    if args.command in ("server", "create-model", "maintain"):
        if not os.path.isdir(args.models_path):
            return f"models path {args.models_path!r} is not a directory"
    if args.command == "server" and not 0 < args.port < 65536:
        return f"invalid port {args.port}: must be in 1..65535"
    return None


def build_app(args):
    """Construct (registry, store, rest_api) without serving."""
    from gus_spark.api.graphql import GraphQLApi
    from gus_spark.api.rest import RestApi
    from gus_spark.model.registry import ModelRegistry
    from gus_spark.session import get_spark
    from gus_spark.storage.parquet_store import ParquetStore

    warehouse = args.warehouse
    if getattr(args, "storage_definitions", None):
        from gus_spark.model_cli import load_storage_config

        parquet_cfg = load_storage_config(args.storage_definitions).get(
            "parquet"
        )
        if parquet_cfg and parquet_cfg.get("warehouse_dir"):
            warehouse = parquet_cfg["warehouse_dir"]
    spark = get_spark(app_name="gus_spark-server")
    registry = ModelRegistry(args.models_path)
    store = ParquetStore(spark, warehouse)
    gql_api = GraphQLApi(registry, store) if registry.names() else None
    return registry, store, RestApi(registry, store, graphql_api=gql_api)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    error = validate(args)
    if error:
        print(error, file=sys.stderr)
        return 2
    if args.command == "create-model":
        from gus_spark.model_cli import create_model

        model = create_model(args.models_path)
        print(f"wrote model {model.model_name!r} to {args.models_path}")
        return 0
    if args.command == "configure-storages":
        from gus_spark.model_cli import configure_storages

        configure_storages(args.storage_definitions)
        print(f"wrote storage config to {args.storage_definitions}")
        return 0
    if args.command == "maintain":
        import json

        from gus_spark.model.registry import ModelRegistry
        from gus_spark.session import get_spark
        from gus_spark.storage.parquet_store import ParquetStore

        spark = get_spark(app_name="gus_spark-maintain")
        registry = ModelRegistry(args.models_path)
        store = ParquetStore(spark, args.warehouse)
        names = [args.model] if args.model else registry.names()
        for name in names:
            if name not in registry.names():
                print(f"unknown model {name!r}", file=sys.stderr)
                return 2
            report = store.maintain(
                registry.get(name),
                max_files=args.max_files,
                max_overlap=args.max_overlap,
                keep_snapshots=args.keep_snapshots,
            )
            print(json.dumps({"model": name, **report}))
        return 0
    if args.command == "server":
        from gus_spark.api.rest import serve

        registry, _store, api = build_app(args)
        server = serve(api, host=args.host, port=args.port)
        print(
            f"serving models {registry.names()} on "
            f"http://{args.host}:{server.server_address[1]}"
        )
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
