"""REST shell: the reference's route surface over the parquet store.

Ports the dispatch of src/cli/server.rs:

- ``GET  /api/rest/<model>/<id>``  -> read_one   (server.rs:117-130)
- ``POST /api/rest/<model>``       -> create_one (server.rs:160-175, 201)
- ``PUT  /api/rest/<model>/<id>``  -> update_one (server.rs:212-229)
- ``DELETE /api/rest/<model>/<id>``-> delete_one (server.rs:254-267)
- ``POST /api/graphql``            -> GraphQL    (server.rs:177-187)

Success: ``{"data": record}``; errors: ``{"error": msg}`` with status
400 (server.rs:63-76; the reference uses 400 for every error including
not-found). ``serve()`` exposes the same handler on a stdlib HTTP
server — the engine core stays framework-free.
"""

from __future__ import annotations

import json
from typing import Any

from gus_spark.errors import GusError
from gus_spark.model.registry import ModelRegistry
from gus_spark.storage.parquet_store import ParquetStore


class RestApi:
    def __init__(self, registry: ModelRegistry, store: ParquetStore,
                 graphql_api=None):
        self.registry = registry
        self.store = store
        self.graphql_api = graphql_api

    def handle(
        self, method: str, uri: str, body: str | None = None
    ) -> tuple[int, dict[str, Any]]:
        """Dispatch one request; returns (status, payload)."""
        method = method.upper()
        segments = [s for s in uri.strip("/").split("/") if s]
        try:
            if segments[:2] == ["api", "graphql"] and method == "POST":
                return self._graphql(body)
            if segments[:2] != ["api", "rest"]:
                return 400, {"error": f"invalid endpoint {uri!r}"}
            rest = segments[2:]
            if method == "POST" and len(rest) == 1:
                model = self.registry.get(rest[0])
                return 201, {"data": self.store.create_one(model, body or "")}
            if len(rest) == 2:
                model = self.registry.get(rest[0])
                if method == "GET":
                    return 200, {"data": self.store.read_one(model, rest[1])}
                if method == "PUT":
                    return 200, {
                        "data": self.store.update_one(model, rest[1], body or "")
                    }
                if method == "DELETE":
                    return 200, {"data": self.store.delete_one(model, rest[1])}
            return 400, {"error": f"invalid endpoint {uri!r} for {method}"}
        except GusError as e:
            return 400, {"error": str(e)}

    def _graphql(self, body: str | None) -> tuple[int, dict]:
        if self.graphql_api is None:
            return 400, {"error": "GraphQL endpoint not configured"}
        try:
            post = json.loads(body or "")
        except ValueError:
            return 400, {"error": "invalid JSON body"}
        if not isinstance(post, dict) or "query" not in post:
            return 400, {"error": "body must be {query, operationName?, variables?}"}
        result = self.graphql_api.execute(
            post["query"],
            variables=post.get("variables"),
            operation_name=post.get("operationName"),
        )
        # 200 iff data present, else 400 (server.rs:183-186)
        return (200 if "data" in result else 400), result


def serve(api: RestApi, host: str = "127.0.0.1", port: int = 8080):
    """Minimal stdlib HTTP server exposing RestApi (blocking)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _run(self, method: str):
            if method == "GET":
                # static view surface first (server.rs:88-116): /,
                # /robots.txt, /view/*, GET /api/graphql -> console
                from gus_spark.api.view import get_view_file

                found = get_view_file(self.path)
                if found is not None:
                    data, content_type = found
                    self.send_response(200)
                    self.send_header("Content-Type", content_type)
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length).decode("utf-8") if length else None
            status, payload = api.handle(method, self.path, body)
            data = json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802
            self._run("GET")

        def do_POST(self):  # noqa: N802
            self._run("POST")

        def do_PUT(self):  # noqa: N802
            self._run("PUT")

        def do_DELETE(self):  # noqa: N802
            self._run("DELETE")

        def log_message(self, *args):  # quiet
            pass

    server = HTTPServer((host, port), Handler)
    return server
