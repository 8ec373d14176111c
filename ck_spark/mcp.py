"""MCP stdio server — the JSON-RPC 2.0 wire layer over CkService (L8).

Completes the reference's MCP surface (ck-cli/src/mcp_server.rs:33-935):
newline-delimited JSON-RPC 2.0 over stdio (the MCP stdio transport),
protocol version 2024-11-05 (mcp_server.rs:400), server name "ck"
(mcp_server.rs:402), and the eight tool routes — lexical_search,
regex_search, semantic_search, hybrid_search, index_status, reindex,
health_check, default_ckignore (mcp_server.rs:634-935).

Tool results mirror the reference's CallToolResult shape: a text summary
content item plus the structured payload as both a JSON content item and
``structuredContent`` (mcp_server.rs:652-663).

The transport is dependency-free and session-agnostic: ``serve`` pumps
any line-iterable into any writer, so tests drive it with StringIO and a
stub service — no Spark needed to prove the framing; the service layer
itself is contract-tested in test_service.py with the real engine.
"""

from __future__ import annotations

import json
from typing import Any, Callable, IO, Iterable

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "ck", "version": "spark"}

# JSON-RPC 2.0 error codes
PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602
INTERNAL_ERROR = -32603


def default_ckignore_content() -> str:
    """The default_ckignore tool payload: the connector's default exclude
    set rendered as ignore-file lines (the analogue of the reference's
    generated .ckignore, ck-cli/src/mcp_server.rs:634-665)."""
    from ck_spark.query.scope import DEFAULT_EXCLUDE_GLOBS

    lines = ["# default ck excludes (ck_spark.query.scope)"]
    lines += [g if g.startswith("*") else f"{g}/" for g in DEFAULT_EXCLUDE_GLOBS]
    return "\n".join(lines) + "\n"


def _obj_schema(props: dict, required: list[str] | None = None) -> dict:
    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": props,
        "required": required or [],
    }


_PAGING = {
    "cursor": {"type": "string"},
    "page_size": {"type": "integer"},
}

# snippet config shared by the search requests (mcp_server.rs:152-220;
# defaults/clamps in mcp/session.rs: include_snippet true, length 500,
# cap 2000)
_SNIPPET = {
    "include_snippet": {"type": "boolean", "default": True},
    "snippet_length": {"type": "integer", "default": 500},
}


def tool_descriptors() -> list[dict]:
    """The tools/list payload (names and shapes mirror mcp_server.rs)."""
    return [
        {"name": "lexical_search",
         "description": "BM25 lexical search over the index",
         "inputSchema": _obj_schema({
             "query": {"type": "string"},
             "top_k": {"type": "integer", "default": 10},
             "mode": {"type": "string", "enum": ["or", "and", "syntax"]},
             "rerank": {"type": "boolean", "default": False},
             **_SNIPPET,
             **_PAGING,
         }, ["query"])},
        {"name": "regex_search",
         "description": "Regex (grep) search; trigram-accelerated when "
                        "the candidate index exists — identical results",
         "inputSchema": _obj_schema({
             "pattern": {"type": "string"},
             "fixed_string": {"type": "boolean"},
             "whole_word": {"type": "boolean"},
             "ignore_case": {"type": "boolean"},
             "full_section": {"type": "boolean"},
             **_SNIPPET,
             **_PAGING,
         }, ["pattern"])},
        {"name": "semantic_search",
         "description": "Cosine top-k over the embeddings table",
         "inputSchema": _obj_schema({
             "query_vec": {"type": "array", "items": {"type": "number"}},
             "top_k": {"type": "integer", "default": 10},
             "threshold": {"type": "number"},
             **_PAGING,
         }, ["query_vec"])},
        {"name": "hybrid_search",
         "description": "RRF fusion of lexical and semantic results",
         "inputSchema": _obj_schema({
             "query": {"type": "string"},
             "query_vec": {"type": "array", "items": {"type": "number"}},
             "top_k": {"type": "integer", "default": 10},
             **_PAGING,
         }, ["query", "query_vec"])},
        {"name": "index_status",
         "description": "Manifest metadata and per-stage build records",
         "inputSchema": _obj_schema({})},
        {"name": "reindex",
         "description": "Incremental upsert of the configured corpus",
         "inputSchema": _obj_schema({
             "full_snapshot": {"type": "boolean", "default": False},
         })},
        {"name": "health_check",
         "description": "Health check tool to verify server status",
         "inputSchema": _obj_schema({})},
        {"name": "default_ckignore",
         "description": "Retrieve the default .ckignore content",
         "inputSchema": _obj_schema({})},
    ]


class McpStdioServer:
    """Newline-delimited JSON-RPC 2.0 dispatcher around a CkService-shaped
    object (anything exposing the eight tool methods)."""

    def __init__(self, service: Any):
        self.service = service
        self._initialized = False

    # -- tool dispatch ------------------------------------------------------

    def _tool_fns(self, arguments: dict) -> dict[str, Callable[[], Any]]:
        svc = self.service
        return {
            "lexical_search": lambda: svc.lexical_search(**arguments),
            "regex_search": lambda: svc.regex_search(**arguments),
            "semantic_search": lambda: svc.semantic_search(**arguments),
            "hybrid_search": lambda: svc.hybrid_search(**arguments),
            "index_status": lambda: svc.index_status(**arguments),
            "reindex": lambda: svc.reindex(**arguments),
            "health_check": lambda: svc.health_check(**arguments),
            "default_ckignore": lambda: {
                "ckignore": default_ckignore_content(),
                "length": len(default_ckignore_content().splitlines()),
                "summary": "Default .ckignore patterns for ck",
            },
        }
    def _call_tool(self, fn: Callable[[], Any], name: str) -> dict:
        structured = fn()
        summary = structured.get("summary") if isinstance(structured, dict) else None
        summary = summary or f"{name} ok"
        # CallToolResult shape (mcp_server.rs:652-663): text summary +
        # structured payload, duplicated into structuredContent
        return {
            "content": [
                {"type": "text", "text": summary},
                {"type": "text", "text": json.dumps(structured, default=str)},
            ],
            "structuredContent": structured,
            "isError": False,
        }

    # -- JSON-RPC -----------------------------------------------------------

    def handle(self, line: str) -> dict | None:
        """One request line -> one response dict (None for notifications)."""
        try:
            msg = json.loads(line)
        except ValueError:
            return {"jsonrpc": "2.0", "id": None,
                    "error": {"code": PARSE_ERROR, "message": "parse error"}}
        if not isinstance(msg, dict) or msg.get("jsonrpc") != "2.0":
            return {"jsonrpc": "2.0", "id": None,
                    "error": {"code": INVALID_REQUEST,
                              "message": "not a JSON-RPC 2.0 message"}}
        method = msg.get("method")
        msg_id = msg.get("id")
        is_notification = "id" not in msg

        def ok(result):
            return None if is_notification else {
                "jsonrpc": "2.0", "id": msg_id, "result": result}

        def err(code, message):
            return None if is_notification else {
                "jsonrpc": "2.0", "id": msg_id,
                "error": {"code": code, "message": message}}

        try:
            if method == "initialize":
                self._initialized = True
                return ok({
                    "protocolVersion": PROTOCOL_VERSION,
                    "serverInfo": SERVER_INFO,
                    "capabilities": {"tools": {"listChanged": False}},
                })
            if method in ("notifications/initialized", "initialized"):
                return None
            if method == "ping":
                return ok({})
            if method == "tools/list":
                return ok({"tools": tool_descriptors()})
            if method == "tools/call":
                params = msg.get("params") or {}
                name = params.get("name")
                if not isinstance(name, str):
                    return err(INVALID_PARAMS, "tools/call needs params.name")
                # resolve the tool BEFORE invoking it, so a KeyError raised
                # inside a tool body surfaces as INTERNAL_ERROR, not as a
                # bogus "unknown tool"
                fn = self._tool_fns(params.get("arguments") or {}).get(name)
                if fn is None:
                    return err(INVALID_PARAMS, f"unknown tool {name!r}")
                try:
                    return ok(self._call_tool(fn, name))
                except TypeError as e:
                    # bad kwargs for the tool signature (the **arguments
                    # splat) — the JSON-RPC invalid-params class
                    return err(INVALID_PARAMS, str(e))
            return err(METHOD_NOT_FOUND, f"method {method!r} not found")
        except Exception as e:  # tool raised: surface as internal error
            return err(INTERNAL_ERROR, f"{type(e).__name__}: {e}")

    def serve(self, lines: Iterable[str], out: IO[str]) -> None:
        """Pump the transport: one JSON-RPC message per line in, one per
        line out, flushed per message (stdio transport contract)."""
        for line in lines:
            line = line.strip()
            if not line:
                continue
            resp = self.handle(line)
            if resp is not None:
                out.write(json.dumps(resp, default=str) + "\n")
                out.flush()


def serve_stdio(service: Any) -> None:
    """Entry point: ``python -m ck_spark.mcp`` semantics for a configured
    service — blocks reading stdin until EOF."""
    import sys

    McpStdioServer(service).serve(sys.stdin, sys.stdout)
