"""MCP stdio JSON-RPC framing (ck_spark/mcp.py) — the wire layer the
reference implements at ck-cli/src/mcp_server.rs:33-935.

The transport is tested with a stub service (no Spark): framing,
initialize handshake, tools/list parity with the reference's tool set,
tools/call result shape (content + structuredContent), notifications,
and every JSON-RPC error class. The service methods themselves are
engine-tested in test_service.py."""

from __future__ import annotations

import io
import json

import pytest

from ck_spark.mcp import (
    INTERNAL_ERROR,
    INVALID_PARAMS,
    INVALID_REQUEST,
    METHOD_NOT_FOUND,
    PARSE_ERROR,
    PROTOCOL_VERSION,
    McpStdioServer,
    default_ckignore_content,
    tool_descriptors,
)

pytestmark = pytest.mark.nospark


class StubService:
    def __init__(self):
        self.calls = []

    def lexical_search(self, query, top_k=10, **kw):
        self.calls.append(("lexical_search", query))
        return {"summary": f"lexical top-{top_k} for {query!r}",
                "results": [{"doc_id": 1, "score": 2.5}],
                "pagination": {"page_size": 50, "returned": 1,
                               "has_more": False, "next_cursor": None}}

    def regex_search(self, pattern, **kw):
        return {"summary": f"regex matches for {pattern!r}", "results": []}

    def semantic_search(self, query_vec, **kw):
        return {"summary": "semantic", "results": []}

    def hybrid_search(self, query, query_vec, **kw):
        return {"summary": "hybrid", "results": []}

    def index_status(self):
        return {"exists": True, "root": "/tmp/x", "meta": {"version": 6}}

    def reindex(self, full_snapshot=False):
        return {"summary": "reindex complete", "added": 0}

    def health_check(self):
        return {"status": "healthy", "server": "ck_spark"}

    def boom(self):  # not a tool
        raise RuntimeError("nope")


def rpc(server, method, params=None, msg_id=1):
    line = json.dumps({"jsonrpc": "2.0", "id": msg_id, "method": method,
                       **({"params": params} if params is not None else {})})
    return server.handle(line)


@pytest.fixture()
def server():
    return McpStdioServer(StubService())


def test_initialize_handshake(server):
    resp = rpc(server, "initialize", {"protocolVersion": PROTOCOL_VERSION,
                                      "capabilities": {}})
    assert resp["id"] == 1 and "error" not in resp
    r = resp["result"]
    assert r["protocolVersion"] == PROTOCOL_VERSION
    assert r["serverInfo"]["name"] == "ck"  # mcp_server.rs:402
    assert "tools" in r["capabilities"]
    # the initialized notification gets NO response
    assert server.handle(json.dumps(
        {"jsonrpc": "2.0", "method": "notifications/initialized"})) is None


def test_tools_list_matches_reference_tool_set(server):
    resp = rpc(server, "tools/list")
    names = {t["name"] for t in resp["result"]["tools"]}
    # the eight routes of ck-cli/src/mcp_server.rs:634-935
    assert names == {
        "lexical_search", "regex_search", "semantic_search", "hybrid_search",
        "index_status", "reindex", "health_check", "default_ckignore",
    }
    for t in resp["result"]["tools"]:
        assert t["inputSchema"]["type"] == "object"


def test_tools_call_result_shape(server):
    resp = rpc(server, "tools/call",
               {"name": "lexical_search",
                "arguments": {"query": "parse buffer", "top_k": 5}})
    r = resp["result"]
    assert r["isError"] is False
    assert r["content"][0]["type"] == "text"
    assert "lexical top-5" in r["content"][0]["text"]
    # structured payload rides BOTH as a JSON content item and as
    # structuredContent (CallToolResult shape, mcp_server.rs:652-663)
    assert json.loads(r["content"][1]["text"]) == r["structuredContent"]
    assert r["structuredContent"]["results"][0]["doc_id"] == 1


def test_default_ckignore_tool(server):
    resp = rpc(server, "tools/call", {"name": "default_ckignore"})
    sc = resp["result"]["structuredContent"]
    assert "node_modules/" in sc["ckignore"] and ".git/" in sc["ckignore"]
    assert sc["length"] == len(default_ckignore_content().splitlines())


def test_ping_and_unknown_method(server):
    assert rpc(server, "ping")["result"] == {}
    resp = rpc(server, "no/such")
    assert resp["error"]["code"] == METHOD_NOT_FOUND


def test_error_classes(server):
    # parse error
    resp = server.handle("{not json")
    assert resp["error"]["code"] == PARSE_ERROR
    # invalid request (wrong version tag)
    resp = server.handle(json.dumps({"jsonrpc": "1.0", "id": 1, "method": "x"}))
    assert resp["error"]["code"] == INVALID_REQUEST
    # unknown tool / missing name -> invalid params
    assert rpc(server, "tools/call", {"name": "boom"})["error"]["code"] == INVALID_PARAMS
    assert rpc(server, "tools/call", {})["error"]["code"] == INVALID_PARAMS
    # tool raising -> internal error with the exception surfaced
    class Exploding(StubService):
        def health_check(self):
            raise RuntimeError("kaput")
    resp = rpc(McpStdioServer(Exploding()), "tools/call", {"name": "health_check"})
    assert resp["error"]["code"] == INTERNAL_ERROR and "kaput" in resp["error"]["message"]
    # bad argument name -> invalid params (TypeError path)
    resp = rpc(server, "tools/call",
               {"name": "index_status", "arguments": {"bogus": 1}})
    assert resp["error"]["code"] == INVALID_PARAMS
    # a KeyError raised INSIDE a tool body is an internal error, NOT a
    # bogus "unknown tool" invalid-params (regression: the unknown-tool
    # sentinel used to share the exception type with tool internals)
    class KeyErroring(StubService):
        def health_check(self):
            raise KeyError("missing-meta-key")
    resp = rpc(McpStdioServer(KeyErroring()), "tools/call",
               {"name": "health_check"})
    assert resp["error"]["code"] == INTERNAL_ERROR
    assert "missing-meta-key" in resp["error"]["message"]


def test_serve_pumps_lines_and_skips_notification_responses(server):
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {}}),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        "",  # blank lines ignored
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                    "params": {"name": "health_check"}}),
    ]
    out = io.StringIO()
    server.serve(lines, out)
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert [r["id"] for r in resps] == [1, 2]  # exactly two responses
    assert resps[1]["result"]["structuredContent"]["status"] == "healthy"


def test_tool_descriptor_schemas_are_json_schema_objects():
    for t in tool_descriptors():
        s = t["inputSchema"]
        assert s["$schema"].startswith("https://json-schema.org/")
        assert isinstance(s["properties"], dict)
