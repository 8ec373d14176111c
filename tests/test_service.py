"""MCP facade tests mirroring the reference's mcp_tests.rs shapes:
tool responses carry results + pagination (page_size default 50, cap 200,
offset next_cursor), top_k defaults to 10, index builds on first use,
reindex upserts, status reports stages."""

import math

import pytest
from pyspark.sql import functions as F

from ck_spark.corpus import generate_corpus
from ck_spark.service import DEFAULT_MCP_TOP_K, CkService, rerank


@pytest.fixture(scope="module")
def service(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svc") / "idx")
    pdf = generate_corpus(150, seed=11)
    corpus = spark.createDataFrame(pdf)
    # tiny deterministic embeddings keyed by the engine's doc ids
    from ck_spark.index.builder import doc_id_expr

    emb = corpus.select(
        doc_id_expr().alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(7)),
                    lambda j: F.sin(F.xxhash64("path") % 100 + j)).alias("embedding"),
    )
    return CkService(spark, root, corpus=corpus, embeddings=emb,
                     build_opts=dict(n_segments=3, term_buckets=4, build_groups=2))


def test_lazy_build_and_lexical_defaults(service):
    # no index exists yet: first search builds it (L7)
    out = service.lexical_search("parse buffer")
    assert out["pagination"]["page_size"] == 50
    assert len(out["results"]) <= DEFAULT_MCP_TOP_K
    assert out["results"], "expected hits on the generated corpus"
    assert out["results"][0]["score"] >= out["results"][-1]["score"]
    assert {"doc_id", "score", "path"} <= set(out["results"][0])
    st = service.index_status()
    assert st["exists"] and st["meta"]["n_docs"] > 0
    assert any(s["stage"] == "doc_map" for s in st["stages"])
    assert st["update_in_progress"] is False


def test_pagination_cursor_roundtrip(service):
    import json

    p1 = service.regex_search("def", page_size=7)
    assert p1["pagination"]["page_size"] == 7
    assert p1["pagination"]["has_more"] is True
    # keyset cursor: order-column values of the page's last row
    # (repo leads — (path, line_no) alone is not unique across repos)
    last = p1["results"][-1]
    assert json.loads(p1["pagination"]["next_cursor"]) == [
        last["repo"], last["path"], last["line_no"]
    ]
    p2 = service.regex_search("def", page_size=7, cursor=p1["pagination"]["next_cursor"])
    k1 = {(r["path"], r["line_no"]) for r in p1["results"]}
    k2 = {(r["path"], r["line_no"]) for r in p2["results"]}
    assert not (k1 & k2), "pages must not overlap"
    # pages are contiguous: walking the cursor visits every row exactly once
    seen, cursor, pages = set(), None, 0
    while True:
        p = service.regex_search("def", page_size=50, cursor=cursor)
        for r in p["results"]:
            key = (r["path"], r["line_no"])
            assert key not in seen
            seen.add(key)
        pages += 1
        cursor = p["pagination"]["next_cursor"]
        if cursor is None:
            break
        assert pages < 100
    assert k1 <= seen and k2 <= seen
    # page size is capped at 200 like the reference
    big = service.regex_search("def", page_size=999)
    assert big["pagination"]["page_size"] == 200


def test_semantic_and_hybrid(service):
    qv = [math.sin(j + 1) for j in range(8)]
    sem = service.semantic_search(qv, top_k=5, threshold=None)
    assert 0 < len(sem["results"]) <= 5
    assert "cosine" in sem["results"][0]
    hyb = service.hybrid_search("parse buffer", qv, top_k=5)
    assert 0 < len(hyb["results"]) <= 5
    assert "rrf_score" in hyb["results"][0]


def test_regex_full_section(service):
    out = service.regex_search("def parse", full_section=True, page_size=5)
    if out["results"]:  # sections exist in the generated python-ish corpus
        r = out["results"][0]
        assert r["section_line_start"] <= r["line_no"] <= r["section_line_end"]


def test_reindex_upsert(service, spark):
    delta = spark.createDataFrame(
        [("repoA", "brand/new_file.py", "c1", "python",
          "def zzservicetoken():\n    return 1\n")],
        "repo string, path string, commit string, lang string, content string",
    )
    stats = service.reindex(delta)
    assert stats["added"] == 1
    hit = service.lexical_search("zzservicetoken")
    assert hit["results"] and hit["results"][0]["path"] == "brand/new_file.py"


def test_health_check(service):
    h = service.health_check()
    assert h["status"] == "healthy" and h["server"] == "ck_spark"


def test_rerank_seam(service, spark):
    df = spark.createDataFrame(
        [("a", "short"), ("b", "a much longer piece of text here")],
        "id string, section string",
    )
    out = rerank(df, lambda s: s.str.len(), k=1).collect()
    assert out[0]["id"] == "b"


def test_regex_search_trigram_acceleration(spark, tmp_path):
    """Service regex results are identical with and without the trigram
    index; reindex REFRESHES the trigram index segment-granularly
    (stored-content v6 layout) so it survives updates without ever going
    stale; and once the index exists the service needs no corpus at all."""
    from ck_spark.corpus import generate_corpus
    from ck_spark.query.trigram import trigram_index_exists
    from ck_spark.service import CkService

    corpus = spark.createDataFrame(generate_corpus(80, seed=7))
    svc = CkService(spark, str(tmp_path / "idx"), corpus=corpus, mode="code",
                    build_opts=dict(n_segments=2, term_buckets=4))
    plain = svc.regex_search(r"def \w+_ctx\(")["results"]
    out = svc.build_trigram()
    assert out["rows"] > 0 and svc._trigram() is not None
    fast = svc.regex_search(r"def \w+_ctx\(")["results"]
    assert [(r["path"], r["line_no"]) for r in fast] == [
        (r["path"], r["line_no"]) for r in plain
    ] and len(plain) > 0
    svc.reindex(corpus.limit(5))
    # stored-content index: trigram acceleration survives the reindex
    assert trigram_index_exists(svc.root) and svc._trigram() is not None
    again = svc.regex_search(r"def \w+_ctx\(")["results"]
    assert [(r["path"], r["line_no"]) for r in again] == [
        (r["path"], r["line_no"]) for r in plain
    ]
    # corpus-free service over the same root: scans run off stored content
    svc2 = CkService(spark, svc.root)
    free = svc2.regex_search(r"def \w+_ctx\(")["results"]
    assert [(r["path"], r["line_no"]) for r in free] == [
        (r["path"], r["line_no"]) for r in plain
    ]
    free_fs = svc2.regex_search("def", full_section=True, page_size=5)
    assert free_fs["results"]
    # build_trigram without a corpus (grams derive from doc_map)
    assert svc2.build_trigram()["rows"] > 0


def test_service_content_store(spark, tmp_path):
    """build_content_store flips fetches to blob point reads with
    identical results (lexical enrichment + regex), and reindex keeps
    the store live (delta refresh) — never stale, never corpus-bound."""
    from ck_spark.corpus import generate_corpus
    from ck_spark.index.content_store import content_store_exists
    from ck_spark.service import CkService

    pdf = generate_corpus(80, seed=9)
    corpus = spark.createDataFrame(pdf)
    svc = CkService(spark, str(tmp_path / "idx"), corpus=corpus, mode="code",
                    build_opts=dict(n_segments=2, term_buckets=4))
    svc.build_trigram()
    plain_lex = svc.lexical_search("def return", top_k=5)["results"]
    plain_rx = svc.regex_search(r"def \w+_ctx\(")["results"]
    out = svc.build_content_store()
    assert out["docs"] == len(pdf)
    assert svc._index().content_store is not None
    lex = svc.lexical_search("def return", top_k=5)["results"]
    assert lex == plain_lex and len(lex) == 5
    rx = svc.regex_search(r"def \w+_ctx\(")["results"]
    assert [(r["path"], r["line_no"]) for r in rx] == [
        (r["path"], r["line_no"]) for r in plain_rx
    ] and rx
    # reindex: store refreshed (marker restored), new content served
    pdf2 = pdf.copy()
    pdf2.loc[2, "content"] = "def qq_store_refresh_ctx(a):\n    return a\n"
    svc.reindex(spark.createDataFrame(pdf2.loc[[2]]))
    assert content_store_exists(svc.root)
    hits = svc.regex_search("qq_store_refresh_ctx")["results"]
    assert len(hits) == 1 and hits[0]["path"] == pdf2.loc[2, "path"]


def test_mcp_stdio_over_real_service(spark, tmp_path):
    """The full wire path: JSON-RPC lines -> McpStdioServer -> CkService
    -> engine, results identical to direct service calls."""
    import io
    import json

    from ck_spark.corpus import generate_corpus
    from ck_spark.mcp import McpStdioServer
    from ck_spark.service import CkService

    corpus = spark.createDataFrame(generate_corpus(60, seed=13))
    svc = CkService(spark, str(tmp_path / "idx"), corpus=corpus, mode="code",
                    build_opts=dict(n_segments=2, term_buckets=4))
    srv = McpStdioServer(svc)
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {}}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                    "params": {"name": "lexical_search",
                               "arguments": {"query": "parse buffer",
                                             "top_k": 5}}}),
        json.dumps({"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                    "params": {"name": "index_status"}}),
    ]
    out = io.StringIO()
    srv.serve(lines, out)
    resps = {r["id"]: r for r in map(json.loads, out.getvalue().splitlines())}
    wire = resps[2]["result"]["structuredContent"]["results"]
    direct = svc.lexical_search("parse buffer", top_k=5)["results"]
    assert [(r["doc_id"], r["score"]) for r in wire] == [
        (r["doc_id"], r["score"]) for r in direct
    ] and len(wire) > 0
    assert resps[3]["result"]["structuredContent"]["meta"]["version"] == 6


def test_snippet_config_lexical(service):
    # opt-in: rows gain SearchResult preview/span columns
    out = service.lexical_search("parse buffer", include_snippet=True)
    row = out["results"][0]
    assert {"preview", "byte_start", "byte_end", "line_start",
            "line_end", "lang"} <= set(row)
    assert row["preview"]
    # truncation: snippet_length chars + '...'
    trunc = service.lexical_search("parse buffer", snippet_length=5)
    r = trunc["results"][0]
    assert len(r["preview"]) == 8 and r["preview"].endswith("...")
    # include_snippet=False replaces the preview (mcp/session.rs:218-221)
    omitted = service.lexical_search("parse buffer", include_snippet=False)
    assert all(r["preview"] == "[snippet omitted]" for r in omitted["results"])
    # default shape untouched when the config is absent
    plain = service.lexical_search("parse buffer")
    assert "preview" not in plain["results"][0]


def test_snippet_config_regex(service):
    out = service.regex_search("parse", include_snippet=False)
    assert out["results"] and all(
        r["line"] == "[snippet omitted]" for r in out["results"]
    )
    trunc = service.regex_search("parse", snippet_length=4)
    assert all(len(r["line"]) <= 7 for r in trunc["results"])
    assert any(r["line"].endswith("...") for r in trunc["results"])


def test_snippet_length_clamped(service):
    from ck_spark.service import MAX_SNIPPET_LENGTH

    out = service.lexical_search("parse buffer",
                                 snippet_length=10 * MAX_SNIPPET_LENGTH)
    # no preview can exceed cap + ellipsis
    assert all(len(r["preview"]) <= MAX_SNIPPET_LENGTH + 3
               for r in out["results"])


def test_inspect_and_dump_chunks(service, spark):
    # pick a real python doc from the service's corpus
    path = service.corpus.where(F.col("lang") == "python") \
        .select("path").first()["path"]
    content = service.corpus.where(F.col("path") == path) \
        .select("content").first()["content"]
    info = service.inspect(path)
    assert info["exists"] and info["path"] == path
    assert info["size_bytes"] == len(content.encode("utf-8"))
    exp_lines = content.split("\n")
    if content.endswith("\n"):
        exp_lines = exp_lines[:-1]
    assert info["lines"] == len(exp_lines)
    ch = info["chunks"]
    assert ch["n"] >= 1 and len(ch["details"]) <= 10
    assert ch["min_tokens"] <= ch["avg_tokens"] <= ch["max_tokens"]
    for d in ch["details"]:
        assert len(d["preview"]) <= 80
        assert d["line_start"] >= 1 and d["line_end"] >= d["line_start"]

    dump = service.dump_chunks(path)
    assert dump["exists"] and dump["chunks"]
    # chunk texts are exact byte slices of the file
    data = content.encode("utf-8")
    for c in dump["chunks"]:
        assert c["text"] == data[c["byte_start"]:c["byte_end"]].decode("utf-8")

    # unknown file is reported, not raised
    missing = service.inspect("no/such/file.py")
    assert missing["exists"] is False
    assert service.dump_chunks("no/such/file.py")["exists"] is False
