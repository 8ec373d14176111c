"""ck SearchResult-shaped enrichment (BM25Index.fetch_search_results) and
the JSONL agent serializer (service.results_to_jsonl).

Reference contract (ck-engine/src/lib.rs:780-818, ck-core/src/lib.rs:
227-241, 266-279, 357-375): lexical results carry preview = first 3 lines
of the stored file (whole content under --full-section), span = the whole
file (bytes 0..len, lines 1..line_count), and lang; JSONL rows serialize
as {path, span, language, snippet, score} with None fields omitted.
Line semantics are Rust str::lines(): trailing newline terminates the
last line, one \r before each \n is stripped, empty content = 0 lines.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ck_spark.index import build_index
from ck_spark.query import BM25Index
from ck_spark.service import results_to_jsonl

# (path, content): every lines()/byte-count edge in one corpus. Each doc
# carries the query term 'needle' so one search retrieves them all.
_DOCS = [
    ("plain.py", "needle one\nsecond line\nthird line\nfourth line"),
    ("trailing.rs", "needle alpha\nbeta\n"),
    ("crlf.go", "needle a\r\nb\r\nc\r\n"),
    ("double_cr.c", "needle x\r\r\ny\r\r"),
    ("no_newline.ts", "needle single"),
    ("empty.md", ""),
    ("unicode.hs", "needle héllo ✓\nsecond\n"),
    ("blanks.java", "needle\n\n\nafter blanks\n"),
]


@pytest.fixture(scope="module")
def ridx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("results_idx"))
    pdf_rows = [("r", p, "c1", "x", c) for p, c in _DOCS]
    corpus = spark.createDataFrame(
        pdf_rows, "repo string, path string, commit string, lang string, content string"
    )
    build_index(spark, corpus, root, mode="simple", n_segments=2,
                term_buckets=4, build_groups=1)
    return BM25Index.load(spark, root)


def _rust_lines(content: str) -> list[str]:
    # executable restatement of Rust str::lines() for the oracle side
    if content == "":
        return []
    parts = content.split("\n")
    if content.endswith("\n"):
        parts = parts[:-1]
    return [p[:-1] if p.endswith("\r") else p for p in parts]


def _by_path(idx, full_section=False):
    res = idx.search("needle", k=20, mode="or")
    enr = idx.fetch_search_results(res, full_section=full_section)
    return {r["path"]: r for r in enr.collect()}


def test_preview_span_lang_match_rust_semantics(ridx):
    got = _by_path(ridx)
    # empty.md has no tokens -> not retrieved; everything else is
    assert set(got) == {p for p, c in _DOCS if c != ""}
    for path, content in _DOCS:
        if content == "":
            continue
        r = got[path]
        lines = _rust_lines(content)
        assert r["preview"] == "\n".join(lines[:3]), path
        assert r["byte_start"] == 0
        assert r["byte_end"] == len(content.encode("utf-8")), path
        assert r["line_start"] == 1
        assert r["line_end"] == len(lines), path
        assert r["lang"] == "x"
        assert r["repo"] == "r"


def test_full_section_preview_is_whole_content(ridx):
    got = _by_path(ridx, full_section=True)
    for path, content in _DOCS:
        if content:
            assert got[path]["preview"] == content


def test_scores_ride_through_and_order_is_score_then_doc_id(ridx):
    res = ridx.search("needle", k=20)
    base = [(r["doc_id"], r["score"]) for r in res.collect()]
    enr = [(r["doc_id"], r["score"])
           for r in ridx.fetch_search_results(res).collect()]
    assert enr == sorted(base, key=lambda t: (-t[1], t[0]))


def test_empty_results_keep_schema(ridx):
    res = ridx.search("zzz_absent_term_zzz", k=5)
    enr = ridx.fetch_search_results(res)
    assert enr.count() == 0
    assert enr.columns == ["doc_id", "repo", "path", "score", "preview",
                           "byte_start", "byte_end", "line_start",
                           "line_end", "lang"]


def test_store_content_required(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nocontent_idx"))
    corpus = spark.createDataFrame(
        [("r", "a.py", "c1", "python", "needle here")],
        "repo string, path string, commit string, lang string, content string",
    )
    build_index(spark, corpus, root, mode="simple", n_segments=1,
                term_buckets=2, build_groups=1, store_content=False)
    idx = BM25Index.load(spark, root)
    with pytest.raises(ValueError, match="store_content"):
        idx.fetch_search_results(idx.search("needle", k=5))


def test_jsonl_shape_and_no_snippet(ridx):
    res = ridx.search("needle", k=20)
    enr = ridx.fetch_search_results(res)
    lines = [json.loads(r["line"]) for r in results_to_jsonl(enr).collect()]
    assert lines, "retrieval should not be empty"
    for obj in lines:
        # serde field order (JsonlSearchResult) and exact key set
        assert list(obj) == ["path", "span", "language", "snippet", "score"]
        assert list(obj["span"]) == ["byte_start", "byte_end",
                                     "line_start", "line_end"]
    by_path = {o["path"]: o for o in lines}
    assert by_path["trailing.rs"]["snippet"] == "needle alpha\nbeta"
    no_snip = [json.loads(r["line"])
               for r in results_to_jsonl(enr, no_snippet=True).collect()]
    assert all("snippet" not in o for o in no_snip)
    # null language is OMITTED, not serialized as null (serde skip parity)
    nulled = enr.withColumn("lang", F.lit(None).cast("string"))
    objs = [json.loads(r["line"]) for r in results_to_jsonl(nulled).collect()]
    assert all("language" not in o for o in objs)


def test_json_v1_shape(ridx):
    from ck_spark.service import results_to_json

    res = ridx.search("needle", k=5)
    enr = ridx.fetch_search_results(res)
    # give one row a known lang, leave 'x' (unknown) for the rest
    objs = [json.loads(r["line"]) for r in results_to_json(enr).collect()]
    for o in objs:
        assert list(o) == ["file", "span", "lang", "symbol", "score",
                           "signals", "preview", "model"]
        # explicit nulls, not omitted (JsonSearchResult has no serde skip)
        assert o["symbol"] is None
        assert o["signals"]["lex_rank"] is None
        assert o["signals"]["vec_rank"] is None
        assert o["signals"]["rrf_score"] == o["score"]
        assert o["model"] == "none"
        # 'x' is not a ck Language -> null lang
        assert o["lang"] is None


def test_json_v1_lang_variant_names(spark, tmp_path_factory):
    from ck_spark.query.grep import grep_results
    from ck_spark.service import results_to_json

    corpus = spark.createDataFrame(
        [("r", "a.rs", "c", "rust", "hit"),
         ("r", "b.cs", "c", "csharp", "hit"),
         ("r", "c.md", "c", "markdown", "hit")],
        "repo string, path string, commit string, lang string, content string",
    )
    out = results_to_json(grep_results(corpus, "hit", fixed_string=True))
    langs = {json.loads(r["line"])["file"]: json.loads(r["line"])["lang"]
             for r in out.collect()}
    # serde variant case, not Display case
    assert langs == {"a.rs": "Rust", "b.cs": "CSharp", "c.md": "Markdown"}


def test_python_xxhash64_matches_spark(spark):
    """functions/xxh.py must stay bit-identical to the JVM expression —
    the fetch's seg pruning silently misses docs otherwise."""
    import random

    from ck_spark.functions.xxh import seg_of_doc_id, xxhash64_long

    random.seed(7)
    vals = [0, 1, -1, 2**62 - 1, -(2**62), (1 << 63) - 1, -(1 << 63)]
    vals += [random.randrange(-2**63, 2**63) for _ in range(40)]
    csv = ",".join(f"{v}L" for v in vals)
    rows = spark.sql(
        f"SELECT id, xxhash64(id) AS h, pmod(xxhash64(id), 7) AS s "
        f"FROM (SELECT explode(array({csv})) AS id)"
    ).collect()
    for r in rows:
        assert xxhash64_long(r["id"]) == r["h"], r["id"]
        assert seg_of_doc_id(r["id"], 7) == r["s"], r["id"]
