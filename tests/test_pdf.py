"""PDF text extraction (S4): pure-Python extractor over constructed
fixtures — literal and FlateDecode streams, Tj / TJ / ' operators, string
escapes — and the fs-connector integration."""

import zlib

from ck_spark.ops.pdf import extract_pdf_text, is_pdf


def _pdf_with_stream(stream: bytes, flate: bool = False) -> bytes:
    body = zlib.compress(stream) if flate else stream
    filt = b"/Filter /FlateDecode " if flate else b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< " + filt + b"/Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
        b"trailer\n<<>>\n%%EOF\n"
    )


CONTENT = (
    b"BT\n/F1 12 Tf\n72 720 Td\n(Hello PDF world) Tj\n"
    b"0 -14 Td\n(second line with \\(escapes\\) and \\\\slash) Tj\n"
    b"ET\n"
    b"BT\n72 600 Td\n[(array ) -250 (shown ) -250 (text)] TJ\nET\n"
)


def test_literal_stream_extraction():
    data = _pdf_with_stream(CONTENT)
    assert is_pdf(data)
    text = extract_pdf_text(data)
    assert "Hello PDF world" in text
    assert "second line with (escapes) and \\slash" in text
    assert "array shown text" in text
    # Td line moves become newlines
    assert text.index("Hello PDF world") < text.index("second line")
    assert "\n" in text


def test_flate_stream_extraction():
    data = _pdf_with_stream(CONTENT, flate=True)
    assert extract_pdf_text(data) == extract_pdf_text(_pdf_with_stream(CONTENT))


def test_octal_escape_and_quote_operator():
    stream = b"BT (caf\\351) Tj ET BT (next)' ET"
    text = extract_pdf_text(_pdf_with_stream(stream))
    assert "caf\xe9" in text  # \351 octal = e-acute in latin-1
    assert "next" in text


def test_non_pdf_and_garbage_are_empty():
    assert extract_pdf_text(b"not a pdf") == ""
    assert extract_pdf_text(b"%PDF-1.4\ngarbage") == ""
    # corrupt flate body extracts nothing but never raises
    bad = _pdf_with_stream(b"xxxx")
    assert extract_pdf_text(bad.replace(b"xxxx", b"\x00\x01")) == ""


def test_fs_connector_extracts_pdf(spark, tmp_path):
    """End-to-end: a .pdf in the tree arrives as TEXT in the corpus, is
    indexable and searchable (the reference's preprocess_file journey)."""
    from ck_spark.index import build_index
    from ck_spark.query import BM25Index
    from ck_spark.sources.fs import read_source_tree

    root = tmp_path / "tree"
    (root / "docs").mkdir(parents=True)
    (root / "docs" / "spec.pdf").write_bytes(
        _pdf_with_stream(b"BT (zzpdfneedle appears here) Tj ET", flate=True)
    )
    (root / "main.py").write_text("def unrelated():\n    pass\n")

    corpus = read_source_tree(spark, str(root))
    rows = {r["path"]: r for r in corpus.collect()}
    assert rows["docs/spec.pdf"]["lang"] == "pdf"
    assert "zzpdfneedle appears here" in rows["docs/spec.pdf"]["content"]

    idx_root = str(tmp_path / "idx")
    build_index(spark, corpus, idx_root, mode="code", n_segments=2,
                term_buckets=4, build_groups=1)
    idx = BM25Index.load(spark, idx_root)
    hits = idx.search("zzpdfneedle", k=5, with_paths=True).collect()
    assert hits and hits[0]["path"] == "docs/spec.pdf"
