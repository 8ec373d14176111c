"""Engine-wide constants, mirroring the reference's published defaults.

Reference provenance (cited for parity checking, not copied):
- BM25 k1=1.2, b=0.75: tantivy 0.24 defaults, not overridden by ck
  (/root/reference/Cargo.toml:44; schema uses plain TEXT at
  ck-engine/src/lib.rs:750-753).
- Lexical default top-k 100: TopDocs::with_limit(100) when --topk unset
  (ck-engine/src/lib.rs:771-775).
- RRF fusion constant k=60 (ck-engine/src/lib.rs:1031).
- Semantic defaults top_k=10, threshold=0.6 (ck-cli/src/main.rs:1687-1695).
- Max token length 40: tantivy default analyzer's RemoveLongFilter with
  limit 40 KEEPS only tokens whose byte length is < 40 (predicate is
  len < limit), so 40-byte tokens are dropped.
"""

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60
LEXICAL_DEFAULT_TOPK = 100
SEMANTIC_DEFAULT_TOPK = 10
SEMANTIC_DEFAULT_THRESHOLD = 0.6
MAX_TOKEN_LEN = 40

# Posting-list physical layout.
BLOCK_SIZE = 128           # docs per block for block-max metadata
DEFAULT_TERM_BUCKETS = 32  # hash buckets of `term` -> parquet partitions
DEFAULT_DOCS_PER_SEGMENT = 250_000  # target segment width (docs per doc-hash segment)
