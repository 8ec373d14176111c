"""tantivy-style query syntax: +must, -must_not, "phrases", bare shoulds.

The reference passes its query string straight to tantivy's QueryParser
(ck-engine/src/lib.rs:765-768); this module rebuilds the commonly-used
subset of that grammar over the Spark index:

- bare terms are SHOULD clauses (tantivy default)
- ``+term`` / ``-term`` are MUST / MUST_NOT
- ``"multi word"`` is a phrase: its terms become MUST clauses for
  candidate generation, then candidates are verified for token ADJACENCY —
  index-only against the positions postings (v5+ indexes, the tantivy
  PhraseQuery analogue), or against the corpus content for older
  position-less indexes. Adjacency means consecutive POSITIONS under the
  index's gap numbering (tokenizer.term_positions_text): a filtered-out
  token between two words breaks the phrase, matching both tantivy's
  position counter and the simple-mode separator regex (tokens are maximal
  alnum runs, so adjacency = exactly one non-alphanumeric run between
  them). Scoring deviation,
  documented: the phrase contributes the BM25 sum of its terms rather
  than tantivy's phrase-frequency, preserving the candidate SET semantics.
- ``-"multi word"`` is a NEGATIVE phrase: tantivy builds
  MustNot(PhraseQuery), excluding only docs that contain the ADJACENT
  phrase — docs containing the terms separately still match. Parsed into
  `neg_phrases` and resolved with the same adjacency machinery.
- ``a AND b`` promotes every bare term to MUST (the parser's conjunctive
  shorthand); ``OR`` is the default and is accepted as a no-op keyword.

Parsing is pure and shared by the engine and the test oracles.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

from ck_spark.tokenizer import tokenize

_TOKEN_RE = re.compile(r'([+-]?)"([^"]*)"|(\S+)')


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    neg_phrases: list[list[str]] = field(default_factory=list)

    @property
    def positive_terms(self) -> list[str]:
        out = list(dict.fromkeys(
            self.must + self.should + [t for p in self.phrases for t in p]
        ))
        return out

    @property
    def all_terms(self) -> list[str]:
        return list(dict.fromkeys(
            self.positive_terms + self.must_not
            + [t for p in self.neg_phrases for t in p]
        ))


def parse_query(q: str, mode: str = "code") -> ParsedQuery:
    pq = ParsedQuery()
    conjunctive = False
    bare: list[str] = []
    for m in _TOKEN_RE.finditer(q or ""):
        sign, phrase, word = m.group(1), m.group(2), m.group(3)
        if phrase is not None:
            terms = tokenize(phrase, mode)
            if not terms:
                continue
            if sign == "-":
                # single-term negative phrase == plain must_not; multi-term
                # is a MustNot(PhraseQuery): only the ADJACENT occurrence
                # bans a doc (tantivy QueryParser semantics)
                if len(terms) == 1:
                    pq.must_not.extend(terms)
                else:
                    pq.neg_phrases.append(terms)
            elif len(terms) == 1:
                (pq.must if sign == "+" else bare).append(terms[0])
            else:
                pq.phrases.append(terms)
            continue
        if word in ("AND", "&&"):
            conjunctive = True
            continue
        if word in ("OR", "||"):
            continue
        sign = "+" if word.startswith("+") else "-" if word.startswith("-") else ""
        terms = tokenize(word.lstrip("+-"), mode)
        if not terms:
            continue
        if sign == "+":
            pq.must.extend(terms)
        elif sign == "-":
            pq.must_not.extend(terms)
        else:
            bare.extend(terms)
    if conjunctive:
        pq.must.extend(bare)
    else:
        pq.should.extend(bare)
    for f_ in ("should", "must", "must_not"):
        setattr(pq, f_, list(dict.fromkeys(getattr(pq, f_))))
    return pq


def phrase_adjacency_regex(terms: list[str]) -> str:
    """Java/RE2-compatible regex matching the phrase's tokens appearing
    consecutively under simple-mode tokenization (case-insensitive; one
    non-alphanumeric separator run between tokens; boundaries must not be
    alphanumeric so partial-token matches are impossible)."""
    body = "[^a-z0-9]+".join(re.escape(t) for t in terms)
    return f"(?i)(^|[^a-z0-9]){body}($|[^a-z0-9])"


def phrases_match_text(text: str, phrases: list[list[str]], mode: str) -> bool:
    """True iff EVERY phrase's terms appear at CONSECUTIVE POSITIONS under
    the index's position numbering (tokenizer.term_positions_text — gap
    numbering: a stoplisted or ≥40-byte token between two words breaks
    adjacency, exactly as tantivy's position counter and the raw-text
    separator regex both do). Shared by the corpus-verify UDF and the
    pure-python test oracles so every phrase path agrees by definition."""
    from ck_spark.tokenizer import term_positions_text

    pos = term_positions_text(text or "", mode)
    posmap = {p: t for t, ps in pos.items() for p in ps}
    for ph in phrases:
        starts = pos.get(ph[0], ())
        if not any(
            all(posmap.get(q + j) == ph[j] for j in range(1, len(ph)))
            for q in starts
        ):
            return False
    return True


def phrase_match_udf(phrases: list[list[str]], mode: str):
    """Arrow pandas UDF: content -> True iff EVERY phrase matches under
    ``phrases_match_text``. This is the exact adjacency check for
    non-simple modes (code mode splits camelCase, so 'parseBuffer'
    contains the adjacent tokens [parse, buffer] — a separator regex
    can't see that); simple-mode callers use the codegen regex instead."""
    from pyspark.sql import functions as F

    @F.pandas_udf("boolean")
    def _udf(content: pd.Series) -> pd.Series:
        return content.map(lambda t: phrases_match_text(t, phrases, mode))

    return _udf
