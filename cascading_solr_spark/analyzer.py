"""Code-aware text analyzer, shared verbatim between index build and query.

Mirrors the analyzer semantics of the reference's Solr test schema
(/root/reference/src/test/resources/solr-home-4.1/collection1/conf/schema.xml):

* ``text_general`` index chain (schema.xml:424-431): StandardTokenizer
  (word-break on non-alphanumerics, approximated for code), StopFilter with an
  *empty* stopword list (conf/stopwords.txt holds only the license header, so
  stopword removal is OFF by default here too), LowerCaseFilter.
* ``text_en_splitting`` (schema.xml:495-527): WordDelimiterFilter with
  ``generateWordParts=1 generateNumberParts=1 catenateWords=1
  splitOnCaseChange=1`` — i.e. camelCase / snake_case / letter-digit boundary
  splitting plus the catenated whole identifier.  This is what makes the
  lowercase query ``turbowriter`` match the stored value "TurboWriter 2.3"
  (reference README.md:96-99, AbstractSolrSchemeTest.java:155-159).

Two implementations, kept rank-identical by `tests/test_analyzer.py`:

* :func:`tokenize` — pure Python, used by the query parser and the pytest
  oracle (the analogue of Solr's query-time chain, schema.xml:432-437).
* :func:`analyze_col` — a Catalyst expression tree (split / regexp_extract_all
  / transform / flatten), fully JVM-side and whole-stage-codegen'd: the hot
  index-build path never leaves the JVM for tokenization.

Hot terms (stopword-grade code tokens such as ``import`` / ``return``) are NOT
dropped — skew is handled by shuffle salting in indexing/build.py, per the
empty stopwords.txt in the reference config.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Primary tokenizer: maximal alphanumeric runs (StandardTokenizer
# approximation appropriate for source code: `foo.bar(baz_qux)` ->
# foo, bar, baz_qux's parts).  Intentionally ASCII-alnum: code identifiers.
WORD_PATTERN = r"[A-Za-z0-9]+"

# Word-delimiter sub-splitter: uppercase acronym runs (XML in XMLHttpRequest),
# capitalized words (Http), lowercase runs, digit runs.  Together the
# alternatives partition any alphanumeric string.
SUB_PATTERN = r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+"

_WORD_RE = re.compile(WORD_PATTERN)
_SUB_RE = re.compile(SUB_PATTERN)

# Split-on-non-alnum pattern for the Column implementation (Java regex).
_SPLIT_PATTERN = r"[^A-Za-z0-9]+"


def tokenize(text: str | None) -> list[str]:
    """Pure-Python analyzer: ``content -> [term]`` (with duplicates, in order).

    Deterministic; the single source of truth for query parsing and the
    pytest BM25 oracle.  Must stay behavior-identical to :func:`analyze_col`.
    """
    if text is None:
        return []
    out: list[str] = []
    for word in _WORD_RE.findall(text):
        parts = _SUB_RE.findall(word)
        if len(parts) <= 1:
            out.append(word.lower())
        else:
            # generateWordParts/generateNumberParts + catenateWords analogue:
            # emit each sub-part and the catenated whole identifier.
            out.extend(p.lower() for p in parts)
            out.append(word.lower())
    return out


def analyze_col(col: Column | str) -> Column:
    """Catalyst-expression analyzer: string column -> array<string> of terms.

    Pure JVM-side (split + regexp_extract_all + higher-order functions), so
    tokenization of the 100 TB corpus never crosses the JVM/Python boundary.
    Behavior-identical to :func:`tokenize` (enforced by tests).
    """
    c = F.col(col) if isinstance(col, str) else col
    # null content -> [] (the reference silently skips nulls, SolrWriter.java:65-66)
    c = F.coalesce(c, F.lit(""))
    primaries = F.filter(F.split(c, _SPLIT_PATTERN), lambda x: x != F.lit(""))

    # Stage 1: run the word-delimiter regex ONCE per word, stashing the
    # lowered word + lowered parts in a struct (Catalyst does not CSE inside
    # higher-order-function lambdas, so naive re-use would re-run the regex).
    staged = F.transform(
        primaries,
        lambda w: F.struct(
            F.lower(w).alias("lw"),
            F.transform(
                F.regexp_extract_all(w, F.lit(SUB_PATTERN), F.lit(0)), F.lower
            ).alias("parts"),
        ),
    )
    # Stage 2: emit parts + catenated whole for multi-part identifiers.
    return F.flatten(
        F.transform(
            staged,
            lambda s: F.when(
                F.size(s["parts"]) > 1,
                F.concat(s["parts"], F.array(s["lw"])),
            ).otherwise(F.array(s["lw"])),
        )
    )


def make_cached_tokenizer():
    """Word-memoized tokenizer for batch kernels: code identifiers repeat
    heavily, so word->tokens memoization turns the per-word regex into a dict
    hit.  One cache per kernel invocation (bounded by batch vocabulary)."""
    cache: dict[str, tuple[str, ...]] = {}
    findall = _WORD_RE.findall
    sub_findall = _SUB_RE.findall

    def tokenize_fast(text: str | None) -> list[str]:
        if not text:
            return []
        out: list[str] = []
        for word in findall(text):
            toks = cache.get(word)
            if toks is None:
                parts = sub_findall(word)
                if len(parts) <= 1:
                    toks = (word.lower(),)
                else:
                    toks = tuple(p.lower() for p in parts) + (word.lower(),)
                cache[word] = toks
            out.extend(toks)
        return out

    return tokenize_fast


def analyze_query(query: str) -> list[str]:
    """Analyze a query string with the same chain as the index (schema.xml:432).

    Returns distinct terms in first-seen order (Lucene's default-OR keyword
    query, solrconfig.xml:766-774; duplicate query terms do not double-score
    in our OR semantics — each distinct term contributes once).
    """
    seen: dict[str, None] = {}
    for t in tokenize(query):
        seen.setdefault(t, None)
    return list(seen)
