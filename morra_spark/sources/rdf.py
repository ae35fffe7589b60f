"""RDF N-Triples interop — export the materialized triple table in the
W3C interchange format (and read the same subset back).

Why: (subj, pred, obj) parquet is this engine's native sink, but the
downstream graph ecosystem (triple stores, SPARQL endpoints, graph
visualizers, other KG pipelines) speaks RDF. N-Triples is the exchange
format of choice at scale precisely because it is LINE-ORIENTED: one
self-contained triple per line means a 100 TB dump is embarrassingly
parallel to write AND to re-read (any byte-range split re-synchronizes
at the next newline — the same property that makes it the standard
format for Wikidata/DBpedia bulk dumps).

Scale shape: both directions are MAP-ONLY — serialization is a single
projection of JVM string expressions (percent-encoding via
``url_encode``, literal escaping via ``replace`` chains; no Python, no
shuffle), parsing is one ``regexp_extract`` per field plus a split-based
unescaper. Neither direction ever moves data across the cluster; the
text files inherit whatever partitioning the triple table had.

Subset contract (documented, test-pinned): the reader accepts exactly
what the writer emits — absolute-IRI subjects/predicates under one
``base`` prefix, objects as either IRIs (entities) or plain string
literals, the four mandatory STRING_LITERAL_QUOTE escapes (\\\\ \\"
\\n \\r) plus \\t leniently on read, ``#`` comment lines and blank
lines skipped. Typed/lang-tagged literals, blank nodes, and \\uXXXX
escapes are out of scope — lines using them are surfaced (not silently
dropped) via ``strict`` parse accounting.

Lossy by design: NE tags and weights live outside the N-Triples data
model; round-tripping preserves (subj, pred, obj, obj kind) exactly and
nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BASE = "urn:kg:"


def _iri(col: Column, base: str) -> Column:
    """Percent-encoded absolute IRI for an entity/predicate surface
    form. ``url_encode`` is application/x-www-form-urlencoded (space →
    '+'); the single post-fix to '%20' yields standard percent-encoding
    — every RFC-3987-forbidden character (space, <>, ", {}, |, ^, `,
    backslash, controls) is escaped because the encoder passes only
    [A-Za-z0-9.*_-] through raw."""
    return F.concat(F.lit("<" + base),
                    F.replace(F.url_encode(col), F.lit("+"), F.lit("%20")),
                    F.lit(">"))


def _literal(col: Column) -> Column:
    """STRING_LITERAL_QUOTE with the spec's four mandatory escapes —
    backslash FIRST (later escapes introduce backslashes), then quote,
    LF, CR. Every other character (tab and other controls included) is
    legal raw inside the quotes per the N-Triples grammar."""
    s = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    s = F.replace(s, F.lit('"'), F.lit('\\"'))
    s = F.replace(s, F.lit("\n"), F.lit("\\n"))
    s = F.replace(s, F.lit("\r"), F.lit("\\r"))
    return F.concat(F.lit('"'), s, F.lit('"'))


def to_ntriples(triples: DataFrame, *, base: str = DEFAULT_BASE,
                subj: str = "subj", pred: str = "pred",
                obj: str = "obj", obj_ne: str | None = "obj_ne",
                ) -> DataFrame:
    """Triple rows → one-column (``line``) N-Triples frame, ready for
    ``.write.text(...)``.

    Object kind is column-driven: when ``obj_ne`` names an existing
    column, a row's object serializes as an entity IRI iff its NE tag
    is non-null and as a plain string literal otherwise (the same
    entity-vs-value split ``graph_nodes`` applies); pass ``obj_ne=None``
    — or point at a frame without the column — to emit every object as
    a literal. Rows with a null subject, predicate, or object carry
    nothing serializable and are dropped (the graph rollup's own rule
    for null endpoints).
    """
    has_ne = obj_ne is not None and obj_ne in triples.columns
    obj_is_iri = (F.col(obj_ne).isNotNull() if has_ne else F.lit(False))
    obj_term = F.when(obj_is_iri, _iri(F.col(obj), base)) \
        .otherwise(_literal(F.col(obj)))
    return (triples
            .filter(F.col(subj).isNotNull() & F.col(pred).isNotNull()
                    & F.col(obj).isNotNull())
            .select(F.concat(_iri(F.col(subj), base), F.lit(" "),
                             _iri(F.col(pred), base), F.lit(" "),
                             obj_term, F.lit(" .")).alias("line")))


def _unescape(col: Column) -> Column:
    """Invert ``_literal`` exactly, JVM-side. A chained replace is
    WRONG here ('\\\\n' — escaped backslash followed by 'n' — contains
    the substring '\\n' and would decode to a newline), so: split on
    the escaped-backslash token first, decode the simple escapes inside
    each segment (where no '\\\\' can remain, making them unambiguous),
    and rejoin with a real backslash."""
    segs = F.split(col, r"\\\\", -1)
    dec = F.transform(
        segs,
        lambda s: F.replace(
            F.replace(
                F.replace(
                    F.replace(s, F.lit('\\"'), F.lit('"')),
                    F.lit("\\n"), F.lit("\n")),
                F.lit("\\r"), F.lit("\r")),
            F.lit("\\t"), F.lit("\t")))  # \t: lenient read, never emitted
    return F.array_join(dec, "\\")


def _deiri(col: Column, base: str) -> Column:
    """Strip the base prefix (anchored — a substring replace could fire
    mid-IRI) and percent-decode back to the original surface form; an
    IRI under a FOREIGN base is kept whole, undecoded, so dumps mixing
    producers degrade readably instead of mangling."""
    return F.when(
        col.startswith(base),
        F.url_decode(col.substr(F.lit(len(base) + 1), F.length(col)))
    ).otherwise(col)


# one self-contained triple per line; the literal body pattern
# ((?:[^"\\]|\\.)*) steps over escaped quotes correctly
_LINE_RE = (r'^<([^ >]+)> <([^ >]+)> '
            r'(?:<([^ >]+)>|"((?:[^"\\]|\\.)*)") \.\s*$')


def from_ntriples(lines: DataFrame, *, base: str = DEFAULT_BASE,
                  column: str = "value",
                  strict: bool = True) -> DataFrame:
    """One-column text frame (``spark.read.text`` output) → (subj,
    pred, obj, obj_is_iri) triples. Blank and ``#`` comment lines are
    skipped; any other non-matching line (blank nodes, typed literals,
    malformed text) raises under ``strict`` — with the offending count —
    and is dropped with ``strict=False``. The raise costs one pass; at
    dump-ingest scale run strict once per new producer, then
    ``strict=False`` on the recurring feed."""
    src = F.col(column)
    body = (lines
            .filter(~F.trim(src).startswith("#") & (F.trim(src) != ""))
            .withColumn("_s", F.regexp_extract(src, _LINE_RE, 1))
            .withColumn("_p", F.regexp_extract(src, _LINE_RE, 2))
            .withColumn("_oi", F.regexp_extract(src, _LINE_RE, 3))
            .withColumn("_ol", F.regexp_extract(src, _LINE_RE, 4)))
    # regexp_extract yields '' on no-match; a matched line always has a
    # non-empty subject (IRIs are non-empty by the pattern)
    bad = body.filter(F.col("_s") == "")
    if strict:
        n_bad = bad.count()
        if n_bad:
            sample = [r[column] for r in bad.select(column).take(3)]
            raise ValueError(
                f"from_ntriples: {n_bad} unparseable line(s) (blank "
                f"nodes / typed literals / malformed?) e.g. {sample!r} — "
                f"re-run with strict=False to drop them")
    matched = body.filter(F.col("_s") != "")
    obj_is_iri = F.col("_oi") != ""
    return matched.select(
        _deiri(F.col("_s"), base).alias("subj"),
        _deiri(F.col("_p"), base).alias("pred"),
        F.when(obj_is_iri, _deiri(F.col("_oi"), base))
        .otherwise(_unescape(F.col("_ol"))).alias("obj"),
        obj_is_iri.alias("obj_is_iri"))


def write_ntriples(triples: DataFrame, path: str, *,
                   base: str = DEFAULT_BASE, mode: str = "error") -> None:
    """Dump a triple table as an N-Triples text directory (one file per
    partition — the parallel-bulk-export shape)."""
    to_ntriples(triples, base=base).write.mode(mode).text(path)


def read_ntriples(spark, path: str, *, base: str = DEFAULT_BASE,
                  strict: bool = True) -> DataFrame:
    """Read an N-Triples dump (this module's subset) into triples."""
    return from_ntriples(spark.read.text(path), base=base, strict=strict)
