"""CoNLL-U source/sink (SURVEY.md §2 A1/A2, B-S4).

The reference consumes/produces CoNLL-U corpora ([PK]
corpuscula/conllu.py::Conllu.load/save — sentences of 10-field token
lines plus ``# key = value`` comment metadata; multiword-token ID ranges
like ``1-2`` pass through untagged). This module re-expresses that I/O as
distributed DataFrame ingestion/export so golden corpora can be diffed
against pipeline output at any scale:

* ``read_conllu`` — ``spark.read.text(..., wholetext=false)`` cannot split
  on sentence boundaries, so we read per-FILE (each input split = one
  file via ``wholetext``) and parse inside ``mapInPandas``; corpora
  sharded into many files parallelize naturally (the standard layout for
  large treebanks). One output row per sentence, token array nested —
  the same shape as ``turns_annotated``.
* ``write_conllu`` — renders each sentence row back to its text block;
  one shuffle-free pass, written as text files.

Parsing is pure-Python string handling over whole files inside Arrow
batches — acceptable because golden corpora are test-scale; the
production path never touches CoNLL-U (transcripts are already tabular).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_FIELDS = ["id", "form", "lemma", "upos", "xpos", "feats",
                "head", "deprel", "deps", "misc"]

CONLLU_SCHEMA = (
    "doc_path string, sent_idx int, sent_id string, text string,"
    " meta map<string,string>,"
    " tokens array<struct<id:string,form:string,lemma:string,upos:string,"
    "xpos:string,feats:map<string,string>,head:string,deprel:string,"
    "deps:string,misc:map<string,string>>>"
)


def _parse_kv_block(s: str) -> dict[str, str]:
    """FEATS/MISC ``A=1|B=2`` blocks; ``_`` means empty."""
    if not s or s == "_":
        return {}
    out: dict[str, str] = {}
    for part in s.split("|"):
        k, _, v = part.partition("=")
        out[k] = v
    return out


def _render_kv_block(d: dict | None) -> str:
    if not d:
        return "_"
    return "|".join(f"{k}={v}" for k, v in d.items())


def parse_conllu_text(content: str, doc_path: str = "") -> list[dict]:
    """One file's text → sentence row dicts (pure function, unit-testable)."""
    sents: list[dict] = []
    meta: dict[str, str] = {}
    toks: list[dict] = []
    for line in content.split("\n"):
        line = line.rstrip("\r")
        if not line.strip():
            if toks or meta:
                sents.append(_close_sentence(doc_path, len(sents), meta, toks))
                meta, toks = {}, []
            continue
        if line.startswith("#"):
            body = line[1:].strip()
            k, eq, v = body.partition("=")
            if eq:
                meta[k.strip()] = v.strip()
            else:
                meta[body] = ""
            continue
        cols = line.split("\t")
        if len(cols) < 10:
            cols += ["_"] * (10 - len(cols))
        toks.append({
            "id": cols[0], "form": cols[1], "lemma": cols[2], "upos": cols[3],
            "xpos": cols[4], "feats": _parse_kv_block(cols[5]),
            "head": cols[6], "deprel": cols[7], "deps": cols[8],
            "misc": _parse_kv_block(cols[9]),
        })
    if toks or meta:
        sents.append(_close_sentence(doc_path, len(sents), meta, toks))
    return sents


def _close_sentence(doc_path: str, idx: int, meta: dict, toks: list) -> dict:
    return {"doc_path": doc_path, "sent_idx": idx,
            "sent_id": meta.get("sent_id", str(idx)),
            "text": meta.get("text", ""), "meta": meta, "tokens": toks}


def render_sentence(meta: dict | None, tokens: list) -> str:
    """Sentence row → CoNLL-U block (inverse of the parser)."""
    lines = []
    for k, v in (meta or {}).items():
        lines.append(f"# {k} = {v}" if v != "" else f"# {k}")
    for t in tokens:
        lines.append("\t".join([
            t["id"] or "_", t["form"] or "_", t["lemma"] or "_",
            t["upos"] or "_", t["xpos"] or "_", _render_kv_block(t["feats"]),
            t["head"] or "_", t["deprel"] or "_", t["deps"] or "_",
            _render_kv_block(t["misc"]),
        ]))
    return "\n".join(lines) + "\n"


def read_conllu(spark: SparkSession, path: str) -> DataFrame:
    """Distributed CoNLL-U ingest: one row per sentence."""
    files = spark.read.text(path, wholetext=True) \
        .withColumn("doc_path", F.input_file_name())

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for content, doc_path in zip(pdf["value"], pdf["doc_path"]):
                rows.extend(parse_conllu_text(str(content), str(doc_path)))
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(parse, schema=CONLLU_SCHEMA)


def write_conllu(df: DataFrame, out_path: str) -> None:
    """Sentence rows → CoNLL-U text files (ordered within each file by
    (doc_path, sent_idx); one output file per input partition).

    The ordering contract is enforced with ``sortWithinPartitions``
    BEFORE the Arrow boundary: mapInPandas sees one pandas batch per
    ``arrow.maxRecordsPerBatch`` rows (16k in this session), so a
    per-batch sort alone would emit independently-sorted runs and
    interleave documents across batch boundaries in any partition
    larger than one batch (code-review r5). With the partition-level
    sort the batches arrive as contiguous ordered slices and the
    per-batch sort is a stable no-op kept as a safety net."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.sort_values(["doc_path", "sent_idx"])
            blocks = [render_sentence(m, t)
                      for m, t in zip(pdf["meta"], pdf["tokens"])]
            yield pd.DataFrame({"value": ["\n".join(blocks)]}) if blocks \
                else pd.DataFrame({"value": pd.Series([], dtype=str)})

    df.select("doc_path", "sent_idx", "meta", "tokens") \
      .sortWithinPartitions("doc_path", "sent_idx") \
      .mapInPandas(render, schema="value string") \
      .write.mode("overwrite").text(out_path)


def annotated_to_conllu_rows(ann: DataFrame) -> DataFrame:
    """turns_annotated → CoNLL-U sentence rows (NE in MISC['NE'], the
    reference's convention [PK] morra/morph_parser_ne.py), for golden
    diffs against reference annotations."""
    empty_map = F.map_from_arrays(F.array(), F.array()).cast("map<string,string>")
    ann_fields = [f.name for f in ann.schema["tokens"].dataType.elementType.fields]
    tok = F.transform(
        "tokens",
        lambda t: F.struct(
            (t["token_id"] + 1).cast("string").alias("id"),
            t["form"].alias("form"), t["lemma"].alias("lemma"),
            t["upos"].alias("upos"), F.lit("_").alias("xpos"),
            (t["feats"] if "feats" in ann_fields else empty_map).alias("feats"),
            F.lit("_").alias("head"), F.lit("_").alias("deprel"),
            F.lit("_").alias("deps"),
            F.when(t["ne"] != "O",
                   F.map_from_arrays(F.array(F.lit("NE")), F.array(t["ne"])))
             .otherwise(F.map_from_arrays(F.array(), F.array())
                        .cast("map<string,string>")).alias("misc")))
    return ann.select(
        F.col("conv_id").alias("doc_path"),
        F.col("turn_idx").alias("sent_idx"),
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("sent_id"),
        "text",
        F.map_from_arrays(
            F.array(F.lit("sent_id"), F.lit("text")),
            F.array(F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")),
                    F.col("text"))).alias("meta"),
        tok.alias("tokens"))
