"""Distributed corpus-dictionary build (SURVEY.md §2 A3).

The reference builds its ``CorpusDict`` by counting (wform → tag) and
(wform, tag → lemma) frequencies in a single-threaded pass over the
training corpus ([PK] corpuscula/corpus_dict.py::CorpusDict). Here the
same statistics are one hash aggregate + one ranking window over an
annotated/gold token table of any size — then collapsed to the tiny
argmax dictionaries that ship inside the broadcast model artifact.

Confidence mirrors the reference's coefficient: freq of the winning
value / total freq of the key; callers can threshold it (the corpus-dict
short-circuit described in SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tag_stats(tokens: DataFrame) -> DataFrame:
    """(form_norm, upos, freq, conf, rn) — per-form tag distribution.
    ``tokens`` needs columns form, upos."""
    counts = (tokens.select(F.lower("form").alias("form_norm"), "upos")
              .groupBy("form_norm", "upos").agg(F.count(F.lit(1)).alias("freq")))
    w = Window.partitionBy("form_norm").orderBy(F.desc("freq"), "upos")
    tot = Window.partitionBy("form_norm")
    return (counts
            .withColumn("conf", F.col("freq") / F.sum("freq").over(tot))
            .withColumn("rn", F.row_number().over(w)))


def lemma_stats(tokens: DataFrame) -> DataFrame:
    """(form_norm, upos, lemma, freq, conf, rn) — per-(form, tag) lemma
    distribution. ``tokens`` needs columns form, upos, lemma."""
    counts = (tokens.select(F.lower("form").alias("form_norm"), "upos",
                            F.lower("lemma").alias("lemma"))
              .groupBy("form_norm", "upos", "lemma")
              .agg(F.count(F.lit(1)).alias("freq")))
    w = Window.partitionBy("form_norm", "upos").orderBy(F.desc("freq"), "lemma")
    tot = Window.partitionBy("form_norm", "upos")
    return (counts
            .withColumn("conf", F.col("freq") / F.sum("freq").over(tot))
            .withColumn("rn", F.row_number().over(w)))


def build_corpus_dict(tokens: DataFrame, min_conf: float = 0.0):
    """Run both aggregations and collect the argmax rows into the plain
    dicts the model artifact broadcasts: ``dict_tag[form_norm] -> upos``
    and ``form_upos_lemma["form⊕upos"] -> lemma``.

    The collect is safe by construction: argmax rows are bounded by the
    corpus *vocabulary*, not its token count.
    """
    from morra_spark.operators.lemmatizer import SEP

    best_tag = (tag_stats(tokens)
                .filter((F.col("rn") == 1) & (F.col("conf") >= min_conf))
                .select("form_norm", "upos").collect())
    best_lemma = (lemma_stats(tokens)
                  .filter((F.col("rn") == 1) & (F.col("conf") >= min_conf))
                  .select("form_norm", "upos", "lemma").collect())
    dict_tag = {r.form_norm: r.upos for r in best_tag}
    form_upos_lemma = {f"{r.form_norm}{SEP}{r.upos}": r.lemma for r in best_lemma}
    return dict_tag, form_upos_lemma
