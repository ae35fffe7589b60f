"""Cross-batch tool-turn alignment — the custom STATEFUL streaming
operator (SURVEY.md §2 B-T4/B-U, `applyInPandasWithState`).

The per-micro-batch sink (`incremental.make_batch_writer`) aligns tool
turns within their batch only: a tool turn whose invoking content turn
landed in an EARLIER micro-batch emits nothing — the documented scope
cut. This module closes it with per-conversation keyed state:

* the stream is annotated once (mapInPandas, same cascade as batch) and
  reduced to one narrow row per turn carrying the turn's alignment
  subject = min (subj, subj_ne) over its triples, null when the turn
  emitted none — the identical rule to the batch window form
  (`pipeline.extract_triples_with_tools`) and the fixtures' gold;
* `groupBy(conv_id).applyInPandasWithState` keeps (last seen turn_idx,
  current invoking subject) per conversation — O(1) state per conv, no
  buffering of turns — and emits a `used_tool` triple for every tool
  turn whose nearest preceding content turn (in THIS or ANY earlier
  batch) carried a subject;
* state expires via event-time timeout one `state_ttl` past the
  watermark, so idle conversations cannot grow state forever (the same
  bound the windowed aggregations use);
* ordering assumption (documented, test-asserted): turns of one
  conversation arrive in non-decreasing turn_idx order ACROSS batches —
  true for append-only transcript logs; a late out-of-order turn below
  the high-water turn_idx is dropped and counted, never mis-aligned.

100 TB shape: one Python annotate stage, one hash exchange on conv_id
(the state operator's natural partitioning), tiny per-key state; the
sink appends per batch_id exactly like the stateless path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOOL_PRED = "used_tool"

ALIGN_INPUT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                      "tool string, ts timestamp, subj string, "
                      "subj_ne string")
TOOL_TRIPLE_SCHEMA = ("conv_id string, turn_idx int, subj string, "
                      "pred string, obj string, subj_ne string, "
                      "obj_ne string")
STATE_SCHEMA = "last_idx int, subj string, subj_ne string"


def turns_with_align_subject(stream: DataFrame, model_bc) -> DataFrame:
    """Annotate → one narrow row per turn: its alignment subject.

    Content turns: subj/subj_ne = the lexicographically smallest
    (subj, subj_ne) among the turn's triples (null if none — a blocker).
    Tool turns: subj null, tool name kept. Map-only, one Python stage.
    """
    from morra_spark.operators.tagger import _annotate_pdf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = model_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            out = pdf[["conv_id", "turn_idx", "role", "tool", "ts"]].copy()
            is_content = (pdf["role"] != "tool").to_numpy()
            subj = [None] * len(pdf)
            subj_ne = [None] * len(pdf)
            if is_content.any():
                ann = _annotate_pdf(pdf[is_content], model, triples_only=True)
                for pos, tris in zip(ann.index, ann["triples"]):
                    if tris:
                        s = min((t["subj"], t["subj_ne"]) for t in tris)
                        subj[pdf.index.get_loc(pos)] = s[0]
                        subj_ne[pdf.index.get_loc(pos)] = s[1]
            out["subj"] = subj
            out["subj_ne"] = subj_ne
            yield out

    return stream.mapInPandas(run, schema=ALIGN_INPUT_SCHEMA)


def _align_fn(state_ttl_ms: int):
    def align(key, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        cols = ["conv_id", "turn_idx", "subj", "pred", "obj",
                "subj_ne", "obj_ne"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        last_idx, subj, subj_ne = (state.get if state.exists
                                   else (-1, None, None))
        rows = []
        for pdf in pdfs:
            for r in pdf.sort_values("turn_idx").itertuples():
                if r.turn_idx <= last_idx:
                    continue  # out-of-order straggler: drop, never misalign
                if r.role == "tool":
                    tool = r.tool if isinstance(r.tool, str) else None
                    if subj is not None and tool:
                        rows.append((conv_id, int(r.turn_idx), subj,
                                     TOOL_PRED, tool, subj_ne, "Tool"))
                else:
                    subj = r.subj if isinstance(r.subj, str) else None
                    subj_ne = r.subj_ne if isinstance(r.subj_ne, str) else None
                last_idx = int(r.turn_idx)
        state.update((last_idx, subj, subj_ne))
        wm = state.getCurrentWatermarkMs()
        if wm > 0:
            state.setTimeoutTimestamp(wm + state_ttl_ms)
        yield pd.DataFrame(rows, columns=cols)

    return align


def aligned_tool_triples(stream: DataFrame, model_bc,
                         state_ttl: str = "1 hour",
                         delay: str = "10 minutes") -> DataFrame:
    """Streaming DataFrame of cross-batch `used_tool` triples."""
    ttl_ms = _duration_ms(state_ttl)
    # watermark goes on the stateful operator's direct input: mapInPandas
    # re-projects its columns, so a watermark placed before it would not
    # be recognized by the state store's event-time timeout tracking
    narrowed = turns_with_align_subject(stream, model_bc) \
        .withWatermark("ts", delay)
    return (narrowed.groupBy("conv_id")
            .applyInPandasWithState(_align_fn(ttl_ms),
                                    outputStructType=TOOL_TRIPLE_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.EventTimeTimeout))


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60_000,
            "minutes": 60_000, "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(n) * mult


def start_stateful_tool_alignment(spark: SparkSession, *,
                                  transcripts_path: str, out_dir: str,
                                  model_path: str, checkpoint_location: str,
                                  max_files_per_trigger: int = 1,
                                  trigger_available_now: bool = False):
    """Streaming query: transcripts → stateful alignment → idempotent
    per-batch_id parquet sink (same retry-safe layout as the stateless
    sink). Returns the StreamingQuery."""
    from morra_spark.model_artifact import KGModel
    from morra_spark.streaming.incremental import read_transcript_stream

    model = KGModel.load(model_path)
    model_bc = spark.sparkContext.broadcast(model)
    stream = read_transcript_stream(spark, transcripts_path,
                                    max_files_per_trigger)
    triples = aligned_tool_triples(stream, model_bc)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(f"{out_dir}/tool_triples/batch_id={batch_id}"))

    writer = (triples.writeStream
              .option("checkpointLocation", checkpoint_location)
              .foreachBatch(write_batch)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
