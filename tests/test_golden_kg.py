"""Golden expected-output checks for EVERY rows-only query
(VERDICT r2 #4, extended round 3 from the 4 kg_* to all 9).

The driver's correctness gate records only ``spark_rows > 0`` for
queries without a SQL oracle (perceptron decode, xxhash64/float-LSH
hash families, stub media decode — none replayable in DuckDB), so a
silent regression in any of them would pass the gate. All nine are
fully deterministic — seed-42 fixtures, pinned model pickle, seeded
k-means, fixed hash families — so their exact outputs are committed
under ``tests/golden/`` and compared row-for-row here; any drift in
tokenizer, features, decoder, linking, tool alignment, minhash banding,
IVF training, or media feature extraction fails CI.

Regenerate (after an INTENTIONAL behavior change) with::

    REGEN_GOLDEN=1 python -m pytest tests/test_golden_kg.py -q

and review the golden diff like any other code change.
"""

from __future__ import annotations

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SF_DIR = "/root/testdata/sf0.001"  # the sf the file-reading queries pin
KG_QUERIES = ["kg_annotate_documents", "kg_flagship_triples",
              "kg_mention_spans", "kg_text_fidelity",
              "dedup_minhash_lsh_fast", "ann_lsh_bucketed", "ann_ivf_topk",
              "multimodal_phash_dedup", "multimodal_audio_features"]


def _canon(df) -> dict:
    """Column-sorted, row-sorted, JSON-stable representation (mirrors the
    driver's order-insensitive compare)."""
    cols = sorted(df.columns)
    rows = [[row[c] for c in cols] for row in df.collect()]
    rows = json.loads(json.dumps(rows, default=str))  # normalize types
    rows.sort(key=json.dumps)
    return {"columns": cols, "rows": rows}


@pytest.mark.parametrize("name", KG_QUERIES)
def test_kg_golden(spark, name):
    import __spark_entry__ as E

    got = _canon(E.queries()[name](spark, SF_DIR))
    path = os.path.join(GOLDEN_DIR, f"{name}.json")
    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(got, f, indent=1)
            f.write("\n")
    with open(path) as f:
        want = json.load(f)
    assert got["columns"] == want["columns"]
    assert got["rows"] == want["rows"]
