"""A16 autotrain — hyperparameter/seed sweep keeping the best dev score.

Re-expresses the capability of morra's ``autotrain`` wrapper
([PK] morra/__init__.py → autotrain, SURVEY.md §2 A16: sweep
hyperparameters/seeds, keep the model with the best held-out score)
Spark-first instead of as a sequential driver loop:

* the **dev split is deterministic by conversation** (crc32 of conv_id),
  so train/dev never share a conversation and the split is reproducible
  across runs and cluster sizes;
* every *training* config (epochs × shuffle-seed) is independent, so the
  sweep runs as an embarrassingly-parallel Spark job — gold tokens are
  broadcast once, ``sc.parallelize(configs, len(configs))`` gives one
  task per config, and each task returns only (config, dev metrics),
  never the multi-MB model. On a real cluster this is a |grid|-way
  parallel sweep with zero shuffle and O(gold) broadcast traffic;
* the serve-time **mode switches** (``pos_mode`` ∈ {level-1, two_pass,
  voting}, A8; ``ner_mode`` ∈ {joint, combine}, A12) need no retraining
  — each trained bundle is scored under every mode combination on dev,
  so the sweep explores |train grid| × |mode grid| configurations while
  paying only |train grid| trainings;
* the winning config is retrained on the driver (training is
  deterministic given (epochs, seed), so this reproduces the winning
  weights exactly) and stamped with its dev metrics in ``model.meta``.

Dev scoring runs the REAL inference cascade (``tagger._run_cascade`` —
the same code the ``mapInPandas`` stage executes), not a training-time
approximation, so the selected config is the one that actually serves
best.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

from morra_spark.fixtures import hash_str
from morra_spark.grammar import Lexicon

# training grid: epoch counts × shuffle seeds. Mode switches are scored
# per trained bundle (see module docstring), not trained separately.
DEFAULT_TRAIN_GRID = {"epochs": (3, 5), "seed": (42, 1)}
DEFAULT_POS_MODES = (None, "two_pass", "voting")
DEFAULT_NER_MODES = (None, "combine")


def _sequence_layout(gold: pd.DataFrame):
    """Sorted gold rows → (gold, seq_ids, starts) with one sequence per
    (conv_id, turn_idx) — the flat token layout the cascade consumes."""
    gold = gold.sort_values(["conv_id", "turn_idx", "token_id"],
                            kind="stable").reset_index(drop=True)
    seq_key = gold["conv_id"].astype(str) + "\x1f" + gold["turn_idx"].astype(str)
    seq_change = np.ones(len(gold), bool)
    seq_change[1:] = seq_key.to_numpy()[1:] != seq_key.to_numpy()[:-1]
    seq_ids = np.cumsum(seq_change) - 1
    starts = np.concatenate([np.nonzero(seq_change)[0], [len(gold)]])
    return gold, seq_ids, starts


def split_dev(gold: pd.DataFrame, dev_frac: float = 0.2):
    """Deterministic conversation-level train/dev split (crc32 bucket)."""
    bucket = gold["conv_id"].map(lambda c: hash_str(str(c)) % 1000)
    is_dev = bucket < int(dev_frac * 1000)
    return gold[~is_dev.to_numpy()], gold[is_dev.to_numpy()]


def eval_token_accuracy(model, gold: pd.DataFrame) -> dict[str, float]:
    """Serve-path dev metrics: run the real cascade on gold forms and
    score upos / lemma / ne token accuracy (A13's token_accuracy, but
    in-process so sweep tasks need no SparkSession)."""
    from morra_spark.operators.tagger import _run_cascade

    if not len(gold):
        return {"pos": 0.0, "lemma": 0.0, "ne": 0.0}
    gold, seq_ids, starts = _sequence_layout(gold)
    forms_list = gold["form"].astype(str).tolist()
    n = len(gold)
    upos, lemma, ne, _ = _run_cascade(model, forms_list, seq_ids, starts,
                                      n, triples_only=True)
    return {
        "pos": float((upos == gold["upos"].to_numpy()).mean()),
        "lemma": float((lemma == gold["lemma"].to_numpy()).mean()),
        "ne": float((ne == gold["ne"].to_numpy()).mean()),
    }


def _score(metrics: dict[str, float]) -> float:
    """Scalar selection score: POS and NER drive triple P/R equally
    (subjects/objects come from NER spans, predicates from POS verb
    heads — SURVEY.md §4.3); lemma is rule-based and config-invariant
    but kept as a low-weight tiebreaker."""
    return 0.45 * metrics["pos"] + 0.45 * metrics["ne"] + 0.1 * metrics["lemma"]


def _eval_one_config(cfg: dict, gold_train: pd.DataFrame,
                     gold_dev: pd.DataFrame, lex_seed: int,
                     pos_modes, ner_modes) -> list[dict]:
    """Train one (epochs, seed) bundle, score every mode combo on dev.
    Pure function — runs as a Spark task in the sweep."""
    from morra_spark.train import train_models

    model = train_models(gold_train, Lexicon(seed=lex_seed),
                         epochs=cfg["epochs"], seed=cfg["seed"])
    out = []
    for pos_mode, ner_mode in itertools.product(pos_modes, ner_modes):
        model.meta["pos_mode"] = pos_mode
        model.meta["ner_mode"] = ner_mode
        m = eval_token_accuracy(model, gold_dev)
        out.append({**cfg, "pos_mode": pos_mode, "ner_mode": ner_mode,
                    "dev": m, "score": _score(m)})
    return out


def autotrain(gold: pd.DataFrame, lex_seed: int = 7, dev_frac: float = 0.2,
              train_grid: dict | None = None,
              pos_modes=DEFAULT_POS_MODES, ner_modes=DEFAULT_NER_MODES,
              spark=None):
    """Sweep, select by dev score, return (best_model, report).

    ``spark=None`` runs the sweep sequentially on the driver (tiny
    grids, tests); with a SparkSession the training configs fan out one
    per task with the gold split broadcast.
    """
    grid = train_grid or DEFAULT_TRAIN_GRID
    configs = [dict(zip(grid, vals))
               for vals in itertools.product(*grid.values())]
    gold_train, gold_dev = split_dev(gold, dev_frac)

    if spark is not None and len(configs) > 1:
        from morra_spark.session import ship_package

        ship_package(spark)  # no-op on local[*]; required on a cluster —
        # executor tasks import morra_spark.train (ADVICE r2)
        sc = spark.sparkContext
        bc = sc.broadcast((gold_train, gold_dev))
        pm, nm, ls = tuple(pos_modes), tuple(ner_modes), lex_seed
        results = [r for rs in sc.parallelize(configs, len(configs)).map(
            lambda cfg: _eval_one_config(cfg, bc.value[0], bc.value[1],
                                         ls, pm, nm)).collect()
            for r in rs]
        bc.unpersist()
    else:
        results = [r for cfg in configs
                   for r in _eval_one_config(cfg, gold_train, gold_dev,
                                             lex_seed, pos_modes, ner_modes)]

    # best score; ties break deterministically toward the simplest
    # config (fewer epochs, level-1 modes) so reruns pick identically
    def sort_key(r):
        return (-r["score"], r["epochs"], r["seed"],
                str(r["pos_mode"]), str(r["ner_mode"]))

    results.sort(key=sort_key)
    best = results[0]

    from morra_spark.train import train_models

    model = train_models(gold_train, Lexicon(seed=lex_seed),
                         epochs=best["epochs"], seed=best["seed"])
    model.meta["pos_mode"] = best["pos_mode"]
    model.meta["ner_mode"] = best["ner_mode"]
    model.meta["autotrain"] = {"best": best, "n_configs": len(results),
                               "dev_frac": dev_frac}
    return model, results


def main() -> None:
    import argparse
    import os
    import tempfile

    from morra_spark.fixtures import write_fixtures
    from morra_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=800)
    ap.add_argument("--dev-frac", type=float, default=0.2)
    ap.add_argument("--out", default="models/kg_model.pkl")
    args = ap.parse_args()

    spark = get_spark("autotrain")
    with tempfile.TemporaryDirectory() as td:
        write_fixtures(spark, td, args.convs, seed=7, shuffle_rows=False)
        gold = spark.read.parquet(f"{td}/gold_tokens").toPandas()
    model, results = autotrain(gold, dev_frac=args.dev_frac, spark=spark)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    model.save(args.out)
    best = model.meta["autotrain"]["best"]
    print(f"swept {len(results)} configs; best={best}")
    print(f"saved {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
