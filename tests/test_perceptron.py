import numpy as np
import pandas as pd

from morra_spark.operators import features as FT
from morra_spark.operators.perceptron import PerceptronModel


def _tiny_model():
    """x→A, y→B language — learnable, used for parity/OOV tests."""
    classes = ["A", "B"]
    vocabs = {"form": {"x": 0, "y": 1},
              "prev": {"A": 0, "B": 1, "<S>": 2}}
    m = PerceptronModel.init(classes, vocabs)
    sents = [[{"form": "x"}, {"form": "y"}, {"form": "x"}, {"form": "y"}]] * 4
    gold = [["A", "B", "A", "B"]] * 4
    m.train(sents, gold, dynamic=("prev",), epochs=8, seed=1)
    return m


def test_training_learns_form_language():
    m = _tiny_model()
    feats = {"form": pd.Series(["x", "y", "y", "x"])}
    ids = FT.features_to_ids(m, feats)
    static = m.static_scores(ids, 4)
    out = m.decode_batch(static, np.array([0, 4]))
    assert [m.classes[i] for i in out] == ["A", "B", "B", "A"]


def test_decode_sequence_dependence_and_boundary_reset():
    """Hand-set prev-tag weights: <S>→A, A→B, B→A. Decode must alternate
    and restart from <S> at every sequence boundary."""
    classes = ["A", "B"]
    m = PerceptronModel.init(classes, {"prev": {"A": 0, "B": 1, "<S>": 2}})
    m.families["prev"].w = np.array(
        [[-1.0, 1.0],   # after A -> B
         [1.0, -1.0],   # after B -> A
         [1.0, -1.0],   # after <S> -> A
         [0.0, 0.0]], np.float32)
    static = np.zeros((6, 2), np.float32)
    out = m.decode_batch(static, np.array([0, 3, 6]))
    assert [m.classes[i] for i in out] == ["A", "B", "A", "A", "B", "A"]


def test_decode_batch_matches_sequential_scoring():
    """Vectorized batch decode == token-at-a-time greedy decode."""
    m = _tiny_model()
    forms = ["x", "y", "y", "x"]
    feats = {"form": pd.Series(forms)}
    ids = FT.features_to_ids(m, feats)
    static = m.static_scores(ids, 4)
    batch = m.decode_batch(static, np.array([0, 4]))

    prev = "<S>"
    seq = []
    for i in range(4):
        feat_ids = {"form": m.families["form"].id_of(forms[i]),
                    "prev": m.families["prev"].id_of(prev)}
        s = m._score_one(feat_ids)
        g = int(np.argmax(s))
        seq.append(g)
        prev = m.classes[g]
    assert batch.tolist() == seq


def test_oov_feature_maps_to_zero_row():
    m = _tiny_model()
    feats = {"form": pd.Series(["zzz"])}
    ids = FT.features_to_ids(m, feats)
    assert ids["form"][0] == len(m.families["form"].vocab)
    static = m.static_scores(ids, 1)
    assert np.allclose(static[0], m.bias)  # OOV row contributes nothing


def test_empty_batch():
    m = _tiny_model()
    out = m.decode_batch(np.zeros((0, 2), np.float32), np.array([0]))
    assert len(out) == 0


def test_prune_drops_rare_feats_keeps_predictions():
    """A15: pruning near-zero rows must not change argmax decisions."""
    import numpy as np

    from morra_spark.operators.perceptron import Family, PerceptronModel

    vocab = {"big": 0, "tiny": 1, "zero": 2}
    w = np.array([[2.0, -1.0], [1e-6, -1e-6], [0.0, 0.0], [0.0, 0.0]],
                 np.float32)  # last row = OOV
    m = PerceptronModel(classes=["A", "B"],
                        families={"f": Family(vocab=dict(vocab), w=w.copy())},
                        bias=np.zeros(2, np.float32))
    ids_before = np.array([m.families["f"].id_of(x) for x in ["big", "tiny", "zero", "oov"]])
    before = m.static_scores({"f": ids_before}, 4).argmax(axis=1)

    dropped = m.prune(abs_thresh=1e-3)
    assert dropped["f"] == 2
    assert set(m.families["f"].vocab) == {"big"}
    ids_after = np.array([m.families["f"].id_of(x) for x in ["big", "tiny", "zero", "oov"]])
    after = m.static_scores({"f": ids_after}, 4).argmax(axis=1)
    assert (before == after).all()


def test_reverse_decode_uses_right_context():
    """A8: the backward model's greedy pass must consume the RIGHT
    neighbor's prediction (decode position order reversed)."""
    import numpy as np

    from morra_spark.operators.perceptron import Family, PerceptronModel

    # two classes; prev family makes class B follow class B; static makes
    # the LAST token strongly B, everything else neutral
    prev_vocab = {"A": 0, "B": 1, "<S>": 2}
    w_prev = np.array([[0.0, -1.0], [0.0, 5.0], [0.0, 0.0], [0.0, 0.0]],
                      np.float32)
    m = PerceptronModel(classes=["A", "B"],
                        families={"prev": Family(vocab=prev_vocab, w=w_prev)},
                        bias=np.zeros(2, np.float32))
    static = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 3.0]], np.float32)
    starts = np.array([0, 3])
    fwd = m.decode_batch(static.copy(), starts)
    bwd = m.decode_batch(static.copy(), starts, reverse=True)
    # forward: A A B (prev=A discourages B until static wins at the end)
    assert fwd.tolist() == [0, 0, 1]
    # backward: starts at the B end; prev=B (+5) pulls the rest to B
    assert bwd.tolist() == [1, 1, 1]


def test_bias_averaging_matches_trajectory_mean():
    """The averaged bias must equal the mean of the bias trajectory
    over update steps FOR EVERY class — including classes untouched
    for long stretches (code-review r5: a single shared bias timestamp
    skipped their interval credit; family weights always had per-cell
    timestamps)."""
    import numpy as np

    from morra_spark.operators.perceptron import PerceptronModel

    m = PerceptronModel.init(["a", "b", "c"], {"f": {"x": 0}})
    fid = {"f": 0}
    # class 2 ('c') is touched once early, then never again — exactly
    # the pattern the scalar timestamp got wrong
    script = [(2, 0), (0, 1), (1, 0), (0, 1), (1, 0), (0, 1), (1, 0)]
    traj = []
    for truth, guess in script:
        # the averaging convention is over the PRE-update weights (the
        # predictor actually used at each step), so record before
        traj.append(m.bias.astype(np.float64).copy())
        m.n_updates += 1
        m._update(fid, truth, guess)
    m.average()
    want = np.mean(traj, axis=0)
    assert np.allclose(m.bias, want, atol=1e-6), (m.bias, want)
    # the class untouched after its early update must carry its weight
    # for the WHOLE remaining run (the scalar-timestamp bug zeroed it)
    assert m.bias[2] > 0.5
