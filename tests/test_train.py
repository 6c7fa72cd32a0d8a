"""T6/A6: the distributed training loop — sufficient-statistics
collection, reference LR-schedule parity, grad accumulation, FGM/PGD,
ε-guarded model selection with checkpoint retention, early stop, and
the train → select → distributed-predict lifecycle."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from clinicaltransformerner_ray.pipelines.train import (
    TrainedEmissionTagger,
    collect_stats,
    entity_types_from_sentences,
    linear_warmup_lambda,
    tag_with_model,
    train,
)

# -- deterministic separable corpus: every token has exactly one label,
# and sentences are built from WELL-FORMED BIO phrases (a dangling `I-`
# is strict-false under BioEval parity even when pred == gold, because
# `_strict_match` requires a `b-` start on both sides) ----
_VOCAB = {
    "aspirin": "B-drug", "ibuprofen": "B-drug", "metformin": "B-drug",
    "sulfate": "I-drug",
    "nausea": "B-symptom", "chest": "B-symptom", "pain": "I-symptom",
    "the": "O", "patient": "O", "took": "O", "felt": "O", "and": "O",
    "daily": "O", "reported": "O", "severe": "O",
}
_PHRASES = [
    ["aspirin", "sulfate"], ["ibuprofen"], ["metformin"],
    ["chest", "pain"], ["nausea"],
    ["the"], ["patient"], ["took"], ["felt"], ["and"],
    ["daily"], ["reported"], ["severe"],
]


def _sentences(n_docs: int, doc0: int = 0) -> pa.Table:
    rows = {"doc_id": [], "sent_idx": [], "tokens": [], "labels": []}
    for d in range(n_docs):
        for s in range(3):
            toks = []
            for j in range(4):
                toks.extend(_PHRASES[(d * 7 + s * 3 + j) % len(_PHRASES)])
            rows["doc_id"].append(f"doc{doc0 + d}")
            rows["sent_idx"].append(s)
            rows["tokens"].append(toks)
            rows["labels"].append([_VOCAB[t] for t in toks])
    return pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.string()),
        "sent_idx": pa.array(rows["sent_idx"], pa.int32()),
        "tokens": pa.array(rows["tokens"], pa.list_(pa.string())),
        "labels": pa.array(rows["labels"], pa.list_(pa.string())),
    })


def _splits():
    return rd.from_arrow(_sentences(14)), rd.from_arrow(_sentences(4, 50))


def test_linear_warmup_lambda_matches_reference_formula():
    # model_utils.py:11-20: step/warmup below warmup, then linear decay
    # floored at min_lr (a MULTIPLIER floor)
    assert linear_warmup_lambda(0, 4, 20) == 0.0
    assert linear_warmup_lambda(3, 4, 20) == 0.75
    assert linear_warmup_lambda(4, 4, 20) == 1.0
    assert linear_warmup_lambda(12, 4, 20) == (20 - 12) / (20 - 4)
    assert linear_warmup_lambda(20, 4, 20, min_lr=1e-6) == 1e-6
    assert linear_warmup_lambda(500, 4, 20, min_lr=1e-6) == 1e-6
    # degenerate guards (max(1, .) in the reference)
    assert linear_warmup_lambda(0, 0, 1) == 1.0


def test_train_learns_selects_and_retains_checkpoints(ray_session, tmp_path):
    train_ds, dev_ds = _splits()
    mdir = str(tmp_path / "model")
    res = train(train_ds, dev_ds, entity_types=["drug", "symptom"],
                num_train_epochs=8, model_dir=mdir,
                max_num_checkpoints=2)
    assert res.best_score == 1.0
    # loss decreases from the first epoch to the last
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]
    # eval_loss drops too
    assert res.history[-1]["eval_loss"] < res.history[0]["eval_loss"]
    # artifacts: frozen vocab + retained checkpoints (A7: top-k by step)
    assert json.load(open(os.path.join(mdir, "label2idx.json")))["O"] == 3
    from clinicaltransformerner_ray.state.artifacts import (
        checkpoint_files, load_latest_checkpoint)

    files = checkpoint_files(mdir)
    assert 1 <= len(files) <= 2
    payload, path = load_latest_checkpoint(mdir)
    assert payload["step"] == res.best_step
    assert payload["W"].shape == res.W.shape
    # improvements are monotone under the eps guard
    scores = [h["best_score"] for h in res.history]
    assert scores == sorted(scores)


def test_stats_and_training_are_block_split_invariant(ray_session):
    train_ds, dev_ds = _splits()
    from clinicaltransformerner_ray.labels import build_label_vocab

    vocab = build_label_vocab(["drug", "symptom"])
    ref = None
    for parts in (1, 3, 7):
        N, Y = collect_stats(train_ds.repartition(parts), vocab,
                             n_buckets=512, n_micro=4)
        if ref is None:
            ref = (N, Y)
        else:
            np.testing.assert_array_equal(ref[0], N)
            np.testing.assert_array_equal(ref[1], Y)
    # full training: bitwise-identical weights across splits
    r1 = train(train_ds.repartition(2), dev_ds,
               entity_types=["drug", "symptom"], num_train_epochs=3,
               steps_per_epoch=2, n_buckets=512)
    r2 = train(train_ds.repartition(5), dev_ds,
               entity_types=["drug", "symptom"], num_train_epochs=3,
               steps_per_epoch=2, n_buckets=512)
    np.testing.assert_array_equal(r1.W, r2.W)
    np.testing.assert_array_equal(r1.b, r2.b)


def test_split_is_dev_single_pass_matches_presplit(ray_session):
    """The one-pass `split_is_dev` route (collect_stats_and_dev: split
    inside the block, driver-sorted dev) must be BITWISE identical to
    pre-filtering the same rows into two Datasets — weights, history
    and dev selection — across several block splits."""
    full = rd.from_arrow(_sentences(18))

    def is_dev(uniq):
        return np.asarray([int(u[3:]) % 5 == 0 for u in uniq], dtype=bool)

    def side(dev):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(ids.astype(str), return_inverse=True)
            m = is_dev(uniq)[inv]
            return batch.filter(pa.array(m if dev else ~m))
        return f

    kw = dict(entity_types=["drug", "symptom"], num_train_epochs=3,
              steps_per_epoch=2, n_buckets=512, learning_rate=0.5)
    ref = train(full.map_batches(side(False), batch_format="pyarrow"),
                full.map_batches(side(True), batch_format="pyarrow"),
                **kw)
    for parts in (1, 4):
        got = train(full.repartition(parts), split_is_dev=is_dev, **kw)
        np.testing.assert_array_equal(ref.W, got.W)
        np.testing.assert_array_equal(ref.b, got.b)
        assert ref.best_step == got.best_step
        assert ref.history == got.history


def test_train_requires_exactly_one_dev_source(ray_session):
    full = rd.from_arrow(_sentences(4))
    with pytest.raises(ValueError):
        train(full, entity_types=["drug", "symptom"])
    with pytest.raises(ValueError):
        train(full, full, split_is_dev=lambda u: np.zeros(len(u), bool),
              entity_types=["drug", "symptom"])


def test_grad_accumulation_steps_the_optimizer_correctly(ray_session):
    train_ds, dev_ds = _splits()
    res = train(train_ds, dev_ds, entity_types=["drug", "symptom"],
                num_train_epochs=4, steps_per_epoch=2,
                gradient_accumulation_steps=3)
    # optimizer steps = steps_per_epoch per epoch, not micro count
    assert res.global_step == 2 * 4
    assert res.best_score == 1.0


@pytest.mark.parametrize("method", ["fgm", "pgd"])
def test_adversarial_training_is_deterministic_and_learns(
        ray_session, method):
    train_ds, dev_ds = _splits()
    kw = dict(entity_types=["drug", "symptom"], num_train_epochs=6,
              adversarial=method, n_buckets=512)
    r1 = train(train_ds, dev_ds, **kw)
    r2 = train(train_ds, dev_ds, **kw)
    np.testing.assert_array_equal(r1.W, r2.W)
    assert r1.best_score == 1.0
    # adversarial training changes the trajectory vs plain
    r0 = train(train_ds, dev_ds, entity_types=["drug", "symptom"],
               num_train_epochs=6, n_buckets=512)
    assert not np.array_equal(r0.W, r1.W)


def test_unknown_adversarial_method_raises(ray_session):
    train_ds, dev_ds = _splits()
    with pytest.raises(RuntimeError, match="unrecognized method"):
        train(train_ds, dev_ds, entity_types=["drug", "symptom"],
              num_train_epochs=1, adversarial="freelb")


def test_early_stop_counter_semantics(ray_session):
    # lr=0: no step ever improves the 0.0 score -> early_stop epochs run
    train_ds, dev_ds = _splits()
    res = train(train_ds, dev_ds, entity_types=["drug", "symptom"],
                num_train_epochs=10, learning_rate=0.0, early_stop=3)
    assert res.stopped_early
    assert len(res.history) == 3  # one per-epoch eval, then break


def test_resume_vocab_guard(ray_session):
    train_ds, dev_ds = _splits()
    from clinicaltransformerner_ray.labels import build_label_vocab

    other = build_label_vocab(["procedure", "symptom"])
    with pytest.raises(ValueError, match="label2idx"):
        train(train_ds, dev_ds, entity_types=["drug", "symptom"],
              num_train_epochs=1, resume_label2idx=other)


def test_entity_types_discovery(ray_session):
    train_ds, _ = _splits()
    assert entity_types_from_sentences(train_ds) == ["drug", "symptom"]


def test_trained_model_distributed_predict_matches_gold(ray_session):
    train_ds, dev_ds = _splits()
    res = train(train_ds, dev_ds, entity_types=["drug", "symptom"],
                num_train_epochs=8)
    assert res.best_score == 1.0
    tagged = tag_with_model(dev_ds, res.payload()).take_all()
    assert len(tagged) == dev_ds.count()
    for row in tagged:
        assert row["labels"] == [_VOCAB[t] for t in row["tokens"]]


def test_trained_mention_tagger_extracts_gold_spans(ray_session):
    """Train -> detect_mentions_trained closes the predict lifecycle:
    span extraction over raw turn text with the trained checkpoint
    recovers exactly the gold phrases; unseen tokens fall back to O via
    the M8 system-label fix (all-zero bucket column argmaxes to PAD)."""
    import ray.data as rd

    from clinicaltransformerner_ray.pipelines.train import (
        detect_mentions_trained)

    train_ds, dev_ds = _splits()
    res = train(train_ds, dev_ds, entity_types=["drug", "symptom"],
                num_train_epochs=8)
    assert res.best_score == 1.0
    turns = rd.from_arrow(pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text": pa.array([
            "the patient took aspirin sulfate and felt chest pain",
            "unseenword another ibuprofen",
            "",
        ], pa.string()),
    }))
    out = detect_mentions_trained(turns, res.payload()).take_all()
    spans = {(r["conv_id"], r["turn_idx"], r["surface"], r["type"])
             for r in out}
    assert spans == {
        ("c1", 0, "aspirin sulfate", "drug"),
        ("c1", 0, "chest pain", "symptom"),
        ("c1", 1, "ibuprofen", "drug"),
    }
    # char offsets index the source text exactly
    for r in out:
        text = ("the patient took aspirin sulfate and felt chest pain"
                if r["turn_idx"] == 0 else "unseenword another ibuprofen")
        assert text[r["start"]:r["end"]] == r["surface"]


def test_tagger_handles_empty_block():
    # direct actor call on an empty-token batch (no Ray needed)
    payload = {"W": np.zeros((4, 8)), "b": np.zeros(4),
               "label2idx": {"PAD": 0, "CLS": 1, "X": 2, "O": 3},
               "n_buckets": 8, "step": 0}
    stage = TrainedEmissionTagger(payload)
    out = stage(pa.table({
        "doc_id": pa.array(["d"], pa.string()),
        "sent_idx": pa.array([0], pa.int32()),
        "tokens": pa.array([[]], pa.list_(pa.string())),
        "labels": pa.array([[]], pa.list_(pa.string())),
    }))
    assert out.column("labels").to_pylist() == [[]]


SF = "/root/testdata/sf0.001"


def test_tag_turn_labels_equals_join_path(ray_session):
    """The emit="labels" tagger route is bit-identical to the
    detect_mentions -> labels_from_mentions re-join, for every turn
    (empty turns included), with zero wide ops."""
    from clinicaltransformerner_ray.pipelines.eval_pipeline import (
        labels_from_mentions)
    from clinicaltransformerner_ray.pipelines.kg import (
        detect_mentions, tag_turn_labels)
    from clinicaltransformerner_ray.sources.turns import (
        load_alias_rows, read_turns)
    from clinicaltransformerner_ray.synth import ensure_synth

    ensure_synth(SF)
    ar = load_alias_rows(SF)
    tu = read_turns(SF, columns=["conv_id", "turn_idx", "text"])
    key = ["conv_id", "turn_idx"]
    a = (tag_turn_labels(tu, ar).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (labels_from_mentions(detect_mentions(tu, ar), tu,
                              emit_tokens=True).to_pandas()
         .sort_values(key).reset_index(drop=True))
    assert len(a) == len(b) == tu.count()
    assert a["conv_id"].tolist() == b["conv_id"].tolist()
    for x, y in zip(a["labels"], b["labels"]):
        assert list(x) == list(y)
    for x, y in zip(a["tokens"], b["tokens"]):
        assert list(x) == list(y)


def test_train_stats_oracle_parity(ray_session):
    """train_stats (the T6 distributed pass) matches its DuckDB oracle
    bit for bit at sf0.001 — same check the driver runs at sf0.01."""
    import duckdb

    import __ray_entry__ as E

    rdf = (E.queries()["train_stats"](SF).to_pandas()
           .sort_values("key").reset_index(drop=True))
    odf = (duckdb.connect().execute(E.oracle_sql_for(SF)["train_stats"])
           .df().sort_values("key").reset_index(drop=True))
    assert len(rdf) == len(odf) > 0
    assert rdf["key"].tolist() == odf["key"].astype("int64").tolist()
    assert rdf["n"].tolist() == odf["n"].astype("int64").tolist()


def test_cli_train(ray_session, tmp_path):
    # reference shell shape: train.txt/dev.txt in --data-dir
    data = tmp_path / "data"
    data.mkdir()
    for split, n in (("train", 10), ("dev", 3)):
        tbl = _sentences(n, 0 if split == "train" else 90)
        lines = []
        for i in range(len(tbl)):
            for w, lb in zip(tbl.column("tokens")[i].as_py(),
                             tbl.column("labels")[i].as_py()):
                lines.append(f"{w} {lb}")
            lines.append("")
        (data / f"{split}.txt").write_text("\n".join(lines))
    mdir = str(tmp_path / "model")
    from clinicaltransformerner_ray.cli import main

    main(["train", "--data-dir", str(data), "--new-model-dir", mdir,
          "--num-train-epochs", "6", "--n-buckets", "512"])
    from clinicaltransformerner_ray.state.artifacts import (
        load_label_vocab, load_latest_checkpoint)

    vocab = load_label_vocab(mdir)
    assert set(vocab) >= {"B-drug", "I-drug", "B-symptom", "I-symptom"}
    payload, _ = load_latest_checkpoint(mdir)
    assert payload["W"].shape[0] == len(vocab)

    # predict round trip with the trained checkpoint: the full surface
    # runs end to end and writes the brat parquet sink.  (sf tokens
    # HASH-COLLIDE into trained buckets at n_buckets=512, so some
    # mentions do come out — hash-feature models confabulate on OOV
    # collisions; the M8 fix only covers untouched all-zero buckets.)
    out = str(tmp_path / "pred")
    main(["predict", "--sf-dir", SF, "--output-dir", out,
          "--format", "brat", "--trained-model-dir", mdir])
    import glob

    import pyarrow.parquet as pq_mod

    files = glob.glob(os.path.join(out, "parquet", "*.parquet"))
    assert files
    tbl = pa.concat_tables([pq_mod.read_table(f) for f in files])
    assert {"conv_id", "turn_idx", "ann"} <= set(tbl.column_names)
