"""Label-vocab persistence, resume keyset check, and checkpoint
retention (S8/K6/J8, S9/K5/A7) — semantics per
src/transformer_ner/task.py:75-98,135-151,259-266,563-571."""

from __future__ import annotations

import os

import pytest

from clinicaltransformerner_ray.labels import build_label_vocab
from clinicaltransformerner_ray.state.artifacts import (
    check_resume_vocab,
    checkpoint_files,
    load_label_vocab,
    load_latest_checkpoint,
    save_checkpoint,
    save_label_vocab,
    save_run_config,
)


def test_vocab_roundtrip_and_resume_check(tmp_path):
    d = str(tmp_path)
    vocab = build_label_vocab(["drug", "symptom"])
    save_label_vocab(vocab, d)
    assert load_label_vocab(d) == vocab

    # resume with same keyset (any order) -> OLD ids win
    old = {k: v for k, v in reversed(list(vocab.items()))}
    assert check_resume_vocab(vocab, old) == old

    # different size fails
    with pytest.raises(ValueError):
        check_resume_vocab(build_label_vocab(["drug"]), vocab)
    # same size, different key fails
    other = build_label_vocab(["drug", "finding"])
    with pytest.raises(ValueError, match="B-symptom"):
        check_resume_vocab(vocab, other)


def test_checkpoint_retention_numeric_sort(tmp_path):
    d = str(tmp_path)
    # steps 1..5 with latest=3: only 3,4,5 survive; then step 10 proves
    # integer (not lexicographic) ordering
    for step in [1, 2, 3, 4, 5]:
        save_checkpoint(d, step, {"step": step}, latest=3)
    names = [os.path.basename(p) for p in checkpoint_files(d)]
    assert names == ["checkpoint_3.bin", "checkpoint_4.bin",
                     "checkpoint_5.bin"]
    save_checkpoint(d, 10, {"step": 10}, latest=3)
    names = [os.path.basename(p) for p in checkpoint_files(d)]
    assert names == ["checkpoint_4.bin", "checkpoint_5.bin",
                     "checkpoint_10.bin"]
    payload, path = load_latest_checkpoint(d)
    assert payload == {"step": 10} and path.endswith("checkpoint_10.bin")


def test_checkpoint_whole_model_fallback(tmp_path):
    import pickle

    d = str(tmp_path)
    with open(os.path.join(d, "model.bin"), "wb") as f:
        pickle.dump({"whole": True}, f)
    payload, path = load_latest_checkpoint(d)
    assert payload == {"whole": True} and path.endswith("model.bin")
    with pytest.raises(FileNotFoundError):
        load_latest_checkpoint(str(tmp_path / "missing"))


def test_run_config_sidecar(tmp_path):
    p = save_run_config(str(tmp_path), model_type="bert",
                        base_model="mock")
    text = open(p).read()
    assert "model_type: bert" in text and "base_model: mock" in text


def test_tagger_accepts_persisted_vocab(tmp_path):
    """A persisted label2idx.json replaces the synthesized vocab in the
    tagger (the stored mapping's ids win), with the resume keyset
    check enforced."""
    import pyarrow as pa

    from clinicaltransformerner_ray.stages.tagger import MentionTagger

    alias_rows = [
        {"alias": "warfarin", "type": "drug", "entity_id": "E1"},
        {"alias": "headache", "type": "symptom", "entity_id": "E2"},
    ]
    vocab = build_label_vocab(["drug", "symptom"])
    # permute the dataset-label ids (keyset identical) and persist
    stored = dict(vocab)
    stored["B-drug"], stored["B-symptom"] = (stored["B-symptom"],
                                             stored["B-drug"])
    save_label_vocab(stored, str(tmp_path))
    loaded = load_label_vocab(str(tmp_path))
    batch = pa.table({
        "conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
        "text": ["patient takes warfarin for headache"],
    })
    out_stored = MentionTagger(alias_rows, label2idx=loaded,
                               noise_mod=0)(batch)
    out_plain = MentionTagger(alias_rows, noise_mod=0)(batch)
    # ids differ internally, spans identical externally
    assert out_stored.to_pydict() == out_plain.to_pydict()
    assert out_stored.num_rows == 2
    # a vocab from different types is rejected
    bad = build_label_vocab(["drug", "finding"])
    with pytest.raises(ValueError):
        MentionTagger(alias_rows, label2idx=bad)
