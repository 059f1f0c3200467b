"""Caption metric + CSV parsing tests."""

import numpy as np
import pytest

import conftest  # noqa: F401

from dino_video_summarization_transformer_tpu.engine.caption_metrics import (
    cider_score, corpus_bleu)


def test_bleu_perfect_match():
    out = corpus_bleu(["the cat sat on the mat"], [["the cat sat on the mat"]])
    assert out["bleu"] == pytest.approx(1.0)


def test_bleu_against_nltk():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    preds = ["a man is playing a guitar on stage",
             "two dogs run through the park",
             "someone slices a tomato in a kitchen"]
    refs = [["a man plays a guitar on a stage", "a musician performs live"],
            ["dogs are running in a park", "two dogs run across the grass"],
            ["a person slices a tomato", "someone cuts a tomato in a kitchen"]]
    expected = nltk_bleu([[r.split() for r in rs] for rs in refs],
                         [p.split() for p in preds])
    got = corpus_bleu(preds, refs)["bleu"]
    assert got == pytest.approx(expected, abs=1e-9)


def test_cider_ranking():
    refs = {
        "v1": ["a dog runs in the park", "a dog is running outside"],
        "v2": ["a man cooks pasta", "someone is cooking pasta in a pot"],
    }
    good = {"v1": ["a dog runs in the park"], "v2": ["a man cooks pasta"]}
    bad = {"v1": ["purple elephants fly"], "v2": ["purple elephants fly"]}
    good_score, _ = cider_score(refs, good)
    bad_score, _ = cider_score(refs, bad)
    assert good_score > bad_score
    assert bad_score == pytest.approx(0.0, abs=1e-9)


def _our_captioning_module():
    """Load the repo's captioning_evaluation.py by path — plain import can
    resolve to the reference's same-named module when /root/reference is on
    sys.path from other tests."""
    import importlib.util
    import os

    path = os.path.join(conftest.REPO_ROOT, "captioning_evaluation.py")
    spec = importlib.util.spec_from_file_location("dvst_captioning_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_caption_csv_parsing(tmp_path):
    ce = _our_captioning_module()

    p = tmp_path / "caps.csv"
    p.write_text(
        'vidA.avi "a man plays guitar</s>"\n'
        'vidB.mp4 "dogs run in a park </s>"\n')
    caps = ce.parse_captions_csv(str(p))
    assert caps == {"vidA": ["a man plays guitar"],
                    "vidB": ["dogs run in a park"]}

    a = tmp_path / "ann.csv"
    a.write_text("vidA,a man plays a guitar\nvidA,musician performs\nvidB,dogs run\n")
    truth = ce.parse_annotations_csv(str(a))
    assert truth["vidA"] == ["a man plays a guitar", "musician performs"]
    assert truth["vidB"] == ["dogs run"]


def test_captioning_end_to_end_metrics(tmp_path):
    ce = _our_captioning_module()

    caps = tmp_path / "captions_adaptive.csv"
    caps.write_text(
        'v1.avi "a dog runs in the park</s>"\n'
        'v2.avi "a man cooks pasta</s>"\n')
    ann = tmp_path / "annotations.csv"
    ann.write_text(
        "v1,a dog runs in the park\nv1,a dog is running outside\n"
        "v2,a man cooks pasta\nv2,someone cooks pasta\n")

    class A:
        captions = str(caps)
        annotations = str(ann)
        test_split = ""
        bert_model = ""

    out = ce.main("adaptive", None, args=A())
    assert out["bleu"] == pytest.approx(1.0)
    assert out["cider"] > 5.0  # perfect matches score near 10
