"""HF Timesformer converter parity + classification engine tests."""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from dino_video_summarization_transformer_tpu.engine.classification import (  # noqa: E402
    hf_video_preprocess, make_classifier_fn)
from dino_video_summarization_transformer_tpu.models import convert  # noqa: E402
from dino_video_summarization_transformer_tpu.models.timesformer import (  # noqa: E402
    TimeSformerConfig)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import TimesformerConfig, TimesformerForVideoClassification

    hf_cfg = TimesformerConfig(
        image_size=32, patch_size=16, num_frames=4, hidden_size=48,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=192,
        num_labels=5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    torch.manual_seed(0)
    hf_model = TimesformerForVideoClassification(hf_cfg).eval()
    with torch.no_grad():
        # randomize zero-initialized embeddings for a meaningful check
        hf_model.timesformer.embeddings.cls_token.normal_(std=0.02)
        hf_model.timesformer.embeddings.position_embeddings.normal_(std=0.02)
        hf_model.timesformer.embeddings.time_embeddings.normal_(std=0.02)

    jcfg = TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=48, depth=2, num_heads=4,
        num_frames=4, num_classes=5)
    params = convert.convert_hf_timesformer(
        {k: v.numpy() for k, v in hf_model.state_dict().items()}, jcfg)
    return hf_model, params, jcfg


def test_hf_converter_forward_parity(hf_pair):
    hf_model, params, jcfg = hf_pair
    rng = np.random.RandomState(0)
    pixel_values = rng.randn(2, 4, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = hf_model(torch.from_numpy(pixel_values)).logits.numpy()
    clf = make_classifier_fn(params, jcfg)
    got = np.asarray(clf(jnp.asarray(pixel_values)))
    np.testing.assert_allclose(got, expected, atol=3e-5, rtol=1e-4)


def test_hf_preprocess_matches_processor():
    from transformers import VideoMAEImageProcessor

    proc = VideoMAEImageProcessor(
        image_mean=[0.45, 0.45, 0.45], image_std=[0.225, 0.225, 0.225])
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (3, 240, 320, 3), dtype=np.uint8)
    expected = proc(list(frames), return_tensors="np")["pixel_values"][0]
    got = hf_video_preprocess(frames)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_finetune_smoke(tmp_path):
    """One-epoch finetune on an in-memory dataset reduces shape errors to
    zero and writes the log history."""
    import jax

    from dino_video_summarization_transformer_tpu.engine.classification import (
        finetune)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer)

    jcfg = TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=48, depth=2, num_heads=4,
        num_frames=2, num_classes=3)
    params = init_timesformer(jax.random.key(0), jcfg)

    rng = np.random.RandomState(0)

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"pixel_values": rng.rand(2, 3, 32, 32).astype(np.float32),
                    "label": i % 3}

    params, hist = finetune(DS(), DS(), params, jcfg, str(tmp_path),
                            num_epochs=1, batch_size=4, warmup_steps=2,
                            num_workers=1)
    assert any("eval_loss" in e for e in hist)
    assert (tmp_path / "training_log_history.json").exists()


@pytest.mark.slow
def test_finetune_loss_trajectory(tmp_path):
    """Multi-epoch finetune on a LEARNABLE synthetic selected-frame set:
    eval loss must decrease epoch-over-epoch, and the emitted
    training_log_history.json must be key-set compatible with the
    reference's committed eval_logs/training_log_history.json (its
    1.555 -> 1.43 trend is the only committed training oracle;
    ref: timesformer_finetuning.py:61-104)."""
    import json

    import jax

    from dino_video_summarization_transformer_tpu.engine.classification import (
        finetune)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer)

    jcfg = TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=48, depth=2, num_heads=4,
        num_frames=2, num_classes=3)
    params = init_timesformer(jax.random.key(0), jcfg)

    # class-conditional means: label k shifts channel k by +/-1 — linearly
    # separable from the patch embedding, so a working AdamW step must
    # drive eval loss below ln(3)
    rng = np.random.RandomState(0)

    class DS:
        def __init__(self, n, seed):
            self.n = n
            self.rng = np.random.RandomState(seed)
            self.labels = self.rng.randint(0, 3, n)

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            y = int(self.labels[i])
            x = 0.3 * self.rng.randn(2, 3, 32, 32).astype(np.float32)
            x[:, y] += 1.0
            return {"pixel_values": x, "label": y}

    params, hist = finetune(
        DS(48, 1), DS(24, 2), params, jcfg, str(tmp_path), num_epochs=3,
        batch_size=8, lr=1e-3, warmup_steps=3, num_workers=0, log_every=2)

    evals = [e["eval_loss"] for e in hist if "eval_loss" in e]
    assert len(evals) == 3
    assert evals[-1] < evals[0], evals
    assert evals[-1] < np.log(3.0), evals  # better than chance

    # schema compatibility with the reference's committed artifact
    with open(tmp_path / "training_log_history.json") as f:
        ours = json.load(f)
    ref_path = "/root/reference/eval_logs/training_log_history.json"
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        ref_train = next(k for k in map(frozenset, ref) if "loss" in k)
        ref_eval = next(k for k in map(frozenset, ref) if "eval_loss" in k)
        ref_summary = next(k for k in map(frozenset, ref)
                           if "train_loss" in k)
        train_keys = [frozenset(e) for e in ours if "loss" in e]
        eval_keys = [frozenset(e) for e in ours if "eval_loss" in e]
        summary_keys = [frozenset(e) for e in ours if "train_loss" in e]
        assert train_keys and all(k == ref_train for k in train_keys), (
            train_keys, ref_train)
        assert eval_keys and all(k == ref_eval for k in eval_keys), (
            eval_keys, ref_eval)
        assert summary_keys == [ref_summary], (summary_keys, ref_summary)
