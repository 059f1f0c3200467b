"""HF Timesformer converter parity + classification engine tests."""

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
