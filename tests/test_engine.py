"""Engine tests: kNN classifier parity, meters, metrics, linear probe."""

import numpy as np
import pytest

import conftest

conftest.add_reference_path()

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dino_video_summarization_transformer_tpu.engine.knn import (  # noqa: E402
    knn_classifier, l2_normalize)
from dino_video_summarization_transformer_tpu.engine.metrics import (  # noqa: E402
    accuracy, topk_accuracies, topks_correct)
from dino_video_summarization_transformer_tpu.engine.meters import (  # noqa: E402
    MetricLogger, SmoothedValue, TestMeter)


def torch_knn_oracle(train_f, train_l, test_f, test_l, k, T, num_classes):
    """Transliteration of eval_knn.py:138-178 (CPU)."""
    import torch

    train_features = torch.from_numpy(train_f).t()
    train_labels = torch.from_numpy(train_l)
    test_features = torch.from_numpy(test_f)
    test_labels = torch.from_numpy(test_l)
    top1, top5, total = 0.0, 0.0, 0
    num_test_images, num_chunks = test_labels.shape[0], 10
    imgs_per_chunk = num_test_images // num_chunks
    retrieval_one_hot = torch.zeros(k, num_classes)
    for idx in range(0, num_test_images, imgs_per_chunk):
        features = test_features[idx:min(idx + imgs_per_chunk, num_test_images), :]
        targets = test_labels[idx:min(idx + imgs_per_chunk, num_test_images)]
        batch_size = targets.shape[0]
        similarity = torch.mm(features, train_features)
        distances, indices = similarity.topk(k, largest=True, sorted=True)
        candidates = train_labels.view(1, -1).expand(batch_size, -1)
        retrieved_neighbors = torch.gather(candidates, 1, indices)
        retrieval_one_hot.resize_(batch_size * k, num_classes).zero_()
        retrieval_one_hot.scatter_(1, retrieved_neighbors.view(-1, 1), 1)
        distances_transform = distances.clone().div_(T).exp_()
        probs = torch.sum(
            retrieval_one_hot.view(batch_size, -1, num_classes)
            * distances_transform.view(batch_size, -1, 1), 1)
        _, predictions = probs.sort(1, True)
        correct = predictions.eq(targets.data.view(-1, 1))
        top1 += correct.narrow(1, 0, 1).sum().item()
        top5 += correct.narrow(1, 0, 5).sum().item()
        total += targets.size(0)
    return top1 * 100.0 / total, top5 * 100.0 / total


def test_knn_matches_reference():
    rng = np.random.RandomState(0)
    C, D = 12, 32
    centers = rng.randn(C, D).astype(np.float32) * 2
    train_l = rng.randint(0, C, 400).astype(np.int64)
    test_l = rng.randint(0, C, 120).astype(np.int64)
    train_f = l2_normalize(centers[train_l] + rng.randn(400, D).astype(np.float32))
    test_f = l2_normalize(centers[test_l] + rng.randn(120, D).astype(np.float32))

    for k, T in [(5, 0.07), (20, 0.07)]:
        exp1, exp5 = torch_knn_oracle(train_f, train_l, test_f, test_l, k, T, C)
        got1, got5 = knn_classifier(train_f, train_l, test_f, test_l, k, T,
                                    num_classes=C, num_chunks=10)
        assert got1 == pytest.approx(exp1, abs=1e-6), (k, T)
        assert got5 == pytest.approx(exp5, abs=1e-6), (k, T)


def test_topks_correct_matches_reference():
    from utils.metrics import topks_correct as ref_topks

    rng = np.random.RandomState(1)
    preds = rng.randn(50, 10).astype(np.float32)
    labels = rng.randint(0, 10, 50).astype(np.int64)
    ref = ref_topks(torch.from_numpy(preds), torch.from_numpy(labels), [1, 5])
    got = topks_correct(preds, labels, [1, 5])
    assert [float(x) for x in ref] == got


def test_accuracy_matches_reference():
    from utils.utils import accuracy as ref_acc

    rng = np.random.RandomState(2)
    out = rng.randn(64, 20).astype(np.float32)
    tgt = rng.randint(0, 20, 64).astype(np.int64)
    ref = ref_acc(torch.from_numpy(out), torch.from_numpy(tgt), topk=(1, 5))
    got = accuracy(out, tgt, topk=(1, 5))
    for r, g in zip(ref, got):
        assert float(r) == pytest.approx(g, abs=1e-4)


def test_test_meter_ensemble():
    num_videos, num_clips, num_cls = 4, 3, 5
    meter = TestMeter(num_videos, num_clips, num_cls)
    rng = np.random.RandomState(3)
    labels = rng.randint(0, num_cls, num_videos)
    all_preds = rng.rand(num_videos, num_clips, num_cls).astype(np.float32)
    # feed clips shuffled
    order = rng.permutation(num_videos * num_clips)
    for flat in order:
        vid, clip = divmod(flat, num_clips)
        clip_id = np.asarray([vid * num_clips + clip])
        meter.update_stats(all_preds[vid, clip][None], labels[[vid]], clip_id)
    stats = meter.finalize_metrics(ks=(1,))
    expected = (all_preds.sum(axis=1).argmax(axis=1) == labels).mean() * 100
    assert float(stats["top1_acc"]) == pytest.approx(expected, abs=1e-2)


def test_smoothed_value_and_logger():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.median == 3.0 and v.global_avg == 2.5 and v.max == 4
    ml = MetricLogger()
    ml.update(loss=1.0)
    ml.update(loss=3.0)
    assert ml.loss.global_avg == 2.0
    out = list(ml.log_every(range(5), print_freq=2, header="t"))
    assert out == list(range(5))


def test_linear_probe_learns():
    """Linear probe on a tiny separable problem reaches high train acc."""
    from dino_video_summarization_transformer_tpu.engine.linear import (
        make_linear_probe)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_tiny_config)

    cfg = vit_tiny_config(num_frames=2, num_classes=0, img_size=32)
    params = init_timesformer(jax.random.key(0), cfg)
    state, train_step, eval_step, epoch_lr = make_linear_probe(
        params, cfg, num_labels=2, lr=0.5, epochs=4)

    rng = np.random.RandomState(0)
    # class 0: dark clips; class 1: bright clips
    x0 = rng.rand(8, 3, 2, 32, 32).astype(np.float32) * 0.2
    x1 = rng.rand(8, 3, 2, 32, 32).astype(np.float32) * 0.2 + 0.8
    x = np.concatenate([x0, x1])
    y = np.asarray([0] * 8 + [1] * 8)

    for epoch in range(4):
        lr_t = epoch_lr(epoch)
        state, loss = train_step(state, jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(lr_t))
    logits = np.asarray(eval_step(state, jnp.asarray(x)))
    acc = (logits.argmax(1) == y).mean()
    assert acc >= 0.9, acc
