"""S3D parity vs the reference torch implementation."""

import numpy as np
import pytest

import conftest

conftest.add_reference_path()

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dino_video_summarization_transformer_tpu.models import s3d  # noqa: E402


def test_s3d_forward_parity():
    from models.s3d import S3D as TorchS3D

    torch.manual_seed(0)
    tmodel = TorchS3D(input_channel=3).eval()
    params = s3d.s3d_to_pytree(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    x = np.random.RandomState(0).randn(1, 3, 8, 64, 64).astype(np.float32)
    with torch.no_grad():
        expected = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(s3d.forward(params, jnp.asarray(x)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-3)


def test_s3d_init_shapes():
    params = s3d.init_s3d(jax.random.key(0))
    x = jnp.zeros((1, 3, 8, 64, 64))
    out = s3d.forward(params, x)
    assert out.shape[1] == 1024  # (ref: models/s3d.py:199 block5 output)
