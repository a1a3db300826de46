"""Numerical parity of nn wrappers against torch (CPU, highest precision).

The reference model is all torch Conv/BN stacks; these tests pin the semantics
that differ between frameworks (padding geometry, transposed-conv padding,
BatchNorm running-stat updates) so converted weights are bit-compatible.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from forge_tpu.nn import (
    TorchConv,
    TorchConvTranspose,
    TorchBatchNorm,
    torch_max_pool,
)


def test_conv3d_stride2_parity():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 8, 4).astype(np.float32)
    tc = tnn.Conv3d(4, 6, 3, stride=2, padding=1)
    ref = tc(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).detach().numpy()
    ref = ref.transpose(0, 2, 3, 4, 1)
    w = tc.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(w),
                                    "bias": jnp.asarray(tc.bias.detach().numpy())}}}
    out = TorchConv(6, 3, 2, 1).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (6, 2, 2)])
def test_convtranspose2d_parity(k, s, p):
    rng = np.random.RandomState(1)
    x = rng.randn(1, 10, 10, 5).astype(np.float32)
    tt = tnn.ConvTranspose2d(5, 7, k, stride=s, padding=p)
    ref = tt(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    ref = ref.transpose(0, 2, 3, 1)
    w = tt.weight.detach().numpy().transpose(2, 3, 1, 0)  # (in,out,kh,kw)->(kh,kw,out,in)
    params = {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(w),
                                             "bias": jnp.asarray(tt.bias.detach().numpy())}}}
    out = TorchConvTranspose(7, k, s, p).apply(params, jnp.asarray(x))
    assert np.asarray(out).shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_batchnorm_parity_train_eval_and_running_stats():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 6, 6, 3).astype(np.float32)
    bn = tnn.BatchNorm2d(3)
    bn.train()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref_train = bn(xt).detach().numpy().transpose(0, 2, 3, 1)

    m = TorchBatchNorm()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    out, newvars = m.apply(variables, jnp.asarray(x), True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), ref_train, atol=1e-5)

    # running stats must match torch's (unbiased-var) update exactly
    np.testing.assert_allclose(
        np.asarray(newvars["batch_stats"]["mean"]),
        bn.running_mean.detach().numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(newvars["batch_stats"]["var"]),
        bn.running_var.detach().numpy(), atol=1e-6,
    )

    # eval mode uses the running stats
    bn.eval()
    ref_eval = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    merged = {"params": variables["params"], "batch_stats": newvars["batch_stats"]}
    out_eval = m.apply(merged, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(out_eval), ref_eval, atol=1e-5)


def test_max_pool_parity():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 9, 9, 3).astype(np.float32)
    ref = tnn.MaxPool2d(3, 2, 1)(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = torch_max_pool(jnp.asarray(x), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


@pytest.mark.slow
def test_resnet_shapes_and_stride_surgery():
    from forge_tpu.nn.resnet import ResNet50Features

    x = jnp.zeros((1, 64, 64, 3))
    m = ResNet50Features(stride_surgery=False)
    vars_ = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(vars_, x, False)
    assert out.shape == (1, 2, 2, 2048)  # /32

    m2 = ResNet50Features(stride_surgery=True)
    vars2 = m2.init(jax.random.PRNGKey(0), x, False)
    out2 = m2.apply(vars2, x, False)
    assert out2.shape == (1, 8, 8, 2048)  # /8 (reference: models/encoder.py:71-78)

    stages = m.apply(vars_, x, False, return_stages=True)
    assert [s.shape[-1] for s in stages] == [256, 512, 1024, 2048]
