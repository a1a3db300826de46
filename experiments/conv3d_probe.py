"""Is XLA's native 3D convolution slow on TPU? Compare against a
depth-decomposed sum of 2D convolutions (same math).

Shapes from the ConvGRU hot path: [B, 32, 32, 32, 256] -> 256ch, 3^3 kernel.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp
from _timing import chip_time, perturb_tree


def conv3d_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def conv3d_via_2d(x, w):
    """sum_k conv2d(x shifted by k in D, w[k]) — same result, 2D lowering."""
    B, D, H, W, C = x.shape
    kd = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for k in range(kd):
        xs = xp[:, k:k + D].reshape(B * D, H, W, C)
        y = jax.lax.conv_general_dilated(
            xs, w[k], window_strides=(1, 1), padding=[(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out.reshape(B, D, H, W, -1)


def main():
    rng = np.random.RandomState(0)
    B, S, C, O = 4, 32, 256, 256
    dt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    x = jnp.asarray(rng.randn(B, S, S, S, C).astype(np.float32)).astype(dt)
    w = jnp.asarray((rng.randn(3, 3, 3, C, O) * 0.01).astype(np.float32)).astype(dt)

    # numeric check (small slice)
    a = conv3d_native(x[:1, :8].astype(jnp.float32), w.astype(jnp.float32))
    b = conv3d_via_2d(x[:1, :8].astype(jnp.float32), w.astype(jnp.float32))
    print("max dev:", float(jnp.max(jnp.abs(a - b))), flush=True)

    def rep(name, f):
        fn = jax.jit(f)
        args = [(x * (1 + 1e-6 * i),) for i in range(3)]
        print(f"{name:16s}: {chip_time(fn, args)*1e3:9.1f} ms", flush=True)

        def loss(xx):
            return jnp.sum(f(xx).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))
        print(f"{name:16s} bwd: {chip_time(g, args)*1e3:9.1f} ms", flush=True)

    rep("native conv3d", lambda xx: conv3d_native(xx, w))
    rep("2d-decomposed", lambda xx: conv3d_via_2d(xx, w))


if __name__ == "__main__":
    main()
