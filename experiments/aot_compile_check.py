"""AOT-compile every Pallas kernel against the LOCAL libtpu Mosaic toolchain.

No TPU device or relay needed: a topology description drives the same
compiler the chip uses, so Mosaic layout/lowering bugs surface on the CPU
host in seconds instead of wedging the hosted relay (which round 4's outage
showed can take the whole environment down). Run before flipping any kernel
default or shipping kernel changes:

    env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
        JAX_PLATFORMS=cpu TPU_ACCELERATOR_TYPE=v5litepod-4 \
        TPU_WORKER_HOSTNAMES=localhost python experiments/aot_compile_check.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, PartitionSpec, NamedSharding


def main():
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    mesh = Mesh(np.array(topo.devices)[:1], ("x",))
    s = NamedSharding(mesh, PartitionSpec())

    def sds(shape, dt=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dt, sharding=s)

    from forge_tpu.ops.affine_resample import (
        affine_resample_pallas, affine_resample_pallas_bwd)
    from forge_tpu.ops.ray_march_pallas import (
        render_volume_pallas, render_volume_pallas_bwd)

    S, N = 32, 4
    jax.jit(lambda a, b, c: affine_resample_pallas(a, b, c, interpret=False),
            in_shardings=(s,) * 3, out_shardings=s).lower(
        sds((N, S, S, S, 128)), sds((N, 3, 3)), sds((N, 3))).compile()
    print("rotate fwd OK", flush=True)
    jax.jit(lambda a, b, c, g: affine_resample_pallas_bwd(
        a, b, c, g, interpret=False), in_shardings=(s,) * 4).lower(
        sds((N, S, S, S, 128)), sds((N, 3, 3)), sds((N, 3)),
        sds((N, S, S, S, 128))).compile()
    print("rotate bwd OK", flush=True)

    B, D, img, n = 10, 64, 128, 64
    jax.jit(lambda f, d, K, R, t: render_volume_pallas(
        f, d, K, R, t, img, n, 0.5, 2.0, 1.0, interpret=False),
        in_shardings=(s,) * 5).lower(
        sds((B, D, D, D, 16)), sds((B, D, D, D, 1)), sds((B, 3, 3)),
        sds((B, 3, 3)), sds((B, 3))).compile()
    print("renderer fwd OK", flush=True)
    jax.jit(lambda f, d, K, R, t, g: render_volume_pallas_bwd(
        f, d, K, R, t, g, img, n, 0.5, 2.0, 1.0, interpret=False),
        in_shardings=(s,) * 6).lower(
        sds((B, D, D, D, 16)), sds((B, D, D, D, 1)), sds((B, 3, 3)),
        sds((B, 3, 3)), sds((B, 3)), sds((B, img, img, 18))).compile()
    print("renderer bwd OK", flush=True)
    # grouped rendering (cams_per_volume) as used by the model
    jax.jit(lambda f, d, K, R, t: render_volume_pallas(
        f, d, K, R, t, img, n, 0.5, 2.0, 1.0, interpret=False,
        cams_per_volume=5), in_shardings=(s,) * 5).lower(
        sds((2, D, D, D, 16)), sds((2, D, D, D, 1)), sds((10, 3, 3)),
        sds((10, 3, 3)), sds((10, 3))).compile()
    print("renderer fwd grouped OK", flush=True)

    # HS8 h-shift-copy variants (flagship D=64 only)
    import forge_tpu.ops.ray_march_pallas as RP
    old = RP.HS8
    RP.HS8 = True
    try:
        jax.jit(lambda f, d, K, R, t: render_volume_pallas(
            f, d, K, R, t, img, n, 0.5, 2.0, 1.0, interpret=False,
            cams_per_volume=10), in_shardings=(s,) * 5).lower(
            sds((1, D, D, D, 16)), sds((1, D, D, D, 1)), sds((10, 3, 3)),
            sds((10, 3, 3)), sds((10, 3))).compile()
        print("renderer fwd HS8 OK", flush=True)
        jax.jit(lambda f, d, K, R, t, g: render_volume_pallas_bwd(
            f, d, K, R, t, g, img, n, 0.5, 2.0, 1.0, interpret=False,
            cams_per_volume=10), in_shardings=(s,) * 6).lower(
            sds((1, D, D, D, 16)), sds((1, D, D, D, 1)), sds((10, 3, 3)),
            sds((10, 3, 3)), sds((10, 3)),
            sds((10, img, img, 18))).compile()
        print("renderer bwd HS8 OK", flush=True)
    finally:
        RP.HS8 = old
    print("ALL KERNELS AOT-COMPILE OK")


if __name__ == "__main__":
    main()
