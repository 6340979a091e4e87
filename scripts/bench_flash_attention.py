"""Benchmark the Pallas flash-attention kernels on real TPU hardware.

Times the exact small-N path, the online-softmax path, the XLA naive
reference, and the backward pass at the InternVideo2 ViT workload
(B2 H16 N2049 D88) plus a long-sequence point (N8192) the round-1 exact
kernel could not reach. Prints one JSON object per config.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import genrl_tpu.ops.pallas  # noqa: F401

fa = sys.modules["genrl_tpu.ops.pallas.flash_attention"]


def sync(x):
    # reduce on device, read back 4 bytes: block_until_ready does not reliably
    # synchronize through the remote-TPU tunnel, and a full-array readback
    # would dominate the measurement
    return float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0])))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    results = {}
    B, H, N, D = 2, 16, 2049, 88
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
               for _ in range(3))

    results["naive_xla_ms"] = timeit(fa.naive_attention, q, k, v)
    results["flash_exact_ms"] = timeit(fa.flash_attention, q, k, v)

    exact_max = fa.EXACT_MAX_N
    fa.EXACT_MAX_N = 0

    def online(q, k, v):
        return fa.flash_attention(q, k, v)

    results["flash_online_ms"] = timeit(jax.jit(online), q, k, v)

    def grad_fn(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v)),
                        argnums=(0, 1, 2))(q, k, v)

    results["flash_online_fwd_bwd_ms"] = timeit(jax.jit(grad_fn), q, k, v)
    fa.EXACT_MAX_N = exact_max

    def grad_exact(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v)),
                        argnums=(0, 1, 2))(q, k, v)

    results["flash_exact_fwd_bwd_ms"] = timeit(jax.jit(grad_exact), q, k, v)

    # long sequence (online path by natural dispatch); bf16 like a finetune
    N2 = 8192
    q2, k2, v2 = (jnp.asarray(rng.normal(size=(1, 16, N2, 88)), jnp.bfloat16)
                  for _ in range(3))
    results["flash_online_n8192_bf16_ms"] = timeit(fa.flash_attention, q2, k2, v2)

    # attention FLOPs: 2*N^2*D (scores) + 2*N^2*D (out) per head, fwd only
    flops = 4 * B * H * N * N * D
    results["flash_exact_tflops"] = flops / (results["flash_exact_ms"] / 1e3) / 1e12
    flops2 = 4 * 1 * 16 * N2 * N2 * 88
    results["flash_online_n8192_tflops"] = (
        flops2 / (results["flash_online_n8192_bf16_ms"] / 1e3) / 1e12)
    print(json.dumps({k: round(float(x), 4) for k, x in results.items()}))


if __name__ == "__main__":
    main()
