"""Micro-benchmarks of the XLA primitives that bound rasterizer plumbing.

Measures sort / gather / scatter / segment-sum cost on the live device so
binning/pack redesigns are grounded in numbers, not folklore.

Timing discipline (see memory: axon tunnel memoizes identical dispatches):
every op is wrapped so that iteration i's input derives from iteration
i-1's output — the chain forces real execution each step.
"""

import time

import jax
import jax.numpy as jnp

K = 1 << 22            # pair capacity used by the bench
N = 300_000            # gaussian count


def chain_time(name, step, x0, n=10):
    """step: (carry_u32_scalar, *static) -> array output; we fold the output
    back into a u32 scalar carry so every dispatch differs."""
    f = jax.jit(step)
    carry = jnp.uint32(1)
    o = f(carry)
    jax.block_until_ready(o)
    carry = jnp.reshape(o, (-1,))[0].astype(jnp.uint32) | jnp.uint32(1)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(carry)
        carry = jnp.reshape(o, (-1,))[0].astype(jnp.uint32) | jnp.uint32(1)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt * 1e3:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    u32keys = jax.random.randint(k1, (K,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    vals = jnp.arange(K, dtype=jnp.uint32)
    feat9 = jax.random.normal(k2, (K, 9), jnp.float32)
    gid = jax.random.randint(k3, (K,), 0, N, dtype=jnp.int32)
    perm = jax.random.permutation(k1, K).astype(jnp.int32)
    sortedperm = jnp.sort(perm)
    tiles = jax.random.randint(k2, (K,), 0, 2160, dtype=jnp.int32)
    table = feat9[:N]
    feat9t = feat9.T.copy()  # (9, K)

    def mix(c):
        return u32keys ^ c

    chain_time("sort K u32 key only",
               lambda c: jax.lax.sort((mix(c),), num_keys=1)[0], None)
    chain_time("sort K u32 key + 1 val",
               lambda c: jax.lax.sort((mix(c), vals), num_keys=1)[0], None)
    chain_time("sort K key + 1 val STABLE",
               lambda c: jax.lax.sort((mix(c), vals), num_keys=1, is_stable=True)[0], None)
    chain_time("sort K u32 key + 10 vals",
               lambda c: jax.lax.sort(
                   (mix(c), vals) + tuple(feat9[:, i] for i in range(9)),
                   num_keys=1)[0], None)
    chain_time("sort K tileid(2160 dom) + 1 val",
               lambda c: jax.lax.sort((mix(c) % 2160, vals), num_keys=1)[0], None)
    chain_time("sort N u32 key + 1 val",
               lambda c: jax.lax.sort((mix(c)[:N], vals[:N]), num_keys=1)[0], None)

    def mixi(c):
        return (perm ^ (c & jnp.uint32(0))).astype(jnp.int32)  # value-dep, same perm

    # gathers: make the INDEX depend on the carry (c&0 keeps values equal but
    # defeats memoization since the input buffer differs each dispatch).
    chain_time("gather K rows from (K,9)", lambda c: feat9[mixi(c)], None)
    chain_time("gather K rows from (K,1)", lambda c: feat9[:, :1][mixi(c)], None)
    chain_time("gather K from (N,9) table",
               lambda c: table[(gid ^ (c & jnp.uint32(0)).astype(jnp.int32))], None)
    chain_time("gather K rows (K,9) SORTED idx",
               lambda c: feat9[(sortedperm ^ (c & jnp.uint32(0)).astype(jnp.int32))], None)
    chain_time("take_along lanes (9,K)",
               lambda c: jnp.take_along_axis(
                   feat9t, (mixi(c))[None, :], axis=1), None)

    chain_time("scatter K rows (K,9) unique perm",
               lambda c: jnp.zeros_like(feat9).at[mixi(c)].set(
                   feat9, unique_indices=True, mode="drop"), None)
    chain_time("scatter K rows (K,1) unique perm",
               lambda c: jnp.zeros((K, 1), jnp.float32).at[mixi(c)].set(
                   feat9[:, :1], unique_indices=True, mode="drop"), None)
    chain_time("scatter-add K->(N,9) by gid",
               lambda c: jnp.zeros((N, 9), jnp.float32).at[
                   (gid ^ (c & jnp.uint32(0)).astype(jnp.int32))].add(feat9), None)

    sg = jnp.sort(gid)
    chain_time("segsum K->(N,9) SORTED ids",
               lambda c: jax.ops.segment_sum(
                   feat9 * (1 + 0 * c), sg, num_segments=N,
                   indices_are_sorted=True), None)
    chain_time("segsum K->(N,9) unsorted ids",
               lambda c: jax.ops.segment_sum(
                   feat9 * (1 + 0 * c), gid, num_segments=N), None)

    chain_time("cumsum K f32", lambda c: jnp.cumsum(feat9[:, 0] * (1 + 0 * c)), None)
    chain_time("cumsum (K,9) f32 axis0", lambda c: jnp.cumsum(feat9 * (1 + 0 * c), 0), None)
    chain_time("histogram 2160 bins scatter-add",
               lambda c: jnp.zeros((2160,), jnp.int32).at[
                   (tiles ^ (c & jnp.uint32(0)).astype(jnp.int32))].add(1), None)


if __name__ == "__main__":
    main()
