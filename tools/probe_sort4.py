"""Banded-sort economics with REAL emit keys (host-partitioned by tile band
to simulate a Pallas bucket-partition), plus a correctness sniff on the
suspiciously-fast full-range-random sort."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

u32 = jnp.uint32


def timeit(name, f, *a, n=10):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:52s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
          flush=True)
    return o


def main():
    K = 2_621_440
    rng = np.random.default_rng(0)

    # Correctness sniff on the "fast" random sort.
    sort1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1,
                                           is_stable=False))
    npk = rng.integers(0, 1 << 32, size=K, dtype=np.uint32)
    out = np.asarray(timeit("np-random full-range key only", sort1,
                            jnp.asarray(npk)))
    ok = bool(np.all(np.diff(out.astype(np.int64)) >= 0))
    same = bool(np.array_equal(np.sort(npk), out))
    print(f"  fast-sort output sorted={ok} exact-multiset={same}")

    # Real emit keys + payloads.
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.ops.rasterizer import preprocess as pp
    from gs2mesh_tpu.ops.rasterizer.emit import (
        _build_tables, _bisect_right, build_feat9, emission_decode_pallas)
    from __graft_entry__ import _scene

    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=K)
    prep = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))(*args)
    feat9 = build_feat9(prep)
    ctable, _, num_pairs, _, nb128 = jax.jit(
        lambda f9: _build_tables(f9, prep.depths, prep.rect,
                                 prep.tiles_touched, cfg))(feat9)
    C = K // 128
    chunk0 = (jnp.arange(C, dtype=jnp.int32) * 128).astype(jnp.float32)
    r_start = _bisect_right(ctable[:, 1], chunk0) - 1
    blk = jnp.clip(jnp.maximum(r_start, 0) // 128, 0, nb128 - 1)
    cols = jax.jit(lambda ct, b, npz: emission_decode_pallas(
        ct, b, npz, W, H, cfg))(ctable, blk, num_pairs)
    rkey = np.asarray(cols[0])
    rpls = [np.asarray(c).view(np.uint32) for c in cols[1:]]

    sort7 = jax.jit(lambda k, *p: jax.lax.sort((k,) + p, num_keys=1,
                                               is_stable=False))
    timeit("real key+6 global", sort7, jnp.asarray(rkey),
           *[jnp.asarray(p) for p in rpls])

    # Host-partition real pairs into B equal-count tile bands.
    for B in (8, 16, 32):
        order = np.argsort(rkey, kind="stable")
        ks = rkey[order]
        # equal-count band boundaries on tile granularity
        tb = int(541 + 1).bit_length()
        tile_of = (ks >> (32 - tb)).astype(np.int64)
        cuts = [0]
        for b in range(1, B):
            tgt = b * K // B
            # advance to a tile boundary at/after tgt
            t = tile_of[min(tgt, K - 1)]
            idx = np.searchsorted(tile_of, t + 1)
            cuts.append(min(idx, K))
        cuts.append(K)
        counts = np.diff(cuts)
        cap = int(max(counts))
        cap = -(-cap // 128) * 128
        kb = np.full((B, cap), 0xFFFFFFFF, np.uint32)
        pb = [np.zeros((B, cap), np.uint32) for _ in range(6)]
        for b in range(B):
            # band rows in EMISSION order (as a partition kernel would emit)
            sel = np.sort(order[cuts[b]:cuts[b + 1]])
            kb[b, :len(sel)] = rkey[sel]
            for j in range(6):
                pb[j][b, :len(sel)] = rpls[j][sel]

        sortb = jax.jit(lambda k, *p: jax.lax.sort(
            (k,) + p, num_keys=1, is_stable=False, dimension=1))
        timeit(f"real key+6 banded B={B} cap={cap} "
               f"(slack {B * cap / K:.2f}x)",
               sortb, jnp.asarray(kb), *[jnp.asarray(p) for p in pb])


if __name__ == "__main__":
    main()
