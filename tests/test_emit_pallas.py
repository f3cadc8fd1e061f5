"""CPU (interpret-mode) checks of the TPU-only emit machinery: the fused
Pallas emission decode and the compacted id-sorted cotangent reduction.
These are the production TPU code paths that the regular CPU test suite
would otherwise never execute."""


import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.emit import (
    DEC_S, _build_tables, _bisect_right, _emit_bwd_tpu, build_feat9,
    emission_core, emission_decode_pallas, pack2bf16, pack_rgb, stuff_ids,
    unpack_rgb)
from gs2mesh_tpu.ops.rasterizer.preprocess import preprocess
from gs2mesh_tpu.ops.rasterizer.tile_render import FEAT

from tests.scenes import look_at_camera, sphere_scene

CAM = look_at_camera((0.0, 0.0, -3.0), width=96, height=64)
CFG = RasterizerConfig(pair_capacity=128 * DEC_S * 2)   # 4096: 2 grid steps


def _scene_prep(n=400):
    s = sphere_scene(n=n)
    args = tuple(jnp.asarray(s[k]) for k in
                 ("means3d", "scales", "rotations", "opacities", "shs"))
    return preprocess(*args, CAM, 0, CFG)


def test_pallas_decode_matches_xla_emission():
    """The fused Pallas decode must produce the same sort key and packed
    payload columns as the XLA emission_core + packing path."""
    prep = _scene_prep()
    feat9 = build_feat9(prep)

    em = emission_core(feat9, prep.depths, prep.rect, prep.tiles_touched,
                       CAM.width, CAM.height, CFG)
    ids = jnp.where(em.slot_valid, em.g, (1 << 22) - 1)
    mxs_ref, mys_ref = stuff_ids(em.feat9[:, 0], em.feat9[:, 1], ids)
    p1_ref = pack2bf16(em.feat9[:, 2], em.feat9[:, 3])
    p2_ref = pack2bf16(em.feat9[:, 4], em.feat9[:, 5])
    rgb_ref = pack_rgb(em.feat9[:, 6], em.feat9[:, 7], em.feat9[:, 8])

    ctable, _, num_pairs, _, nb128 = _build_tables(
        feat9, prep.depths, prep.rect, prep.tiles_touched, CFG)
    C = CFG.pair_capacity // 128
    chunk0 = (jnp.arange(C, dtype=jnp.int32) * 128).astype(jnp.float32)
    r_start = _bisect_right(ctable[:, 1], chunk0) - 1
    blk = jnp.clip(jnp.maximum(r_start, 0) // 128, 0, nb128 - 1)
    key, mxs, mys, p1, p2, rgb32 = emission_decode_pallas(
        ctable, blk, num_pairs, CAM.width, CAM.height, CFG)

    np.testing.assert_array_equal(np.asarray(key), np.asarray(em.key))
    # Invalid slots may differ in id payload (XLA uses the sentinel id,
    # the kernel decodes zero rows); only compare real emission slots.
    valid = np.asarray(em.slot_valid)
    for got, ref in ((mxs, mxs_ref), (mys, mys_ref), (p1, p1_ref),
                     (p2, p2_ref), (rgb32, rgb_ref)):
        np.testing.assert_array_equal(np.asarray(got)[valid],
                                      np.asarray(ref)[valid])
    # The minifloat triple stays within its format's rounding of the bf16
    # feature values.
    r, g, b = (np.asarray(x) for x in unpack_rgb(rgb32))
    for ch, (got, mbits) in enumerate(((r, 6), (g, 6), (b, 5))):
        ref = np.asarray(em.feat9[:, 6 + ch])[valid]
        np.testing.assert_allclose(got[valid], ref,
                                   rtol=2.0 ** (-mbits - 1) + 1e-7,
                                   atol=2.0 ** -14)


def test_pallas_decode_strided_matches_xla_emission():
    """The STRIDED decode (row_stride=G>1, row_offset!=0 — the sharded
    tile-row-ownership mapping) must match the XLA emission path bit-for-bit
    too. VERDICT r3: this configuration had never executed anywhere (stride
    > 1 only arises on G>1 meshes and the decode was TPU-gated)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, row_stride=4)
    prep = _scene_prep()
    feat9 = build_feat9(prep)

    em = emission_core(feat9, prep.depths, prep.rect, prep.tiles_touched,
                       CAM.width, CAM.height, cfg, row_offset=1)
    ids = jnp.where(em.slot_valid, em.g, (1 << 22) - 1)
    mxs_ref, mys_ref = stuff_ids(em.feat9[:, 0], em.feat9[:, 1], ids)
    rgb_ref = pack_rgb(em.feat9[:, 6], em.feat9[:, 7], em.feat9[:, 8])

    ctable, _, num_pairs, _, nb128 = _build_tables(
        feat9, prep.depths, prep.rect, prep.tiles_touched, cfg)
    C = cfg.pair_capacity // 128
    chunk0 = (jnp.arange(C, dtype=jnp.int32) * 128).astype(jnp.float32)
    r_start = _bisect_right(ctable[:, 1], chunk0) - 1
    blk = jnp.clip(jnp.maximum(r_start, 0) // 128, 0, nb128 - 1)
    key, mxs, mys, p1, p2, rgb32 = emission_decode_pallas(
        ctable, blk, num_pairs, CAM.width, CAM.height, cfg, row_offset=1)

    np.testing.assert_array_equal(np.asarray(key), np.asarray(em.key))
    valid = np.asarray(em.slot_valid)
    for got, ref in ((mxs, mxs_ref), (mys, mys_ref), (rgb32, rgb_ref),
                     (p1, pack2bf16(em.feat9[:, 2], em.feat9[:, 3])),
                     (p2, pack2bf16(em.feat9[:, 4], em.feat9[:, 5]))):
        np.testing.assert_array_equal(np.asarray(got)[valid],
                                      np.asarray(ref)[valid])


def test_bwd_compaction_matches_scatter():
    """_emit_bwd_tpu (compaction + id sort + MXU segment sum) must agree
    with a plain scatter-add. (At this tiny KC the 256-chunk compaction
    floor always selects the full-size path; both cond branches are
    exercised explicitly by test_bwd_compaction_branches.)"""
    rng = np.random.default_rng(0)
    chunk = 128
    KC = 24
    n_rows = 300
    K = KC * chunk

    ids = rng.integers(0, n_rows, size=K).astype(np.int32)
    ct = np.zeros((KC, FEAT, chunk), np.float32)
    live_chunks = [1, 2, 3, 7, 11, 12, 13, 19]
    for c in live_chunks:
        ct[c, :9, :] = rng.normal(size=(9, chunk)).astype(np.float32)
    # Reference scatter-add over live rows only.
    flat = ct.transpose(0, 2, 1).reshape(K, FEAT)
    ref = np.zeros((n_rows, FEAT), np.float32)
    np.add.at(ref, ids, flat)

    cfg = RasterizerConfig(pair_capacity=K, grad_carry_bf16=False)
    drows = np.asarray(_emit_bwd_tpu(jnp.asarray(ct), jnp.asarray(ids),
                                     n_rows, cfg))
    np.testing.assert_allclose(drows, ref, rtol=1e-6, atol=1e-6)


def test_bwd_compaction_branches():
    """Force both cond branches by constructing capacities around the
    256-chunk compaction floor."""
    rng = np.random.default_rng(1)
    chunk = 128
    KC = 520                       # cap floor 256 < KC -> compaction active
    n_rows = 1000
    K = KC * chunk
    ids = rng.integers(0, n_rows, size=K).astype(np.int32)
    ct = np.zeros((KC, FEAT, chunk), np.float32)

    # Case 1: few live chunks (fits in cap=260).
    for c in rng.choice(KC, size=40, replace=False):
        ct[c, :9, :] = rng.normal(size=(9, chunk)).astype(np.float32)
    flat = ct.transpose(0, 2, 1).reshape(K, FEAT)
    ref = np.zeros((n_rows, FEAT), np.float32)
    np.add.at(ref, ids, flat)
    cfg = RasterizerConfig(pair_capacity=K, grad_carry_bf16=False,
                           bwd_compact_frac=0.5)
    drows = np.asarray(_emit_bwd_tpu(jnp.asarray(ct), jnp.asarray(ids),
                                     n_rows, cfg))
    np.testing.assert_allclose(drows, ref, rtol=1e-6, atol=1e-6)

    # Case 2: more live chunks than cap -> full-size fallback.
    ct2 = rng.normal(size=(KC, FEAT, chunk)).astype(np.float32)
    ct2[:, 9:, :] = 0.0
    flat2 = ct2.transpose(0, 2, 1).reshape(K, FEAT)
    ref2 = np.zeros((n_rows, FEAT), np.float32)
    np.add.at(ref2, ids, flat2)
    drows2 = np.asarray(_emit_bwd_tpu(jnp.asarray(ct2), jnp.asarray(ids),
                                      n_rows, cfg))
    np.testing.assert_allclose(drows2, ref2, rtol=2e-5, atol=2e-5)


def test_reduce_compact_cts_matches_scatter():
    """The fused path's per-gaussian reduction over a KERNEL-COMPACTED
    cotangent stream (ids bitcast in the last feature row, garbage beyond
    n_written) must equal a plain scatter-add over the live prefix — on
    BOTH the id-sort+segsum path (forced; the TPU branch, interpret
    kernels here) and the CPU scatter branch, and on both sides of the
    capacity-fallback cond."""
    import jax
    from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
    from gs2mesh_tpu.ops.rasterizer.emit import reduce_compact_cts
    from gs2mesh_tpu.ops.rasterizer.tile_render import FEAT

    rng = np.random.default_rng(7)
    KC, chunk, n_rows = 300, 128, 300
    dpairs = rng.normal(size=(KC, FEAT, chunk)).astype(np.float32)
    dpairs[:, 9:, :] = 0.0
    ids = rng.integers(0, n_rows, size=(KC, chunk)).astype(np.int32)
    dpairs[:, FEAT - 1, :] = ids.view(np.float32)
    # Garbage beyond the live prefix, including NaN bit patterns that
    # would poison an unmasked one-hot matmul.
    n_written = 10
    dpairs[n_written:] = np.nan
    dpairs[n_written:, FEAT - 1, :] = \
        rng.integers(0, 2**31, size=(KC - n_written, chunk),
                     dtype=np.int64).astype(np.int32).view(np.float32)

    ref = np.zeros((n_rows, FEAT), np.float32)
    for c in range(n_written):
        for j in range(chunk):
            ref[ids[c, j]] += np.nan_to_num(dpairs[c, :, j])

    # frac 0.9 -> cap 270 < KC and n_written 10 <= cap: the compact branch
    # of the cond (sorts the 270-chunk prefix). With n_written forced past
    # a 256 cap the fallback branch must also agree — emulate by shrinking
    # frac so cap (256 floor) < n_written' where the extra chunks are the
    # same garbage (the fallback sorts all KC with masked ids).
    for frac, label in ((0.9, "compact-branch"), (0.1, "fallback-branch")):
        cfg = RasterizerConfig(pair_capacity=KC * chunk,
                               grad_carry_bf16=False,
                               bwd_compact_frac=frac)
        if label == "fallback-branch":
            # cap = 256; make the live count exceed it so the cond takes
            # the full-size path (the extra live chunks are zeros so the
            # reference sum is unchanged).
            dpairs[n_written:260] = 0.0
            ids_pad = rng.integers(0, n_rows, size=(260 - n_written, chunk))
            dpairs[n_written:260, FEAT - 1, :] = \
                ids_pad.astype(np.int32).view(np.float32)
            n_written = 260
        got = np.asarray(jax.jit(
            lambda d, nw, cfg=cfg: reduce_compact_cts(
                d, nw, n_rows, cfg, force_sort_path=True))(
                    jnp.asarray(dpairs), jnp.int32(n_written)))
        np.testing.assert_allclose(got[:, :9], ref[:, :9], rtol=2e-5,
                                   atol=1e-4, err_msg=label)
        cpu = np.asarray(reduce_compact_cts(
            jnp.asarray(dpairs), jnp.int32(n_written), n_rows, cfg))
        np.testing.assert_allclose(cpu[:, :9], ref[:, :9], rtol=2e-5,
                                   atol=1e-4, err_msg=label + "-scatter")
