"""Device-op tests: sparse codec roundtrips, scatter pooling vs numpy oracle,
trilinear sampling vs analytic fields, top-k/top-p filtering semantics.

Mirrors the reference property checks batch_sparse_dense_unittest /
pack_unpack_unittest / sample_unittest (models/shapeformer/common.py:143-206,
302-314) as real pytest units, on static-shape jit-safe implementations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapeformer_tpu.ops import gridcoords, grid_sample, sampling, scatter, sparse


# ------------------------------------------------------------------ sparse codec
def test_dense_sparse_roundtrip(rng):
    reso, vocab, L = 4, 16, 20
    dense = np.full((2, reso, reso, reso), 7, np.int32)  # mode = 7
    dense[0, 1, 1, 1], dense[0, 1, 1, 0], dense[0, 1, 0, 0] = 2, 3, 4
    dense[1, 0, 0, 0], dense[1, 0, 0, 1] = 9, 2
    # end_pos = reso^3 (out of cell range), end_val = vocab: reference convention
    seq, mode = sparse.dense2sparse(jnp.asarray(dense), L, (64, 16), vocab)
    assert int(mode) == 7
    back = sparse.sparse2dense(seq, mode, reso)
    assert (np.asarray(back) == dense).all()
    # tokens sorted ascending by position, ends padded
    lens = np.asarray(sparse.seq_lengths(seq, (64, 16)))
    assert lens.tolist() == [3, 2]
    pos0 = np.asarray(seq)[0, :3, 0]
    assert (np.diff(pos0) > 0).all()
    assert (np.asarray(seq)[0, 3:, 0] == 64).all()
    assert (np.asarray(seq)[0, 3:, 1] == 16).all()


def test_dense_sparse_truncation(rng):
    reso, vocab, L = 4, 8, 5
    dense = rng.integers(0, 2, (1, reso, reso, reso)).astype(np.int32)
    dense[dense == 1] += rng.integers(1, 7, (dense == 1).sum()).astype(np.int32)
    # force > L non-mode cells
    dense = np.zeros((1, reso, reso, reso), np.int32)
    dense.reshape(-1)[:10] = 3  # 10 tokens of value 3, mode=0
    seq, mode = sparse.dense2sparse(jnp.asarray(dense), L, (64, 8), vocab)
    s = np.asarray(seq)[0]
    assert int(mode) == 0
    # kept first L-1 tokens, terminated at the last column
    assert (s[: L - 1, 1] == 3).all()
    assert s[L - 1, 0] == 64 and s[L - 1, 1] == 8


def test_dense_sparse_jit_and_mode_tiebreak():
    reso, vocab = 2, 4
    dense = jnp.asarray(np.array([[[[1, 1], [2, 2]], [[1, 2], [3, 0]]]]))
    f = jax.jit(lambda d: sparse.dense2sparse(d, 8, (8, 4), vocab))
    seq, mode = f(dense)
    assert int(mode) == 1  # ties (1 vs 2, both x3) break to smallest, like torch.mode
    back = sparse.sparse2dense(seq, mode, reso)
    assert (np.asarray(back) == np.asarray(dense)).all()


def test_token_mask():
    seq = jnp.asarray([[[0, 1], [4, 4], [4, 4]],
                       [[1, 2], [2, 3], [3, 1]]])
    m = np.asarray(sparse.token_mask(seq, (4, 4)))
    assert m.tolist() == [[1, 1, 0], [1, 1, 1]]


def test_np_host_codec(rng):
    dense = np.zeros((2, 4, 4, 4), np.int64)
    dense[0, 2, 3, 1] = 5
    dense[1, 0, 0, 0] = 2
    seq, mode = sparse.np_dense2sparse(dense, 6, (64, 8))
    assert mode == 0
    back = sparse.np_sparse2dense(seq, mode, 4)
    assert (back == dense).all()
    filt = sparse.filter_end_tokens(seq[0], (64, 8))
    assert filt.shape == (1, 2)


# -------------------------------------------------------------------- gridcoords
def test_coordinate2index_matches_numpy(rng):
    pts = rng.uniform(-0.55, 0.55, (2, 100, 3)).astype(np.float32)
    p_nor = np.asarray(gridcoords.normalize_3d_coordinate(jnp.asarray(pts)))
    assert p_nor.min() >= 0 and p_nor.max() < 1
    ids = np.asarray(gridcoords.coordinate2index(jnp.asarray(p_nor), 64))
    cell = np.floor(p_nor * 64).astype(np.int64)
    ref = (cell[..., 0] * 64 + cell[..., 1]) * 64 + cell[..., 2]
    assert (ids == ref).all()


def test_ravel_unravel_jnp():
    flat = jnp.arange(27)
    idx = gridcoords.unravel_index(flat, (3, 3, 3))
    assert (np.asarray(gridcoords.ravel_index(idx, (3, 3, 3))) == np.arange(27)).all()


# ----------------------------------------------------------------------- scatter
def test_scatter_pool_vs_numpy(rng):
    B, N, C, n_cells = 2, 64, 5, 8
    c = rng.normal(size=(B, N, C)).astype(np.float32)
    ids = rng.integers(0, n_cells, (B, N))
    got_max = np.asarray(scatter.scatter_max(jnp.asarray(c), jnp.asarray(ids), n_cells))
    got_mean = np.asarray(scatter.scatter_mean(jnp.asarray(c), jnp.asarray(ids), n_cells))
    for b in range(B):
        for cell in range(n_cells):
            sel = c[b][ids[b] == cell]
            if len(sel) == 0:
                assert (got_max[b, cell] == 0).all()
                assert (got_mean[b, cell] == 0).all()
            else:
                np.testing.assert_allclose(got_max[b, cell], sel.max(0), rtol=1e-6)
                np.testing.assert_allclose(got_mean[b, cell], sel.mean(0), rtol=1e-5)
    mask = np.asarray(scatter.occupancy_mask(jnp.asarray(ids), n_cells))
    for b in range(B):
        assert set(np.where(mask[b])[0]) == set(ids[b].tolist())


def test_gather_cells():
    grid = jnp.arange(24, dtype=jnp.float32).reshape(1, 6, 4)
    ids = jnp.asarray([[0, 5, 2]])
    out = np.asarray(scatter.gather_cells(grid, ids))
    assert (out[0, 0] == np.arange(4)).all()
    assert (out[0, 1] == np.arange(20, 24)).all()


def test_pooled_gather_matches_scatter_then_gather(rng):
    """Sort+segmented-scan fusion == dense scatter_* followed by gather_cells."""
    B, N, C, n_cells = 3, 100, 7, 17
    c = rng.normal(size=(B, N, C)).astype(np.float32)
    ids = jnp.asarray(rng.integers(0, n_cells, (B, N)))
    plan = scatter.pool_plan(ids)
    for mode, pool in (("max", scatter.scatter_max),
                       ("mean", scatter.scatter_mean)):
        want = scatter.gather_cells(pool(jnp.asarray(c), ids, n_cells), ids)
        got = scatter.pooled_gather(jnp.asarray(c), plan, mode=mode,
                                    use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_segmented_scan_matches_xla(rng):
    """Pallas scan kernel (interpret off-TPU) == XLA associative_scan core,
    across tile boundaries (N*B spans multiple 256-row tiles)."""
    from shapeformer_tpu.ops import pallas_scatter
    B, N, C = 2, 300, 5
    vals = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    ids = jnp.asarray(np.sort(rng.integers(0, 40, (B, N)), axis=1))
    seg_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), ids[:, 1:] != ids[:, :-1]], axis=1)
    seg_end = jnp.concatenate(
        [seg_start[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    for mode in ("max", "sum"):
        for rev, flags in ((False, seg_start), (True, seg_end)):
            want = scatter._seg_scan(vals, flags, mode, reverse=rev)
            got = pallas_scatter.segmented_scan(vals, flags, mode, reverse=rev)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)


def test_pooled_gather_pallas_path(rng):
    """pooled_gather(use_pallas=True) == XLA path end to end."""
    B, N, C, n_cells = 2, 130, 6, 11
    c = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_cells, (B, N)))
    plan = scatter.pool_plan(ids)
    for mode in ("max", "mean"):
        want = scatter.pooled_gather(c, plan, mode=mode, use_pallas=False)
        got = scatter.pooled_gather(c, plan, mode=mode, use_pallas=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_pooled_gather_pallas_grad_matches_xla(rng):
    """The pallas path's hand-written VJP == XLA autodiff (pallas_call has no
    JVP rule; without the custom VJP the VQDIF train step crashes — this is
    the regression pin for the round-4 TPU bench failure)."""
    B, N, C, n_cells = 2, 130, 6, 11
    c = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_cells, (B, N)))
    plan = jax.jit(scatter.pool_plan)(ids)
    for mode in ("max", "mean"):
        def loss(c, use_pallas):
            out = scatter.pooled_gather(c, plan, mode=mode,
                                        use_pallas=use_pallas)
            return (out ** 2).sum()
        g_x = jax.jit(jax.grad(lambda c: loss(c, False)))(c)
        g_p = jax.jit(jax.grad(lambda c: loss(c, True)))(c)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   rtol=1e-4, atol=1e-4)


def test_pooled_sorted_matches_dense(rng):
    """pooled_sorted (cumsum/packed-cummax formulation) == dense
    scatter_*+gather in sorted order, for f32 (fallback + cumsum-mean) and
    bf16 (packed segmax fast path)."""
    B, N, C, n_cells = 3, 100, 7, 17
    c = rng.normal(size=(B, N, C)).astype(np.float32)
    ids = jnp.asarray(rng.integers(0, n_cells, (B, N)))
    plan = scatter.pool_plan(ids)
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        cj = jnp.asarray(c).astype(dtype)
        cs = jnp.take_along_axis(cj, plan["perm"][..., None], axis=1)
        ids_s = plan["ids_sorted"]
        for mode, pool in (("max", scatter.scatter_max),
                           ("mean", scatter.scatter_mean)):
            want = scatter.gather_cells(
                pool(cs.astype(jnp.float32), ids_s, n_cells), ids_s)
            got = scatter.pooled_sorted(cs, plan, mode).astype(jnp.float32)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=tol, atol=tol)


def test_pooled_sorted_grad_matches_scan_autodiff(rng):
    """Custom VJP of the cumsum-formulated pooled_sorted == autodiff through
    the masked-scan core (ties have measure zero with random floats)."""
    B, N, C, n_cells = 2, 130, 6, 11
    c = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_cells, (B, N)))
    plan = jax.jit(scatter.pool_plan)(ids)
    cs = jnp.take_along_axis(c, plan["perm"][..., None], axis=1)
    # f32 'max' is gated OUT of the fast path (the packed trick needs 16-bit
    # values); its bf16 grad is pinned in test_packed_segmax_bf16_fast_path_grad
    for mode in ("sum", "mean"):
        def loss_fast(x):
            return (scatter._pooled_sorted_fast(
                mode, None, x, plan["start_pos"], plan["end_pos"],
                plan["seg_id"]) ** 2).sum()

        def loss_scan(x):
            if mode == "sum":
                seg = scatter._seg_scan(x, plan["seg_start"], "sum")
                segb = scatter._seg_scan(x, scatter._seg_ends(
                    plan["seg_start"]), "sum", reverse=True)
                return ((seg + segb - x) ** 2).sum()
            want = scatter.gather_cells(
                scatter.scatter_mean(x, plan["ids_sorted"], n_cells),
                plan["ids_sorted"])
            return (want ** 2).sum()
        g_f = jax.jit(jax.grad(loss_fast))(cs)
        g_s = jax.jit(jax.grad(loss_scan))(cs)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-4, atol=1e-4)


def test_packed_segmax_bf16_fast_path_grad(rng):
    """bf16 packed-cummax max path: value AND gradient match the f32 scan
    reference (the bitcast encode has no autodiff rule — the custom VJP is
    what makes the encoder trainable in bf16)."""
    B, N, C, n_cells = 2, 96, 5, 9
    c32 = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    # snap to bf16 grid so f32 reference sees identical values / argmaxes
    c = c32.astype(jnp.bfloat16)
    c32 = c.astype(jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_cells, (B, N)))
    plan = jax.jit(scatter.pool_plan)(ids)
    cs = jnp.take_along_axis(c, plan["perm"][..., None], axis=1)

    def loss_fast(x):
        return (scatter.pooled_sorted(x, plan, "max")
                .astype(jnp.float32) ** 2).sum()

    def loss_ref(x):
        out = scatter.gather_cells(
            scatter.scatter_max(x, plan["ids_sorted"], n_cells),
            plan["ids_sorted"])
        return (out ** 2).sum()
    v_f = jax.jit(loss_fast)(cs)
    v_r = jax.jit(loss_ref)(cs.astype(jnp.float32))
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-2)
    g_f = jax.jit(jax.grad(loss_fast))(cs).astype(jnp.float32)
    g_r = jax.jit(jax.grad(loss_ref))(cs.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=2e-2, atol=2e-2)


def test_pooled_sorted_part_bounds_past_32768(rng):
    """Packed max scan with static part bounds (the fused-tokenize path,
    N > 32768) == the masked-scan fallback.  Parts occupy disjoint id
    ranges, exactly like enc.LocalPoolPointnet's splits offsets."""
    B, C, n_cells = 2, 33000, 64          # N > 32768 in total
    splits = (12000, 21000)
    N = sum(splits)
    ids0 = rng.integers(0, n_cells, (B, splits[0]))
    ids1 = rng.integers(0, n_cells, (B, splits[1])) + n_cells   # disjoint
    ids = jnp.asarray(np.concatenate([ids0, ids1], axis=1))
    c = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    plan = jax.jit(scatter.pool_plan)(ids)
    cs = jnp.take_along_axis(c, plan["perm"][..., None], axis=1)
    bounds = (0, splits[0], N)
    assert scatter._fast_ok("max", jnp.bfloat16, N, bounds)
    assert not scatter._fast_ok("max", jnp.bfloat16, N, None)
    got = scatter.pooled_sorted(cs, plan, "max", part_bounds=bounds)
    want = scatter.gather_cells(
        scatter.scatter_max(cs.astype(jnp.float32), plan["ids_sorted"],
                            2 * n_cells), plan["ids_sorted"])
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_scatter_mean_sorted_c_matches_dense(rng):
    """Sorted-order gather-formulated grid build == scatter_mean, values and
    gradients."""
    B, N, C, n_cells = 2, 120, 6, 13
    c = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_cells, (B, N)))
    plan = jax.jit(scatter.pool_plan)(ids)
    cs = jnp.take_along_axis(c, plan["perm"][..., None], axis=1)
    want = scatter.scatter_mean(c, ids, n_cells)
    got_o = scatter.scatter_mean_plan(c, ids, plan, n_cells)
    got_s = scatter.scatter_mean_sorted_c(cs, plan, n_cells)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    g_want = jax.jit(jax.grad(
        lambda x: (scatter.scatter_mean(x, ids, n_cells) ** 2).sum()))(c)
    g_got = jax.jit(jax.grad(
        lambda x: (scatter.scatter_mean_plan(x, ids, plan,
                                             n_cells) ** 2).sum()))(c)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-5)
    g_sort = jax.jit(jax.grad(
        lambda x: (scatter.scatter_mean_sorted_c(x, plan,
                                                 n_cells) ** 2).sum()))(cs)
    g_want_s = jnp.take_along_axis(g_want, plan["perm"][..., None], axis=1)
    np.testing.assert_allclose(np.asarray(g_sort), np.asarray(g_want_s),
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------- grid_sample
def test_trilinear_linear_field_exact(rng):
    """Trilinear interp reproduces any per-axis-linear field exactly."""
    X = Y = Z = 5
    gx, gy, gz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z), indexing="ij")
    field = (2.0 * gx - 3.0 * gy + 0.5 * gz)[None, ..., None].astype(np.float32)
    p = rng.uniform(0, 1, (1, 50, 3)).astype(np.float32)
    out = np.asarray(grid_sample.trilinear_sample(jnp.asarray(field), jnp.asarray(p)))
    f = p * (np.array([X, Y, Z]) - 1)
    ref = 2.0 * f[..., 0] - 3.0 * f[..., 1] + 0.5 * f[..., 2]
    np.testing.assert_allclose(out[..., 0], ref, rtol=1e-4, atol=1e-4)


def test_trilinear_corners_and_border():
    grid = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 2, 2, 1)
    p = jnp.asarray([[[0, 0, 0], [1, 1, 1], [0, 0, 1], [1.2, -0.3, 0.5]]],
                    dtype=jnp.float32)
    out = np.asarray(grid_sample.trilinear_sample(grid, p))[0, :, 0]
    assert out[0] == 0 and out[1] == 7 and out[2] == 1
    # border padding: out-of-range coordinates clamp
    assert np.isfinite(out[3])


def test_trilinear_matches_torch(rng):
    """Bit-level check against torch.nn.functional.grid_sample
    (align_corners=True, padding_mode='border') — the exact config the
    reference decoder uses (dec.py:67)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, X, Y, Z, C, M = 2, 5, 6, 7, 3, 64
    grid = rng.normal(size=(B, X, Y, Z, C)).astype(np.float32)
    p = rng.uniform(0, 1, (B, M, 3)).astype(np.float32)
    out = np.asarray(grid_sample.trilinear_sample(jnp.asarray(grid), jnp.asarray(p)))
    # torch: input (B, C, D, H, W) with vgrid (x->W, y->H, z->D); our canonical
    # layout maps axis 0->X, so feed torch input with D=X,H=Y,W=Z and flip vgrid.
    tin = torch.from_numpy(grid).permute(0, 4, 1, 2, 3)  # (B,C,X,Y,Z)
    vgrid = torch.from_numpy(2 * p - 1)[:, :, None, None, :]  # (B,M,1,1,3)
    vgrid = vgrid.flip(-1)  # (z,y,x) -> torch (x=W? no: make W index our Z)
    tout = F.grid_sample(tin, vgrid, padding_mode="border", align_corners=True,
                         mode="bilinear")[:, :, :, 0, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(out, tout, rtol=1e-5, atol=1e-5)


def test_trilinear_sample_grad_matches_autodiff(rng):
    """trilinear_sample's hand-written VJP (scatter.scatter_add_dense for
    dgrid — the 62.6 ms XLA-scatter fix, grid_sample.py docstring — plus the
    exact lerp-chain dp) == plain autodiff through the 8-gather forward, for
    BOTH inputs, including out-of-range (border-clamped) coordinates and
    torch-routing duplicate corners."""
    B, X, Y, Z, C, M = 2, 6, 5, 4, 3, 96
    grid = jnp.asarray(rng.normal(size=(B, X, Y, Z, C)), jnp.float32)
    # mix of interior, boundary-exact and out-of-range coords
    p = rng.uniform(-0.2, 1.2, (B, M, 3)).astype(np.float32)
    p[:, :4] = np.asarray([[0, 0, 0], [1, 1, 1], [0.5, 0, 1], [1.1, -0.1, 0.5]])
    p = jnp.asarray(p)
    g_out = jnp.asarray(rng.normal(size=(B, M, C)), jnp.float32)

    def loss_custom(gr, pp):
        return (grid_sample.trilinear_sample(gr, pp) * g_out).sum()

    def loss_ref(gr, pp):
        return (grid_sample._impl(gr, pp) * g_out).sum()

    dg_c, dp_c = jax.grad(loss_custom, argnums=(0, 1))(grid, p)
    dg_r, dp_r = jax.grad(loss_ref, argnums=(0, 1))(grid, p)
    np.testing.assert_allclose(np.asarray(dg_c), np.asarray(dg_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp_c), np.asarray(dp_r),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------- sampling
def test_topk_filter():
    logits = jnp.asarray([[1.0, 3.0, 2.0, -1.0]])
    f = np.asarray(sampling.filter_logits(logits, top_k=2))
    assert f[0, 1] == 3 and f[0, 2] == 2
    assert f[0, 0] <= sampling.NEG_INF and f[0, 3] <= sampling.NEG_INF


def test_topp_filter_keeps_first_above_threshold():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    f = np.asarray(sampling.filter_logits(logits, top_p=0.6))
    # cum = .5, .8 -> keep first two (shift-right rule), drop rest
    assert np.isfinite(f[0, 0]) and f[0, 0] > sampling.NEG_INF
    assert f[0, 1] > sampling.NEG_INF
    assert f[0, 2] <= sampling.NEG_INF and f[0, 3] <= sampling.NEG_INF


def test_sampling_respects_filter(rng):
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.tile(np.array([[1.0, 1.0001, -2.0, 1.02]]), (64, 1)),
                         dtype=jnp.float32)
    toks, _ = sampling.sample_logits(key, logits, top_k=1, top_p=0.9)
    assert (np.asarray(toks) == 3).all()  # top-1 forces argmax
    toks3, filt = sampling.sample_logits(jax.random.PRNGKey(1), logits,
                                         top_k=3, top_p=0.999)
    assert set(np.asarray(toks3).tolist()) <= {0, 1, 3}  # index 2 filtered


def test_log_prob_of():
    logits = jnp.asarray([[0.0, float(np.log(3.0))]])  # p = [.25, .75]
    lp = np.asarray(sampling.log_prob_of(logits, jnp.asarray([1])))
    assert np.isclose(lp[0], np.log(0.75), atol=1e-4)


def test_sample_ranked_matches_filtered_support(rng):
    """The compressed (B, k) path must agree with the full-vocab reference
    path: sampled tokens lie in the filtered support, and the returned
    log-prob is under the UNSCALED pre-filter logits (the ranking-key
    semantics of the sampler's old sample_logits + log_prob_of pair)."""
    logits = jnp.asarray(rng.normal(size=(16, 57)).astype(np.float32))
    for kw in (dict(top_k=5, top_p=0.7), dict(top_k=5), dict(top_k=57),
               dict(top_p=0.7), dict()):
        tok, lp = sampling.sample_ranked(jax.random.PRNGKey(3), logits,
                                         temperature=0.8, **kw)
        filt = sampling.filter_logits(logits, temperature=0.8, **kw)
        f, t = np.asarray(filt), np.asarray(tok)
        assert (f[np.arange(16), t] > sampling.NEG_INF).all()
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(sampling.log_prob_of(logits, tok)),
            rtol=1e-5, atol=1e-5)


def test_sample_ranked_argmax_and_distribution():
    # top_k=1 == argmax, deterministic
    logits = jnp.asarray([[1.0, 4.0, 2.0, 3.0]] * 8)
    tok, _ = sampling.sample_ranked(jax.random.PRNGKey(0), logits, top_k=1)
    assert (np.asarray(tok) == 1).all()
    # best_in_first pins row 0 to the argmax regardless of the draw
    tok2, _ = sampling.sample_ranked(jax.random.PRNGKey(4), logits, top_k=3,
                                     best_in_first=True)
    assert int(tok2[0]) == 1
    # empirical frequencies over keys approximate softmax on the top-k set
    base = jnp.asarray([[np.log(3.0), 0.0, -50.0, np.log(1.0)]])
    draws = jax.vmap(lambda k: sampling.sample_ranked(k, base, top_k=3)[0][0]
                     )(jax.random.split(jax.random.PRNGKey(5), 3000))
    freq = np.bincount(np.asarray(draws), minlength=4) / 3000.0
    # p = softmax([log3, 0, -inf(top-k drops idx2... keeps 3 best), 0]) over
    # kept {0, 1, 3} = [0.6, 0.2, 0.2]
    assert abs(freq[0] - 0.6) < 0.05 and freq[2] == 0.0
    assert abs(freq[1] - 0.2) < 0.05 and abs(freq[3] - 0.2) < 0.05


def test_scatter_mean_sorted_matches_dense():
    """scatter_mean_sorted / occupancy_from_plan (unique-index stores at
    segment ends) must equal the segment_sum-based scatter_mean /
    occupancy_mask exactly — the TPU-fast grid build is a pure reformulation."""
    import jax
    import jax.numpy as jnp

    from shapeformer_tpu.ops import scatter

    key = jax.random.PRNGKey(0)
    B, N, C, n_cells = 3, 512, 8, 64
    c = jax.random.normal(key, (B, N, C), jnp.float32)
    ids = jax.random.randint(key, (B, N), 0, n_cells)
    plan = jax.jit(scatter.pool_plan)(ids)

    ref = scatter.scatter_mean(c, ids, n_cells)
    got = jax.jit(lambda c, i, p: scatter.scatter_mean_sorted(
        c, i, p, n_cells))(c, ids, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    m_ref = scatter.occupancy_mask(ids, n_cells)
    m_got = jax.jit(lambda i, p: scatter.occupancy_from_plan(
        i, p, n_cells))(ids, plan)
    np.testing.assert_array_equal(np.asarray(m_got), np.asarray(m_ref))

    # bf16 features with >256 points per cell: means must not lose count
    # precision (f32 accumulation inside)
    ids1 = jnp.zeros((1, 400), jnp.int32)
    c1 = jnp.ones((1, 400, 4), jnp.bfloat16)
    plan1 = scatter.pool_plan(ids1)
    got1 = scatter.scatter_mean_sorted(c1, ids1, plan1, 4)
    np.testing.assert_allclose(np.asarray(got1[0, 0], np.float32),
                               np.ones(4), rtol=1e-2)


def test_scatter_mean_plan_matches_dense_and_grads():
    """scatter_mean_plan (1-wide pointer scatter + C-wide gather, the TPU
    grid build) == scatter_mean exactly, and its custom VJP == the
    segment_sum formulation's autodiff grads."""
    import jax
    import jax.numpy as jnp

    from shapeformer_tpu.ops import scatter

    key = jax.random.PRNGKey(0)
    B, N, C, n_cells = 3, 512, 8, 64
    c = jax.random.normal(key, (B, N, C), jnp.float32)
    ids = jax.random.randint(key, (B, N), 0, n_cells)
    plan = jax.jit(scatter.pool_plan)(ids)

    ref = scatter.scatter_mean(c, ids, n_cells)
    got = jax.jit(lambda c, i, p: scatter.scatter_mean_plan(
        c, i, p, n_cells))(c, ids, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    w = jax.random.normal(key, ref.shape)

    def loss(fn, c):
        return (fn(c) * w).sum()

    g_ref = jax.jit(jax.grad(lambda c: loss(
        lambda cc: scatter.scatter_mean(cc, ids, n_cells), c)))(c)
    g_got = jax.jit(jax.grad(lambda c: loss(
        lambda cc: scatter.scatter_mean_plan(cc, ids, plan, n_cells), c)))(c)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)

    # bf16 with >256 points per cell: f32 accumulation inside
    ids1 = jnp.zeros((1, 400), jnp.int32)
    c1 = jnp.ones((1, 400, 4), jnp.bfloat16)
    plan1 = scatter.pool_plan(ids1)
    got1 = scatter.scatter_mean_plan(c1, ids1, plan1, 4)
    np.testing.assert_allclose(np.asarray(got1[0, 0], np.float32),
                               np.ones(4), rtol=1e-2)
    assert (np.asarray(got1[0, 1:], np.float32) == 0).all()


def test_encoder_coarse_mask_matches_rebinning():
    """enc.py's maxpooled fine occupancy == re-binning the points at the
    output resolution (floor(p*out) == floor(p*reso)//f for p in [0,1))."""
    import jax
    import jax.numpy as jnp

    from shapeformer_tpu.ops import scatter
    from shapeformer_tpu.ops.gridcoords import (coordinate2index,
                                                normalize_3d_coordinate)

    key = jax.random.PRNGKey(1)
    p = jax.random.uniform(key, (2, 1024, 3), minval=-0.55, maxval=0.55)
    p_nor = normalize_3d_coordinate(p)
    reso, out = 32, 8
    fine = scatter.occupancy_mask(coordinate2index(p_nor, reso), reso ** 3)
    f = reso // out
    pooled = fine.reshape(-1, out, f, out, f, out, f).any(axis=(2, 4, 6))
    direct = scatter.occupancy_mask(coordinate2index(p_nor, out),
                                    out ** 3).reshape(-1, out, out, out)
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(direct))
