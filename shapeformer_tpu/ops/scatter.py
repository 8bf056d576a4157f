"""Point -> grid scatter pooling (the encoder hot loop).

TPU-native replacement for torch_scatter.scatter_max / scatter_mean
(reference call sites: shapeformer/models/vqdif/enc.py:5,59-64,72,95-112).

Three formulations:
  - scatter_max/scatter_mean: jax.ops.segment_* over per-batch-offset flat
    cell ids (reference semantics; duplicate-index scatters serialize on TPU
    so these are off the hot path).
  - pool_plan + pooled_sorted/pooled_gather: sort the points by cell id ONCE
    per encode (XLA sort is fast), then every segmented reduction is a PLAIN
    cumulative scan + boundary row gathers (see the cumsum-formulated block
    below) — no dense grid, no scatter, no masked tuple scans.  This is the
    default; the encoder keeps its whole stack in sorted order so the
    permutation gathers are paid once.
  - legacy cores kept for parity tests and unsupported dtypes: the masked
    associative_scan (_seg_scan) and a Pallas TPU scan kernel
    (shapeformer_tpu.ops.pallas_scatter, via use_pallas/
    SFTPU_PALLAS_SCATTER).

Empty-cell convention matches torch_scatter's zero-fill: cells containing no
point pool to 0 (relevant only for the dense scatter_mean grid; pooled_gather
reads back exclusively at occupied cells).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flat_segments(ids, n_cells: int):
    """(B, N) per-batch cell ids -> (B*N,) global segment ids."""
    B, N = ids.shape
    offset = jnp.arange(B, dtype=ids.dtype)[:, None] * n_cells
    return (ids + offset).reshape(-1)


def scatter_max(c, ids, n_cells: int):
    """(B, N, C), (B, N) -> (B, n_cells, C): per-cell feature max, 0 for empty."""
    B, N, C = c.shape
    seg = _flat_segments(ids, n_cells)
    pooled = jax.ops.segment_max(c.reshape(B * N, C), seg,
                                 num_segments=B * n_cells)
    pooled = jnp.where(jnp.isneginf(pooled), 0.0, pooled)
    return pooled.reshape(B, n_cells, C)


def scatter_mean(c, ids, n_cells: int):
    """(B, N, C), (B, N) -> (B, n_cells, C): per-cell feature mean, 0 for empty."""
    B, N, C = c.shape
    seg = _flat_segments(ids, n_cells)
    ssum = jax.ops.segment_sum(c.reshape(B * N, C), seg,
                               num_segments=B * n_cells)
    cnt = jax.ops.segment_sum(jnp.ones((B * N, 1), c.dtype), seg,
                              num_segments=B * n_cells)
    return (ssum / jnp.maximum(cnt, 1.0)).reshape(B, n_cells, C)


def gather_cells(grid, ids):
    """(B, n_cells, C), (B, N) -> (B, N, C): read each point's cell feature."""
    return jnp.take_along_axis(grid, ids[..., None], axis=1)


# --------------------------------------------------------- fused pool+gather
def pool_plan(ids):
    """Sort each batch row's cell ids once; reused by every pooled_gather.

    ids: (B, N) int cell ids.  Returns dict with the permutation, its inverse,
    the segment-start flags of the sorted order, plus per-point segment
    geometry (all in sorted order):
      start_pos/end_pos: (B, N) int32 index of each point's segment start/end
      seg_id:            (B, N) int32 0-based segment ordinal
      ids_sorted:        (B, N) the sorted cell ids
    The extras cost three 1-wide int scans; they let the pooled ops run as
    plain cumulative scans + boundary gathers instead of masked tuple scans
    (masked associative_scan measured ~15x a plain cumsum on v5e at B8x32k).
    """
    B, N = ids.shape
    perm = jnp.argsort(ids, axis=1)
    sorted_ids = jnp.take_along_axis(ids, perm, axis=1)
    seg_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), sorted_ids[:, 1:] != sorted_ids[:, :-1]],
        axis=1)
    inv_perm = jnp.argsort(perm, axis=1)
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    start_pos = jax.lax.cummax(jnp.where(seg_start, iota, 0), axis=1)
    seg_end = _seg_ends(seg_start)
    end_pos = jax.lax.cummin(jnp.where(seg_end, iota, N - 1), axis=1,
                             reverse=True)
    seg_id = jnp.cumsum(seg_start.astype(jnp.int32), axis=1) - 1
    return dict(perm=perm, inv_perm=inv_perm, seg_start=seg_start,
                start_pos=start_pos, end_pos=end_pos, seg_id=seg_id,
                ids_sorted=sorted_ids)


def _seg_scan(vals, seg_start, mode: str, reverse: bool = False):
    """Inclusive segmented scan along axis 1.

    vals: (B, N, C); seg_start: (B, N) bool segment boundaries (in scan
    direction).  mode: 'max' | 'sum'.
    """
    op = jnp.maximum if mode == "max" else jnp.add
    flags = seg_start[..., None]

    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, op(av, bv))

    _, out = jax.lax.associative_scan(combine, (flags, vals), axis=1,
                                      reverse=reverse)
    return out


_PALLAS_OK = {}   # (C, dtype) -> bool

# (device_kind substring, C) pairs the mosaic scan kernel is validated on.
# Probing an arbitrary width — or validated widths on OTHER TPU generations —
# by just compiling it is NOT safe: a failed/hung mosaic compile was observed
# to poison the TPU client (subsequent unrelated programs die with
# FAILED_PRECONDITION) or deadlock the axon tunnel — so unknown widths and
# unvalidated hardware take the XLA scan (within ~20% of pallas anyway)
# instead of being probed.  Extend after validating on hardware, or force
# with SFTPU_PALLAS_SCATTER=1.
_PALLAS_KNOWN = (("v5 lite", 32), ("v5e", 32))
# seconds before an in-flight probe is declared hung and XLA scan is used
_PALLAS_PROBE_TIMEOUT_S = 120.0


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.lower()
    except Exception:
        return ""


def _known_width(C: int) -> bool:
    kind = _device_kind()
    return any(k in kind and C == c for k, c in _PALLAS_KNOWN)


def _pallas_ok(C: int, dtype) -> bool:
    """Pallas scan is the DEFAULT on TPU (it wins the bench microbench) at
    validated feature widths, gated by a PER-(C, dtype) on-device
    correctness check at first call — narrow widths hit unsupported mosaic
    lowerings (C=16 f32 fails on v5e), and a failing compile can take the
    TPU client down with it, so only _PALLAS_KNOWN_C widths are ever
    probed.  Env override: SFTPU_PALLAS_SCATTER=0 opt-out / =1 force."""
    env = os.environ.get("SFTPU_PALLAS_SCATTER", "")
    if env in ("0", "1"):
        return env == "1"
    if jax.default_backend() != "tpu" or not _known_width(int(C)):
        return False
    sig = (int(C), np.dtype(dtype).name)
    if sig not in _PALLAS_OK:
        def _check():
            try:
                key = jax.random.PRNGKey(0)
                ids = jax.random.randint(key, (2, 512), 0, 64)
                c = jax.random.normal(key, (2, 512, sig[0]), jnp.float32
                                      ).astype(dtype)
                plan = jax.jit(pool_plan)(ids)
                ok = True
                for mode in ("max", "mean"):
                    a = jax.jit(lambda c, p, m=mode: pooled_gather(
                        c, p, m, use_pallas=True))(c, plan)
                    b = jax.jit(lambda c, p, m=mode: pooled_gather(
                        c, p, m, use_pallas=False))(c, plan)
                    ok &= bool(jnp.allclose(
                        a.astype(jnp.float32), b.astype(jnp.float32),
                        atol=1e-2, rtol=1e-2))
                _PALLAS_OK[sig] = ok
                if not ok:
                    print(f"[scatter] pallas scan FAILED the on-TPU "
                          f"correctness check at C={sig[0]} {sig[1]}; "
                          f"falling back to XLA scan")
            except Exception as e:
                print(f"[scatter] pallas scan unavailable at C={sig[0]} "
                      f"{sig[1]} ({type(e).__name__}: {e}); using XLA scan")
                _PALLAS_OK[sig] = False
        try:
            # usually reached while TRACING the encoder, where nothing can
            # run eagerly (omnistaging) — run the one-time check on a fresh
            # thread, whose trace state is clean.  The join is bounded: a
            # hung mosaic compile must not hang the encoder's first call, so
            # after the timeout the (daemon) probe is abandoned and this
            # (C, dtype) is pinned to the XLA scan for the process lifetime.
            import threading
            th = threading.Thread(target=_check, daemon=True)
            th.start()
            th.join(timeout=_PALLAS_PROBE_TIMEOUT_S)
            if th.is_alive():
                print(f"[scatter] pallas probe timed out after "
                      f"{_PALLAS_PROBE_TIMEOUT_S:.0f}s at C={sig[0]} "
                      f"{sig[1]}; using XLA scan")
            if sig not in _PALLAS_OK:
                _PALLAS_OK[sig] = False
        except Exception as e:
            print(f"[scatter] pallas scan unavailable "
                  f"({type(e).__name__}: {e}); using XLA scan")
            _PALLAS_OK[sig] = False
    return _PALLAS_OK[sig]


def _pallas_default() -> bool:
    """Gate at the flagship encoder width (bench log/back-compat hook)."""
    return _pallas_ok(32, jnp.bfloat16)


def _seg_ends(seg_start):
    """End flags for the reverse scan: end[i] = start[i+1]; last row ends."""
    return jnp.concatenate(
        [seg_start[:, 1:], jnp.ones_like(seg_start[:, :1])], axis=1)


# ------------------------------------------------ cumsum-formulated pooling
# Masked tuple scans (lax.associative_scan with carry flags) measured ~9.8 ms
# at (8, 32768, 32) f32 on v5e, while a plain jnp.cumsum is 0.66 ms and a
# blocked MXU cumsum (tril-matmul per 256-block + block-offset cumsum) is
# ~0.06 ms.  With the per-point segment start/end positions from pool_plan,
# every segmented reduction becomes cumulative-scan + two boundary row
# gathers:
#   seg_sum  per point = CS[end_pos] - (CS - x)[start_pos]
#   seg_max  per point = decode(cummax(seg_id<<16 | sortable16(x)))[end_pos]
# The packed max trick needs the value in 16 bits (bf16/f16) and
# seg_id < 2^15 (N <= 32768) so the key fits int32; other cases fall back to
# the masked scans.

_CUMSUM_BLOCK = 256


def _cumsum_f32(x):
    """Inclusive cumsum along axis 1 in f32; blocked MXU form when N allows."""
    x = x.astype(jnp.float32)
    B, N, C = x.shape
    if N % _CUMSUM_BLOCK or N <= _CUMSUM_BLOCK:
        return jnp.cumsum(x, axis=1)
    nb = N // _CUMSUM_BLOCK
    xb = x.reshape(B, nb, _CUMSUM_BLOCK, C)
    L = jnp.tril(jnp.ones((_CUMSUM_BLOCK, _CUMSUM_BLOCK), jnp.float32))
    pref = jnp.einsum("lk,bnkc->bnlc", L, xb)
    tot = pref[:, :, -1, :]
    off = jnp.cumsum(tot, axis=1) - tot
    return (pref + off[:, :, None, :]).reshape(B, N, C)


def _row_gather(x, pos):
    """(B, N, C), (B, N) int -> (B, N, C): out[b, i] = x[b, pos[b, i]]."""
    return jnp.take_along_axis(x, pos[..., None], axis=1)


def _packed_segmax_scan(cs, seg_id, reverse: bool = False):
    """Inclusive segmented max scan of 16-bit floats via one int32 cummax.

    Packs (seg_id, sortable16(value)) into one int32 key; seg_id is
    nondecreasing along the scan direction (32767-seg_id when reverse) so the
    running key max always belongs to the current segment and its low 16 bits
    decode to the segmented running max.  Bit-exact vs the masked tuple scan
    (incl. +-0 up to sign, +-inf).
    """
    u = jax.lax.bitcast_convert_type(cs, jnp.uint16).astype(jnp.int32)
    sortable = jnp.where(u >= 0x8000, 0xFFFF - u, u + 0x8000)   # 0..65535
    sid = (32767 - seg_id) if reverse else seg_id
    key = sid[..., None] * 65536 + sortable
    m = jax.lax.cummax(key, axis=1, reverse=reverse)
    sv = m & 0xFFFF
    uv = jnp.where(sv >= 0x8000, sv - 0x8000, 0xFFFF - sv)
    return jax.lax.bitcast_convert_type(uv.astype(jnp.uint16), cs.dtype)


def _seg_sum_per_point(cs, start_pos, end_pos):
    """Per-point f32 segment total of cs (sorted order)."""
    CS = _cumsum_f32(cs)
    E = CS - cs.astype(jnp.float32)        # exclusive cumsum
    return _row_gather(CS, end_pos) - _row_gather(E, start_pos)


def _seg_sum_at_ends(cs, start_pos):
    """f32 segment totals valid ONLY at segment-END rows (garbage partial
    sums elsewhere): tot[i] = CS[i] - CS[start_pos[i] - 1].  At an end row
    CS[i] is local (no gather), so this costs ONE row gather instead of
    _seg_sum_per_point's two — and TPU row gathers are the grid-build's
    dominant cost (~7-14 cycles/row regardless of width, PERF.md).  Callers
    that only read end rows (grid builds, sparse downsampler steps) get
    identical values there."""
    CS = _cumsum_f32(cs)
    prev = jnp.maximum(start_pos - 1, 0)
    prev_cs = jnp.where((start_pos > 0)[..., None], _row_gather(CS, prev),
                        0.0)
    return CS - prev_cs


def _fast_ok(mode: str, dtype, n: int, part_bounds=None) -> bool:
    if mode == "max":
        if jnp.dtype(dtype).itemsize != 2:
            return False
        if n <= 32768:
            return True
        # the packed key needs seg_id < 2^15; with static part bounds
        # (disjoint sorted id ranges, e.g. the fused-tokenize splits) the
        # scan runs per part slice with rebased seg ids, so only the largest
        # PART must fit
        return (part_bounds is not None and
                max(b - a for a, b in zip(part_bounds[:-1], part_bounds[1:]))
                <= 32768)
    return jnp.issubdtype(dtype, jnp.floating)


def _packed_segmax_bounded(cs, seg_id, part_bounds, reverse: bool = False):
    """_packed_segmax_scan over static part slices.  part_bounds: ascending
    static ints (0, ..., N); segments never cross a bound (callers guarantee
    disjoint id ranges per part), so each slice scans independently with its
    seg ids rebased to 0 — lifting the N <= 32768 packed-key limit to a
    per-part limit."""
    if part_bounds is None or len(part_bounds) <= 2:
        return _packed_segmax_scan(cs, seg_id, reverse=reverse)
    outs = []
    for a, b in zip(part_bounds[:-1], part_bounds[1:]):
        sid = seg_id[:, a:b]
        sid = sid - sid[:, :1]
        outs.append(_packed_segmax_scan(cs[:, a:b], sid, reverse=reverse))
    return jnp.concatenate(outs, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pooled_sorted_fast(mode: str, part_bounds, cs, start_pos, end_pos,
                        seg_id):
    """Per-point pooled segment value, sorted order, cumsum-formulated."""
    return _psf_impl(mode, part_bounds, cs, start_pos, end_pos, seg_id)


def _psf_impl(mode, part_bounds, cs, start_pos, end_pos, seg_id):
    if mode == "max":
        # two direction-packed cummaxes beat one cummax + a C-wide row
        # gather (row gathers measured 2.4 ms vs 1.2 ms per cummax at
        # (8, 32768, 32) bf16 on v5e)
        return jnp.maximum(
            _packed_segmax_bounded(cs, seg_id, part_bounds),
            _packed_segmax_bounded(cs, seg_id, part_bounds, reverse=True))
    tot = _seg_sum_per_point(cs, start_pos, end_pos)
    if mode == "mean":
        n = (end_pos - start_pos + 1).astype(jnp.float32)
        tot = tot / n[..., None]
    return tot.astype(cs.dtype)


def _psf_fwd(mode, part_bounds, cs, start_pos, end_pos, seg_id):
    out = _psf_impl(mode, part_bounds, cs, start_pos, end_pos, seg_id)
    return out, (cs, out, start_pos, end_pos)


def _psf_bwd(mode, part_bounds, res, g):
    cs, out, start_pos, end_pos = res
    g_seg = _seg_sum_per_point(g, start_pos, end_pos)   # segment cotangent sum
    if mode == "max":
        # route each segment's summed cotangent to the FIRST per-channel
        # argmax point (torch_scatter semantics, matches _pg_bwd)
        is_max = (cs == out).astype(jnp.float32)
        MC = _cumsum_f32(is_max)
        prior = _row_gather(MC - is_max, start_pos)     # argmaxes before seg
        first = (is_max > 0) & (MC - prior == 1.0)
        dc = jnp.where(first, g_seg, 0.0)
    elif mode == "mean":
        n = (end_pos - start_pos + 1).astype(jnp.float32)
        dc = g_seg / n[..., None]
    else:
        dc = g_seg
    f0 = jax.dtypes.float0
    return (dc.astype(cs.dtype), np.zeros(start_pos.shape, f0),
            np.zeros(end_pos.shape, f0), np.zeros(end_pos.shape, f0))


_pooled_sorted_fast.defvjp(_psf_fwd, _psf_bwd)


def pooled_sorted(cs, plan, mode: str = "max", part_bounds=None):
    """Per-point pooled segment value for SORTED-order features.

    cs: (B, N, C) features already in the plan's sorted order.  Returns
    (B, N, C) where out[b, i] = pool over point i's segment.  This is
    pooled_gather without the perm/inv_perm gathers — the encoder keeps its
    whole per-point stack in sorted order and only pays the sort once.
    part_bounds: optional static ints (0, ..., N) marking slices no segment
    crosses (the fused-tokenize splits) — lets the packed max scan run past
    N = 32768 (see _packed_segmax_bounded).
    """
    scan_mode = "mean" if mode == "mean" else ("max" if mode == "max" else
                                               "sum")
    if _fast_ok(scan_mode, cs.dtype, cs.shape[1], part_bounds):
        bounds = (tuple(int(b) for b in part_bounds)
                  if part_bounds is not None and cs.shape[1] > 32768
                  else None)
        return _pooled_sorted_fast(scan_mode, bounds, cs, plan["start_pos"],
                                   plan["end_pos"], plan["seg_id"])
    # fallback: masked fwd+bwd scans (f32 max etc.)
    seg_start = plan["seg_start"]
    seg_end = _seg_ends(seg_start)
    sm = "max" if mode == "max" else "sum"
    fwd = _seg_scan(cs, seg_start, sm)
    bwd = _seg_scan(cs, seg_end, sm, reverse=True)
    if mode == "max":
        return jnp.maximum(fwd, bwd)
    total = fwd + bwd - cs
    if mode == "mean":
        ones = jnp.ones(cs.shape[:2] + (1,), cs.dtype)
        n = (_seg_scan(ones, seg_start, "sum")
             + _seg_scan(ones, seg_end, "sum", reverse=True) - 1.0)
        total = total / n
    return total


def _pg_core(mode: str, c, perm, inv_perm, seg_start, use_pallas: bool):
    """pooled_gather forward.  Returns (out, (cs, total, n)) with cs/total/n
    in SORTED point order (n is the per-point segment size, mean mode only) —
    the residuals the custom VJP of the pallas path needs."""
    cs = jnp.take_along_axis(c, perm[..., None], axis=1)
    seg_end = _seg_ends(seg_start)
    scan_mode = "max" if mode == "max" else "sum"
    if use_pallas:
        from . import pallas_scatter
        fwd = pallas_scatter.segmented_scan(cs, seg_start, scan_mode)
        bwd = pallas_scatter.segmented_scan(cs, seg_end, scan_mode,
                                            reverse=True)
    else:
        fwd = _seg_scan(cs, seg_start, scan_mode)
        bwd = _seg_scan(cs, seg_end, scan_mode, reverse=True)
    n = None
    if mode == "max":
        total = jnp.maximum(fwd, bwd)
    else:
        total = fwd + bwd - cs
        ones = jnp.ones(cs.shape[:2] + (1,), cs.dtype)
        cf = _seg_scan(ones, seg_start, "sum")
        cb = _seg_scan(ones, seg_end, "sum", reverse=True)
        n = cf + cb - 1.0
        total = total / n
    out = jnp.take_along_axis(total, inv_perm[..., None], axis=1)
    return out, (cs, total, n)


# pallas_call has no autodiff rules, so the pallas scan path carries a
# hand-written VJP (torch_scatter semantics): 'max' routes each segment's
# summed cotangent to the FIRST per-channel argmax point, 'mean' spreads it
# uniformly (1/n each).  The bwd pass itself runs on the XLA scans — it is a
# couple of sum scans of the cotangent, far off the hot path.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pooled_gather_pallas(mode: str, c, perm, inv_perm, seg_start):
    return _pg_core(mode, c, perm, inv_perm, seg_start, use_pallas=True)[0]


def _pg_fwd(mode, c, perm, inv_perm, seg_start):
    out, (cs, total, n) = _pg_core(mode, c, perm, inv_perm, seg_start,
                                   use_pallas=True)
    return out, (cs, total, n, perm, inv_perm, seg_start)


def _pg_bwd(mode, res, g):
    cs, total, n, perm, inv_perm, seg_start = res
    seg_end = _seg_ends(seg_start)
    # cotangent of the final gather: dtotal[b, j] = g[b, perm[b, j]]
    gs = jnp.take_along_axis(g, perm[..., None], axis=1).astype(jnp.float32)
    gf = _seg_scan(gs, seg_start, "sum")
    gb = _seg_scan(gs, seg_end, "sum", reverse=True)
    g_seg = gf + gb - gs                   # per-segment cotangent total
    if mode == "max":
        is_max = (cs == total).astype(jnp.float32)   # per channel
        cnt = _seg_scan(is_max, seg_start, "sum")    # running argmax count
        first = (is_max > 0) & (cnt == 1.0)
        dc_s = jnp.where(first, g_seg, 0.0)
    else:
        dc_s = g_seg / n.astype(jnp.float32)
    dc = jnp.take_along_axis(dc_s, inv_perm[..., None], axis=1)
    f0 = jax.dtypes.float0
    return (dc.astype(cs.dtype), np.zeros(perm.shape, f0),
            np.zeros(inv_perm.shape, f0), np.zeros(seg_start.shape, f0))


_pooled_gather_pallas.defvjp(_pg_fwd, _pg_bwd)


def pooled_gather(c, plan, mode: str = "max", use_pallas: bool = None):
    """Fused {scatter_max|scatter_mean} + gather_cells.

    c: (B, N, C) per-point features; plan: pool_plan(ids).  Returns (B, N, C)
    where out[b, i] = pool over all points j of batch b with
    ids[b, j] == ids[b, i] — exactly gather_cells(scatter_*(c, ids), ids),
    without materializing the (B, n_cells, C) dense grid.
    """
    if use_pallas is None:
        scan_mode = ("mean" if mode == "mean"
                     else ("max" if mode == "max" else "sum"))
        if "start_pos" in plan and _fast_ok(scan_mode, c.dtype, c.shape[1]):
            cs = jnp.take_along_axis(c, plan["perm"][..., None], axis=1)
            out_s = pooled_sorted(cs, plan, mode)
            return jnp.take_along_axis(out_s, plan["inv_perm"][..., None],
                                       axis=1)
        use_pallas = _pallas_ok(c.shape[-1], c.dtype)
    if use_pallas:
        return _pooled_gather_pallas(mode, c, plan["perm"], plan["inv_perm"],
                                     plan["seg_start"])
    return _pg_core(mode, c, plan["perm"], plan["inv_perm"],
                    plan["seg_start"], use_pallas=False)[0]


def scatter_mean_sorted(c, ids, plan, n_cells: int):
    """scatter_mean through an existing pool_plan: per-cell means land in the
    dense grid via a UNIQUE-index scatter (one row per segment end) instead
    of a duplicate-index scatter-add over every point.

    TPU scatters serialize on duplicate indices — segment_sum over B*64^3
    segments from 262k points is the encoder's hidden cost — while a scatter
    whose indices are unique and sorted lowers to a parallel store.  The
    segment totals come from the same inclusive scans pooled_gather already
    uses.  Exactly equals scatter_mean(c, ids, n_cells); empty cells are 0.
    """
    B, N, C = c.shape
    out_dtype = c.dtype
    # accumulate in f32: bf16 integer precision dies past 256 points/cell
    cs = jnp.take_along_axis(c, plan["perm"][..., None],
                             axis=1).astype(jnp.float32)
    ids_s = jnp.take_along_axis(ids, plan["perm"], axis=1)
    seg_start = plan["seg_start"]
    seg_end = jnp.concatenate(
        [seg_start[:, 1:], jnp.ones_like(seg_start[:, :1])], axis=1)
    sums = _seg_scan(cs, seg_start, "sum")                 # inclusive per-seg
    ones = jnp.ones(cs.shape[:2] + (1,), jnp.float32)
    cnts = _seg_scan(ones, seg_start, "sum")
    mean = (sums / jnp.maximum(cnts, 1.0)).astype(out_dtype)  # at seg ends
    # non-end rows point out of bounds -> dropped; the indices actually
    # written are then genuinely unique (one per segment)
    tgt = jnp.where(seg_end, ids_s, n_cells)

    def one(t, v):
        g = jnp.zeros((n_cells, C), v.dtype)
        return g.at[t].set(v, mode="drop", unique_indices=True)
    return jax.vmap(one)(tgt, mean)


# The dense grid build is the encoder's hidden cost: a C-wide scatter at
# B8 x 49k pts -> 64^3 measured ~52 ms (duplicate-index segment_sum) and
# ~63 ms (unique-index row stores, scatter_mean_sorted) on v5e — both ~150x
# off HBM speed-of-light — while a 1-wide unique-index store (occupancy grid)
# measured ~0 ms.  TPU scatter cost scales with scattered ROW WIDTH, so
# scatter_mean_gather moves all C-wide traffic to gathers: scatter only an
# int32 POINTER per segment end into the grid, then gather the per-segment
# mean rows through the pointers.  Measured 52.5 -> ~3 ms.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def scatter_mean_gather(n_cells: int, presorted: bool, c, ids_s, perm,
                        inv_perm, start_pos, end_pos):
    """== scatter_mean(c, ids, n_cells) through an existing pool_plan.

    c: (B, N, C) features — in ORIGINAL point order when presorted is False
    (sorted internally via argsort(inv_perm)), or already in the plan's
    sorted order when presorted is True (inv_perm then unused by the fwd).
    ids_s/start_pos/end_pos: pool_plan fields.  f32 accumulation via
    cumsum-diff (see _seg_sum_per_point).
    """
    return _smg_fwd_impl(n_cells, presorted, c, ids_s, perm, start_pos,
                         end_pos)


def _smg_fwd_impl(n_cells, presorted, c, ids_s, perm, start_pos, end_pos):
    B, N, C = c.shape
    if presorted:
        cs = c
    else:
        cs = jnp.take_along_axis(c, perm[..., None], axis=1)
    # the pointer gather below reads ONLY segment-end rows (+ the zero pad
    # row), so the cheaper ends-only segment sum (one row gather, not two)
    # produces an identical grid
    tot = _seg_sum_at_ends(cs, start_pos)
    n = (end_pos - start_pos + 1).astype(jnp.float32)
    mean = (tot / n[..., None]).astype(c.dtype)          # valid at END rows
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    seg_end = iota == end_pos
    tgt = jnp.where(seg_end, ids_s, n_cells)     # non-ends dropped

    def one(t, i):
        g = jnp.full((n_cells,), N, jnp.int32)   # N = empty-cell sentinel
        return g.at[t].set(i, mode="drop", unique_indices=True)

    ptr = jax.vmap(one)(tgt, iota)                        # (B, n_cells)
    mean_pad = jnp.concatenate(
        [mean, jnp.zeros((B, 1, C), mean.dtype)], axis=1)
    return jnp.take_along_axis(mean_pad, ptr[..., None], axis=1)


def _smg_fwd(n_cells, presorted, c, ids_s, perm, inv_perm, start_pos,
             end_pos):
    grid = _smg_fwd_impl(n_cells, presorted, c, ids_s, perm, start_pos,
                         end_pos)
    return grid, (ids_s, inv_perm, start_pos, end_pos,
                  jnp.zeros((0,), c.dtype))


def _smg_bwd(n_cells, presorted, res, g):
    # grid[b, cell] = mean of segment at cell -> dc[point] = g[cell(point)]/n
    ids_s, inv_perm, start_pos, end_pos, cproto = res
    gs = jnp.take_along_axis(
        g.astype(jnp.float32), ids_s[..., None], axis=1)   # (B, N, C) gather
    n = (end_pos - start_pos + 1).astype(jnp.float32)[..., None]
    dc_s = gs / n
    # cotangent back to c's order: identity when c was presorted, else the
    # inv_perm gather (the transpose of the fwd's perm gather)
    dc = dc_s if presorted else jnp.take_along_axis(
        dc_s, inv_perm[..., None], axis=1)
    f0 = jax.dtypes.float0
    return (dc.astype(cproto.dtype), np.zeros(ids_s.shape, f0),
            np.zeros(inv_perm.shape, f0), np.zeros(inv_perm.shape, f0),
            np.zeros(start_pos.shape, f0), np.zeros(end_pos.shape, f0))


scatter_mean_gather.defvjp(_smg_fwd, _smg_bwd)


def scatter_mean_plan(c, ids, plan, n_cells: int):
    """Dense per-cell mean grid, gather-formulated (see scatter_mean_gather).
    Drop-in for scatter_mean when a pool_plan already exists; c is in
    ORIGINAL point order."""
    return scatter_mean_gather(n_cells, False, c, plan["ids_sorted"],
                               plan["perm"], plan["inv_perm"],
                               plan["start_pos"], plan["end_pos"])


def segment_mean_rows(cs, plan):
    """Per-point segment-mean rows for SORTED-order features, plus the
    is-segment-end row mask — the sparse-direct grid feed (one meaningful row
    per distinct cell, at its segment's end position).

    cs: (B, N, C) sorted-order features.  Returns (mean (B, N, C) valid at
    END rows — partial-sum garbage elsewhere, callers mask by is_end —,
    is_end (B, N) bool)."""
    tot = _seg_sum_at_ends(cs, plan["start_pos"])
    n = (plan["end_pos"] - plan["start_pos"] + 1).astype(jnp.float32)
    mean = (tot / n[..., None]).astype(cs.dtype)
    iota = jnp.arange(cs.shape[1], dtype=jnp.int32)[None]
    return mean, iota == plan["end_pos"]


def scatter_mean_sorted_c(cs, plan, n_cells: int):
    """Dense per-cell mean grid from SORTED-order features (the sorted-order
    encoder path: no permutation gathers at all)."""
    return scatter_mean_gather(n_cells, True, cs, plan["ids_sorted"],
                               plan["perm"], plan["inv_perm"],
                               plan["start_pos"], plan["end_pos"])


def scatter_add_dense(u, ids, n_cells: int):
    """Σ-scatter rows with DUPLICATE ids into a dense (B, n_cells, C) grid,
    gather-formulated: sort by cell id, ends-only segment sums, 1-wide
    pointer store, one C-wide row gather.  == jnp.zeros(...).at[ids].add(u)
    per batch row, but avoids the XLA scatter (measured 62.6 ms for 524k
    rows -> 64^3 x 32 on v5e vs ~25 ms for this formulation; TPU scatter
    serializes, PERF.md row law).  f32 accumulation; empty cells 0.

    u: (B, N, C) contribution rows; ids: (B, N) target cells in
    [0, n_cells) (use n_cells as a drop sentinel).  Forward-only building
    block (no custom VJP) — used inside hand-written VJPs (grid_sample).
    """
    B, N, C = u.shape
    plan = pool_plan(ids)
    us = jnp.take_along_axis(u, plan["perm"][..., None], axis=1)
    tot = _seg_sum_at_ends(us, plan["start_pos"])          # f32, at ends
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    seg_end = iota == plan["end_pos"]
    tgt = jnp.where(seg_end & (plan["ids_sorted"] < n_cells),
                    plan["ids_sorted"], n_cells)

    def one(t, i):
        g = jnp.full((n_cells,), N, jnp.int32)
        return g.at[t].set(i, mode="drop", unique_indices=True)

    ptr = jax.vmap(one)(tgt, iota)
    tot_pad = jnp.concatenate(
        [tot, jnp.zeros((B, 1, C), tot.dtype)], axis=1)
    return jnp.take_along_axis(tot_pad, ptr[..., None], axis=1)


def occupancy_mask(ids, n_cells: int):
    """(B, N) -> (B, n_cells) bool: True where a cell contains >= 1 point
    (replaces the index_put mask build at enc.py:85-91)."""
    B = ids.shape[0]
    seg = _flat_segments(ids, n_cells)
    cnt = jax.ops.segment_sum(jnp.ones_like(seg, jnp.int32), seg,
                              num_segments=B * n_cells)
    return (cnt > 0).reshape(B, n_cells)


def occupancy_from_plan(ids, plan, n_cells: int):
    """occupancy_mask through an existing pool_plan: one unique-index store
    per segment end instead of a duplicate-index scatter-add per point (see
    scatter_mean_sorted for why duplicates hurt on TPU)."""
    ids_s = jnp.take_along_axis(ids, plan["perm"], axis=1)
    seg_start = plan["seg_start"]
    seg_end = jnp.concatenate(
        [seg_start[:, 1:], jnp.ones_like(seg_start[:, :1])], axis=1)
    tgt = jnp.where(seg_end, ids_s, n_cells)       # out of bounds -> dropped

    def one(t):
        g = jnp.zeros((n_cells,), bool)
        return g.at[t].set(True, mode="drop", unique_indices=True)
    return jax.vmap(one)(tgt)
