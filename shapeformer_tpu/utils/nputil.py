"""Host-side numpy utilities (grids, index raveling, voxel block compression).

Behavioral parity targets (semantics, not code) in the reference:
  makeGrid                 xgutils/nputil.py:618-655
  ravel/unravel            xgutils/ptutil.py:357-377 (torch) -> numpy here
  z-order (Morton) ravel   xgutils/ptutil.py:396-423
  point2index/index2point  xgutils/ptutil.py:425-489
  point2voxel              xgutils/ptutil.py:520-550
  compress/decompress      xgutils/ptutil.py:260-285 (256^3 -> 16^3-block vocab)
All functions are pure numpy; device-side jnp twins live in shapeformer_tpu.ops.
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- scalar math
def sigmoid(x):
    x = np.asarray(x)
    return np.where(x >= 0, 1.0 / (1.0 + np.exp(-np.abs(x))),
                    np.exp(-np.abs(x)) / (1.0 + np.exp(-np.abs(x))))


def logsoftmax(x, axis=-1):
    x = np.asarray(x, dtype=np.float64)
    m = x.max(axis=axis, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=axis, keepdims=True))


# ---------------------------------------------------------------------- grids
def makeGrid(bb_min=(0, 0, 0), bb_max=(1, 1, 1), shape=(10, 10, 10),
             mode="on", flatten=True, indexing="ij"):
    """Dense grid of coordinates over a bounding box.

    mode='on'  -> vertices on the boundary (align_corners=True)
    mode='in'  -> cell centers strictly inside (align_corners=False)
    Returns (prod(shape), D) if flatten else (*shape, D).
    """
    bb_min, bb_max = np.asarray(bb_min, np.float64), np.asarray(bb_max, np.float64)
    if isinstance(shape, int):
        shape = [shape] * bb_min.shape[0]
    coords = []
    for i, si in enumerate(shape):
        if mode == "on":
            coords.append(np.linspace(bb_min[i], bb_max[i], si))
        elif mode == "in":
            off = (bb_max[i] - bb_min[i]) / 2.0 / si
            coords.append(np.linspace(bb_min[i] + off, bb_max[i] - off, si))
        else:
            raise ValueError(f"unknown grid mode {mode!r}")
    grid = np.stack(np.meshgrid(*coords, sparse=False, indexing=indexing), axis=-1)
    if flatten:
        grid = grid.reshape(-1, grid.shape[-1])
    return grid


def array2NDCube(array, N=3):
    array = np.asarray(array)
    dim = int(round(array.shape[0] ** (1.0 / N)))
    while dim ** N < array.shape[0]:
        dim += 1
    return array.reshape((dim,) * N)


# ----------------------------------------------------------------- ravel/index
def ravel_index(idx, shape):
    """(..., D) integer multi-index -> (...,) flat index; C order."""
    idx = np.asarray(idx)
    out = idx[..., 0].astype(np.int64)
    for d in range(1, idx.shape[-1]):
        out = out * shape[d] + idx[..., d]
    return out


def unravel_index(flat, shape):
    """(...,) flat index -> (..., D) multi-index; C order."""
    flat = np.asarray(flat).astype(np.int64)
    out = []
    for d in range(len(shape) - 1, -1, -1):
        out.append(flat % shape[d])
        flat = flat // shape[d]
    return np.stack(out[::-1], axis=-1)


def _part_bits(v, nbits, dim):
    """Spread the low `nbits` bits of v so consecutive bits are `dim` apart."""
    v = np.asarray(v, dtype=np.int64)
    out = np.zeros_like(v)
    for b in range(nbits):
        out |= ((v >> b) & 1) << (b * dim)
    return out


def ravel_index_zorder(idx, depth):
    """Multi-index (..., D) -> Morton (z-order) code with `depth` bits/axis.

    Bit interleaving matches the reference convention (ptutil.py:396-404):
    axis 0 contributes the most-significant bit of each `dim`-bit group.
    """
    idx = np.asarray(idx, dtype=np.int64)
    dim = idx.shape[-1]
    out = np.zeros(idx.shape[:-1], dtype=np.int64)
    for a in range(dim):
        out |= _part_bits(idx[..., a], depth, dim) << (dim - 1 - a)
    return out


def unravel_index_zorder(code, dim, depth):
    code = np.asarray(code, dtype=np.int64)
    axes = []
    for a in range(dim):
        shifted = code >> (dim - 1 - a)
        v = np.zeros_like(code)
        for b in range(depth):
            v |= ((shifted >> (b * dim)) & 1) << b
        axes.append(v)
    return np.stack(axes, axis=-1)


# --------------------------------------------------------------- point <-> cell
def point2index(points, grid_dim=32, ravel=False, ravel_type="flat"):
    """Points in [-1,1]^D -> nearest-cell indices on an 'in'-mode grid.

    Matches ptutil.point2index (ptutil.py:425-470): p01*grid_dim - 0.5,
    rounded and clamped to [0, grid_dim-1].
    """
    points = np.asarray(points)
    p01 = (points + 1.0) / 2.0
    shifted = p01 * grid_dim - 0.5
    index = np.clip(np.round(shifted), 0, grid_dim - 1).astype(np.int64)
    if ravel:
        if ravel_type == "flat":
            return ravel_index(index, (grid_dim,) * points.shape[-1])
        elif ravel_type == "zorder":
            depth = int(np.log2(grid_dim))
            assert 2 ** depth == grid_dim
            return ravel_index_zorder(index, depth=depth)
        raise ValueError(ravel_type)
    return index


def index2point(index, grid_dim=32):
    """Cell index -> coordinate of the cell center in [-1,1] (ptutil.py:471-489)."""
    index = np.asarray(index, dtype=np.float64)
    return ((index + 0.5) / grid_dim) * 2.0 - 1.0


def point2voxel(points, grid_dim=32):
    """Binary-voxelize a batched point cloud: (B, N, D) -> (B, (grid_dim,)*D)."""
    points = np.asarray(points)
    B, N, D = points.shape
    vox = np.zeros((B,) + (grid_dim,) * D, dtype=np.float32)
    flat = point2index(points, grid_dim=grid_dim, ravel=True).reshape(B, N)
    for b in range(B):  # B is tiny in data-pipeline use
        vox[b].reshape(-1)[flat[b]] = 1.0
    return vox


# ------------------------------------------------------------ cube un/folding
def unfold_cube(arr, last_dims=3, size=2, step=2, flatten=True):
    """Split the trailing `last_dims` axes into non-overlapping size^N blocks
    (ptutil.unfold_cube, ptutil.py:236-247; torch .unfold with size == step)."""
    assert size == step, "only non-overlapping blocks are used by the pipeline"
    arr = np.asarray(arr)
    batch = arr.shape[:-last_dims]
    dims = arr.shape[-last_dims:]
    assert all(d % size == 0 for d in dims), (dims, size)
    split = []
    for d in dims:
        split += [d // size, size]
    x = arr.reshape(*batch, *split)
    nb = len(batch)
    order = (list(range(nb)) + [nb + 2 * i for i in range(last_dims)]
             + [nb + 2 * i + 1 for i in range(last_dims)])
    x = np.transpose(x, order)
    if flatten:
        n_blocks = int(np.prod([d // size for d in dims]))
        x = x.reshape(*batch, n_blocks, size ** last_dims)
    return x


def fold_cube(unfolded, N=3):
    """Inverse of unfold_cube(flatten=True): (..., n_blocks, cell^N) -> dense
    (ptutil.fold_cube, ptutil.py:248-258)."""
    unfolded = np.asarray(unfolded)
    batch = unfolded.shape[:-2]
    nb_dim = int(round(unfolded.shape[-2] ** (1.0 / N)))
    s = int(round(unfolded.shape[-1] ** (1.0 / N)))
    assert nb_dim ** N == unfolded.shape[-2] and s ** N == unfolded.shape[-1]
    x = unfolded.reshape(*batch, *((nb_dim,) * N), *((s,) * N))
    b = len(batch)
    order = list(range(b))
    for i in range(N):
        order += [b + i, b + N + i]
    x = np.transpose(x, order)
    return x.reshape(*batch, *((nb_dim * s,) * N))


# ------------------------------------------------------------- octree codes
def zorder2tree(codes, dim=3, bits=6):
    """Morton codes -> sorted unique octree node codes: each code prefixed
    with a root bit, plus every ancestor prefix (ptutil.zorder2tree,
    ptutil.py:338-354)."""
    codes = np.asarray(codes, np.int64) + (np.int64(1) << (bits * dim))
    shifts = (np.arange(bits + 1, dtype=np.int64) * dim)
    tree = (codes[..., None] >> shifts).reshape(-1)
    return np.unique(tree)


def point2tree(points, depth=6, max_length=-1):
    """Points in [-1,1]^D -> sorted octree node codes at `depth`
    (ptutil.point2tree, ptutil.py:491-502)."""
    points = np.asarray(points)
    codes = point2index(points, grid_dim=2 ** depth, ravel=True,
                        ravel_type="zorder")
    tree = zorder2tree(codes, dim=points.shape[-1], bits=depth)
    if max_length > -1:
        tree = tree[:max_length]
    return tree


def tree2bboxes(tree, dim=3, depth=6):
    """Octree node codes -> (box centers in [-1,1], box half-len*2, node
    depths) (ptutil.tree2bboxes, ptutil.py:503-518)."""
    tree = np.asarray(tree, np.int64)
    first_bit = np.floor(np.log2(tree.astype(np.float64))).astype(np.int64)
    tdepth = first_bit // dim
    treeind = tree - (np.int64(1) << first_bit)
    idx = unravel_index_zorder(treeind, dim=dim, depth=depth)
    grid_dims = (np.int64(1) << tdepth).astype(np.float64)
    boxcenter = index2point(idx, grid_dim=grid_dims[..., None])
    boxlen = 1.0 / grid_dims
    return boxcenter, boxlen, tdepth


# ------------------------------------------------------- block voxel compression
def compress_voxels(voxel, block=16, packbits=True):
    """Compress a cubic binary voxel grid into (vocab, idx) of `block`^3 tiles.

    Tile vocabulary convention matches ptutil.compress_voxels (ptutil.py:260-275):
    vocab[0]=empty, vocab[1]=full, vocab[2:]=distinct partial tiles in scan order.
    """
    voxel = np.asarray(voxel)
    res = voxel.shape[-1]
    assert voxel.shape == (res, res, res) and res % block == 0
    nb = res // block
    tiles = voxel.reshape(nb, block, nb, block, nb, block) \
                 .transpose(0, 2, 4, 1, 3, 5).reshape(nb ** 3, block ** 3)
    s = tiles.sum(axis=-1)
    empty, full = s == 0, s == block ** 3
    partial_idx = np.where(~empty & ~full)[0]
    vocab = np.zeros((2 + len(partial_idx), block ** 3), dtype=bool)
    vocab[1] = True
    vocab[2:] = tiles[partial_idx].astype(bool)
    idx = np.zeros(nb ** 3, dtype=np.int16)
    idx[full] = 1
    idx[partial_idx] = 2 + np.arange(len(partial_idx))
    assert (vocab[idx] == tiles.astype(bool)).all(), "invalid compression"
    if packbits:
        vocab = np.packbits(vocab, axis=-1)
    return vocab, idx


def decompress_voxels(vocab, idx, unpackbits=True):
    """Inverse of compress_voxels (ptutil.py:276-285)."""
    vocab = np.asarray(vocab)
    if unpackbits:
        vocab = np.unpackbits(vocab, axis=-1)
    tiles = vocab[np.asarray(idx, dtype=np.int64)]
    nb3, b3 = tiles.shape
    nb = int(round(nb3 ** (1 / 3)))
    block = int(round(b3 ** (1 / 3)))
    grid = tiles.reshape(nb, nb, nb, block, block, block) \
                .transpose(0, 3, 1, 4, 2, 5).reshape(nb * block, nb * block, nb * block)
    return grid
