"""Strided conv Downsampler / nearest-upsample Upsampler (channels-last).

Semantics parity with shapeformer/models/vqdif/updown.py:79-132:
  ConvLayer order 'crg' = Conv3d(bias=False) -> ReLU -> GroupNorm(8)
  Downsampler step: k=2 s=2 conv doubling channels, then 1x1x1 conv
  Upsampler step:   x2 nearest upsample, then two k=3 convs halving channels
All convs operate on (B, X, Y, Z, C) NDHWC tensors for TPU-friendly layout.

The Downsampler additionally carries a SPARSE-DIRECT path (`sparse_call`):
the encoder's grid is overwhelmingly empty (<= N points occupy <= N of 64^3
cells), yet the dense path materializes the full (B, 64^3, C) grid — two
~16 ms row-gathers plus dense convs per tokenize at B8 on v5e, the hot
fraction of the frozen-VQDIF tokenization inside every ShapeFormer train
step.  sparse_call computes the identical Conv->ReLU->GroupNorm chain on
(occupied-cell rows, background value) pairs:
  - k2s2 conv: each coarse cell sees 8 children = background + occupied
    deltas, so coarse = bg @ sum_o(W_o) + segment-sum of delta @ W_{o(i)};
  - ReLU applies to actual values (rows and bg alike);
  - GroupNorm statistics decompose into occupied-row sums plus
    (n_cells - n_occupied) copies of the background value.
Exact vs the dense path up to float reassociation (tested in test_vqdif).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import scatter


class Conv3dNB(nn.Module):
    """Bias-free 3D conv with an explicitly declared kernel so sibling sparse
    paths can reuse the same weights.  Param tree ('kernel' of shape
    (k, k, k, Cin, Cout)), init, and numerics match nn.Conv(use_bias=False)
    with NDHWC/DHWIO dimension numbers."""
    features: int
    in_features: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        k = self.ksize
        self.kernel_w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, k, self.in_features, self.features), jnp.float32)

    def weights(self):
        """(k, k, k, Cin, Cout) kernel promoted to the compute dtype."""
        (w,) = nn.dtypes.promote_dtype(self.kernel_w, dtype=self.dtype)
        return w

    def __call__(self, x):
        x, w = nn.dtypes.promote_dtype(x, self.kernel_w, dtype=self.dtype)
        return jax.lax.conv_general_dilated(
            x, w, (self.stride,) * 3, [(self.pad, self.pad)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class GN(nn.Module):
    """GroupNorm over the channel-minor axis; numerics mirror
    flax.linen.GroupNorm (f32 fast-variance stats, normalize in f32, cast to
    dtype) with params 'scale'/'bias', plus a moments-form entry point for
    the sparse path."""
    features: int
    num_groups: int = 8
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x):
        """x: (B, ..., C) -> same shape; stats per (batch, group) over all
        non-batch axes (flax GroupNorm semantics)."""
        C = x.shape[-1]
        G = self.num_groups
        scale, bias = self.scale, self.bias
        xf = x.astype(jnp.float32)
        xg = xf.reshape(x.shape[:-1] + (G, C // G))
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mu = xg.mean(axes)                                     # (B, G)
        mu2 = (xg * xg).mean(axes)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        return self._apply(x, mu, var, scale, bias)

    def _apply(self, x, mu, var, scale, bias):
        C = x.shape[-1]
        G = self.num_groups
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (G, 1)
        xg = x.astype(jnp.float32).reshape(x.shape[:-1] + (G, C // G))
        y = (xg - mu.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape)
                                                     + self.epsilon)
        y = y.reshape(x.shape) * scale + bias
        return y.astype(self.dtype)

    def normalize_with_moments(self, x, mu, var):
        """Normalize x with externally computed per-(batch, group) moments
        (the sparse path's analytic dense-grid statistics)."""
        return self._apply(x, mu, var, self.scale, self.bias)


class ConvCRG(nn.Module):
    """Conv3d (no bias) -> ReLU -> GroupNorm(num_groups)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    # set to enable the sparse path (the explicit-kernel conv needs it)
    in_features: Optional[int] = None

    def setup(self):
        groups = (self.num_groups if self.features >= self.num_groups else 1)
        if self.in_features is not None:
            self.conv = Conv3dNB(self.features, self.in_features,
                                 ksize=self.kernel, stride=self.stride,
                                 pad=self.padding, dtype=self.dtype)
        else:
            pad = [(self.padding, self.padding)] * 3
            self.conv = nn.Conv(self.features,
                                kernel_size=(self.kernel,) * 3,
                                strides=(self.stride,) * 3, padding=pad,
                                use_bias=False, dtype=self.dtype)
        self.norm = GN(features=self.features, num_groups=groups,
                       epsilon=1e-5, dtype=self.dtype)

    def __call__(self, x):
        return self.norm(nn.relu(self.conv(x)))

    # ------------------------------------------------------------ sparse path
    def sparse_relu_norm(self, vals, bg, row_valid, n_occ, n_cells):
        """ReLU + GroupNorm on (occupied rows, background) of a virtual dense
        grid with n_cells cells, n_occ of which are the rows of `vals` where
        row_valid.  Returns (vals', bg') with invalid rows re-zeroed."""
        vals = jnp.maximum(vals, 0.0)
        bg = jnp.maximum(bg, 0.0)
        C = vals.shape[-1]
        G = self.norm.num_groups
        vf = vals.astype(jnp.float32) * row_valid[..., None]
        bgf = bg.astype(jnp.float32)
        s1 = vf.sum(axis=1).reshape(-1, G, C // G).sum(-1)          # (B, G)
        s2 = (vf * vf).sum(axis=1).reshape(-1, G, C // G).sum(-1)
        n_empty = (n_cells - n_occ).astype(jnp.float32)[:, None]
        b1 = bgf.reshape(-1, G, C // G).sum(-1)
        b2 = (bgf * bgf).reshape(-1, G, C // G).sum(-1)
        denom = float(n_cells * (C // G))
        mu = (s1 + n_empty * b1) / denom
        mu2 = (s2 + n_empty * b2) / denom
        var = jnp.maximum(0.0, mu2 - mu * mu)
        vals = self.norm.normalize_with_moments(vals, mu, var)
        bg = self.norm.normalize_with_moments(bg[:, None, :], mu,
                                              var)[:, 0, :]
        return vals * row_valid[..., None].astype(vals.dtype), bg


class Downsampler(nn.Module):
    in_channels: int
    downsample_steps: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.in_channels
        for i in range(self.downsample_steps):
            # setattr so module names stay down{i}_conv / down{i}_mix (the
            # checkpoint-converter layout, convert.py:105-113)
            setattr(self, f"down{i}_conv",
                    ConvCRG(2 * c, kernel=2, stride=2, padding=0,
                            dtype=self.dtype, in_features=c))
            setattr(self, f"down{i}_mix",
                    ConvCRG(2 * c, kernel=1, stride=1, padding=0,
                            dtype=self.dtype, in_features=2 * c))
            c *= 2

    def _layers(self):
        return [(getattr(self, f"down{i}_conv"), getattr(self, f"down{i}_mix"))
                for i in range(self.downsample_steps)]

    def __call__(self, x):
        for conv, mix in self._layers():
            x = mix(conv(x))
        return x

    # ------------------------------------------------------------ sparse path
    def sparse_call(self, vals, ids, reso: int, densify_at: int = 0):
        """Downsample WITHOUT materializing the fine dense grid.

        vals: (B, N, C) occupied-cell feature rows (zero on invalid rows);
        ids:  (B, N) ascending raveled fine-cell ids, == reso^3 (sentinel) on
              invalid rows; at most one valid row per distinct cell.
        Returns the (B, r_out, r_out, r_out, 2^steps * C) dense output grid —
        identical (up to float reassociation) to __call__ on the densified
        input (empty cells zero).

        densify_at: densify EARLY once the resolution reaches this value and
        run the remaining steps as dense convs.  TPU row gathers cost ~7-14
        cycles/row regardless of width (PERF.md), so the expensive term is
        per-CELL row counts: one sparse step then densifying at 32^3 pays
        8x fewer gather rows than the dense fine-grid build, while deeper
        sparse levels pay per-point sort+gather chains that stop paying for
        themselves (measured: full-sparse ties dense at 64^3).  0 keeps the
        all-sparse behavior (densify at the final resolution).
        """
        B, N, C = vals.shape
        bg = jnp.zeros((B, C), self.dtype)   # empty fine cells are zero
        r = reso
        vals = vals.astype(self.dtype)
        layers = self._layers()
        for i, (conv, mix) in enumerate(layers):
            if densify_at and r <= densify_at:
                grid = self._densify(vals, ids, bg, r)
                for conv2, mix2 in layers[i:]:
                    grid = mix2(conv2(grid))
                return grid
            vals, ids, bg, r = self._sparse_step(conv, mix, vals, ids, bg, r)
        return self._densify(vals, ids, bg, r)

    def _sparse_step(self, conv, mix, vals, ids, bg, r):
        B, N, C = vals.shape
        n_fine, rc = r ** 3, r // 2
        n_coarse = rc ** 3
        valid = ids < n_fine
        # fine cell -> (child offset o in 0..7, coarse cell id)
        x_, rem = ids // (r * r), ids % (r * r)
        y_, z_ = rem // r, rem % r
        o = ((x_ & 1) << 2) | ((y_ & 1) << 1) | (z_ & 1)
        coarse = ((x_ >> 1) * rc + (y_ >> 1)) * rc + (z_ >> 1)
        coarse = jnp.where(valid, coarse, n_coarse)

        W = conv.conv.weights().reshape(8, C, -1)           # (8, C, Cout)
        Cout = W.shape[-1]
        # delta rows: occupied value minus the background every cell carries
        delta = jnp.where(valid[..., None], vals - bg[:, None, :], 0.0)
        # one-hot offset expansion -> ONE (B, N, 8C) @ (8C, Cout) MXU matmul
        oh = jax.nn.one_hot(o, 8, dtype=delta.dtype)        # (B, N, 8)
        expanded = (oh[..., None] * delta[:, :, None, :]).reshape(B, N, 8 * C)
        contrib = expanded @ W.reshape(8 * C, Cout)         # (B, N, Cout)
        new_bg = bg @ W.sum(axis=0)                         # (B, Cout)

        # pool contributions by coarse cell (duplicates: up to 8 children)
        plan = scatter.pool_plan(coarse)
        cs = jnp.take_along_axis(contrib, plan["perm"][..., None], axis=1)
        # only segment-END rows are read below (row_valid implies is_end), so
        # the one-gather ends-only segment sum suffices (scatter.py row law)
        seg_tot = scatter._seg_sum_at_ends(
            cs, plan["start_pos"]).astype(vals.dtype)
        iota = jnp.arange(N, dtype=jnp.int32)[None]
        is_end = iota == plan["end_pos"]
        ids2 = plan["ids_sorted"]
        row_valid = is_end & (ids2 < n_coarse)
        vals2 = jnp.where(row_valid[..., None],
                          new_bg[:, None, :] + seg_tot, 0.0)
        ids2 = jnp.where(row_valid, ids2, n_coarse)
        n_occ = row_valid.sum(axis=1)

        # conv's ReLU+GroupNorm, then the 1x1 mix conv and its ReLU+GroupNorm
        vals2, bg2 = conv.sparse_relu_norm(vals2, new_bg, row_valid, n_occ,
                                           n_coarse)
        Wm = mix.conv.weights().reshape(Cout, Cout)
        vals2, bg2 = mix.sparse_relu_norm(vals2 @ Wm, bg2 @ Wm, row_valid,
                                          n_occ, n_coarse)
        return vals2, ids2, bg2, rc

    def _densify(self, vals, ids, bg, r):
        """(rows, ids, bg) -> (B, r, r, r, C) dense grid: bg everywhere, row
        values at their cells (1-wide pointer store + row gather)."""
        B, N, C = vals.shape
        n_cells = r ** 3
        iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))

        def one(t, i):
            g = jnp.full((n_cells,), N, jnp.int32)
            return g.at[t].set(i, mode="drop", unique_indices=True)

        ptr = jax.vmap(one)(jnp.where(ids < n_cells, ids, n_cells), iota)
        vals_pad = jnp.concatenate(
            [vals, jnp.zeros((B, 1, C), vals.dtype)], axis=1)
        grid = jnp.take_along_axis(vals_pad, ptr[..., None], axis=1)
        grid = jnp.where((ptr == N)[..., None], bg[:, None, :], grid)
        return grid.reshape(B, r, r, r, C)


def upsample_nearest2x(x):
    """(B, X, Y, Z, C) -> (B, 2X, 2Y, 2Z, C) nearest-neighbor."""
    for axis in (1, 2, 3):
        x = jnp.repeat(x, 2, axis=axis)
    return x


class Upsampler(nn.Module):
    in_channels: int
    upsampler_steps: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        for i in range(self.upsampler_steps):
            c = int(c / 2)
            x = upsample_nearest2x(x)
            x = ConvCRG(c, kernel=3, stride=1, padding=1, dtype=self.dtype,
                        name=f"up{i}_conv0")(x)
            x = ConvCRG(c, kernel=3, stride=1, padding=1, dtype=self.dtype,
                        name=f"up{i}_conv1")(x)
        return x
