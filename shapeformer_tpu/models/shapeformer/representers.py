"""Representers: bridge between the frozen VQDIF tokenizer and the transformer.

Semantics parity with shapeformer/models/shapeformer/representers.py:18-443:
  - encode_cloud: frozen VQDIF quantize_cloud -> padded (pos, val) sequences
    (representers.py:68-77), with optional cloud_shrinkage and no_val_ind;
  - get_indices: condition tokens from Xct, target tokens from Xbd, uncond
    mode, train-time random condition-token dropout (representers.py:79-103);
  - coordinate codings AR / RR (relative raveled) / AU (absolute unraveled)
    and the AR_N "next condition position" extra channel
    (representers.py:183-299, 373-443);
  - sampling maskers enforcing monotonic positions, end-token semantics and
    completion consistency (representers.py:120-155), vectorized as jnp.where
    masks with static shapes instead of boolean fancy-indexing.

Design notes (TPU-first):
  - all sequences are statically padded to max_length = block_size // 2 with
    end tokens; attention/loss masks (ops.sparse.token_mask) recover the
    reference's dynamic-length behavior;
  - random_cind_masking draws a per-row uniform subset size (the reference
    shares one subset across the batch because its batch is 1);
  - the representer is a plain python object; its methods are pure functions
    of the frozen VQDIF variables and run inside jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import config as _config
from ...ops import sparse as sparse_ops
from ...ops.sampling import NEG_INF


# ------------------------------------------------------------- AR/RR/AU codecs
def AR_to_RR(ar, end_token: int):
    """Absolute raveled -> relative (delta) coding, (B, L) (representers.py:391)."""
    if ar.shape[1] == 0:
        return ar
    diff = ar - jnp.roll(ar, 1, axis=1)
    diff = diff.at[:, 0].set(ar[:, 0])
    return jnp.where(ar == end_token, end_token, diff)


def RR_to_AR(rr, end_token: int):
    if rr.shape[1] == 0:
        return rr
    ar = jnp.cumsum(rr, axis=1)
    return jnp.where(rr == end_token, end_token, ar)


def unravel3(idx, reso: int):
    """flat -> (z, y, x) triplets, matching representers.py:381-388."""
    xi = idx % reso
    yi = (idx // reso) % reso
    zi = idx // (reso * reso)
    return jnp.stack([zi, yi, xi], axis=-1)


def ravel3(zyx, reso: int):
    return zyx[..., 2] + reso * (zyx[..., 1] + reso * zyx[..., 0])


def AR_to_AU(ar, ar_end: int, au_end: int, reso: int = 16):
    """(B, L, 1) -> (B, L, 3) unraveled coords; end -> au_end per axis."""
    coords = unravel3(ar[..., 0], reso)
    return jnp.where((ar == ar_end), au_end, coords)


def AU_to_AR(au, ar_end: int, au_end: int, reso: int = 16):
    flat = ravel3(au, reso)[..., None]
    is_end = (au == au_end).any(axis=-1, keepdims=True)
    return jnp.where(is_end, ar_end, flat)


def get_next_cond(c_pos, z_pos, end_token: int):
    """For each z position, the smallest condition position strictly greater
    (end_token if none / if z is an end token); representers.py:432-442.
    c_pos: (B, Lc) ascending with end-token padding; z_pos: (B, Lz)."""
    if z_pos.shape[1] == 0:
        return z_pos
    big = jnp.int32(end_token)
    cand = jnp.where(c_pos[:, None, :] > z_pos[:, :, None],
                     c_pos[:, None, :], big)
    nxt = cand.min(axis=-1)
    return jnp.where(z_pos == end_token, end_token, nxt)


# ------------------------------------------------------------------- frozen VQ
def load_frozen_vqdif(vqvae_opt: dict):
    """Build the VQDIF module from its yaml + restore ckpt variables
    (init_trained_model_from_ckpt, representers.py:34-48)."""
    from ...checkpoint import restore_frozen_model
    return restore_frozen_model(vqvae_opt)


# ----------------------------------------------------------------- representers
class Representer:
    """Abstract interface (representers.py:18-48)."""

    def get_indices(self, **kwargs):
        raise NotImplementedError

    def get_extra_indices(self, c_indices, z_indices):
        raise NotImplementedError

    def convert_input_indices(self, c_indices, z_indices):
        return c_indices, z_indices

    def convert_output_indices(self, indices):
        return indices

    def sampling_masker(self, logits, *, tuple_i, step_j, new_pos=None,
                        prev_pos=None, cond_pos=None):
        return logits

    def mask_element(self, logits, tuple_i, step_j, prev_token, cur_elems,
                     cond_pos, prev_sum):
        """Generic sampler hook: mask element tuple_i's logits given the
        previous full token (B, tuple_n) and the elements already sampled this
        step.  Default adapts the 2-tuple sampling_masker signature."""
        if tuple_i == 0:
            kw = dict(tuple_i=0, step_j=step_j, prev_pos=prev_token[:, 0],
                      cond_pos=cond_pos)
            try:
                return self.sampling_masker(logits, prev_pos_sum=prev_sum,
                                            **kw)
            except TypeError:
                return self.sampling_masker(logits, **kw)
        return self.sampling_masker(logits, tuple_i=tuple_i, step_j=step_j,
                                    new_pos=cur_elems[0])


class ShapeRepresenter(Representer):
    """AR (absolute raveled) base representer (representers.py:53-155)."""

    extra_tuple_n = 1

    def __init__(self, voxel_res=16, end_tokens=None, input_end_tokens=None,
                 block_size=None, uncond=False, no_val_ind=False,
                 vqvae_opt=None, cloud_shrinkage=1.0,
                 random_cind_masking=False, mask_invalid=True,
                 mask_invalid_completion=False, defer_vqvae=False,
                 fuse_tokenize=False):
        self.voxel_res = voxel_res
        self.end_tokens = tuple(end_tokens)
        self.input_end_tokens = tuple(input_end_tokens or end_tokens)
        self.block_size = block_size
        self.uncond = uncond
        self.no_val_ind = no_val_ind
        self.cloud_shrinkage = cloud_shrinkage
        self.random_cind_masking = random_cind_masking
        self.mask_invalid = mask_invalid
        self.mask_invalid_completion = mask_invalid_completion
        self.fuse_tokenize = fuse_tokenize
        self.max_length = block_size // 2
        self.vqvae_opt = vqvae_opt
        self.vqdif_model, self.vqdif_vars = None, None
        if vqvae_opt is not None and not defer_vqvae:
            self.vqdif_model, self.vqdif_vars = load_frozen_vqdif(vqvae_opt)

    def set_vqdif(self, model, variables):
        self.vqdif_model, self.vqdif_vars = model, variables

    def cond_token_mask(self, c_indices):
        """(B, L, tuple_n) CONVERTED condition tokens -> (B, L) validity mask.
        The default input coding keeps the input end tokens in place."""
        return sparse_ops.token_mask(c_indices, self.input_end_tokens) > 0

    # ------------------------------------------------------------- tokenizing
    def encode_cloud(self, cloud, vqdif_vars=None):
        """(B, N, 3) in [-1,1] -> (quant_feat, quant_ind, mode, (B, L, 2) seq).

        vqdif_vars overrides the stored frozen variables so jitted callers can
        thread them as traced arguments instead of baked-in constants."""
        from ..vqdif.vqdif import VQDIF
        quant_ind, mode, encoded = self.vqdif_model.apply(
            vqdif_vars if vqdif_vars is not None else self.vqdif_vars,
            cloud * self.cloud_shrinkage,
            method=VQDIF.quantize_cloud)
        vocab = self.vqdif_model.quantizer_opt["kwargs"]["vocab_size"]
        seq, mode = sparse_ops.dense2sparse(
            quant_ind, self.max_length, self.input_end_tokens, vocab, mode=mode)
        if self.no_val_ind:
            seq = seq.at[..., 1].set(0)
        return encoded["quant_feat"], quant_ind, mode, seq

    def _random_cind_mask(self, c_indices, rng):
        """Per-row uniform random subset of condition tokens, end kept, order
        preserved and re-compacted to the front (representers.py:93-99)."""
        B, L, _ = c_indices.shape
        lens = sparse_ops.seq_lengths(c_indices, self.input_end_tokens)  # real tokens
        k_rng, u_rng = jax.random.split(rng)
        # subset size ~ U{0..lens} per row (reference: U{0..max_num} shared)
        k = jnp.floor(jax.random.uniform(k_rng, (B,)) * (lens + 1)).astype(jnp.int32)
        k = jnp.minimum(k, lens)
        u = jax.random.uniform(u_rng, (B, L))
        pos_idx = jnp.arange(L)[None, :]
        u = jnp.where(pos_idx < lens[:, None], u, jnp.inf)
        rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
        keep = rank < k[:, None]
        slot = jnp.cumsum(keep, axis=1) - 1
        tgt = jnp.where(keep, slot, L)
        e = jnp.asarray(self.input_end_tokens, jnp.int32)
        out = jnp.broadcast_to(e[None, None, :], (B, L + 1, 2)).astype(jnp.int32)
        out = out.at[jnp.arange(B)[:, None], tgt].set(
            jnp.where(keep[..., None], c_indices, e[None, None, :]))
        return out[:, :L, :]

    def encode_clouds_fused(self, Xct, Xbd, vqdif_vars=None):
        """encode_cloud over Xct AND Xbd through ONE frozen-VQDIF invocation
        (VQDIF.quantize_clouds_fused): one sort/scatter/Downsampler/codebook
        pass instead of two.  Exact same outputs as two encode_cloud calls —
        per-cloud mode semantics preserved (pinned in
        tests/test_vqdif.py::test_fused_tokenize_matches_two_calls).

        Measured NEGATIVE at the flagship training shapes (v5e, B8,
        Xct 16k + Xbd 32k): 94.8 ms fused vs 74.2 ms two-call wall — both
        tokenizes already sit inside the ONE jitted train step, so there were
        no per-call dispatch costs to consolidate, and the concat pays a
        longer 49k-point sort plus per-part segmented-scan slicing
        (scatter._packed_segmax_bounded).  Hence fuse_tokenize defaults to
        False; the path stays as a tested opt-in (PERF.md)."""
        from ..vqdif.vqdif import VQDIF
        parts = self.vqdif_model.apply(
            vqdif_vars if vqdif_vars is not None else self.vqdif_vars,
            [Xct * self.cloud_shrinkage, Xbd * self.cloud_shrinkage],
            method=VQDIF.quantize_clouds_fused)
        vocab = self.vqdif_model.quantizer_opt["kwargs"]["vocab_size"]
        seqs = []
        for quant_ind, mode, _qf in parts:
            seq, _ = sparse_ops.dense2sparse(
                quant_ind, self.max_length, self.input_end_tokens, vocab,
                mode=mode)
            if self.no_val_ind:
                seq = seq.at[..., 1].set(0)
            seqs.append((mode, seq))
        return seqs

    def get_indices(self, Xct, Xbd=None, stage="train", rng=None,
                    vqdif_vars=None, **kwargs):
        """-> (c_indices, z_indices, extra_indices, others); all (B, L, .)
        statically padded (representers.py:79-103)."""
        enc_kw = (self.vqdif_model.encoder_opt or {}).get("kwargs") or {} \
            if self.vqdif_model is not None else {}
        if (self.fuse_tokenize and Xbd is not None
                and Xbd.shape[0] == Xct.shape[0]
                and not bool(enc_kw.get("sparse_tokenize", False))):
            (mode1, c_indices), (_, z_indices) = self.encode_clouds_fused(
                Xct, Xbd, vqdif_vars)
        else:
            _, _, mode1, c_indices = self.encode_cloud(Xct, vqdif_vars)
            if Xbd is None:
                z_indices = c_indices[:, :0, :]
            else:
                _, _, _, z_indices = self.encode_cloud(Xbd, vqdif_vars)
        if self.uncond:
            e = jnp.asarray(self.input_end_tokens, jnp.int32)
            c_indices = jnp.broadcast_to(e[None, None, :], c_indices.shape
                                         ).astype(jnp.int32)
        others = dict(empty_index=mode1, origin_c_indices=c_indices,
                      origin_z_indices=z_indices)
        if stage == "train" and self.random_cind_masking:
            assert rng is not None, "random_cind_masking needs an rng"
            c_indices = self._random_cind_mask(c_indices, rng)
        extra_indices = self.get_extra_indices(c_indices, z_indices)
        c_indices, z_indices = self.convert_input_indices(c_indices, z_indices)
        return c_indices, z_indices, extra_indices, others

    def get_extra_indices(self, c_indices, z_indices):
        """Base: a zero extra channel (representers.py:105-110)."""
        B = c_indices.shape[0]
        L = c_indices.shape[1] + z_indices.shape[1]
        return jnp.zeros((B, L, 1), jnp.int32)

    def sampling_next_extra(self, cond_pos, new_elem0, prev_elem0, step_j):
        """Extra index of a freshly sampled gen token.

        Matches the reference sampler, which recomputes get_extra_indices
        over the CONVERTED sampled buffer every step (shapeformer.py:78-87)
        — so each representer derives the new token's extra from its
        converted coding.  Base: whatever next_extra_for computes (AR_N) or
        zeros (the base get_extra_indices)."""
        if hasattr(self, "next_extra_for"):
            return self.next_extra_for(cond_pos, new_elem0)
        return jnp.zeros_like(new_elem0)

    # ---------------------------------------------------------------- masking
    def sampling_masker(self, logits, *, tuple_i, step_j, new_pos=None,
                        prev_pos=None, cond_pos=None):
        """Vectorized port of representers.py:120-155.

        tuple_i=0 masks the position logits given prev_pos (B,) = the previous
        token's position; tuple_i=1 masks value logits given new_pos (B,) =
        the just-sampled position.  cond_pos: (B, Lc) ascending cond positions
        padded with end tokens.  step_j is a traced scalar.
        """
        end = self.end_tokens
        V = logits.shape[-1]
        if tuple_i == 1:
            force_end = new_pos == end[0]
            forced = jnp.where(jnp.arange(V)[None, :] == end[1], 1.0, NEG_INF)
            return jnp.where(force_end[:, None], forced, logits)
        positions = jnp.arange(V)[None, :]
        if self.mask_invalid:
            invalid = positions <= prev_pos[:, None]
            invalid = invalid.at[:, end[0]].set(False)
            invalid = invalid & (step_j > 0)
            logits = jnp.where(invalid, NEG_INF, logits)
        if self.mask_invalid_completion:
            nxt = get_next_cond(cond_pos, prev_pos[:, None], end[0])[:, 0]
            # reference appends 1+end to cond_poses: if no cond pos exceeds
            # prev, next = 1+end -> nothing masked
            nxt = jnp.where(nxt == end[0], end[0] + 1, nxt)
            logits = jnp.where(positions > nxt[:, None], NEG_INF, logits)
        return logits


class CC(ShapeRepresenter):
    """Category-conditioning variant (representers.py:160-173): identical
    token flow, no random condition masking applied at train time."""

    def get_indices(self, Xct, Xbd=None, stage="train", rng=None, **kwargs):
        return super().get_indices(Xct, Xbd=Xbd, stage="test", rng=rng, **kwargs)


class AR(ShapeRepresenter):
    pass


class AR_N(ShapeRepresenter):
    """AR + 'next condition position' extra channel (representers.py:187-196)."""

    def get_extra_indices(self, c_indices, z_indices):
        c_extra = c_indices[..., 0]
        z_extra = get_next_cond(c_indices[..., 0], z_indices[..., 0],
                                self.end_tokens[0])
        return jnp.concatenate([c_extra, z_extra], axis=1)[..., None]

    def next_extra_for(self, cond_pos, new_pos):
        """Extra index of a freshly sampled gen token (used by the sampler)."""
        return get_next_cond(cond_pos, new_pos[:, None], self.end_tokens[0])[:, 0]


class AR_RR(ShapeRepresenter):
    """AR tokens + relative-raveled extra channel (representers.py:199-206)."""

    def get_extra_indices(self, c_indices, z_indices):
        cRR = AR_to_RR(c_indices[..., 0], self.end_tokens[0])
        zRR = AR_to_RR(z_indices[..., 0], self.end_tokens[0])
        return jnp.concatenate([cRR, zRR], axis=1)[..., None]

    def sampling_next_extra(self, cond_pos, new_elem0, prev_elem0, step_j):
        # AR_to_RR within the gen segment: token 0's delta is itself
        # (representers.py:391-398 via the reference's per-step recompute)
        end = self.end_tokens[0]
        delta = jnp.where(step_j == 0, new_elem0, new_elem0 - prev_elem0)
        return jnp.where(new_elem0 == end, end, delta)


class RR(ShapeRepresenter):
    """Relative-raveled position tokens (representers.py:209-267)."""

    def convert_input_indices(self, c_indices, z_indices):
        c_indices = c_indices.at[..., 0].set(
            AR_to_RR(c_indices[..., 0], self.end_tokens[0]))
        z_indices = z_indices.at[..., 0].set(
            AR_to_RR(z_indices[..., 0], self.end_tokens[0]))
        return c_indices, z_indices

    def convert_output_indices(self, indices):
        return indices.at[..., 0].set(
            RR_to_AR(indices[..., 0], self.end_tokens[0]))

    def sampling_masker(self, logits, *, tuple_i, step_j, new_pos=None,
                        prev_pos=None, cond_pos=None, prev_pos_sum=None):
        """RR masker (representers.py:223-267): dead rows emit end tokens;
        deltas must keep the cumulative position within the voxel grid and be
        strictly positive after the first step."""
        end = self.end_tokens
        V = logits.shape[-1]
        positions = jnp.arange(V)[None, :]
        if tuple_i == 1:
            dead = new_pos == end[0]
            forced = jnp.where(positions == end[1], 1.0, NEG_INF)
            # NOTE: the reference APPEARS to mask the end value for alive
            # rows (representers.py:245-246 `logits[alive_mask, end] = -inf`)
            # but that assignment is dead code — the final
            # `logits[alive_mask] = alive_logits` write-back (:267) restores
            # the pre-mask copy taken at :241.  Effective reference
            # semantics: alive rows may sample the end VALUE token; only the
            # position element controls death.  Pinned by the golden RR
            # trajectory test.
            return jnp.where(dead[:, None], forced, logits)
        dead = (prev_pos == end[0]) & (step_j > 0)
        forced = jnp.where(positions == end[0], 1.0, NEG_INF)
        feasible = (self.voxel_res ** 3 - 1) - prev_pos_sum
        invalid_late = (positions > feasible[:, None]) | (positions == 0)
        invalid_late = invalid_late.at[:, end[0]].set(False)
        invalid_first = positions == end[0]  # no 0-length sequences
        invalid = jnp.where(step_j > 0, invalid_late, invalid_first)
        alive_logits = jnp.where(invalid, NEG_INF, logits)
        return jnp.where(dead[:, None], forced, alive_logits)


class RR_AR(RR):
    """RR tokens + absolute-raveled extra channel (representers.py:270-275)."""

    def get_extra_indices(self, c_indices, z_indices):
        return jnp.concatenate(
            [c_indices[..., 0], z_indices[..., 0]], axis=1)[..., None]

    def sampling_next_extra(self, cond_pos, new_elem0, prev_elem0, step_j):
        # the reference recomputes extras from the CONVERTED (RR) buffer, so
        # a gen token's extra is its own delta token (cz[..., 0])
        return new_elem0


class AU(ShapeRepresenter):
    """Absolute-unraveled (z, y, x, val) 4-tuples (representers.py:278-370).

    end_tokens is the 4-tuple (R, R, R, V); input_end_tokens stays the AR
    2-tuple (R^3, V) used by the sparse codec before conversion.  The sampling
    masker (representers.py:301-370) enforces lexicographic (z, y, x) growth:
    z non-decreasing (must increase when y = x = R-1), y non-decreasing when z
    stalls (must increase when x = R-1), x strictly increasing when z and y
    stall; dead rows (z = end) emit end tokens forever; element 0 is the only
    place a sequence may die.
    """

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.AR_end_token = self.voxel_res ** 3
        self.AU_end_token = self.voxel_res

    def convert_input_indices(self, c_indices, z_indices):
        nci = AR_to_AU(c_indices[..., 0:1], self.AR_end_token,
                       self.AU_end_token, reso=self.voxel_res)
        nzi = AR_to_AU(z_indices[..., 0:1], self.AR_end_token,
                       self.AU_end_token, reso=self.voxel_res)
        nci = jnp.concatenate([nci, c_indices[..., 1:2]], axis=-1)
        nzi = jnp.concatenate([nzi, z_indices[..., 1:2]], axis=-1)
        return nci, nzi

    def convert_output_indices(self, indices):
        ni = AU_to_AR(indices[..., :-1], self.AR_end_token,
                      self.AU_end_token, reso=self.voxel_res)
        return jnp.concatenate([ni, indices[..., -1:]], axis=-1)

    def cond_token_mask(self, c_indices):
        # converted coding: (z, y, x, val) with per-element end tokens
        return sparse_ops.token_mask(c_indices, self.end_tokens) > 0

    def mask_element(self, logits, tuple_i, step_j, prev_token, cur_elems,
                     cond_pos, prev_sum):
        ends = self.end_tokens
        R = self.voxel_res
        V = logits.shape[-1]
        positions = jnp.arange(V)[None, :]
        # dead rows: the PREVIOUS token ended (element 0) or, for later
        # elements, this step's z came out as the end token
        if tuple_i == 0:
            dead = (prev_token[:, 0] == ends[0]) & (step_j > 0)
        else:
            dead = cur_elems[0] == ends[0]
        forced = jnp.where(positions == ends[tuple_i], 1.0, NEG_INF)

        prev_z, prev_y, prev_x = (prev_token[:, 0], prev_token[:, 1],
                                  prev_token[:, 2])
        invalid = jnp.zeros_like(logits, bool)
        if tuple_i == 0:
            late = positions < prev_z[:, None]
            corner = (prev_y == R - 1) & (prev_x == R - 1)
            late = late | (corner[:, None] & (positions == prev_z[:, None]))
            late = late.at[:, ends[0]].set(False)   # may always end
            first = positions == ends[0]            # no 0-length sequences
            invalid = jnp.where(step_j > 0, late, first)
        elif tuple_i == 1:
            cur_z = cur_elems[0]
            late = positions < prev_y[:, None]
            corner = prev_x == R - 1
            late = late | (corner[:, None] & (positions == prev_y[:, None]))
            late = late & (cur_z == prev_z)[:, None]
            invalid = late & (step_j > 0)
        elif tuple_i == 2:
            cur_z, cur_y = cur_elems[0], cur_elems[1]
            late = positions <= prev_x[:, None]
            late = late & ((cur_z == prev_z) & (cur_y == prev_y))[:, None]
            invalid = late & (step_j > 0)
        if tuple_i > 0:
            # alive sequences only die at element 0 (the z coordinate)
            invalid = invalid.at[:, ends[tuple_i]].set(True)
        alive_logits = jnp.where(invalid, NEG_INF, logits)
        return jnp.where(dead[:, None], forced, alive_logits)
