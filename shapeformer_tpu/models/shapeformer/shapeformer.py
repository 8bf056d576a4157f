"""ShapeFormer: conditional autoregressive transformer over sparse VQ tokens.

Capability parity with shapeformer/models/shapeformer/shapeformer.py:16-207:
  - forward/loss: concat cond+gen tuple sequences, two-stage TupleGPT, per-
    tuple-element cross-entropy averaged (shared_step, shapeformer.py:132-140);
  - sample_indices: autoregressive sampling with per-element representer
    masking, top-k/top-p, best-in-first, early stop when every row emitted its
    end token (shapeformer.py:55-123);
  - sample: output indices converted by the representer (shapeformer.py:125-130).

TPU-native redesign (SURVEY.md section 7):
  - the sampling loop is a jit-compiled lax.while_loop with KV caches carried
    through both transformer stages — one O(1)-context step per token instead
    of the reference's full-prefix re-forward (shapeformer.py:86-88), and the
    loop exits as soon as all candidates are done (matching the reference's
    host-side break, shapeformer.py:112-115) with zero host syncs;
  - sequences are statically padded (attention key masks recover dynamic
    lengths); the window-overflow shift of the reference (shapeformer.py:73-76,
    which indexes the batch dim and cannot trigger under the shipped 406+406
    block layout) is replaced by a hard stop at block_size;
  - per-token log-probs of the sampled tokens are accumulated in-loop from the
    masked logits (the reference stores full logits histories and computes
    log-softmax on host, shapeformer.py:94,407-418).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ... import config as _config
from ...ops import sampling as sampling_ops
from ...ops import sparse as sparse_ops


class ShapeFormer:
    """Plain-python system object: a flax CondTupleGPT + a representer.

    (The reference subclasses pl.LightningModule; here optimizer/step logic
    lives in shapeformer_tpu.systems and this class is the pure model.)
    """

    def __init__(self, tuple_n=None, block_size=None, end_tokens=None,
                 vocab_sizes=None, extra_vocab_sizes=None, voxel_res=16,
                 transformer_opt=None, representer_opt=None, optim_opt=None,
                 defer_vqvae=False):
        self.tuple_n = tuple_n
        self.block_size = block_size
        self.end_tokens = tuple(end_tokens)
        self.vocab_sizes = tuple(vocab_sizes)
        self.extra_vocab_sizes = tuple(extra_vocab_sizes)
        self.voxel_res = voxel_res
        self.optim_opt = optim_opt or {}
        assert "TupleGPT" in transformer_opt["class"]
        self.transformer = _config.load_object(transformer_opt["class"])(
            **transformer_opt.get("kwargs", {}))
        rep_kwargs = dict(representer_opt.get("kwargs", {}))
        if defer_vqvae:
            rep_kwargs["defer_vqvae"] = True
        self.representer = _config.load_object(representer_opt["class"])(
            **rep_kwargs)
        self.max_length = self.representer.max_length

    # ----------------------------------------------------------------- params
    def init_variables(self, rng):
        B, L = 1, self.max_length
        idx = jnp.zeros((B, 2 * L - 1, self.tuple_n), jnp.int32)
        extra = jnp.zeros((B, 2 * L - 1, len(self.extra_vocab_sizes)), jnp.int32)
        return self.transformer.init(rng, idx, extra, L, idx,
                                     deterministic=True)

    # ------------------------------------------------------------------- loss
    def compute_logits(self, params, c_indices, z_indices, extra_indices,
                       rng=None, deterministic=True):
        """Teacher-forced forward (shapeformer.py:26-46): returns per-element
        logits already cut to the generation region, (B, L, vocab_i)."""
        L_c = c_indices.shape[1]
        cz = jnp.concatenate([c_indices, z_indices], axis=1)
        idx, target = cz[:, :-1], cz[:, 1:]
        # c/z arrive CONVERTED (e.g. AU (z,y,x,val) 4-tuples), so padding
        # detection must use the representer's converted-coding mask — the
        # input-coding end tokens never match a converted AU sequence, which
        # silently left ALL padding attendable at train time while sampling
        # masked it (train/sample attention mismatch)
        rep = self.representer
        key_valid = jnp.concatenate(
            [rep.cond_token_mask(c_indices),
             rep.cond_token_mask(z_indices)], axis=1)[:, :-1]
        rngs = {"dropout": rng} if rng is not None else None
        # logits_start slices x BEFORE the position-wise heads — exact (the
        # reference computes full-length logits and slices after,
        # shapeformer.py:139) but skips the cond-region head matmuls and
        # their backward (~L_c/L of the head cost)
        logits = self.transformer.apply(
            params, idx, extra_indices[:, :-1], L_c, target, key_valid,
            deterministic=deterministic, rngs=rngs, logits_start=L_c - 1)
        return logits

    def loss(self, params, batch, rng=None, stage="train", vqdif_vars=None):
        """Per-element masked CE averaged over tuple elements
        (shared_step, shapeformer.py:132-140; masking reproduces the
        reference's batch-size-1 dynamic padding, see ops.sparse.token_mask)."""
        rep_rng = tok_rng = None
        if rng is not None:
            rep_rng, tok_rng = jax.random.split(rng)
        c, z, extra, _ = self.representer.get_indices(
            stage=stage, rng=rep_rng, vqdif_vars=vqdif_vars,
            Xct=batch["Xct"], Xbd=batch.get("Xbd"))
        logits = self.compute_logits(params, c, z, extra, rng=tok_rng,
                                     deterministic=(stage != "train"))
        w = sparse_ops.token_mask(z, self.end_tokens)
        if batch.get("batch_mask") is not None:
            # rows duplicated by dp batch padding carry weight 0
            # (systems._mesh_batch)
            w = w * batch["batch_mask"][:, None]
        total = 0.0
        for i, lg in enumerate(logits):
            logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, z[..., i:i + 1], axis=-1)[..., 0]
            total = total + (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
        return total / len(logits)

    # --------------------------------------------------------------- sampling
    def sample_indices(self, params, c_indices, rng, max_steps: int = 512,
                       top_k: int = 100, top_p: float = 0.8,
                       temperature: float = 1.0, best_in_first: bool = False,
                       candidates: int = 1, best_rows=None,
                       split_cond_cache: bool = True):
        """KV-cached AR sampling (semantics of shapeformer.py:55-123).

        c_indices: (B, max_length, tuple_n) padded condition tokens (in input
        coding).  Returns (gen_tokens (B, max_gen, tuple_n) padded with end
        tokens, log_prob (B,) sum of sampled-token log-probs under the masked
        logits).

        Works for any tuple_n: element 0 comes from the stage-0 logits, each
        later element i from decode_stage_i fed the freshly sampled element
        i-1 (the reference generator's .send() protocol for 2-tuples,
        generalized to e.g. AU's (z, y, x, val) 4-tuples).

        candidates > 1 draws that many independent samples PER condition row:
        the condition prefill runs once per row and the KV caches are tiled
        afterwards (the reference expands the condition batch up front,
        shapeformer.py:229, paying candidates x prefill).

        best_in_first semantics (DIVERGES from the reference at
        candidates=1): the reference pins only batch row 0 to argmax
        (shapeformer.py:234); here every row whose index is a multiple of
        `candidates` pins — i.e. the first candidate OF EVERY condition.  At
        candidates=1 that is ALL rows, so a caller that pre-expanded one
        condition into a candidate batch itself (as
        callbacks/shapeformer_vis.py does) would get B identical
        deterministic samples — such callers must pass an explicit
        `best_rows` boolean mask (shape (B,), True = pin to argmax) instead
        of best_in_first.
        """
        tf, rep = self.transformer, self.representer
        B, L_c, _ = c_indices.shape
        n = self.tuple_n
        block = tf.block_size
        max_gen = min(int(max_steps), block - L_c)
        ends = self.end_tokens
        e0 = ends[0]
        cond_pos = c_indices[..., 0]
        empty_z = c_indices[:, :0, :]
        extra_c = rep.get_extra_indices(c_indices, empty_z)

        cond_valid = rep.cond_token_mask(c_indices)                # (B, L_c)
        cond_valid_blk = jnp.pad(cond_valid, ((0, 0), (0, block - L_c)))
        arange_blk = jnp.arange(block)[None, :]

        # split-cache serving (candidates > 1): prefill stays at S condition
        # rows and decode attends a shared cond segment + per-candidate gen
        # segment (mingpt decode_split) instead of tiling the full caches —
        # the per-step KV stream drops by ~the cond fraction per candidate.
        use_split = split_cond_cache and candidates > 1
        Tc8 = -(-L_c // 8) * 8
        caches, h0, logits0 = tf.apply(
            params, c_indices, extra_c, L_c, cond_valid,
            cache_len=Tc8 if use_split else None,
            method=type(tf).prefill)

        if candidates > 1:
            # tile the per-row prefill results to B * candidates sample rows
            def tile(x, axis):
                return jnp.repeat(x, candidates, axis=axis)
            if not use_split:
                caches = [[(tile(k, 0), tile(v, 0)) for k, v in stage]
                          for stage in caches]
            h0, logits0 = tile(h0, 0), tile(logits0, 0)
            cond_pos = tile(cond_pos, 0)
            cond_valid_blk = tile(cond_valid_blk, 0)
            B = B * candidates

        def key_valid_upto(index):
            gen = (arange_blk >= L_c) & (arange_blk <= index)
            return cond_valid_blk | gen

        if use_split:
            # gen segments: stage 0 slot j holds position L_c+j; stages >= 1
            # slot j holds position L_c+j-1 (slot 0 = the per-candidate
            # rewrite of the last prefix position, see mingpt.prefill notes)
            G8 = -(-max_gen // 8) * 8
            C_embd = tf.n_embd
            zeros_g = jnp.zeros((B, G8, C_embd), tf.cache_dtype)
            gen_caches = [[(zeros_g, zeros_g) for _ in stage]
                          for stage in caches]
            cond_valid8 = jnp.pad(cond_valid, ((0, 0), (0, Tc8 - L_c)))
            cv_last = cond_valid[:, L_c - 1]            # (S,)
            # stages >= 1 read position L_c-1 from gen slot 0, not cond
            cond_valid8_s1 = cond_valid8.at[:, L_c - 1].set(False)
            cv_last_tiled = jnp.repeat(cv_last, candidates, axis=0)  # (B,)
            arange_g = jnp.arange(G8)[None, :]

            def gen_valid0(j):                          # stage-0 decode
                return arange_g <= j

            def gen_valid1(j):                          # stage >= 1 decode
                return (arange_g <= j) & ((arange_g > 0)
                                          | cv_last_tiled[:, None])

            cond_caches = caches        # frozen (S-row) prefill segments
            caches = gen_caches         # the while_loop carries only these

        gen_buf = jnp.stack(
            [jnp.full((B, max_gen), e, jnp.int32) for e in ends], axis=-1)

        # best_in_first pins the FIRST candidate of every condition row to
        # argmax (the reference's deterministic candidate 0, shapeformer.py:
        # 234); with tiled candidates the conditions repeat every
        # `candidates` rows — at candidates=1 every row is its own
        # condition, so all rows pin.  Callers that pre-expand ONE condition
        # into a candidate batch themselves (callbacks/shapeformer_vis.py)
        # pass an explicit best_rows mask instead.
        if best_rows is None and best_in_first:
            best_rows = jnp.arange(B) % candidates == 0

        def pick(key, masked):
            # compressed top-k sampling: Gumbel/argmax/log-norm on (B, k)
            # instead of (B, V) — measured 0.40 ms/step of full-vocab
            # elementwise ops at flagship size (ops/sampling.sample_ranked)
            return sampling_ops.sample_ranked(
                key, masked, top_k=top_k, top_p=top_p,
                temperature=temperature, best_rows=best_rows)

        def body(state):
            (caches, h0, logits0, buf, prev_token, prev_sum, j, logp,
             key) = state
            keys = jax.random.split(key, n + 1)
            key = keys[0]
            idx1 = L_c + j - 1
            kv1 = None if use_split else key_valid_upto(idx1)
            # --- element 0 from the running stage-0 logits ---
            m = rep.mask_element(logits0, 0, j, prev_token, (), cond_pos,
                                 prev_sum)
            elem, lp = pick(keys[1], m)
            cur = (elem,)
            h = h0
            # --- elements 1..n-1 via their stages, fed element i-1 ---
            for i in range(1, n):
                if use_split:
                    logits_i, h, caches = tf.apply(
                        params, cond_caches, caches, h, cur[-1], i, j,
                        cond_valid8_s1, gen_valid1(j),
                        method=type(tf).decode_stage_i_split)
                else:
                    logits_i, h, caches = tf.apply(
                        params, caches, h, cur[-1], i, idx1, kv1,
                        method=type(tf).decode_stage_i)
                m = rep.mask_element(logits_i, i, j, prev_token, cur,
                                     cond_pos, prev_sum)
                elem, lp_i = pick(keys[1 + i], m)
                lp = lp + lp_i
                cur = cur + (elem,)
            token = jnp.stack(cur, axis=-1)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, token[:, None, :], j, axis=1)
            # --- append token, advance stage 0 ---
            extra_new = rep.sampling_next_extra(
                cond_pos, cur[0], prev_token[:, 0], j)[:, None]
            idx0 = L_c + j
            if use_split:
                caches, h0, logits0 = tf.apply(
                    params, cond_caches, caches, token, extra_new, idx0, j,
                    cond_valid8, gen_valid0(j),
                    method=type(tf).decode_stage0_split)
            else:
                caches, h0, logits0 = tf.apply(
                    params, caches, token, extra_new, idx0, j,
                    key_valid_upto(idx0), method=type(tf).decode_stage0)
            new_sum = prev_sum + jnp.where(cur[0] == e0, 0, cur[0])
            return (caches, h0, logits0, buf, token, new_sum, j + 1,
                    logp + lp, key)

        ends_arr = jnp.asarray(ends, jnp.int32)

        def cond(state):
            (_, _, _, _, prev_token, _, j, _, _) = state
            # a row signals stop when ANY tuple element emits its end token —
            # the reference's exact exit check (shapeformer.py:112-115:
            # (sampled != end_tokens).all(-1) rows remaining)
            stopped = (prev_token == ends_arr[None, :]).any(axis=-1)
            running = jnp.logical_not(jnp.all(stopped)) | (j == 0)
            return (j < max_gen) & running

        init_prev = jnp.broadcast_to(
            jnp.asarray(ends, jnp.int32)[None, :], (B, n)).astype(jnp.int32)
        init = (caches, h0, logits0, gen_buf, init_prev,
                jnp.zeros((B,), jnp.int32),          # prev_sum (RR feasibility)
                jnp.int32(0), jnp.zeros((B,), jnp.float32), rng)
        state = jax.lax.while_loop(cond, body, init)
        buf, logp = state[3], state[7]
        return buf, logp

    def sample(self, params, c_indices, rng, **kw):
        """sample_indices + representer output conversion (shapeformer.py:125-130).
        Returns (out_tokens, raw_tokens, log_prob)."""
        x, logp = self.sample_indices(params, c_indices, rng, **kw)
        return self.representer.convert_output_indices(x), x, logp

    def complete_many(self, params, Xct, rng, vqdif_vars=None,
                      candidates: int = 8, max_steps: int = 512,
                      top_k: int = 100, top_p: float = 0.4,
                      temperature: float = 1.0, best_in_first: bool = False):
        """Batched serving API: complete S partial clouds in ONE sampling
        call, `candidates` samples each.

        Completing many shapes per call amortizes the per-step transformer
        weight stream S-fold — the framework's high-throughput mode (the
        reference completes one shape at a time, shapeformer.py:222-260).
        Jit-compatible; shard the condition batch over a mesh 'data' axis for
        multi-chip serving.

        Xct: (S, N, 3) partial clouds.  Returns a dict:
          tokens   (S, candidates, L, tuple_n) output-coded, end-padded
          raw      (S, candidates, L, tuple_n) sampler-coded
          log_prob (S, candidates) sum of sampled-token log-probs (ranking
                   key — the reference's compute_log_probs, :407-418)
          empty_index  scalar codebook mode used as the empty-cell fill
        """
        rep = self.representer
        c, _, _, others = rep.get_indices(Xct=Xct, stage="test",
                                          vqdif_vars=vqdif_vars)
        out, raw, logp = self.sample(
            params, c, rng, max_steps=max_steps, top_k=top_k, top_p=top_p,
            temperature=temperature, best_in_first=best_in_first,
            candidates=candidates)
        S = c.shape[0]
        L, n = out.shape[1], out.shape[2]
        # candidate tiling is jnp.repeat(axis=0): rows group per condition
        return dict(tokens=out.reshape(S, candidates, L, n),
                    raw=raw.reshape(S, candidates, L, n),
                    log_prob=logp.reshape(S, candidates),
                    empty_index=others["empty_index"])
