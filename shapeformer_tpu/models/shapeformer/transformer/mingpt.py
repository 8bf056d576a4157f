"""CondTupleGPT: tuple-factorized conditional GPT with KV-cached decode.

Architecture parity with shapeformer/models/shapeformer/transformer/
mingpt.py:185-319 (CondTupleGPT):
  - one token embedding per tuple element, summed, plus extra-channel
    embeddings and separate cond/gen learned positional embeddings
    (gen positions restart at 0 after the condition, mingpt.py:256-265);
  - stage i = n_layers[i] pre-LN transformer blocks consuming the running
    stream x, emitting logits_i through its head, then adding the embedding
    of target element i before stage i+1 (mingpt.py:287-296);
  - heads = LayerNorm -> optional hidden Dense+ReLU -> bias-free Dense.

TPU-native redesign decisions (SURVEY.md section 7):
  - fused qkv projection, attention as einsums on (B, T, H, Dh);
  - an explicit `key_valid` mask hides fixed-length padding tokens, so static
    shapes reproduce the reference's dynamic-length sequences exactly;
  - decode path carries explicit (k, v) caches per stage (positions are
    written at a scalar index inside lax.while_loop) instead of the
    reference's full-prefix re-forward per token (its hot loop,
    mingpt.py:297-310 / shapeformer.py:86-88);
  - the python-generator two-stage sampling protocol (.send of the sampled
    position, mingpt.py:297-310) becomes the explicit pair
    decode_stage0 / decode_stage1 with identical ordering semantics.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ....ops.quant import make_dense

NEG_INF = -1e30

# Flash-attention (Pallas TPU kernel) switch for the TRAINING forward.
# MEASURED NEGATIVE RESULT at the flagship scale (B8 T812 H16 D64, v5e):
# the fused kernel made the full train step 400 ms vs 249 ms for the XLA
# attention (fwd+bwd A/B, everything else identical).  The XLA path's
# (B, H, T, T) materialization around the softmax is only ~21 MB/layer in
# bf16 at T=812 — comfortably cached — while the kernel pays D=64 lane
# padding (half of every (8, 128) register tile) and a custom-VJP backward
# that recomputes the forward.  Flash would only pay off at much longer
# sequences than this model's block 812.  Default is therefore the XLA
# attention (flash_attn=False); `flash_attn=True` opts in (TPU only),
# and `set_flash_enabled(False)` remains a global kill switch used by
# parallel/sharding.py because a pallas_call does not auto-partition under
# GSPMD.
_FLASH_ENABLED = True


def set_flash_enabled(on: bool):
    global _FLASH_ENABLED
    _FLASH_ENABLED = bool(on)


def flash_enabled() -> bool:
    return _FLASH_ENABLED


def _split_heads(x, n_head):
    B, T, C = x.shape
    return x.reshape(B, T, n_head, C // n_head)


class CausalSelfAttention(nn.Module):
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant_dense: bool = False

    def setup(self):
        self.qkv = make_dense(self.quant_dense, 3 * self.n_embd,
                              dtype=self.dtype)
        self.proj = make_dense(self.quant_dense, self.n_embd,
                               dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.attn_pdrop)
        self.resid_drop = nn.Dropout(self.resid_pdrop)

    def _attend(self, q, k, v, mask, deterministic):
        """q: (B,Tq,H,D), k/v: (B,Tk,H,D), mask: broadcastable (B,1,Tq,Tk)."""
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        att = jnp.where(mask, att, jnp.asarray(NEG_INF, att.dtype))
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
        att = self.attn_drop(att, deterministic=deterministic)
        y = jnp.einsum("bhqk,bkhd->bqhd", att, v)
        return y.reshape(y.shape[0], y.shape[1], -1)

    def _attend_flash(self, q, k, v, key_valid):
        """Fused causal attention via the bundled Pallas TPU flash kernel
        (fwd + custom-VJP bwd): never materializes the (B, H, T, T) matrix.

        q/k/v: (B, T, H, D).  T pads to a 128 multiple (the kernel's block
        granularity); key validity and the padding tail are expressed as
        segment ids (kv segment 0 = never attended, matching the XLA path's
        `mask & key_valid[:, None, None, :]` semantics — queries themselves
        are never masked, exactly like `_attend`)."""
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)
        B, T, H, D = q.shape
        Tp = -(-T // 128) * 128
        pad = Tp - T

        def prep(t):  # (B, T, H, D) -> kernel layout (B, H, Tp, D)
            t = jnp.transpose(t, (0, 2, 1, 3))
            return jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))

        kv_seg = (jnp.ones((B, T), jnp.int32) if key_valid is None
                  else key_valid.astype(jnp.int32))
        kv_seg = jnp.pad(kv_seg, ((0, 0), (0, pad)))
        q_seg = jnp.pad(jnp.ones((B, T), jnp.int32), ((0, 0), (0, pad)))
        out = flash_attention(prep(q), prep(k), prep(v),
                              segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
                              causal=True,
                              sm_scale=float(1.0 / np.sqrt(D)))
        y = jnp.transpose(out[:, :, :T, :], (0, 2, 1, 3))
        return y.reshape(B, T, H * D)

    def __call__(self, x, mask, deterministic: bool = True, key_valid=None,
                 use_flash: bool = False):
        qkv = self.qkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.n_head) for t in (q, k, v))
        if use_flash:
            y = self._attend_flash(q, k, v, key_valid)
        else:
            y = self._attend(q, k, v, mask, deterministic)
        return self.resid_drop(self.proj(y), deterministic=deterministic), (k, v)

    def decode(self, x_new, cache_k, cache_v, index, key_valid):
        """Single-position decode against this layer's cache.

        x_new: (B, 1, C); cache_k/v: (B, T_max, C) PER-LAYER caches — heads
        UNSPLIT, channel minor.  Three v5e profiling findings shaped this:
        (1) a stacked (n_layers, B, T, H, D) cache made XLA materialize an
        async DMA copy of every per-layer slice each step plus a whole-stage
        copy (~1.0 ms/step of pure data movement at B=8); (2) any layout
        with the 64-wide head dim minormost pads the (8,128) memory tiling
        2x, and XLA lowers the Tq=1 per-head einsum to a slow VPU
        multiply+reduce (40 us/layer vs ~8 us stream time); (3) XLA
        re-normalizes layouts, so logical transposes don't stick.  The fix:
        keep C=H*D minor (dense lanes) and make attention REAL matmuls via
        block-diagonal queries — q is placed into a (B, H, C) block matrix
        so 'bhc,btc->bht' contracts the full channel dim on the MXU (the
        16x redundant FLOPs are ~0.06 ms/step, noise next to the HBM
        stream), and att.V is a plain 'bht,btc->bhc' whose head block is
        extracted afterwards.  index: scalar write position; key_valid:
        (B, T_max) bool of attendable positions (already includes causality:
        only positions <= index are valid).
        Returns (y (B,1,C), cache_k, cache_v).
        """
        B, _, C = x_new.shape
        H = self.n_head
        D = C // H
        qkv = self.qkv(x_new)
        q, k, v = jnp.split(qkv, 3, axis=-1)                 # (B, 1, C) each
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, index, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, index, 0))
        T_cache = cache_k.shape[1]
        if key_valid.shape[-1] < T_cache:   # alignment tail of the cache
            key_valid = jnp.pad(key_valid,
                                ((0, 0), (0, T_cache - key_valid.shape[-1])))
        scale = jnp.asarray(1.0 / jnp.sqrt(jnp.float32(D)), self.dtype)
        eye = jnp.eye(H, dtype=self.dtype)
        qh = q.reshape(B, H, D) * scale
        qb = (qh[:, :, None, :] * eye[None, :, :, None]).reshape(B, H, C)
        att = jnp.einsum("bhc,btc->bht", qb, cache_k.astype(self.dtype))
        att = jnp.where(key_valid[:, None, :], att,
                        jnp.asarray(NEG_INF, att.dtype))
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1
                             ).astype(self.dtype)
        ybig = jnp.einsum("bht,btc->bhc", att, cache_v.astype(self.dtype))
        y = jnp.einsum("bhgd,hg->bhd", ybig.reshape(B, H, H, D), eye)
        y = y.reshape(B, 1, C)
        return self.proj(y), cache_k, cache_v


    def decode_split(self, x_new, cond_k, cond_v, gen_k, gen_v, gen_index,
                     cond_valid, gen_valid):
        """Single-position decode against a TWO-SEGMENT cache: a condition
        segment shared by all candidates of a condition plus a per-row
        generation segment.

        Batched serving flattens past S~8 because the per-step KV stream
        scales with rows (PERF.md), and the cond half of every tiled cache
        is byte-identical across the `candidates` rows of its condition
        (sample_indices tiles the prefilled caches).  Splitting the cache
        reads the cond segment ONCE per condition: KV bytes/step drop from
        rows * (Tc+Tg) * C * 2 to (S*Tc + rows*Tg) * C * 2 — ~45% at
        candidates=8 with the flagship's Tc ~= Tg ~= 406.

        x_new: (B, 1, C) with B = S * candidates (candidate rows of one
        condition contiguous); cond_k/v: (S, Tc, C) frozen prefill caches;
        gen_k/v: (B, Tg, C); gen_index: scalar write slot in the gen
        segment; cond_valid: (S, Tc) bool; gen_valid: (B or 1, Tg) bool.
        Same layout rules as decode() — heads unsplit, channel minor,
        block-diagonal queries.  Returns (y (B,1,C), gen_k, gen_v).
        """
        B, _, C = x_new.shape
        S, Tc, _ = cond_k.shape
        G = B // S
        H = self.n_head
        D = C // H
        qkv = self.qkv(x_new)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        gen_k = jax.lax.dynamic_update_slice(
            gen_k, k.astype(gen_k.dtype), (0, gen_index, 0))
        gen_v = jax.lax.dynamic_update_slice(
            gen_v, v.astype(gen_v.dtype), (0, gen_index, 0))
        Tg = gen_k.shape[1]
        scale = jnp.asarray(1.0 / jnp.sqrt(jnp.float32(D)), self.dtype)
        eye = jnp.eye(H, dtype=self.dtype)
        qh = q.reshape(B, H, D) * scale
        qb = (qh[:, :, None, :] * eye[None, :, :, None]).reshape(B, H, C)
        # cond segment: all candidates of a condition share one (Tc, C) read
        qs = qb.reshape(S, G * H, C)
        attc = jnp.einsum("sgc,stc->sgt", qs, cond_k.astype(self.dtype))
        attc = jnp.where(cond_valid[:, None, :], attc,
                         jnp.asarray(NEG_INF, attc.dtype)).reshape(B, H, Tc)
        attg = jnp.einsum("bhc,btc->bht", qb, gen_k.astype(self.dtype))
        attg = jnp.where(gen_valid[:, None, :], attg,
                         jnp.asarray(NEG_INF, attg.dtype))
        att = jax.nn.softmax(
            jnp.concatenate([attc, attg], axis=-1).astype(jnp.float32),
            axis=-1).astype(self.dtype)
        wc, wg = att[..., :Tc], att[..., Tc:]
        yc = jnp.einsum("sgt,stc->sgc", wc.reshape(S, G * H, Tc),
                        cond_v.astype(self.dtype)).reshape(B, H, C)
        yg = jnp.einsum("bht,btc->bhc", wg, gen_v.astype(self.dtype))
        y = jnp.einsum("bhgd,hg->bhd", (yc + yg).reshape(B, H, H, D), eye)
        return self.proj(y.reshape(B, 1, C)), gen_k, gen_v


class Block(nn.Module):
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant_dense: bool = False

    def setup(self):
        self.ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = CausalSelfAttention(self.n_embd, self.n_head,
                                        self.attn_pdrop, self.resid_pdrop,
                                        dtype=self.dtype,
                                        quant_dense=self.quant_dense)
        self.fc1 = make_dense(self.quant_dense, 4 * self.n_embd,
                              dtype=self.dtype)
        self.fc2 = make_dense(self.quant_dense, self.n_embd,
                              dtype=self.dtype)
        self.mlp_drop = nn.Dropout(self.resid_pdrop)

    def _mlp(self, x, deterministic):
        # exact (erf) GELU: the reference uses torch nn.GELU()'s default
        # (mingpt.py:104), and checkpoint-transfer fidelity tracks it
        return self.mlp_drop(
            self.fc2(nn.gelu(self.fc1(x), approximate=False)),
            deterministic=deterministic)

    def __call__(self, x, mask, deterministic: bool = True, key_valid=None,
                 use_flash: bool = False):
        a, kv = self.attn(self.ln1(x), mask, deterministic,
                          key_valid=key_valid, use_flash=use_flash)
        x = x + a
        return x + self._mlp(self.ln2(x), deterministic), kv

    def decode(self, x_new, cache_k, cache_v, index, key_valid):
        a, ck, cv = self.attn.decode(self.ln1(x_new), cache_k, cache_v,
                                     index, key_valid)
        x = x_new + a
        return x + self._mlp(self.ln2(x), True), ck, cv

    def decode_split(self, x_new, cond_k, cond_v, gen_k, gen_v, gen_index,
                     cond_valid, gen_valid):
        a, gk, gv = self.attn.decode_split(self.ln1(x_new), cond_k, cond_v,
                                           gen_k, gen_v, gen_index,
                                           cond_valid, gen_valid)
        x = x_new + a
        return x + self._mlp(self.ln2(x), True), gk, gv


class Head(nn.Module):
    vocab_size: int
    n_embd: int
    head_hidden_layers: int = 0
    dtype: jnp.dtype = jnp.float32
    quant_dense: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        # explicit Dense_i names keep param paths identical across the
        # quantized and float variants (QuantDense would auto-name otherwise)
        for i in range(self.head_hidden_layers):
            x = nn.relu(make_dense(self.quant_dense, self.n_embd,
                                   dtype=self.dtype, name=f"Dense_{i}")(x))
        return make_dense(self.quant_dense, self.vocab_size, use_bias=False,
                          dtype=self.dtype,
                          name=f"Dense_{self.head_hidden_layers}")(x)


class CondTupleGPT(nn.Module):
    vocab_sizes: Sequence[int]
    extra_vocab_sizes: Sequence[int]
    block_size: int
    tuple_n: int
    n_layers: Sequence[int] = (12,)
    n_head: int = 8
    n_embd: int = 256
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    n_unmasked: int = 0
    no_pos_emb: bool = False
    cond_emb_same: bool = False
    pos_no_restart: bool = False
    head_hidden_layers: int = 0
    dtype: jnp.dtype = jnp.float32
    cache_dtype: jnp.dtype = jnp.bfloat16
    quant_dense: bool = False  # int8 weight-only serving path (ops/quant.py)
    # flash-attention training forward: False = off (the measured
    # default — see the negative result at `set_flash_enabled`), True =
    # opt in (TPU backend with standard causal/key_valid mask only)
    flash_attn: bool = False

    def setup(self):
        assert self.tuple_n == len(self.vocab_sizes) == len(self.n_layers)
        emb_init = nn.initializers.normal(stddev=0.02)
        self.tok_embs = [nn.Embed(v, self.n_embd, embedding_init=emb_init,
                                  dtype=self.dtype)
                         for v in self.vocab_sizes]
        self.extra_tok_embs = [nn.Embed(v, self.n_embd, embedding_init=emb_init,
                                        dtype=self.dtype)
                               for v in self.extra_vocab_sizes]
        self.pos_emb = self.param("pos_emb", nn.initializers.zeros,
                                  (1, self.block_size, self.n_embd))
        if not self.cond_emb_same:
            self.cond_pos_emb = self.param("cond_pos_emb", nn.initializers.zeros,
                                           (1, self.block_size, self.n_embd))
        self.stages = [
            [Block(self.n_embd, self.n_head, self.attn_pdrop, self.resid_pdrop,
                   dtype=self.dtype, quant_dense=self.quant_dense)
             for _ in range(n)]
            for n in self.n_layers]
        self.heads = [Head(v, self.n_embd, self.head_hidden_layers,
                           dtype=self.dtype, quant_dense=self.quant_dense)
                      for v in self.vocab_sizes]
        self.drop = nn.Dropout(self.embd_pdrop)

    def get_block_size(self):
        return self.block_size

    # ------------------------------------------------------------ embeddings
    def get_pos_embeddings(self, L_gen: int, L_cond: int):
        cond_emb = self.pos_emb if self.cond_emb_same else self.cond_pos_emb
        if self.pos_no_restart:
            out = self.pos_emb[:, :L_gen + L_cond, :]
        else:
            out = jnp.concatenate([cond_emb[:, :L_cond, :],
                                   self.pos_emb[:, :L_gen, :]], axis=1)
        if self.no_pos_emb:
            out = out * 0.0
        return out.astype(self.dtype)

    def get_embeddings(self, idx, extra_idx, L_cond: int):
        """idx: (B, L, tuple_n) int, extra_idx: (B, L, extra_tuple_n) int."""
        L = idx.shape[1]
        tok = sum(emb(idx[..., i]) for i, emb in enumerate(self.tok_embs))
        extra = sum(emb(extra_idx[..., i])
                    for i, emb in enumerate(self.extra_tok_embs))
        return tok + extra + self.get_pos_embeddings(L - L_cond, L_cond)

    # --------------------------------------------------------------- training
    def _attn_mask(self, T: int, key_valid):
        """(T, T) causal AND per-row key validity -> (B, 1, T, T)."""
        causal = jnp.tril(jnp.ones((T, T), bool))
        if self.n_unmasked > 0:
            nu = self.n_unmasked
            causal = causal.at[:nu, :nu].set(True)
        mask = causal[None, None, :, :]
        if key_valid is not None:
            mask = mask & key_valid[:, None, None, :]
        return mask

    def __call__(self, idx, extra_idx=None, L_cond: int = 1, target_idx=None,
                 key_valid=None, deterministic: bool = True,
                 logits_start: int = 0):
        """Training forward: returns [logits_i (B, L - logits_start, V_i)].

        target_idx = idx shifted left by one (the teacher-forced next tuple);
        stage i+1 consumes stage i's stream plus tok_emb_i(target[..., i])
        (mingpt.py:287-296).

        logits_start: apply the heads only from this position on.  The loss
        consumes only the generation region (reference shapeformer.py:139
        slices logits[:, L_c-1:] AFTER a full-length head), so slicing x
        BEFORE the position-wise heads is exact and skips ~half the head
        matmuls, their logits materialization and their backward at the
        flagship's L_cond = L/2.  0 keeps full-length logits (the
        reference-parity surface pinned by the golden tests).
        """
        T = idx.shape[1]
        assert T <= self.block_size
        x = self.get_embeddings(idx, extra_idx, L_cond)
        use_flash = self._flash_ok(deterministic)
        mask = None if use_flash else self._attn_mask(T, key_valid)
        logits = []
        for i in range(self.tuple_n):
            x = self.drop(x, deterministic=deterministic)
            for blk in self.stages[i]:
                x, _ = blk(x, mask, deterministic, key_valid=key_valid,
                           use_flash=use_flash)
            logits.append(self.heads[i](x[:, logits_start:, :]))
            if i < self.tuple_n - 1:
                x = x + self.tok_embs[i](target_idx[..., i])
        return logits

    def _flash_ok(self, deterministic: bool) -> bool:
        """Whether the training forward takes the flash kernel (see the
        module docstring at `set_flash_enabled`).  The kernel expresses only
        causal + key-validity masks, so n_unmasked > 0 and active attention
        dropout fall back to the XLA path; numerics match to bf16
        tolerance (pinned in tests/test_transformer.py::
        test_flash_attention_matches_xla on the TPU backend)."""
        if not self.flash_attn or not flash_enabled():
            return False
        if jax.default_backend() != "tpu":
            return False
        if self.n_unmasked > 0:
            return False
        if self.attn_pdrop > 0 and not deterministic:
            return False
        return True

    # ----------------------------------------------------------------- decode
    @property
    def cache_block(self) -> int:
        """Cache T extent: block_size rounded up to an 8 multiple so the
        (sublane, lane) tiling of the (B, T, C) caches has no partial
        sublane rows; the tail is key-masked."""
        return -(-self.block_size // 8) * 8

    def prefill(self, idx, extra_idx, L_cond: int, key_valid,
                cache_len: Optional[int] = None):
        """Run the full prefix once, filling caches for every stage.

        idx: (B, P, tuple_n) prefix tokens (P < block_size).  Stage i+1's
        prefix inputs use the teacher-forced next-element idx[t+1, i], so the
        last prefix position P-1 is NOT processed by stages > 0 (its stage-1
        input depends on the yet-unsampled position token); decode_stage1
        handles it.  Returns (caches, h0_last (B, C), logits0_last (B, V0)).

        cache_len overrides the cache T extent (default cache_block): the
        split-cache decode path right-sizes the cond segment to round8(P).
        """
        B, P, _ = idx.shape
        x = self.get_embeddings(idx, extra_idx, L_cond)
        mask = self._attn_mask(P, key_valid)
        extent = self.cache_block if cache_len is None else cache_len

        def pad_kv(k):  # (B, P, H, D) -> (B, extent, C) decode layout
            kf = k.reshape(B, P, -1)                   # undo _split_heads
            return jnp.pad(kf, ((0, 0), (0, extent - P), (0, 0))
                           ).astype(self.cache_dtype)

        caches = []
        h_last = None
        logits0_last = None
        for i in range(self.tuple_n):
            layer_caches = []
            for blk in self.stages[i]:
                x, (k, v) = blk(x, mask, True)
                layer_caches.append((pad_kv(k), pad_kv(v)))
            caches.append(layer_caches)
            if i == 0:
                h_last = x[:, -1, :]
                logits0_last = self.heads[0](x[:, -1:, :])[:, 0, :]
            if i < self.tuple_n - 1:
                # teacher-forced shift: position t gets element i of token t+1;
                # the final position P-1 has no target yet -> its stage-(i+1)
                # k/v entry is recomputed by decode_stage1 at sampling time.
                nxt = jnp.concatenate([idx[:, 1:, i], idx[:, -1:, i]], axis=1)
                x = x + self.tok_embs[i](nxt)
        return caches, h_last, logits0_last

    def decode_stage_i(self, caches, h_prev, prev_elem, stage_i: int, index,
                       key_valid):
        """Tuple stage `stage_i` >= 1 for one position.

        h_prev: (B, C) hidden after stage stage_i-1 at `index`; prev_elem:
        (B,) the freshly sampled element stage_i-1 token (the .send() of the
        reference generator protocol, mingpt.py:297-310, generalized to any
        tuple_n).  Returns (logits_i (B, V_i), h_i (B, C), caches).
        """
        x = (h_prev + self.tok_embs[stage_i - 1](prev_elem))[:, None, :]
        layer_caches = []
        for blk, (ck, cv) in zip(self.stages[stage_i], caches[stage_i]):
            x, ck, cv = blk.decode(x, ck, cv, index, key_valid)
            layer_caches.append((ck, cv))
        caches = list(caches)
        caches[stage_i] = layer_caches
        return self.heads[stage_i](x)[:, 0, :], x[:, 0, :], caches

    def decode_stage1(self, caches, h0, pos_token, index, key_valid):
        """2-tuple convenience wrapper around decode_stage_i."""
        logits, _, caches = self.decode_stage_i(caches, h0, pos_token, 1,
                                                index, key_valid)
        return logits, caches

    def decode_stage0(self, caches, new_token, new_extra, index, gen_pos,
                      key_valid):
        """Append the completed token tuple at `index` and advance stage 0.

        new_token: (B, tuple_n); gen_pos: scalar index into the gen positional
        embedding (index - L_cond).  Returns (caches, h0 (B,C), logits0 (B,V0)).
        """
        tok = sum(emb(new_token[:, i]) for i, emb in enumerate(self.tok_embs))
        extra = sum(emb(new_extra[:, i])
                    for i, emb in enumerate(self.extra_tok_embs))
        # pos_no_restart: training indexes pos_emb by ABSOLUTE sequence
        # position (get_pos_embeddings); the restart-at-zero gen_pos applies
        # only to the default separate-cond-table layout
        pos_idx = index if self.pos_no_restart else gen_pos
        pos = jax.lax.dynamic_slice_in_dim(self.pos_emb[0], pos_idx, 1,
                                           axis=0)
        if self.no_pos_emb:
            pos = pos * 0.0
        x = (tok + extra)[:, None, :] + pos[None].astype(self.dtype)
        layer_caches = []
        for blk, (ck, cv) in zip(self.stages[0], caches[0]):
            x, ck, cv = blk.decode(x, ck, cv, index, key_valid)
            layer_caches.append((ck, cv))
        caches = [layer_caches] + list(caches[1:])
        return caches, x[:, 0, :], self.heads[0](x)[:, 0, :]

    # ------------------------------------------- split-cache decode (serving)
    def decode_stage_i_split(self, cond_caches, gen_caches, h_prev, prev_elem,
                             stage_i: int, gen_index, cond_valid, gen_valid):
        """decode_stage_i over two-segment caches (see
        CausalSelfAttention.decode_split).  cond_caches: prefill caches at S
        condition rows (frozen — never written); gen_caches: per-sample-row
        generation segments; gen_index: write slot.  For stages >= 1 slot 0
        holds the per-candidate value of sequence position L_c-1 (the
        position prefill cannot finish), so at sampling step j the write
        slot is j itself.  Returns (logits_i, h_i, gen_caches)."""
        x = (h_prev + self.tok_embs[stage_i - 1](prev_elem))[:, None, :]
        layer_caches = []
        for blk, (ck, cv), (gk, gv) in zip(self.stages[stage_i],
                                           cond_caches[stage_i],
                                           gen_caches[stage_i]):
            x, gk, gv = blk.decode_split(x, ck, cv, gk, gv, gen_index,
                                         cond_valid, gen_valid)
            layer_caches.append((gk, gv))
        gen_caches = list(gen_caches)
        gen_caches[stage_i] = layer_caches
        return self.heads[stage_i](x)[:, 0, :], x[:, 0, :], gen_caches

    def decode_stage0_split(self, cond_caches, gen_caches, new_token,
                            new_extra, index, gen_index, cond_valid,
                            gen_valid):
        """decode_stage0 over two-segment caches.  index: absolute sequence
        position (pos-embedding lookup); gen_index: gen-segment write slot
        (= index - L_cond).  Returns (gen_caches, h0, logits0)."""
        tok = sum(emb(new_token[:, i]) for i, emb in enumerate(self.tok_embs))
        extra = sum(emb(new_extra[:, i])
                    for i, emb in enumerate(self.extra_tok_embs))
        pos_idx = index if self.pos_no_restart else gen_index
        pos = jax.lax.dynamic_slice_in_dim(self.pos_emb[0], pos_idx, 1,
                                           axis=0)
        if self.no_pos_emb:
            pos = pos * 0.0
        x = (tok + extra)[:, None, :] + pos[None].astype(self.dtype)
        layer_caches = []
        for blk, (ck, cv), (gk, gv) in zip(self.stages[0], cond_caches[0],
                                           gen_caches[0]):
            x, gk, gv = blk.decode_split(x, ck, cv, gk, gv, gen_index,
                                         cond_valid, gen_valid)
            layer_caches.append((gk, gv))
        gen_caches = [layer_caches] + list(gen_caches[1:])
        return gen_caches, x[:, 0, :], self.heads[0](x)[:, 0, :]


class GPT(nn.Module):
    """Plain single-stream GPT (reference mingpt.py:114-183); provided for
    component parity — the shipped pipeline uses CondTupleGPT."""
    vocab_size: int
    block_size: int
    n_layer: int = 12
    n_head: int = 8
    n_embd: int = 256
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    n_unmasked: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, idx, deterministic: bool = True):
        B, T = idx.shape
        assert T <= self.block_size
        tok = nn.Embed(self.vocab_size, self.n_embd,
                       embedding_init=nn.initializers.normal(0.02),
                       dtype=self.dtype)(idx)
        pos = self.param("pos_emb", nn.initializers.zeros,
                         (1, self.block_size, self.n_embd))[:, :T, :]
        x = nn.Dropout(self.embd_pdrop)(tok + pos.astype(self.dtype),
                                        deterministic=deterministic)
        causal = jnp.tril(jnp.ones((T, T), bool))
        if self.n_unmasked > 0:
            causal = causal.at[:self.n_unmasked, :self.n_unmasked].set(True)
        mask = causal[None, None]
        for _ in range(self.n_layer):
            x, _ = Block(self.n_embd, self.n_head, self.attn_pdrop,
                         self.resid_pdrop, dtype=self.dtype)(
                x, mask, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype)(x)
