"""Emformer: efficient-memory transformer encoder for streaming ASR.

Not in the reference (SURVEY §2 — torchaudio-contrib has no model zoo);
mirrors torchaudio's ``models.Emformer`` capability (Shi et al. 2021):
block processing with hard-copied right context, cached left context,
and an averaged memory bank, giving an encoder whose streaming
chunkwise ``infer`` is *exactly* equivalent to the full-utterance
``apply`` (pinned by test — the invariant that makes it an Emformer).

TPU-first design: instead of one big masked (T×T) attention, the
utterance is reshaped into segments and attention runs as a vmap over
``(batch, segment)`` with static per-segment query/key shapes
``(S+R+1) × (M+L+S+R)`` — linear in T, all GEMMs MXU-shaped, no
dynamic control flow.  Visibility is coordinate-based and identical in
both modes:

- segment ``i`` queries = [its ``S`` frames, its hard-copy right
  context (``R`` frames), one summary (fixed-divisor mean of the
  segment)];
- keys/values = [memory bank entries of segments ``[i-M, i)``, left
  context frames ``[iS-L, iS)``, the segment itself, its right
  context];
- an utterance/left-context key at stream coordinate ``c`` is valid
  iff ``c < length``; memory ``j`` is valid iff segment ``j`` starts
  before ``length``; right-context frames start at
  ``min((i+1)·S, T)`` and are valid only for samples whose stream
  actually extends there (full-length samples own the appended
  ``R``-frame lookahead tail; shorter samples in the batch get none —
  their true lookahead frames are not present in the padded batch).

Memory chain (as in torchaudio): the bank at layer ``n`` holds the
summary *attention outputs* of layer ``n-1`` (layer 0's bank holds
mean-pooled raw input segments); a segment's own summary only becomes
visible to later segments, so streaming needs no lookahead into the
bank.  ``tanh_on_mem`` bounds memory values.

Streaming state per layer = (last ``L`` input frames, last ``M``
incoming memories); ``infer`` consumes one ``segment_length + R``
chunk per call (utterance slots zero-padded, lookahead slots carrying
the next ``R`` frames) and returns ``segment_length`` outputs plus the
new state.

``compat="torchaudio"`` selects the weight-compatible layer layout of
torchaudio's ``models.Emformer`` so published ``emformer_rnnt_base``
checkpoints import exactly ([ref-recon: torchaudio
models/emformer.py ``_EmformerLayer`` — UNVERIFIED, mount empty]):
a per-layer ``layer_norm_output`` applied after the FFN residual (to
both utterance and right context) replaces this build's single final
``ln_out``; memory-bank keys enter attention raw (torchaudio norms
only ``[right_context, utterance]``); the memory output is the
summary row's attention context *before* ``out_proj``, clamped to
``[-10, 10]`` when ``tanh_on_mem=False``.  Both layouts keep the
streaming ≡ full invariant (pinned by test).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ._common import _dense, _ln, _ln_p

__all__ = ["Emformer", "ConvEmformer", "EmformerTranscriber"]

_NEG = -1e9


class Emformer:
    """``apply(params, x (B, T+R, D), lengths)`` → ``(out (B, T, D),
    lengths)`` — full utterance right-padded with ``R`` lookahead
    frames (torchaudio's ``Emformer.forward`` convention); ``T`` need
    not be a segment multiple.  ``init_state(batch)`` +
    ``infer(params, chunk (B, S+R, D), state, utt_lengths,
    rc_lengths)`` → ``(out (B, S, D), out_lengths, state)`` advances
    one segment per call.
    """

    def __init__(self, input_dim: int, num_heads: int, ffn_dim: int,
                 num_layers: int, segment_length: int,
                 left_context_length: int = 0,
                 right_context_length: int = 0,
                 max_memory_size: int = 0,
                 tanh_on_mem: bool = False,
                 activation: str = "relu",
                 compat: Optional[str] = None):
        if input_dim % num_heads:
            raise ValueError("input_dim must be divisible by num_heads")
        if segment_length < 1:
            raise ValueError("segment_length must be >= 1")
        if activation not in ("relu", "gelu", "silu"):
            raise ValueError("activation must be relu/gelu/silu")
        if compat not in (None, "torchaudio"):
            raise ValueError("compat must be None or 'torchaudio'")
        self.d = input_dim
        self.h = num_heads
        self.ffn = ffn_dim
        self.n_layers = num_layers
        self.S = segment_length
        self.L = left_context_length
        self.R = right_context_length
        self.M = max_memory_size
        self.tanh_on_mem = tanh_on_mem
        self.activation = activation
        # exact-erf gelu: torch.nn.GELU's default (jax's default is
        # the tanh approximation — a real parity gap at 1e-4)
        self.act = {"relu": jax.nn.relu,
                    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
                    "silu": jax.nn.silu}[activation]
        self.compat = compat
        self._config = (input_dim, num_heads, ffn_dim, num_layers,
                        segment_length, left_context_length,
                        right_context_length, max_memory_size,
                        tanh_on_mem, activation, compat)

    # -- params ----------------------------------------------------
    def init(self, key):
        d, keys = self.d, iter(jax.random.split(key, 6 * self.n_layers))
        layers = []
        for _ in range(self.n_layers):
            lp = {
                "ln1": _ln_p(d),
                "wq": _dense(next(keys), d, d), "bq": jnp.zeros((d,)),
                "wk": _dense(next(keys), d, d), "bk": jnp.zeros((d,)),
                "wv": _dense(next(keys), d, d), "bv": jnp.zeros((d,)),
                "wo": _dense(next(keys), d, d), "bo": jnp.zeros((d,)),
                "ln2": _ln_p(d),
                "w1": _dense(next(keys), d, self.ffn),
                "b1": jnp.zeros((self.ffn,)),
                "w2": _dense(next(keys), self.ffn, d),
                "b2": jnp.zeros((d,)),
            }
            if self.compat:
                lp["ln3"] = _ln_p(d)     # torchaudio layer_norm_output
            layers.append(lp)
        if self.compat:
            return {"layers": layers}
        return {"layers": layers, "ln_out": _ln_p(d)}

    # -- attention over one segment (leading dims arbitrary) -------
    def _attend(self, p, q, kv, kmask):
        """Returns ``(projected output, pre-``out_proj`` context)`` —
        the latter feeds the compat-mode memory chain."""
        h, dh = self.h, self.d // self.h
        lead = q.shape[:-2]
        Q, K = q.shape[-2], kv.shape[-2]
        qh = (q @ p["wq"] + p["bq"]).reshape(*lead, Q, h, dh)
        kh = (kv @ p["wk"] + p["bk"]).reshape(*lead, K, h, dh)
        vh = (kv @ p["wv"] + p["bv"]).reshape(*lead, K, h, dh)
        logits = jnp.einsum("...qhd,...khd->...hqk", qh, kh) / math.sqrt(dh)
        logits = jnp.where(kmask[..., None, None, :], logits, _NEG)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", w, vh)
        ctx = out.reshape(*lead, Q, self.d)
        return ctx @ p["wo"] + p["bo"], ctx

    def _ffn(self, p, x):
        y = _ln(x, p["ln2"])
        return x + self.act(y @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]

    def _post_attention(self, p, utt_a, rc_a, masks, conv_cache):
        """Hook between the attention residual and the FFN —
        identity here; :class:`ConvEmformer` inserts its convolution
        module.  Returns ``(utt_a, rc_a, new_cache)``."""
        return utt_a, rc_a, None

    def _layer_body(self, p, utt, lc, rc, bank, masks,
                    conv_cache=None):
        """Shared per-segment layer body.  ``utt (..., S, D)``,
        ``lc (..., L, D)`` / ``rc (..., R, D)`` / ``bank (..., M, D)``
        are raw (pre-LN) values; masks = (lc_m, seg_m, rc_m, mem_m).
        Returns (utt', rc', summary attention output, new conv
        cache — None for the plain Emformer)."""
        lc_m, seg_m, rc_m, mem_m = masks
        S, L, R, M = self.S, self.L, self.R, self.M
        n_utt = _ln(utt, p["ln1"])
        n_lc = _ln(lc, p["ln1"]) if L else lc
        n_rc = _ln(rc, p["ln1"]) if R else rc
        # torchaudio norms only [right_context, utterance]; memory
        # keys enter attention raw
        n_bank = bank if (self.compat or not M) \
            else _ln(bank, p["ln1"])
        summary = jnp.mean(jnp.where(seg_m[..., None], n_utt, 0.0),
                           axis=-2, keepdims=True)
        q = jnp.concatenate([n_utt, n_rc, summary], axis=-2)
        kv = jnp.concatenate([n_bank, n_lc, n_utt, n_rc], axis=-2)
        kmask = jnp.concatenate([mem_m, lc_m, seg_m, rc_m], axis=-1)
        o, ctx = self._attend(p, q, kv, kmask)
        utt_a = utt + o[..., :S, :]
        rc_a = rc + o[..., S:S + R, :] if R else rc
        utt_a, rc_a, new_cache = self._post_attention(
            p, utt_a, rc_a, masks, conv_cache)
        utt2 = self._ffn(p, utt_a)
        rc2 = self._ffn(p, rc_a) if R else rc_a
        if self.compat:
            utt2 = _ln(utt2, p["ln3"])
            rc2 = _ln(rc2, p["ln3"]) if R else rc2
            m_out = ctx[..., -1, :]     # pre-out_proj (torchaudio)
            m_out = jnp.tanh(m_out) if self.tanh_on_mem \
                else jnp.clip(m_out, -10.0, 10.0)
        else:
            m_out = o[..., -1, :]
            if self.tanh_on_mem:
                m_out = jnp.tanh(m_out)
        return utt2, rc2, m_out, new_cache

    # -- full-utterance forward ------------------------------------
    def apply(self, params, x, lengths=None):
        B, TR, D = x.shape
        if D != self.d:
            raise ValueError(f"input dim {D} != {self.d}")
        S, L, R, M = self.S, self.L, self.R, self.M
        T = TR - R
        if T < 1:
            raise ValueError("need at least one utterance frame")
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        lengths = jnp.minimum(lengths.astype(jnp.int32), T)
        nseg = -(-T // S)
        Tp = nseg * S
        xp = jnp.pad(x[:, :T], ((0, 0), (0, Tp - T), (0, 0)))
        # stream-extended values: utterance, lookahead tail, padding —
        # position T + r holds the tail, matching stream coordinates.
        ext = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))  # (B, Tp+R, D)

        seg_ids = jnp.arange(nseg)
        seg_c = seg_ids[:, None] * S + jnp.arange(S)[None]
        lc_c = seg_ids[:, None] * S - L + jnp.arange(max(L, 1))[None]
        # hard-copy right context starts where the segment's valid
        # frames end globally: min((i+1)S, T)
        rc_c = jnp.minimum((seg_ids[:, None] + 1) * S, T) \
            + jnp.arange(max(R, 1))[None]
        mem_j = seg_ids[:, None] - M + jnp.arange(max(M, 1))[None]

        len_b = lengths[:, None, None]
        # full-length samples own the appended R-frame tail
        ext_len = (lengths + jnp.where(lengths == T, R, 0))[:, None, None]
        seg_m = seg_c[None] < len_b
        lc_m = (lc_c[None] >= 0) & (lc_c[None] < len_b) if L \
            else jnp.zeros((B, nseg, 0), bool)
        rc_m = (rc_c[None] < ext_len) if R \
            else jnp.zeros((B, nseg, 0), bool)
        mem_m = ((mem_j[None] >= 0) & (mem_j[None] * S < len_b)) if M \
            else jnp.zeros((B, nseg, 0), bool)
        masks = (lc_m, seg_m, rc_m, mem_m)

        utt = jnp.where(seg_m[..., None], xp.reshape(B, nseg, S, D), 0.0)
        if R:
            rc = jnp.take(ext, rc_c.reshape(-1), axis=1
                          ).reshape(B, nseg, R, D)
            rc = jnp.where(rc_m[..., None], rc, 0.0)
        else:
            rc = jnp.zeros((B, nseg, 0, D))

        # layer-0 memory chain: mean-pooled raw input segments
        mems = jnp.mean(utt, axis=-2)  # (B, nseg, D)

        mem_g = jnp.clip(mem_j, 0, nseg - 1).reshape(-1) if M else None
        lc_g = jnp.clip(lc_c, 0, Tp - 1).reshape(-1) if L else None
        for p in params["layers"]:
            bank = jnp.take(mems, mem_g, axis=1).reshape(B, nseg, M, D) \
                if M else jnp.zeros((B, nseg, 0, D))
            lc = jnp.take(utt.reshape(B, Tp, D), lc_g, axis=1
                          ).reshape(B, nseg, L, D) \
                if L else jnp.zeros((B, nseg, 0, D))
            utt, rc, mems, _ = self._layer_body(p, utt, lc, rc, bank,
                                                masks)
        out = utt if self.compat else _ln(utt, params["ln_out"])
        out = out.reshape(B, Tp, D)[:, :T]
        out = jnp.where(jnp.arange(T)[None, :, None] < lengths[:, None, None],
                        out, 0.0)
        return out, lengths

    # -- streaming -------------------------------------------------
    def init_state(self, batch_size: int):
        """Zeroed streaming state; validity is derived from the
        segment counter and cumulative per-sample lengths."""
        L, M, D = max(self.L, 1), max(self.M, 1), self.d
        return {"layers": [{"lc": jnp.zeros((batch_size, L, D)),
                            "bank": jnp.zeros((batch_size, M, D))}
                           for _ in range(self.n_layers)],
                "seg": jnp.zeros((), jnp.int32),
                "seen": jnp.zeros((batch_size,), jnp.int32)}

    def infer(self, params, chunk, state,
              utt_lengths: Optional[jnp.ndarray] = None,
              rc_lengths: Optional[jnp.ndarray] = None):
        """One segment step.  ``chunk (B, S+R, D)`` = ``S`` utterance
        slots (zero-padded past the stream end) + ``R`` lookahead
        frames; ``utt_lengths`` (B,) = valid new utterance frames
        (default S), ``rc_lengths`` (B,) = valid lookahead frames
        (default R — pass fewer at stream end)."""
        B, SR, D = chunk.shape
        S, L, R, M = self.S, self.L, self.R, self.M
        if SR != S + R:
            raise ValueError(f"chunk must have {S + R} frames, got {SR}")
        i = state["seg"]
        seen = state["seen"]
        utt_len = jnp.full((B,), S, jnp.int32) if utt_lengths is None \
            else jnp.clip(utt_lengths.astype(jnp.int32), 0, S)
        rc_len = jnp.full((B,), R, jnp.int32) if rc_lengths is None \
            else jnp.clip(rc_lengths.astype(jnp.int32), 0, R)

        seg_m = jnp.arange(S)[None] < utt_len[:, None]
        rc_m = (jnp.arange(max(R, 1))[None] < rc_len[:, None]) if R \
            else jnp.zeros((B, 0), bool)
        lc_c = i * S - L + jnp.arange(max(L, 1))[None]
        lc_m = ((lc_c >= 0) & (lc_c < seen[:, None])) if L \
            else jnp.zeros((B, 0), bool)
        mem_j = i - M + jnp.arange(max(M, 1))[None]
        mem_m = ((mem_j >= 0) & (mem_j * S < seen[:, None])) if M \
            else jnp.zeros((B, 0), bool)
        masks = (lc_m, seg_m, rc_m, mem_m)

        utt = jnp.where(seg_m[..., None], chunk[:, :S], 0.0)
        rc = jnp.where(rc_m[..., None], chunk[:, S:], 0.0) if R \
            else jnp.zeros((B, 0, D))
        m_in = jnp.mean(utt, axis=-2)  # layer-0 memory element
        new_layers = []
        for p, st in zip(params["layers"], state["layers"]):
            lc = st["lc"][:, -L:] if L else jnp.zeros((B, 0, D))
            bank = st["bank"][:, -M:] if M else jnp.zeros((B, 0, D))
            # cache this layer's input before computing its output
            new_st = {
                "lc": jnp.concatenate([st["lc"], utt],
                                      axis=1)[:, -max(L, 1):]
                if L else st["lc"],
                "bank": jnp.concatenate([st["bank"], m_in[:, None]],
                                        axis=1)[:, -max(M, 1):]
                if M else st["bank"],
            }
            utt, rc, m_in, new_cache = self._layer_body(
                p, utt, lc, rc, bank, masks,
                conv_cache=st.get("conv"))
            if new_cache is not None:
                new_st["conv"] = new_cache
            new_layers.append(new_st)
        out = utt if self.compat else _ln(utt, params["ln_out"])
        out = jnp.where(seg_m[..., None], out, 0.0)
        return out, utt_len, {"layers": new_layers, "seg": i + 1,
                              "seen": seen + utt_len}


class EmformerTranscriber:
    """torchaudio's ``_EmformerEncoder`` layout around the compat
    Emformer, so published ``emformer_rnnt_base`` transcriber weights
    import exactly ([ref-recon: torchaudio models/rnnt.py
    ``_EmformerEncoder`` — UNVERIFIED, mount empty]):

    ``input_linear`` (bias-free) → time reduction (stride-``s`` frame
    stacking, ``(B, T, D) → (B, T/s, D·s)``) → Emformer
    (``compat="torchaudio"``) → ``output_linear`` → LayerNorm.

    Lengths are in *input* (mel-frame) units everywhere; outputs come
    back in reduced units (``lengths // stride``).  ``segment_length``
    and ``right_context_length`` are in input units and must be
    divisible by ``time_reduction_stride`` (torchaudio asserts the
    same).  ``apply(params, x (B, T+R, input_dim), lengths)`` expects
    the utterance length ``T`` to be a stride multiple so the
    utterance/lookahead boundary survives the reduction exactly.

    Streaming: ``init_state(B)`` + ``infer(params, chunk
    (B, segment_length + right_context_length, input_dim), state,
    utt_lengths, rc_lengths)`` — chunkwise ≡ full pinned by test.
    """

    def __init__(self, *, input_dim: int, output_dim: int,
                 segment_length: int, right_context_length: int,
                 time_reduction_input_dim: int,
                 time_reduction_stride: int,
                 num_heads: int = 8, ffn_dim: int = 2048,
                 num_layers: int = 20,
                 left_context_length: int = 30,
                 max_memory_size: int = 0,
                 activation: str = "gelu",
                 tanh_on_mem: bool = True):
        s = time_reduction_stride
        if segment_length % s or right_context_length % s:
            raise ValueError(
                "segment_length and right_context_length must be "
                f"divisible by time_reduction_stride={s}")
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.red_dim = time_reduction_input_dim
        self.stride = s
        self.S_in = segment_length            # input units
        self.R_in = right_context_length
        self.d = time_reduction_input_dim * s
        self.emformer = Emformer(
            self.d, num_heads, ffn_dim, num_layers,
            segment_length // s,
            left_context_length=left_context_length,
            right_context_length=right_context_length // s,
            max_memory_size=max_memory_size,
            tanh_on_mem=tanh_on_mem, activation=activation,
            compat="torchaudio")

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "in_lin": {"w": _dense(k1, self.input_dim, self.red_dim)},
            "emformer": self.emformer.init(k2),
            "out_lin": {"w": _dense(k3, self.d, self.output_dim),
                        "b": jnp.zeros((self.output_dim,))},
            "out_ln": _ln_p(self.output_dim),
        }

    def _reduce(self, y):
        """(B, T, red_dim) → (B, T//stride, red_dim*stride); T must be
        a stride multiple (callers guarantee it)."""
        B, T, D = y.shape
        s = self.stride
        return y.reshape(B, T // s, D * s)

    def _head(self, params, feats):
        return _ln(feats @ params["out_lin"]["w"]
                   + params["out_lin"]["b"], params["out_ln"])

    def apply(self, params, x, lengths=None):
        B, TR, D = x.shape
        s = self.stride
        T = TR - self.R_in
        if T < 1 or T % s:
            raise ValueError(
                f"utterance length {T} (input frames {TR} minus "
                f"right context {self.R_in}) must be a positive "
                f"multiple of the time-reduction stride {s}")
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        y = self._reduce(x @ params["in_lin"]["w"])
        out, out_lengths = self.emformer.apply(
            params["emformer"], y, lengths.astype(jnp.int32) // s)
        return self._head(params, out), out_lengths

    # -- streaming ---------------------------------------------------
    def init_state(self, batch_size: int):
        return self.emformer.init_state(batch_size)

    def infer(self, params, chunk, state, utt_lengths=None,
              rc_lengths=None):
        """One segment step; ``chunk (B, S_in + R_in, input_dim)``,
        lengths in input units."""
        B, n, D = chunk.shape
        if n != self.S_in + self.R_in:
            raise ValueError(
                f"chunk must have {self.S_in + self.R_in} frames")
        s = self.stride
        y = self._reduce(chunk @ params["in_lin"]["w"])
        out, out_lengths, state = self.emformer.infer(
            params["emformer"], y, state,
            None if utt_lengths is None
            else utt_lengths.astype(jnp.int32) // s,
            None if rc_lengths is None
            else rc_lengths.astype(jnp.int32) // s)
        return self._head(params, out), out_lengths, state


class ConvEmformer(Emformer):
    """Emformer with a per-layer convolution module (torchaudio's
    ``prototype.models.ConvEmformer`` capability [ref-recon:
    torchaudio/prototype/models/conv_emformer.py — UNVERIFIED,
    mount empty]).

    Each layer inserts a Conformer-style convolution module between
    the attention residual and the FFN: pre-LN → pointwise GLU →
    CAUSAL depthwise conv (kernel ``kernel_size``, left-padded by the
    previous segment's last ``kernel_size−1`` post-attention frames)
    → SiLU → pointwise projection → residual.  The right-context
    frames ride the same conv as a continuation of the segment, so
    chunkwise ``infer`` stays EXACTLY equal to the full-utterance
    ``apply`` (pinned by test) — the streaming state gains one
    ``(B, kernel_size−1, D)`` conv cache per layer.  The exact inner
    ordering of torchaudio's layer (macaron halves etc.) is
    unverifiable against the empty mount; the invariant this class
    pins is the Emformer contract itself (streaming ≡ full).
    """

    def __init__(self, input_dim: int, num_heads: int, ffn_dim: int,
                 num_layers: int, segment_length: int,
                 kernel_size: int = 31, **emformer_kwargs):
        if kernel_size < 1:
            raise ValueError("kernel_size must be >= 1")
        super().__init__(input_dim, num_heads, ffn_dim, num_layers,
                         segment_length, **emformer_kwargs)
        self.K = kernel_size
        self._config = self._config + (kernel_size,)

    def init(self, key):
        k_base, k_conv = jax.random.split(key)
        params = super().init(k_base)
        d, K = self.d, self.K
        keys = iter(jax.random.split(k_conv, 3 * self.n_layers))
        for lp in params["layers"]:
            s = math.sqrt(6.0 / (K + 2 * d))
            lp["conv"] = {
                "ln": _ln_p(d),
                "pw1": _dense(next(keys), d, 2 * d),
                "pb1": jnp.zeros((2 * d,)),
                "dw": jax.random.uniform(next(keys), (K, 1, d),
                                         jnp.float32, -s, s),
                "pw2": _dense(next(keys), d, d),
                "pb2": jnp.zeros((d,)),
            }
        return params

    def init_state(self, batch_size: int):
        state = super().init_state(batch_size)
        Km1 = self.K - 1
        for st in state["layers"]:
            st["conv"] = jnp.zeros((batch_size, max(Km1, 1), self.d))
        return state

    def _post_attention(self, p, utt_a, rc_a, masks, conv_cache):
        _, seg_m, rc_m, _ = masks
        S, R, D, K = self.S, self.R, self.d, self.K
        Km1 = K - 1
        # zero invalid slots so the conv never mixes attention garbage
        # (identical operation in both modes — equality-preserving)
        utt_a = jnp.where(seg_m[..., None], utt_a, 0.0)
        if R:
            rc_a = jnp.where(rc_m[..., None], rc_a, 0.0)

        if conv_cache is None:
            # full mode: utt_a is (B, nseg, S, D) — the cache for
            # segment i is segment i-1's last K-1 post-attention
            # frames, gathered from the flattened tensor
            B, nseg = utt_a.shape[0], utt_a.shape[1]
            if Km1:
                flat = utt_a.reshape(B, nseg * S, D)
                coords = (jnp.arange(nseg)[:, None] * S - Km1
                          + jnp.arange(Km1)[None])
                g = jnp.take(flat, jnp.clip(coords, 0).reshape(-1),
                             axis=1).reshape(B, nseg, Km1, D)
                cache_v = jnp.where((coords >= 0)[None, ..., None],
                                    g, 0.0)
            else:
                cache_v = jnp.zeros((B, nseg, 0, D))
            new_cache = None
        else:
            cache_v = conv_cache[:, :Km1]        # (B, K-1, D)
            new_cache = jnp.concatenate(
                [conv_cache, utt_a], axis=-2)[:, -max(Km1, 1):] \
                if Km1 else conv_cache

        x = jnp.concatenate([cache_v, utt_a] + ([rc_a] if R else []),
                            axis=-2)
        y = _ln(x, p["conv"]["ln"])
        y = y @ p["conv"]["pw1"] + p["conv"]["pb1"]
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)                # GLU
        lead = y.shape[:-2]
        y2 = y.reshape((-1,) + y.shape[-2:])
        out = jax.lax.conv_general_dilated(
            y2, p["conv"]["dw"], window_strides=(1,),
            padding="VALID", dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=D,
            preferred_element_type=jnp.float32)
        out = out.reshape(lead + (S + R, D))
        out = jax.nn.silu(out) @ p["conv"]["pw2"] + p["conv"]["pb2"]
        utt_a = utt_a + out[..., :S, :]
        if R:
            rc_a = rc_a + out[..., S:, :]
        return utt_a, rc_a, new_cache
