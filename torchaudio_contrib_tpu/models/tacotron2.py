"""Tacotron2 (Shen et al. 2018) — text→mel TTS, pure-functional JAX.

Not in the reference (SURVEY §2 — no model zoo); mirrors torchaudio's
``models.Tacotron2`` capability: character embedding → conv+biLSTM
encoder → autoregressive decoder with location-sensitive attention →
postnet residual, returning ``(mel, mel_postnet, stop_logits,
alignments)``.  Feed the mel into ``models.WaveRNN`` or
``ops.mel_to_audio`` to reach a waveform.

TPU formulation:

* Teacher-forced ``apply`` runs the whole decoder as ONE ``lax.scan``
  over mel frames; the per-step body is a handful of GEMMs (two LSTM
  cells, attention projections) — static shapes, one jitted program.
  The encoder memory projection is hoisted out of the scan.
* ``infer`` is the same scan with the step's own output fed back and a
  fixed ``max_steps`` (XLA-friendly bounded loop); the returned
  ``lengths`` mark each clip's first stop-token crossing.
* The conv stacks' BatchNorms are carried as FROZEN per-channel
  affines (inference form; ``utils.import_torch.import_tacotron2``
  folds a checkpoint's running stats in exactly — round 4, was
  layernorm before, which cannot represent a trained BN).  Remaining
  deviation (documented): the prenet runs WITHOUT dropout (torchaudio
  applies dropout even at inference; randomness here would need an
  explicit key — pass your own prenet noise via SpecAugment-style
  augmentation instead).  Forward parity vs a torch replica is pinned
  in ``tests/test_import_torch_extra.py``.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ._common import _dense, _conv

__all__ = ["Tacotron2"]


def _conv1d(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, w, (1,), padding, dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)


def _lstm_step(p, h, c, x):
    """torch ``nn.LSTMCell`` semantics exactly (gates ``i, f, g, o``,
    no implicit forget-gate offset) so imported torch weights run
    unchanged; the +1 forget-gate training bias lives in the INITIAL
    ``b`` value instead (``_lstm_params``), where a checkpoint
    overwrites it."""
    gates = x @ p["wx"] + h @ p["wh"] + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _lstm_params(key, cin, hdim):
    k1, k2 = jax.random.split(key)
    b = jnp.zeros((4 * hdim,)).at[hdim:2 * hdim].set(1.0)
    return {"wx": _dense(k1, cin, 4 * hdim),
            "wh": _dense(k2, hdim, 4 * hdim),
            "b": b}


class Tacotron2:
    """``apply(params, tokens (B, S), token_lengths, mels (B, n_mels,
    T))`` → ``(mel (B, n_mels, T), mel_postnet, stop_logits (B, T),
    alignments (B, T, S))``; ``infer(params, tokens, token_lengths,
    max_steps)`` adds ``lengths``."""

    def __init__(self, n_symbols: int = 148, n_mels: int = 80,
                 embed_dim: int = 512, encoder_dim: int = 512,
                 attention_dim: int = 128, attention_filters: int = 32,
                 attention_kernel: int = 31, decoder_dim: int = 1024,
                 prenet_dim: int = 256, postnet_dim: int = 512,
                 postnet_kernel: int = 5, encoder_kernel: int = 5,
                 n_encoder_convs: int = 3, n_postnet_convs: int = 5):
        if encoder_dim % 2:
            raise ValueError("encoder_dim must be even (biLSTM halves)")
        self.n_symbols = n_symbols
        self.n_mels = n_mels
        self.embed = embed_dim
        self.enc = encoder_dim
        self.att = attention_dim
        self.att_filters = attention_filters
        self.att_kernel = attention_kernel
        self.dec = decoder_dim
        self.prenet = prenet_dim
        self.post = postnet_dim
        self.post_k = postnet_kernel
        self.enc_k = encoder_kernel
        self.n_enc_convs = n_encoder_convs
        self.n_post_convs = n_postnet_convs
        self._config = (n_symbols, n_mels, embed_dim, encoder_dim,
                        attention_dim, decoder_dim, prenet_dim,
                        postnet_dim)

    # -- params ------------------------------------------------------------
    def init(self, key):
        # key budget scales with the conv-stack configs (a fixed pool
        # would StopIteration on deep custom stacks)
        keys = iter(jax.random.split(
            key, 24 + self.n_enc_convs + self.n_post_convs))
        ln = lambda c: {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}
        h2 = self.enc // 2
        enc_convs = []
        cin = self.embed
        for _ in range(self.n_enc_convs):
            enc_convs.append({"w": _conv(next(keys), self.enc_k, cin,
                                         self.enc),
                              "b": jnp.zeros((self.enc,)),
                              "n": ln(self.enc)})
            cin = self.enc
        post = []
        cin = self.n_mels
        for i in range(self.n_post_convs):
            cout = self.n_mels if i == self.n_post_convs - 1 else self.post
            post.append({"w": _conv(next(keys), self.post_k, cin, cout),
                         "b": jnp.zeros((cout,)),
                         "n": ln(cout)})
            cin = cout
        return {
            "embedding": 0.3 * jax.random.normal(
                next(keys), (self.n_symbols, self.embed)),
            "enc_convs": enc_convs,
            "enc_fwd": _lstm_params(next(keys), self.enc, h2),
            "enc_bwd": _lstm_params(next(keys), self.enc, h2),
            "prenet1": {"w": _dense(next(keys), self.n_mels,
                                    self.prenet)},
            "prenet2": {"w": _dense(next(keys), self.prenet,
                                    self.prenet)},
            "att_rnn": _lstm_params(next(keys),
                                    self.prenet + self.enc, self.dec),
            "att_query": _dense(next(keys), self.dec, self.att),
            "att_memory": _dense(next(keys), self.enc, self.att),
            "att_loc_conv": _conv(next(keys), self.att_kernel, 2,
                                  self.att_filters),
            "att_loc_fc": _dense(next(keys), self.att_filters,
                                 self.att),
            "att_v": _dense(next(keys), self.att, 1),
            "dec_rnn": _lstm_params(next(keys), self.dec + self.enc,
                                    self.dec),
            "mel_out": {"w": _dense(next(keys), self.dec + self.enc,
                                    self.n_mels),
                        "b": jnp.zeros((self.n_mels,))},
            "stop": {"w": _dense(next(keys), self.dec + self.enc, 1),
                     "b": jnp.zeros((1,))},
            "postnet": post,
        }

    # -- encoder -----------------------------------------------------------
    def _encode(self, params, tokens, token_lengths):
        x = params["embedding"][tokens]               # (B, S, E)
        # zero pad positions before/through the conv stack so the
        # SAME-padded convs see zeros past the sequence end exactly as
        # they would at an unpadded clip's edge — valid positions are
        # then independent of batch padding (pinned by test)
        in_mask = (jnp.arange(x.shape[1])[None, :]
                   < token_lengths[:, None])[..., None]
        x = jnp.where(in_mask, x, 0.0)
        for c in params["enc_convs"]:
            # conv + frozen-BN affine (inference form; imported
            # checkpoints fold running stats into n.g/n.b) + relu
            x = jax.nn.relu((_conv1d(x, c["w"], "SAME") + c["b"])
                            * c["n"]["g"] + c["n"]["b"])
            x = jnp.where(in_mask, x, 0.0)
        # bi-LSTM over symbols
        h2 = self.enc // 2

        def run(p, xs, reverse):
            def step(carry, x_t):
                h, c = carry
                h, c = _lstm_step(p, h, c, x_t)
                return (h, c), h
            b = xs.shape[1]
            init = (jnp.zeros((b, h2)), jnp.zeros((b, h2)))
            _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
            return hs

        xs = jnp.transpose(x, (1, 0, 2))              # (S, B, D)
        # backward direction: reverse EACH sample by its own length
        # (a plain reversed scan would start in the padded tail and
        # carry pad contamination into valid positions — torch packs;
        # we gather), run forward, and gather back.  The index map
        # L-1-t is an involution, so one map serves both directions.
        S = xs.shape[0]
        rev = token_lengths[None, :] - 1 - jnp.arange(S)[:, None]
        valid = rev >= 0                              # (S, B)
        gidx = jnp.clip(rev, 0)[:, :, None]
        xs_rev = jnp.where(valid[:, :, None],
                           jnp.take_along_axis(xs, gidx, axis=0), 0.0)
        hs_bwd_rev = run(params["enc_bwd"], xs_rev, False)
        hs_bwd = jnp.where(
            valid[:, :, None],
            jnp.take_along_axis(hs_bwd_rev, gidx, axis=0), 0.0)
        memory = jnp.concatenate(
            [run(params["enc_fwd"], xs, False), hs_bwd], -1)
        memory = jnp.transpose(memory, (1, 0, 2))     # (B, S, enc)
        mask = (jnp.arange(memory.shape[1])[None, :]
                < token_lengths[:, None])
        return memory * mask[..., None], mask

    def _prenet(self, params, x):
        x = jax.nn.relu(x @ params["prenet1"]["w"])
        return jax.nn.relu(x @ params["prenet2"]["w"])

    # -- one decoder step ----------------------------------------------------
    def _step(self, params, memory, mem_proj, mask, carry, prev_frame):
        (h_a, c_a, h_d, c_d, ctx, att_w, att_cum) = carry
        pre = self._prenet(params, prev_frame)
        h_a, c_a = _lstm_step(params["att_rnn"], h_a, c_a,
                              jnp.concatenate([pre, ctx], -1))
        # location-sensitive attention
        loc = jnp.stack([att_w, att_cum], -1)          # (B, S, 2)
        loc = _conv1d(loc, params["att_loc_conv"], "SAME")
        loc = loc @ params["att_loc_fc"]
        q = (h_a @ params["att_query"])[:, None, :]
        e = (jnp.tanh(q + mem_proj + loc)
             @ params["att_v"])[..., 0]               # (B, S)
        e = jnp.where(mask, e, -1e30)
        w = jax.nn.softmax(e, -1)
        ctx = jnp.einsum("bs,bse->be", w, memory)
        att_cum = att_cum + w
        h_d, c_d = _lstm_step(params["dec_rnn"], h_d, c_d,
                              jnp.concatenate([h_a, ctx], -1))
        hc = jnp.concatenate([h_d, ctx], -1)
        frame = hc @ params["mel_out"]["w"] + params["mel_out"]["b"]
        stop = (hc @ params["stop"]["w"] + params["stop"]["b"])[..., 0]
        return (h_a, c_a, h_d, c_d, ctx, w, att_cum), (frame, stop, w)

    def _init_carry(self, b, s):
        z = jnp.zeros
        return (z((b, self.dec)), z((b, self.dec)), z((b, self.dec)),
                z((b, self.dec)), z((b, self.enc)), z((b, s)),
                z((b, s)))

    def _postnet(self, params, mel):                  # (B, T, n_mels)
        y = mel
        for i, c in enumerate(params["postnet"]):
            y = (_conv1d(y, c["w"], "SAME") + c["b"]) \
                * c["n"]["g"] + c["n"]["b"]
            if i < len(params["postnet"]) - 1:
                y = jnp.tanh(y)
        return mel + y

    # -- teacher-forced forward ---------------------------------------------
    def apply(self, params, tokens, token_lengths, mels):
        tokens = jnp.asarray(tokens, jnp.int32)
        mels = jnp.asarray(mels)
        if tokens.ndim != 2 or mels.ndim != 3 \
                or mels.shape[1] != self.n_mels:
            raise ValueError("tokens (B, S); mels (B, n_mels, T)")
        token_lengths = jnp.asarray(token_lengths, jnp.int32)
        b, s = tokens.shape
        memory, mask = self._encode(params, tokens, token_lengths)
        mem_proj = memory @ params["att_memory"]

        frames = jnp.transpose(mels, (2, 0, 1))       # (T, B, M)
        go = jnp.zeros((1, b, self.n_mels))
        inputs = jnp.concatenate([go, frames[:-1]], 0)

        def scan_step(carry, prev):
            return self._step(params, memory, mem_proj, mask, carry,
                              prev)

        _, (out, stop, ali) = jax.lax.scan(
            scan_step, self._init_carry(b, s), inputs)
        mel = jnp.transpose(out, (1, 2, 0))           # (B, M, T)
        post = jnp.transpose(
            self._postnet(params, jnp.transpose(mel, (0, 2, 1))),
            (0, 2, 1))
        return (mel, post, jnp.transpose(stop, (1, 0)),
                jnp.transpose(ali, (1, 0, 2)))

    # -- inference ------------------------------------------------------------
    def infer(self, params, tokens, token_lengths, max_steps: int = 200,
              stop_threshold: float = 0.5):
        tokens = jnp.asarray(tokens, jnp.int32)
        token_lengths = jnp.asarray(token_lengths, jnp.int32)
        b, s = tokens.shape
        memory, mask = self._encode(params, tokens, token_lengths)
        mem_proj = memory @ params["att_memory"]

        def scan_step(state, _):
            carry, prev = state
            carry, (frame, stop, ali) = self._step(
                params, memory, mem_proj, mask, carry, prev)
            return (carry, frame), (frame, stop, ali)

        init = (self._init_carry(b, s), jnp.zeros((b, self.n_mels)))
        _, (out, stop, ali) = jax.lax.scan(scan_step, init, None,
                                           length=max_steps)
        mel = jnp.transpose(out, (1, 2, 0))
        post = jnp.transpose(
            self._postnet(params, jnp.transpose(mel, (0, 2, 1))),
            (0, 2, 1))
        stop = jnp.transpose(stop, (1, 0))            # (B, T)
        stopped = jax.nn.sigmoid(stop) > stop_threshold
        lengths = jnp.where(
            jnp.any(stopped, 1),
            jnp.argmax(stopped, 1) + 1, max_steps).astype(jnp.int32)
        return mel, post, stop, jnp.transpose(ali, (1, 0, 2)), lengths

    def __call__(self, params, tokens, token_lengths, mels):
        return self.apply(params, tokens, token_lengths, mels)
