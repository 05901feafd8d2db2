"""RNN-T (transducer) model family: predictor, joiner, full model,
device greedy decoding, host beam search.

Not in the reference (SURVEY §2 — torchaudio-contrib has no model
zoo); mirrors torchaudio's ``models.RNNT`` / ``RNNTBeamSearch``
capability (Graves 2012).  The transcriber (acoustic encoder) is
pluggable — any object with ``init(key)`` and ``apply(params, x,
lengths)`` (returning features or ``(features, lengths)``) works;
``Conformer`` and ``Emformer`` from this package both qualify, the
latter giving the streaming Emformer-RNNT stack.

TPU-first notes:

* the predictor LSTM is ONE step function reused by both the training
  ``lax.scan`` and decoding, so streaming decode and training are
  consistent by construction;
* ``greedy_decode`` is fully jittable: a ``lax.scan`` over time with a
  statically-unrolled bounded inner emission loop (``max_symbols`` per
  frame), masked flag updates instead of data-dependent branching —
  one compiled program decodes a whole padded batch;
* beam search runs on the host (hypothesis sets are inherently ragged)
  but batches all hypotheses' predictor steps and joint evaluations
  into single jitted device calls per expansion round.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ._common import _dense, _ln
import numpy as np

__all__ = ["RNNTPredictor", "RNNT", "RNNTBeamSearch"]


class RNNTPredictor:
    """LSTM label predictor.  Blank doubles as the start-of-sequence
    token (torchaudio's convention).  ``apply`` returns one output per
    label *context*: position ``u`` encodes ``y_1..y_u`` (position 0 =
    SOS only), so the output length is ``U + 1``."""

    def __init__(self, num_symbols: int, embed_dim: int,
                 hidden_dim: int, output_dim: int, num_layers: int = 1,
                 blank: int = 0):
        self.v = num_symbols
        self.e = embed_dim
        self.h = hidden_dim
        self.o = output_dim
        self.n_layers = num_layers
        self.blank = blank

    def init(self, key):
        keys = iter(jax.random.split(key, 2 + 2 * self.n_layers))
        layers = []
        cin = self.e
        for _ in range(self.n_layers):
            layers.append({"wi": _dense(next(keys), cin, 4 * self.h),
                           "wh": _dense(next(keys), self.h, 4 * self.h),
                           "b": jnp.zeros((4 * self.h,))})
            cin = self.h
        return {"emb": 0.1 * jax.random.normal(next(keys),
                                               (self.v, self.e)),
                "layers": layers,
                "ln": {"g": jnp.ones((self.h,)),
                       "b": jnp.zeros((self.h,))},
                "out": {"w": _dense(next(keys), self.h, self.o),
                        "b": jnp.zeros((self.o,))}}

    def init_state(self, batch_size: int):
        return [(jnp.zeros((batch_size, self.h)),
                 jnp.zeros((batch_size, self.h)))
                for _ in range(self.n_layers)]

    def step(self, params, tokens, state):
        """One step: ``tokens (B,) int32`` → ``(out (B, O), state)``."""
        x = params["emb"][tokens]
        new_state = []
        for p, (h, c) in zip(params["layers"], state):
            gates = x @ p["wi"] + h @ p["wh"] + p["b"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            new_state.append((h, c))
            x = h
        out = _ln(x, params["ln"]) @ params["out"]["w"] \
            + params["out"]["b"]
        return out, new_state

    def apply(self, params, targets, target_lengths=None):
        """``targets (B, U)`` → ``(B, U+1, O)`` label-context
        encodings.  The scan consumes the padded row verbatim, so
        positions past ``target_lengths`` are pad-token-dependent and
        carry no contract — ``ops.rnnt_loss`` masks them; do not read
        them as sequence encodings."""
        B, U = targets.shape
        sos = jnp.full((B,), self.blank, jnp.int32)
        seq = jnp.concatenate([sos[:, None],
                               targets.astype(jnp.int32)], axis=1)

        def step(state, tok):
            out, state = self.step(params, tok, state)
            return state, out

        _, outs = jax.lax.scan(step, self.init_state(B),
                               jnp.swapaxes(seq, 0, 1))
        return jnp.swapaxes(outs, 0, 1)                  # (B, U+1, O)


class RNNT:
    """Transducer = transcriber ∘ predictor ∘ joiner.

    ``joint_logits(params, x, targets, lengths, target_lengths)`` →
    ``(logits (B, T, U+1, V), out_lengths)`` feeds directly into
    ``ops.rnnt_loss``; ``greedy_decode`` is jittable."""

    def __init__(self, transcriber, num_symbols: int,
                 encoding_dim: int, joiner_dim: int = 0,
                 predictor_embed_dim: int = 64,
                 predictor_hidden_dim: int = 128,
                 predictor_layers: int = 1, blank: int = 0,
                 joiner_activation: str = "tanh"):
        if joiner_activation not in ("tanh", "relu"):
            raise ValueError("joiner_activation must be tanh or relu")
        self.transcriber = transcriber
        self.v = num_symbols
        self.blank = blank
        self.joiner_dim = joiner_dim or encoding_dim
        self.enc_dim = encoding_dim
        self.act = jnp.tanh if joiner_activation == "tanh" \
            else jax.nn.relu
        self.predictor = RNNTPredictor(
            num_symbols, predictor_embed_dim, predictor_hidden_dim,
            self.joiner_dim, predictor_layers, blank)

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {"transcriber": self.transcriber.init(k1),
                "predictor": self.predictor.init(k2),
                "enc_proj": {"w": _dense(k3, self.enc_dim,
                                         self.joiner_dim),
                             "b": jnp.zeros((self.joiner_dim,))},
                "joiner": {"w": _dense(k4, self.joiner_dim, self.v),
                           "b": jnp.zeros((self.v,))}}

    # -- pieces -----------------------------------------------------
    def transcribe(self, params, x, lengths=None):
        out = self.transcriber.apply(params["transcriber"], x, lengths)
        if isinstance(out, tuple):
            feats, out_lengths = out
        else:
            feats = out
            out_lengths = lengths if lengths is not None else \
                jnp.full((x.shape[0],), feats.shape[1], jnp.int32)
        feats = feats @ params["enc_proj"]["w"] + params["enc_proj"]["b"]
        return feats, out_lengths

    def join(self, params, enc, pred):
        """``enc (..., J)`` + ``pred (..., J)`` → logits ``(..., V)``;
        broadcasting shapes is the caller's job."""
        return self.act(enc + pred) @ params["joiner"]["w"] \
            + params["joiner"]["b"]

    def joint_logits(self, params, x, targets, lengths=None,
                     target_lengths=None):
        enc, out_lengths = self.transcribe(params, x, lengths)
        pred = self.predictor.apply(params["predictor"], targets,
                                    target_lengths)
        logits = self.join(params, enc[:, :, None, :],
                           pred[:, None, :, :])
        return logits, out_lengths

    # -- decoding ---------------------------------------------------
    def greedy_init_state(self, params, batch_size: int):
        """Decoder-side greedy carry: (last predictor output, LSTM
        state) primed with the SOS/blank step.  Passing the returned
        carry through successive ``_greedy_on_enc`` calls makes
        chunkwise decoding ≡ one-shot decoding by construction."""
        return self.predictor.step(
            params["predictor"],
            jnp.full((batch_size,), self.blank, jnp.int32),
            self.predictor.init_state(batch_size))

    @partial(jax.jit, static_argnums=(0, 4))
    def _greedy_on_enc(self, params, enc, out_lengths, max_symbols,
                       carry):
        B = enc.shape[0]

        def time_step(carry, inp):
            pred, state = carry
            enc_t, t = inp
            valid_t = t < out_lengths                       # (B,)
            toks = jnp.full((B, max_symbols), self.blank, jnp.int32)
            done = ~valid_t
            for k in range(max_symbols):
                logits = self.join(params, enc_t, pred)     # (B, V)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                emit = (~done) & (tok != self.blank)
                toks = toks.at[:, k].set(jnp.where(emit, tok,
                                                   self.blank))
                new_pred, new_state = self.predictor.step(
                    params["predictor"], tok, state)
                m = emit[:, None]
                pred = jnp.where(m, new_pred, pred)
                state = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(m, n, o), new_state, state)
                done = done | ~emit
            return (pred, state), toks

        carry, toks = jax.lax.scan(time_step, carry,
                                   (jnp.swapaxes(enc, 0, 1),
                                    jnp.arange(enc.shape[1])))
        return jnp.swapaxes(toks, 0, 1), carry  # (B, T, max_symbols)

    def greedy_decode(self, params, x, lengths=None,
                      max_symbols: int = 4, compact: bool = True):
        """Greedy transducer decode.  Returns a list of per-sample
        token lists (``compact=True``) or the raw ``(B, T,
        max_symbols)`` grid of emissions (blank = no emission) for
        fully-device pipelines."""
        enc, out_lengths = self.transcribe(params, x, lengths)
        grid, _ = self._greedy_on_enc(
            params, enc, out_lengths, max_symbols,
            self.greedy_init_state(params, enc.shape[0]))
        if not compact:
            return grid
        g = np.asarray(grid)
        return [[int(t) for t in row.reshape(-1) if t != self.blank]
                for row in g]

    # -- streaming --------------------------------------------------
    def init_stream_state(self, params, batch_size: int):
        """Joint streaming state: the transcriber's streaming state
        (the transcriber must expose ``init_state``/``infer`` — e.g.
        ``Emformer``) + the greedy decoder carry."""
        if not hasattr(self.transcriber, "init_state"):
            raise TypeError(
                "streaming needs a transcriber with init_state/infer "
                f"(got {type(self.transcriber).__name__})")
        return {"enc": self.transcriber.init_state(batch_size),
                "dec": self.greedy_init_state(params, batch_size)}

    def stream_transcribe(self, params, chunk, enc_state,
                          **infer_kwargs):
        """One transcriber streaming step + joiner projection:
        ``chunk`` in the transcriber's ``infer`` format →
        ``(feats (B, S, J), out_lengths, enc_state)``."""
        feats, out_lengths, enc_state = self.transcriber.infer(
            params["transcriber"], chunk, enc_state, **infer_kwargs)
        feats = feats @ params["enc_proj"]["w"] \
            + params["enc_proj"]["b"]
        return feats, out_lengths, enc_state

    def stream_greedy_step(self, params, chunk, state,
                           max_symbols: int = 4, **infer_kwargs):
        """Streaming greedy decode, one transcriber chunk per call:
        → ``(grid (B, S, max_symbols), out_lengths, state)``.  Feeding
        every chunk reproduces ``greedy_decode``'s emission grid
        exactly (pinned by test)."""
        feats, out_lengths, enc_state = self.stream_transcribe(
            params, chunk, state["enc"], **infer_kwargs)
        grid, dec = self._greedy_on_enc(params, feats, out_lengths,
                                        max_symbols, state["dec"])
        return grid, out_lengths, {"enc": enc_state, "dec": dec}


class RNNTBeamSearch:
    """Time-synchronous transducer beam search (host-side hypothesis
    bookkeeping, device-batched predictor/joiner evaluations).

    Each frame runs up to ``max_symbols`` expansion rounds: every
    hypothesis is scored against all symbols; blank extensions become
    frame-final candidates, the best non-blank extensions survive into
    the next round.  Identical label sequences are merged with
    ``logaddexp``.  Returns the ``beam_width`` best hypotheses."""

    def __init__(self, model: RNNT, beam_width: int = 8,
                 max_symbols: int = 4):
        self.model = model
        self.beam = beam_width
        self.max_symbols = max_symbols
        self._step = jax.jit(
            lambda p, toks, st: model.predictor.step(p["predictor"],
                                                     toks, st))
        self._join = jax.jit(
            lambda p, enc, pred: jax.nn.log_softmax(
                model.join(p, enc, pred), axis=-1))

    def __call__(self, params, x, lengths=None
                 ) -> List[List[Tuple[List[int], float]]]:
        enc, out_lengths = self.model.transcribe(params, x, lengths)
        enc = np.asarray(enc)
        out_lengths = np.asarray(out_lengths)
        out = []
        for b in range(enc.shape[0]):
            hyps, cache = self._init_hyps(params)
            hyps, _ = self._advance(params, enc[b],
                                    int(out_lengths[b]), hyps, cache)
            out.append(self._ranked(hyps))
        return out

    # -- streaming --------------------------------------------------
    def init_state(self, params, batch_size: int):
        """Host-side decode state, one (hypotheses, predictor cache)
        pair per sample."""
        return [self._init_hyps(params) for _ in range(batch_size)]

    def infer(self, params, feats, out_lengths, states):
        """Advance the beam over one chunk of *projected* encoder
        features (from ``model.stream_transcribe``): ``feats (B, S,
        J)`` → (per-sample ranked hypotheses so far, new states).
        Feeding every chunk reproduces ``__call__`` exactly (pinned
        by test)."""
        feats = np.asarray(feats)
        out_lengths = np.asarray(out_lengths)
        results, new_states = [], []
        for b, (hyps, cache) in enumerate(states):
            hyps, cache = self._advance(params, feats[b],
                                        int(out_lengths[b]), hyps,
                                        cache)
            new_states.append((hyps, cache))
            results.append(self._ranked(hyps))
        return results, new_states

    # -- internals --------------------------------------------------
    @staticmethod
    def _ranked(hyps):
        return [(list(h[0]), float(h[1])) for h in
                sorted(hyps, key=lambda h: -h[1])]

    def _init_hyps(self, params):
        blank = self.model.blank
        pred0, state0 = self._step(
            params, jnp.full((1,), blank, jnp.int32),
            self.model.predictor.init_state(1))
        # hyp = (tokens tuple, score, pred_out (J,), state leaves)
        hyps = [((), 0.0, pred0[0], jax.tree_util.tree_map(
            lambda a: a[0], state0))]
        # predictor output/state per label sequence (depends only on
        # the tokens, so one cache serves all frames)
        cache = {(): (hyps[0][2], hyps[0][3])}
        return hyps, cache

    def _advance(self, params, enc, T, hyps, cache):
        blank = self.model.blank
        for t in range(T):
            finals = {}

            def _merge(d, key, val):
                d[key] = np.logaddexp(d[key], val) if key in d else val

            active = hyps
            for _ in range(self.max_symbols):
                if not active:
                    break
                pred = jnp.stack([h[2] for h in active])
                lp = np.asarray(self._join(
                    params, jnp.asarray(enc[t])[None], pred))
                nxt = {}
                for h, row in zip(active, lp):
                    _merge(finals, h[0], h[1] + float(row[blank]))
                    # only the top `beam` non-blank tokens can survive:
                    # partial-select beats a full vocab argsort on the
                    # host decode path (V can be 4k+)
                    k = min(self.beam + 1, row.size)
                    part = np.argpartition(row, row.size - k)[-k:]
                    order = part[np.argsort(row[part])[::-1]]
                    kept = 0
                    for tok in order:
                        if tok == blank:
                            continue
                        cand = h[0] + (int(tok),)
                        sc = h[1] + float(row[tok])
                        if cand in nxt:
                            nxt[cand] = (np.logaddexp(nxt[cand][0], sc),
                                         nxt[cand][1])
                        else:
                            nxt[cand] = (sc, h)
                        kept += 1
                        if kept >= self.beam:
                            break
                top = sorted(nxt.items(), key=lambda kv: -kv[1][0]
                             )[:self.beam]
                if not top:
                    # blank-only vocabulary: these hypotheses' blank
                    # closes were already merged above — clear so the
                    # post-loop close does not double-count them
                    active = []
                    break
                toks = jnp.asarray([c[-1] for c, _ in top], jnp.int32)
                parents = [v[1] for _, v in top]
                state = jax.tree_util.tree_map(
                    lambda *leaves: jnp.stack(leaves),
                    *[h[3] for h in parents])
                pred_out, new_state = self._step(params, toks, state)
                active = [
                    (c, v[0], pred_out[i], jax.tree_util.tree_map(
                        lambda a, i=i: a[i], new_state))
                    for i, (c, v) in enumerate(top)]
                for h in active:
                    cache[h[0]] = (h[2], h[3])
            # last round's survivors must also close with a blank
            if active:
                pred = jnp.stack([h[2] for h in active])
                lp = np.asarray(self._join(
                    params, jnp.asarray(enc[t])[None], pred))
                for h, row in zip(active, lp):
                    _merge(finals, h[0], h[1] + float(row[blank]))
            # carry states: rebuild hyp list for surviving sequences
            best = sorted(finals.items(), key=lambda kv: -kv[1]
                          )[:self.beam]
            hyps = [(key, score) + cache[key] for key, score in best] \
                or hyps
        # keep the cache bounded to the sequences still alive
        cache = {h[0]: (h[2], h[3]) for h in hyps}
        return hyps, cache
