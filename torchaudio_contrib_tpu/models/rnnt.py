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

__all__ = ["RNNTPredictor", "LayerNormLSTMPredictor", "RNNT",
           "RNNTBeamSearch"]


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


def _ln_eps(x, p, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


class LayerNormLSTMPredictor:
    """torchaudio's ``_Predictor`` layout (weight-compatible with
    published ``emformer_rnnt_base`` checkpoints; [ref-recon:
    torchaudio models/rnnt.py ``_Predictor``/``_CustomLSTM`` —
    UNVERIFIED, mount empty]): embedding → input LayerNorm → a stack
    of layer-norm LSTMs (``x2g`` input GEMM, bias only when
    ``layer_norm=False``; ``p2g`` bias-free recurrent GEMM; one
    LayerNorm over the summed 4H gates, one over the updated cell —
    the *normed* cell is both the carry and the tanh input) → output
    linear → output LayerNorm.

    Drop-in for :class:`RNNTPredictor` (same ``init``/``init_state``/
    ``step``/``apply`` interface incl. the SOS-prefix convention), so
    every RNNT decode path works unchanged."""

    def __init__(self, num_symbols: int, embed_dim: int,
                 hidden_dim: int, output_dim: int, num_layers: int = 3,
                 blank: int = 0, layer_norm: bool = True,
                 layer_norm_eps: float = 1e-5):
        self.v = num_symbols
        self.e = embed_dim
        self.h = hidden_dim
        self.o = output_dim
        self.n_layers = num_layers
        self.blank = blank
        self.layer_norm = layer_norm
        self.eps = layer_norm_eps

    def init(self, key):
        keys = iter(jax.random.split(key, 2 + 2 * self.n_layers))
        ln = lambda d: {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}
        layers = []
        cin = self.e
        for _ in range(self.n_layers):
            lp = {"wx": _dense(next(keys), cin, 4 * self.h),
                  "wh": _dense(next(keys), self.h, 4 * self.h)}
            if self.layer_norm:
                lp["g_ln"] = ln(4 * self.h)
                lp["c_ln"] = ln(self.h)
            else:
                lp["bx"] = jnp.zeros((4 * self.h,))
            layers.append(lp)
            cin = self.h
        return {"emb": 0.1 * jax.random.normal(next(keys),
                                               (self.v, self.e)),
                "in_ln": ln(self.e),
                "layers": layers,
                "out": {"w": _dense(next(keys), self.h, self.o),
                        "b": jnp.zeros((self.o,))},
                "out_ln": ln(self.o)}

    def init_state(self, batch_size: int):
        return [(jnp.zeros((batch_size, self.h)),
                 jnp.zeros((batch_size, self.h)))
                for _ in range(self.n_layers)]

    def step(self, params, tokens, state):
        # layer_norm_eps applies only to the LSTM-internal gate/cell
        # norms (torchaudio's lstm_layer_norm_epsilon); the input and
        # output LayerNorms keep torch's default 1e-5
        x = _ln(params["emb"][tokens], params["in_ln"])
        new_state = []
        for p, (h, c) in zip(params["layers"], state):
            gates = x @ p["wx"] + h @ p["wh"]
            if self.layer_norm:
                gates = _ln_eps(gates, p["g_ln"], self.eps)
            else:
                gates = gates + p["bx"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            if self.layer_norm:
                c = _ln_eps(c, p["c_ln"], self.eps)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            new_state.append((h, c))
            x = h
        out = _ln(x @ params["out"]["w"] + params["out"]["b"],
                  params["out_ln"])
        return out, new_state

    def apply(self, params, targets, target_lengths=None):
        """SOS-prefixed label-context encodings, ``(B, U+1, O)`` —
        the contract :class:`RNNTPredictor.apply` pins."""
        B, U = targets.shape
        sos = jnp.full((B,), self.blank, jnp.int32)
        seq = jnp.concatenate([sos[:, None],
                               targets.astype(jnp.int32)], axis=1)

        def step(state, tok):
            out, state = self.step(params, tok, state)
            return state, out

        _, outs = jax.lax.scan(step, self.init_state(B),
                               jnp.swapaxes(seq, 0, 1))
        return jnp.swapaxes(outs, 0, 1)


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
                 joiner_activation: str = "tanh",
                 predictor=None):
        if joiner_activation not in ("tanh", "relu"):
            raise ValueError("joiner_activation must be tanh or relu")
        self.transcriber = transcriber
        self.v = num_symbols
        self.blank = blank
        self.joiner_dim = joiner_dim or encoding_dim
        self.enc_dim = encoding_dim
        self.act = jnp.tanh if joiner_activation == "tanh" \
            else jax.nn.relu
        # a custom predictor (e.g. LayerNormLSTMPredictor) must expose
        # init/init_state/step/apply and output joiner_dim-wide
        # encodings; the predictor_* size kwargs are ignored then
        self.predictor = predictor if predictor is not None \
            else RNNTPredictor(
                num_symbols, predictor_embed_dim,
                predictor_hidden_dim, self.joiner_dim,
                predictor_layers, blank)

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

    def loss(self, params, x, targets, lengths=None,
             target_lengths=None, *, time_chunk=None, **kw):
        """Transducer training loss via the FUSED path
        (:func:`~..ops.rnnt_loss_fused`): the ``(B, T, U+1, V)`` joint
        grid is computed ``time_chunk`` frames at a time under remat
        and never stored — the memory-capacity fix for large-batch
        training (docs/PERFORMANCE.md round 5).  ``time_chunk=None``
        (default) adapts to the batch size (``max(4, 512 // B)``, the
        measured v5e optimum).  Equals ``rnnt_loss(joint_logits(...))``
        exactly (values + grads, pinned by test).  ``kw`` forwards
        blank/clamp/reduction."""
        from ..ops.rnnt import rnnt_loss_fused
        enc, out_lengths = self.transcribe(params, x, lengths)
        pred = self.predictor.apply(params["predictor"], targets,
                                    target_lengths)
        kw.setdefault("blank", self.blank)
        return rnnt_loss_fused(
            enc, pred, params["joiner"], targets, act=self.act,
            logit_lengths=out_lengths, target_lengths=target_lengths,
            time_chunk=time_chunk, **kw)

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

    # -- fully-jitted fixed-width beam (TPU decode path) ------------
    #
    # The host loop above costs >= 2 device dispatches per frame per
    # expansion round (1-4 ms tunnel RTT each on this host), and
    # serializes over the batch — a 10 s utterance decodes in seconds.
    # This path runs the SAME time-synchronous algorithm as ONE
    # compiled lax.scan over frames: fixed beam width, hypotheses as
    # fixed-shape arrays (scores / token buffer / lengths / predictor
    # carry), duplicate label sequences recombined with logaddexp via
    # a K_f x K_f buffer-equality mask (exactly the host `_merge`),
    # empty beam slots at -inf.  Equivalence to the host beam (same
    # sequences, same logaddexp scores) is pinned by test.

    def init_batched_state(self, params, batch_size: int,
                           max_tokens: int):
        """Device beam carry for ``decode_batched``/``infer_batched``:
        slot 0 = the empty hypothesis (score 0), slots 1.. = -inf."""
        K = self.beam
        B = batch_size
        pred0, state0 = self._step(
            params, jnp.full((B,), self.model.blank, jnp.int32),
            self.model.predictor.init_state(B))
        scores = jnp.full((B, K), -jnp.inf,
                          jnp.float32).at[:, 0].set(0.0)
        return {
            "scores": scores,
            "toks": jnp.zeros((B, K, max_tokens), jnp.int32),
            "lens": jnp.zeros((B, K), jnp.int32),
            "pred": jnp.broadcast_to(pred0[:, None, :],
                                     (B, K, pred0.shape[-1])),
            "state": jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(
                    a[:, None, :], (B, K, a.shape[-1])), state0),
        }

    def _frame_step(self, params, carry, enc_t, valid):
        """Advance every sample's beam by one frame (vectorized over
        batch AND beam)."""
        K, blank = self.beam, self.model.blank
        B, _, L = carry["toks"].shape
        J = carry["pred"].shape[-1]

        def close(act):
            logp = jax.nn.log_softmax(self.model.join(
                params, enc_t[:, None, :], act["pred"]), -1)
            return act["scores"] + logp[..., blank], logp

        finals = []          # list of closed-hypothesis array dicts
        act = carry
        for _ in range(self.max_symbols):
            closed, logp = close(act)
            finals.append({**act, "scores": closed})
            # non-blank extensions: top-K over (K*V) candidates
            ext = act["scores"][..., None] + logp      # (B, K, V)
            ext = ext.at[..., blank].set(-jnp.inf)
            # full token buffers cannot take another symbol — freeze
            ext = jnp.where((act["lens"] >= L)[..., None],
                            -jnp.inf, ext)
            V = ext.shape[-1]
            top, idx = jax.lax.top_k(ext.reshape(B, K * V), K)
            parent = idx // V                          # (B, K)
            tok = (idx % V).astype(jnp.int32)
            gather = lambda a: jnp.take_along_axis(
                a, parent.reshape(parent.shape + (1,) * (a.ndim - 2)),
                axis=1)
            toks = gather(act["toks"])
            lens = jnp.take_along_axis(act["lens"], parent, 1)
            hit = (jnp.arange(L)[None, None, :] == lens[..., None])
            toks = jnp.where(hit, tok[..., None], toks)
            state = jax.tree_util.tree_map(gather, act["state"])
            pred_new, state_new = self._step(
                params, tok.reshape(B * K),
                jax.tree_util.tree_map(
                    lambda a: a.reshape(B * K, -1), state))
            act = {
                "scores": top,
                "toks": toks,
                "lens": jnp.minimum(lens + 1, L),
                "pred": pred_new.reshape(B, K, J),
                "state": jax.tree_util.tree_map(
                    lambda a: a.reshape(B, K, -1), state_new),
            }
        closed, _ = close(act)                         # post-loop close
        finals.append({**act, "scores": closed})

        f = {k: jnp.concatenate([d[k] for d in finals], axis=1)
             for k in ("scores", "toks", "lens", "pred")}
        f["state"] = jax.tree_util.tree_map(
            lambda *leaves: jnp.concatenate(leaves, axis=1),
            *[d["state"] for d in finals])
        F = f["scores"].shape[1]

        # recombine identical label sequences (the host `_merge`):
        # equality over (length, buffer), merged mass to the first
        # occurrence, later duplicates dropped to -inf
        eq = ((f["lens"][:, :, None] == f["lens"][:, None, :])
              & jnp.all(f["toks"][:, :, None, :]
                        == f["toks"][:, None, :, :], -1))   # (B,F,F)
        merged = jax.nn.logsumexp(
            jnp.where(eq, f["scores"][:, None, :], -jnp.inf), axis=-1)
        first = ~jnp.any(jnp.tril(eq, -1), axis=-1)         # (B, F)
        scores = jnp.where(first, merged, -jnp.inf)

        top, sel = jax.lax.top_k(scores, K)
        gather = lambda a: jnp.take_along_axis(
            a, sel.reshape(sel.shape + (1,) * (a.ndim - 2)), axis=1)
        new = {"scores": top, "toks": gather(f["toks"]),
               "lens": jnp.take_along_axis(f["lens"], sel, 1),
               "pred": gather(f["pred"]),
               "state": jax.tree_util.tree_map(gather, f["state"])}
        # padded frames leave the carry untouched
        keep = lambda n, o: jnp.where(
            valid.reshape((B,) + (1,) * (n.ndim - 1)), n, o)
        return jax.tree_util.tree_map(keep, new, carry)

    @partial(jax.jit, static_argnums=0)
    def _run_batched(self, params, feats, out_lengths, carry):
        def step(c, inp):
            enc_t, t = inp
            return self._frame_step(params, c, enc_t,
                                    t < out_lengths), None
        carry, _ = jax.lax.scan(
            step, carry, (jnp.swapaxes(feats, 0, 1),
                          jnp.arange(feats.shape[1])))
        return carry

    @staticmethod
    def _ranked_from_carry(carry):
        scores = np.asarray(carry["scores"])
        toks = np.asarray(carry["toks"])
        lens = np.asarray(carry["lens"])
        out = []
        for b in range(scores.shape[0]):
            hyps = [(list(map(int, toks[b, k, :lens[b, k]])),
                     float(scores[b, k]))
                    for k in range(scores.shape[1])
                    if np.isfinite(scores[b, k])]
            out.append(sorted(hyps, key=lambda h: -h[1]))
        return out

    def decode_batched(self, params, x, lengths=None,
                       max_tokens: Optional[int] = None):
        """Whole-batch beam search in one compiled program (one
        device dispatch after the transcriber): same ranked
        ``[(tokens, score), ...]`` per sample as ``__call__``."""
        enc, out_lengths = self.model.transcribe(params, x, lengths)
        if max_tokens is None:
            max_tokens = enc.shape[1] * self.max_symbols
        carry = self.init_batched_state(params, enc.shape[0],
                                        max_tokens)
        carry = self._run_batched(params, enc, out_lengths, carry)
        return self._ranked_from_carry(carry)

    def infer_batched(self, params, feats, out_lengths, carry):
        """Streaming variant of ``decode_batched`` over one chunk of
        *projected* encoder features (``model.stream_transcribe``):
        → (per-sample ranked hypotheses so far, new carry).  Feeding
        every chunk reproduces ``decode_batched`` exactly (the carry
        IS the beam)."""
        carry = self._run_batched(params, jnp.asarray(feats),
                                  jnp.asarray(out_lengths), carry)
        return self._ranked_from_carry(carry), carry
