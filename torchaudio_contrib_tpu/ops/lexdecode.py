"""Device-side lexicon-constrained CTC beam search.

``models/decoder.py::CTCDecoder`` is the host reference (flashlight's
dict-of-hypotheses algorithm, same division of labor as torchaudio's
CPU binding).  This module is its TPU counterpart (VERDICT r4 ask 4):
the trie is *bounded* — flattened host-side into static tables — and
the search becomes one ``lax.scan`` over frames with a fixed beam,
exactly like ``ops/ctcdecode.py::ctc_beam_decode``:

* ``child_table (N, V)`` int32 — trie node × token → child id (−1);
* ``words_at (N, W)`` int32 — word-ids completable at a node (W = max
  homophones, padded −1);
* an order-≤2 n-gram LM compiled to dense ``lm_score (S, Nw)`` /
  ``lm_finish (S,)`` tables over LM *states* (start + one per word —
  exact for unigram/bigram ARPA models and ZeroLM; higher orders keep
  the host decoder, the state space is no longer word-indexed).

Hypothesis state per (batch, beam) slot: ``(trie node, previous
token, LM state, score)`` — the host's dict key — plus bounded
token/word/timestep buffers.  Per frame every slot fans out into
``3 + W + V`` candidates (blank, repeat, root-silence, W silence word
completions, V trie advances), duplicates by key are max-merged with
a pairwise mask BEFORE the top-K (so the beam is never diluted by
fillers — bitwise the host's ``log_add=False`` merge), then
``lax.top_k`` keeps K.  Scores and word sequences are pinned equal to
the host decoder by ``tests/test_lexdecode.py``.

Boundaries (loud errors, same philosophy as the host's): ``log_add``
merging, ``unk_word`` emission and LM order > 2 are host-only;
``beam_threshold`` is ignored (pure top-K keeps a superset of the
thresholded beam — compare against a host decoder built with
``beam_threshold=math.inf``).
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["LexiconTables", "CompiledLexicon", "compile_lexicon_tables",
           "ctc_lexicon_beam_decode", "DeviceCTCDecoder",
           "device_ctc_decoder"]

_NEG = -jnp.inf


class LexiconTables(NamedTuple):
    """Array half of a compiled (trie, LM) pair — jit-safe (LM state
    0 is always the start state)."""
    child: jnp.ndarray        # (N, V) int32, -1 = no child
    words_at: jnp.ndarray     # (N, W) int32 word ids, -1 pad
    lm_score: jnp.ndarray     # (S, Nw) f32 log10 P(word | state)
    lm_finish: jnp.ndarray    # (S,) f32 log10 P(</s> | state)
    word_state: jnp.ndarray   # (Nw,) int32 LM state after a word


class CompiledLexicon(NamedTuple):
    """:func:`compile_lexicon_tables` result: the device tables plus
    the host-side word-id → string map."""
    tables: LexiconTables
    words: tuple


def compile_lexicon_tables(decoder) -> CompiledLexicon:
    """Flatten a host :class:`~..models.decoder.CTCDecoder`'s trie and
    LM into :class:`LexiconTables`.  The LM must be ZeroLM or an
    ARPA model of order ≤ 2 (bigram) — those have a word-indexed
    state space that fits a dense table."""
    from ..models.decoder import ZeroLM
    root = decoder._trie
    lm = decoder._lm
    V = len(decoder.tokens)

    # BFS node ids (root = 0)
    nodes, ids = [root], {id(root): 0}
    for node in nodes:
        for c in sorted(node.children):
            ch = node.children[c]
            if id(ch) not in ids:
                ids[id(ch)] = len(nodes)
                nodes.append(ch)
    N = len(nodes)
    child = np.full((N, V), -1, np.int32)
    W = max((len(n.words) for n in nodes), default=0) or 1
    words_at = np.full((N, W), -1, np.int32)
    word_list: List[str] = []
    word_id = {}
    for ni, node in enumerate(nodes):
        for c, ch in node.children.items():
            child[ni, c] = ids[id(ch)]
        for wi, w in enumerate(node.words):
            if w not in word_id:
                word_id[w] = len(word_list)
                word_list.append(w)
            words_at[ni, wi] = word_id[w]
    Nw = max(len(word_list), 1)

    order = getattr(lm, "order", 1 if isinstance(lm, ZeroLM) else None)
    if order is None or order > 2:
        raise NotImplementedError(
            f"device lexicon decode compiles LM states to a dense "
            f"table — ZeroLM or ARPA order <= 2 only (got order="
            f"{order}); use the host CTCDecoder for higher orders")

    # enumerate LM states: start + the (context-independent, order<=2)
    # post-word state of every lexicon word
    start = lm.start()
    states = [start]
    state_id = {start: 0}
    word_state = np.zeros((Nw,), np.int32)
    for wi, w in enumerate(word_list):
        s2, _ = lm.score(start, w)
        if s2 not in state_id:
            state_id[s2] = len(states)
            states.append(s2)
        word_state[wi] = state_id[s2]
    S = len(states)
    lm_score = np.zeros((S, Nw), np.float32)
    lm_finish = np.zeros((S,), np.float32)
    for si, st in enumerate(states):
        lm_finish[si] = lm.finish(st)
        for wi, w in enumerate(word_list):
            lm_score[si, wi] = lm.score(st, w)[1]

    return CompiledLexicon(
        tables=LexiconTables(
            child=jnp.asarray(child), words_at=jnp.asarray(words_at),
            lm_score=jnp.asarray(lm_score),
            lm_finish=jnp.asarray(lm_finish),
            word_state=jnp.asarray(word_state)),
        words=tuple(word_list))


def _merge_dedup(keys, scores):
    """Max-merge candidates with identical keys: keep the best (ties →
    lowest index), mark the rest ``-inf``.  ``keys`` tuple of (B, C)
    int arrays, ``scores (B, C)``."""
    eq = True
    for k in keys:
        eq = eq & (k[:, :, None] == k[:, None, :])
    idx = jnp.arange(scores.shape[1])
    better = (scores[:, None, :] > scores[:, :, None]) | (
        (scores[:, None, :] == scores[:, :, None])
        & (idx[None, :] < idx[:, None])[None])
    drop = jnp.any(eq & better, axis=-1)
    return jnp.where(drop, _NEG, scores)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _lex_beam_run(log_probs, input_lengths, tables,
                  K: int, L: int, blank: int, sil: int,
                  lm_weight: float, word_score: float,
                  sil_score: float, pad_value: int):
    B, T, V = log_probs.shape
    N, W = tables.words_at.shape
    C = 3 + W + V

    node = jnp.zeros((B, K), jnp.int32)
    prev = jnp.full((B, K), -1, jnp.int32)
    lmst = jnp.zeros((B, K), jnp.int32)      # state 0 = start
    score = jnp.full((B, K), _NEG).at[:, 0].set(0.0)
    toks = jnp.full((B, K, L), pad_value, jnp.int32)
    times = jnp.full((B, K, L), -1, jnp.int32)
    lens = jnp.zeros((B, K), jnp.int32)
    wids = jnp.full((B, K, L), -1, jnp.int32)
    wlens = jnp.zeros((B, K), jnp.int32)

    def frame(carry, inp):
        node, prev, lmst, score, toks, times, lens, wids, wlens = carry
        row, t = inp
        valid = t < input_lengths                           # (B,)

        ext_child = tables.child[node]                      # (B,K,V)
        node_words = tables.words_at[node]                  # (B,K,W)

        # ---- candidates, laid out (B, K, C) -----------------------
        # 0: blank  1: repeat  2: root consecutive silence
        # 3..3+W: silence word completions  3+W..: trie advances
        c_blank_s = score + row[:, None, blank]
        c_rep_s = jnp.where(
            prev >= 0,
            score + jnp.take_along_axis(
                row, jnp.maximum(prev, 0), -1), _NEG)
        has_sil = sil >= 0
        sil_ok = has_sil & (prev != sil)
        sil_base = score + (row[:, None, sil] if has_sil else 0.0) \
            + sil_score
        c_root_s = jnp.where(sil_ok & (node == 0)
                             & jnp.all(node_words < 0, -1),
                             sil_base, _NEG)
        wid_safe = jnp.maximum(node_words, 0)
        wlp = jnp.take_along_axis(
            tables.lm_score[lmst], wid_safe, -1)            # (B,K,W)
        c_word_s = jnp.where(
            (node_words >= 0) & sil_ok[..., None],
            sil_base[..., None] + lm_weight * wlp + word_score, _NEG)
        tok_ids = jnp.arange(V, dtype=jnp.int32)
        ext_ok = (ext_child >= 0) & (tok_ids[None, None]
                                     != prev[..., None])
        c_ext_s = jnp.where(ext_ok, score[..., None] + row[:, None],
                            _NEG)
        # buffers full → no more emissions
        full = lens >= L
        c_root_s = jnp.where(full, _NEG, c_root_s)
        c_word_s = jnp.where(full[..., None], _NEG, c_word_s)
        c_ext_s = jnp.where(full[..., None], _NEG, c_ext_s)

        cscore = jnp.concatenate(
            [c_blank_s[..., None], c_rep_s[..., None],
             c_root_s[..., None], c_word_s, c_ext_s], -1)   # (B,K,C)
        cnode = jnp.concatenate(
            [node[..., None], node[..., None],
             jnp.zeros((B, K, 1 + W), jnp.int32),
             jnp.maximum(ext_child, 0)], -1)
        sil_i = jnp.int32(max(sil, 0))
        cprev = jnp.concatenate(
            [jnp.full((B, K, 1), -1, jnp.int32), prev[..., None],
             jnp.full((B, K, 1 + W), sil_i, jnp.int32),
             jnp.broadcast_to(tok_ids, (B, K, V))], -1)
        clmst = jnp.concatenate(
            [lmst[..., None], lmst[..., None], lmst[..., None],
             tables.word_state[wid_safe],
             jnp.broadcast_to(lmst[..., None], (B, K, V))], -1)
        ctok = jnp.concatenate(
            [jnp.full((B, K, 2), -1, jnp.int32),
             jnp.full((B, K, 1 + W), sil_i, jnp.int32),
             jnp.broadcast_to(tok_ids, (B, K, V))], -1)
        cword = jnp.concatenate(
            [jnp.full((B, K, 3), -1, jnp.int32), wid_safe,
             jnp.full((B, K, V), -1, jnp.int32)], -1)
        cword = jnp.where(cscore > _NEG, cword, -1)

        # ---- exact max-merge then top-K ---------------------------
        flat = lambda a: a.reshape(B, K * C)
        fscore = _merge_dedup(
            (flat(cnode), flat(cprev) + 1, flat(clmst)), flat(cscore))
        top, idx = jax.lax.top_k(fscore, K)
        g = lambda a: jnp.take_along_axis(flat(a), idx, 1)
        src = idx // C
        n_node, n_prev, n_lmst = g(cnode), g(cprev), g(clmst)
        tok_sel, word_sel = g(ctok), g(cword)

        gb = lambda a: jnp.take_along_axis(a, src[..., None], 1)
        n_toks, n_times, n_wids = gb(toks), gb(times), gb(wids)
        n_lens = jnp.take_along_axis(lens, src, 1)
        n_wlens = jnp.take_along_axis(wlens, src, 1)
        pos = jnp.arange(L)
        app_t = (tok_sel >= 0) & (top > _NEG)
        hit = (pos[None, None] == n_lens[..., None]) & app_t[..., None]
        n_toks = jnp.where(hit, tok_sel[..., None], n_toks)
        n_times = jnp.where(hit, t, n_times)
        n_lens = n_lens + app_t
        app_w = (word_sel >= 0) & (top > _NEG)
        hit_w = (pos[None, None] == n_wlens[..., None]) \
            & app_w[..., None]
        n_wids = jnp.where(hit_w, word_sel[..., None], n_wids)
        n_wlens = n_wlens + app_w

        keep = lambda n, o: jnp.where(
            valid.reshape((B,) + (1,) * (n.ndim - 1)), n, o)
        return (keep(n_node, node), keep(n_prev, prev),
                keep(n_lmst, lmst), keep(top, score),
                keep(n_toks, toks), keep(n_times, times),
                keep(n_lens, lens), keep(n_wids, wids),
                keep(n_wlens, wlens)), None

    carry, _ = jax.lax.scan(
        frame,
        (node, prev, lmst, score, toks, times, lens, wids, wlens),
        (jnp.swapaxes(log_probs, 0, 1), jnp.arange(T)))
    node, prev, lmst, score, toks, times, lens, wids, wlens = carry

    # ---- final flush: complete words at the node, LM </s> ---------
    node_words = tables.words_at[node]                      # (B,K,W)
    wid_safe = jnp.maximum(node_words, 0)
    wlp = jnp.take_along_axis(tables.lm_score[lmst], wid_safe, -1)
    fin_w = jnp.where(
        node_words >= 0,
        score[..., None] + lm_weight * (
            wlp + tables.lm_finish[tables.word_state[wid_safe]])
        + word_score, _NEG)                                 # (B,K,W)
    fin_root = jnp.where(
        (node == 0) & jnp.all(node_words < 0, -1),
        score + lm_weight * tables.lm_finish[lmst], _NEG)   # (B,K)
    B, K = score.shape
    fscores = jnp.concatenate(
        [fin_root[..., None], fin_w], -1).reshape(B, K * (1 + W))
    top, idx = jax.lax.top_k(fscores, K)
    src = idx // (1 + W)
    slot = idx % (1 + W)                      # 0 = root, 1.. = word w
    gb = lambda a: jnp.take_along_axis(a, src[..., None], 1)
    toks, times, wids = gb(toks), gb(times), gb(wids)
    lens = jnp.take_along_axis(lens, src, 1)
    wlens = jnp.take_along_axis(wlens, src, 1)
    add_w = jnp.take_along_axis(
        jnp.concatenate([jnp.full((B, K, 1), -1, jnp.int32),
                         wid_safe], -1).reshape(B, K * (1 + W)),
        idx, 1)
    app = (slot > 0) & (top > _NEG)
    pos = jnp.arange(wids.shape[-1])
    hit = (pos[None, None] == wlens[..., None]) & app[..., None]
    wids = jnp.where(hit, add_w[..., None], wids)
    wlens = wlens + app
    toks = jnp.where(pos[None, None] < lens[..., None], toks,
                     pad_value)
    return toks, times, lens, wids, wlens, top


def ctc_lexicon_beam_decode(log_probs, tables: LexiconTables,
                            input_lengths=None, *,
                            beam_width: int = 16, blank: int = 0,
                            sil: Optional[int] = None,
                            lm_weight: float = 2.0,
                            word_score: float = 0.0,
                            sil_score: float = 0.0,
                            max_tokens: Optional[int] = None,
                            pad_value: int = -1):
    """One compiled lexicon+LM beam search over a whole batch.

    ``log_probs (batch, time, classes)`` log-softmax emissions.
    Returns ``(tokens, timesteps, lengths, word_ids, word_lengths,
    scores)``, each leading ``(batch, beam_width)``, ranked by final
    score (``-inf`` = dead/unused slot; word ids index
    ``tables.words``).  Scores are Viterbi-style max-merged — the host
    :class:`~..models.decoder.CTCDecoder` default (``log_add=False``).
    """
    log_probs = jnp.asarray(log_probs)
    if log_probs.ndim != 3:
        raise ValueError("log_probs must be (batch, time, classes)")
    B, T, V = log_probs.shape
    if isinstance(tables, CompiledLexicon):
        tables = tables.tables
    if tables.child.shape[1] != V:
        raise ValueError(
            f"tables were compiled for {tables.child.shape[1]} "
            f"tokens, emissions have {V}")
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, jnp.int32)
    L = T if max_tokens is None else int(max_tokens)
    return _lex_beam_run(
        log_probs, jnp.asarray(input_lengths, jnp.int32), tables,
        int(beam_width), L, int(blank),
        -1 if sil is None else int(sil), float(lm_weight),
        float(word_score), float(sil_score), int(pad_value))


class DeviceCTCDecoder:
    """Drop-in device counterpart of the host
    :class:`~..models.decoder.CTCDecoder` (build via
    :func:`device_ctc_decoder`): same ``__call__`` contract, returns
    the same ``CTCDecoderOutput`` n-best lists."""

    def __init__(self, compiled, *, nbest, beam_size, lm_weight,
                 word_score, sil_score, blank_idx, sil_idx):
        self.tables = compiled.tables
        self.words = compiled.words
        self.nbest = nbest
        self.beam_size = beam_size
        self.lm_weight = lm_weight
        self.word_score = word_score
        self.sil_score = sil_score
        self.blank_idx = blank_idx
        self.sil_idx = sil_idx

    def __call__(self, emissions, lengths=None):
        from ..models.decoder import CTCDecoderOutput
        lp = jnp.asarray(emissions, jnp.float32)
        squeeze = lp.ndim == 2
        if squeeze:
            lp = lp[None]
        toks, times, lens, wids, wlens, scores = ctc_lexicon_beam_decode(
            lp, self.tables, input_lengths=lengths,
            beam_width=self.beam_size, blank=self.blank_idx,
            sil=self.sil_idx, lm_weight=self.lm_weight,
            word_score=self.word_score, sil_score=self.sil_score)
        toks, times, lens = (np.asarray(a) for a in (toks, times, lens))
        wids, wlens, scores = (np.asarray(a)
                               for a in (wids, wlens, scores))
        out = []
        for b in range(toks.shape[0]):
            hyps, seen = [], set()
            for k in range(toks.shape[1]):
                if not np.isfinite(scores[b, k]) \
                        or len(hyps) >= self.nbest:
                    continue
                n, wn = int(lens[b, k]), int(wlens[b, k])
                tk = tuple(toks[b, k, :n].tolist())
                wd = tuple(wids[b, k, :wn].tolist())
                if (tk, wd) in seen:   # host _final dedups by key
                    continue
                seen.add((tk, wd))
                hyps.append(CTCDecoderOutput(
                    list(tk), [self.words[i] for i in wd],
                    float(scores[b, k]), times[b, k, :n].tolist()))
            out.append(hyps)
        return out


def device_ctc_decoder(decoder) -> DeviceCTCDecoder:
    """Compile a host :class:`~..models.decoder.CTCDecoder` into its
    device form.  Raises for the host-only features (``log_add``
    merging, enabled ``unk``, LM order > 2); ``beam_threshold`` is
    ignored (top-K keeps a superset)."""
    if decoder.log_add:
        raise NotImplementedError(
            "device lexicon decode merges with max (log_add=False); "
            "use the host CTCDecoder for log_add")
    if decoder.unk_word is not None \
            and decoder.unk_score > -math.inf:
        raise NotImplementedError(
            "unk-word emission is host-only (unbounded state); build "
            "the decoder with unk_score=-math.inf")
    compiled = compile_lexicon_tables(decoder)
    return DeviceCTCDecoder(
        compiled, nbest=decoder.nbest, beam_size=decoder.beam_size,
        lm_weight=decoder.lm_weight, word_score=decoder.word_score,
        sil_score=decoder.sil_score, blank_idx=decoder.blank_idx,
        sil_idx=decoder.sil_idx)
