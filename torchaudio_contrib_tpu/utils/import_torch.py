"""Torch ``state_dict`` → param-pytree importers for the model zoo.

Converts PyTorch checkpoints (fairseq/HuggingFace layout — the layout
published wav2vec2/HuBERT/WavLM/HiFi-GAN weights actually ship in, and
the one torchaudio's own import utilities consume) into this package's
pure-JAX parameter pytrees.  Layout conversions applied:

- ``nn.Linear``      weight ``(out, in)``      → ``(in, out)`` transpose
- ``nn.Conv1d``      weight ``(out, in, k)``   → TIO ``(k, in, out)``
- ``ConvTranspose1d`` weight ``(in, out, k)``  → TIO ``(k, out, in)``
  (``transpose_kernel=True`` layout used by ``models/hifigan.py``)
- ``nn.LSTM``        gate order ``i, f, g, o`` is shared with
  ``models/rnnt.py::RNNTPredictor``; the two torch biases are summed
- ``weight_norm``    reparameterizations are folded into the plain
  weight (handles ``weight_g``/``weight_v``, new-style
  ``parametrizations.weight.original0/1``, and already-folded weights)
- q/k/v projections are concatenated into the fused ``wqkv`` in
  ``(q, k, v)`` block order (matching the ``reshape(B, T, 3, H, hd)``
  split in ``models/wav2vec2.py::Wav2Vec2._attention``)

Every family importer validates the resulting tree against
``jax.eval_shape(model.init)`` — same treedef, same leaf shapes — and
raises with the offending path otherwise, so a architecture/checkpoint
mismatch is loud, never silently truncated.

Forward parity against the torch oracles (``transformers``
Wav2Vec2Model / HubertModel / WavLMModel / SpeechT5HifiGan,
``torch.nn.LSTM``, and full-model ``nn``-primitive replicas of
torchaudio's ConvTasNet / WaveRNN / Tacotron2) is pinned ≤1e-4
(measured ~1e-6) in ``tests/test_import_torch.py`` and
``tests/test_import_torch_extra.py``.  BatchNorms (WaveRNN MelResNet,
Tacotron2 conv stacks) fold into the models' frozen per-channel
affines exactly (``_fold_bn``).  [ref-recon: the contrib reference has
no model zoo (SURVEY §2) — this capability mirrors
``torchaudio.models.wav2vec2.utils.import_huggingface/import_fairseq``]
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "load_torch_state_dict",
    "import_wav2vec2", "import_hifigan", "import_lstm",
    "import_conv_tasnet", "import_wavernn", "import_gru",
    "import_tacotron2", "import_conformer",
    "import_wav2letter", "import_deepspeech",
    "import_vggish", "import_emformer_rnnt",
    "import_squim_objective", "import_hdemucs",
]


# ----------------------------------------------------------------- #
# generic tensor plumbing                                           #
# ----------------------------------------------------------------- #

def _np(t) -> np.ndarray:
    """torch tensor / array-like → float32 numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _j(t):
    return jnp.asarray(_np(t))


class _SD:
    """A name-indexed view of a state dict that records consumed keys
    (so importers can report unused leftovers) and resolves
    weight-norm parametrizations transparently."""

    def __init__(self, sd: Mapping[str, object]):
        self.sd = dict(sd)
        self.used = set()

    def has(self, name: str) -> bool:
        if name in self.sd:
            return True
        if name.endswith(".weight"):
            base = name[: -len(".weight")]
            return (f"{base}.parametrizations.weight.original0"
                    in self.sd or f"{base}.weight_g" in self.sd)
        return False

    def get(self, name: str) -> np.ndarray:
        if name in self.sd:
            self.used.add(name)
            return _np(self.sd[name])
        if name.endswith(".weight"):
            base = name[: -len(".weight")]
            for g_key, v_key in (
                    (f"{base}.parametrizations.weight.original0",
                     f"{base}.parametrizations.weight.original1"),
                    (f"{base}.weight_g", f"{base}.weight_v")):
                if g_key in self.sd:
                    self.used.update((g_key, v_key))
                    return _fold_weight_norm(_np(self.sd[g_key]),
                                             _np(self.sd[v_key]))
        raise KeyError(
            f"state_dict has no '{name}' (and no weight-norm "
            f"parametrization of it); available keys near it: "
            f"{[k for k in self.sd if k.startswith(name.rsplit('.', 1)[0])][:8]}")

    def opt(self, name: str) -> Optional[np.ndarray]:
        try:
            return self.get(name)
        except KeyError:
            return None

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """``w = g * v / ||v||`` with the norm taken over every dim where
    ``g`` is broadcast (size 1) — recovers torch's ``dim=`` semantics
    from the shapes alone."""
    norm_dims = tuple(i for i, s in enumerate(g.shape) if s == 1)
    norm = np.sqrt((v.astype(np.float64) ** 2)
                   .sum(axis=norm_dims, keepdims=True))
    return (g * (v / norm)).astype(np.float32)


def _linear(sd: _SD, prefix: str, *, bias: bool = True) -> Dict:
    p = {"w": jnp.asarray(sd.get(f"{prefix}.weight").T)}
    if bias:
        b = sd.opt(f"{prefix}.bias")
        p["b"] = (jnp.asarray(b) if b is not None
                  else jnp.zeros((p["w"].shape[1],), jnp.float32))
    return p


def _lnp(sd: _SD, prefix: str) -> Dict:
    return {"g": jnp.asarray(sd.get(f"{prefix}.weight")),
            "b": jnp.asarray(sd.get(f"{prefix}.bias"))}


def _conv_tio(w: np.ndarray) -> jnp.ndarray:
    """torch Conv1d ``(out, in, k)`` → TIO ``(k, in, out)``."""
    return jnp.asarray(np.transpose(w, (2, 1, 0)))


def _convT_tio(w: np.ndarray) -> jnp.ndarray:
    """torch ConvTranspose1d ``(in, out, k)`` → ``(k, out, in)``
    (``transpose_kernel=True`` TIO)."""
    return jnp.asarray(np.transpose(w, (2, 1, 0)))


def _check_tree(got, model, what: str):
    """Validate ``got`` against ``jax.eval_shape(model.init)``:
    identical treedef and leaf shapes, loud error otherwise."""
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    got_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(got)}
    ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(ref)}
    missing = sorted(set(ref_paths) - set(got_paths))
    extra = sorted(set(got_paths) - set(ref_paths))
    if missing or extra:
        raise ValueError(
            f"{what}: imported tree does not match model.init — "
            f"missing {missing[:6]}{'…' if len(missing) > 6 else ''}, "
            f"unexpected {extra[:6]}{'…' if len(extra) > 6 else ''}")
    bad = [(p, got_paths[p], ref_paths[p]) for p in ref_paths
           if tuple(got_paths[p]) != tuple(ref_paths[p])]
    if bad:
        raise ValueError(f"{what}: leaf shape mismatches {bad[:6]}")
    return got


def load_torch_state_dict(path) -> Dict[str, object]:
    """Load a ``.pt``/``.pth``/``.bin`` checkpoint on the host CPU and
    unwrap the common ``{"state_dict": …}`` / ``{"model": …}``
    nesting."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj \
                and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"{path} does not contain a state dict")
    return obj


def _strip_prefix(sd: Mapping[str, object], marker: str) -> Dict:
    """Strip any uniform prefix in front of the first key containing
    ``marker`` (handles ``wav2vec2.``/``hubert.``/``wavlm.``/
    ``model.`` wrapping of task heads)."""
    for k in sd:
        i = k.find(marker)
        if i > 0:
            prefix = k[:i]
            return {key[len(prefix):] if key.startswith(prefix)
                    else key: v for key, v in sd.items()}
        if i == 0:
            return dict(sd)
    return dict(sd)


# ----------------------------------------------------------------- #
# wav2vec2 family (wav2vec2 / HuBERT / WavLM)                       #
# ----------------------------------------------------------------- #

def import_wav2vec2(state_dict: Mapping[str, object], model):
    """HF-layout wav2vec2/HuBERT/WavLM ``state_dict`` →
    ``models.Wav2Vec2``/``WavLM`` param pytree.

    Name map (HF ``Wav2Vec2Model``/``HubertModel``/``WavLMModel``):

    =====================================================  ==========
    ``feature_extractor.conv_layers.{i}.conv``             ``extractor[i].w/.b``
    ``feature_extractor.conv_layers.{i}.layer_norm``       ``extractor[i].n`` (layer mode) / ``.gn`` (group mode, i=0)
    ``feature_projection.layer_norm``                      ``proj_ln``
    ``feature_projection.projection``                      ``proj``
    ``encoder.pos_conv_embed.conv`` (weight-normed)        ``pos_conv``/``pos_b``
    ``encoder.layer_norm``                                 ``enc_ln``
    ``encoder.layers.{i}.attention.{q,k,v}_proj``          ``layers[i].wqkv/bqkv`` (q,k,v block concat)
    ``encoder.layers.{i}.attention.out_proj``              ``layers[i].wo/bo``
    ``encoder.layers.{i}.layer_norm``                      ``layers[i].ln1``
    ``encoder.layers.{i}.final_layer_norm``                ``layers[i].ln2``
    ``encoder.layers.{i}.feed_forward.*``                  ``layers[i].w1/b1/w2/b2``
    ``encoder.layers.0.attention.rel_attn_embed``          ``rel_embed`` (WavLM)
    ``encoder.layers.{i}.attention.gru_rel_pos_*``         ``layers[i].gru_*`` (WavLM)
    ``lm_head`` / ``aux``                                  ``aux`` (optional CTC head)
    =====================================================  ==========

    ``masked_spec_embed``/quantizer/project_q leaves (pretraining
    heads outside this encoder) are ignored.
    """
    sd = _SD(_strip_prefix(state_dict, "feature_extractor.conv_layers"))
    p: Dict = {"extractor": []}
    for i in range(len(model.extractor)):
        pre = f"feature_extractor.conv_layers.{i}"
        lp = {"w": _conv_tio(sd.get(f"{pre}.conv.weight"))}
        if model.conv_bias:
            lp["b"] = jnp.asarray(sd.get(f"{pre}.conv.bias"))
        if model.extractor_mode == "layer_norm":
            lp["n"] = _lnp(sd, f"{pre}.layer_norm")
        elif i == 0:
            lp["gn"] = _lnp(sd, f"{pre}.layer_norm")
        p["extractor"].append(lp)

    p["proj_ln"] = _lnp(sd, "feature_projection.layer_norm")
    p["proj"] = _linear(sd, "feature_projection.projection")

    # positional conv: grouped, weight-normed (dim=2 → g is (1,1,k))
    pos_w = sd.get("encoder.pos_conv_embed.conv.weight")  # (d, d/g, k)
    p["pos_conv"] = _conv_tio(pos_w)                      # (k, d/g, d)
    p["pos_b"] = jnp.asarray(sd.get("encoder.pos_conv_embed.conv.bias"))
    p["enc_ln"] = _lnp(sd, "encoder.layer_norm")

    is_wavlm = sd.has("encoder.layers.0.attention.rel_attn_embed.weight")
    if is_wavlm:
        p["rel_embed"] = jnp.asarray(
            sd.get("encoder.layers.0.attention.rel_attn_embed.weight"))

    p["layers"] = []
    for i in range(model.num_layers):
        pre = f"encoder.layers.{i}"
        wq = sd.get(f"{pre}.attention.q_proj.weight")
        wk = sd.get(f"{pre}.attention.k_proj.weight")
        wv = sd.get(f"{pre}.attention.v_proj.weight")
        bq = sd.get(f"{pre}.attention.q_proj.bias")
        bk = sd.get(f"{pre}.attention.k_proj.bias")
        bv = sd.get(f"{pre}.attention.v_proj.bias")
        lp = {
            "ln1": _lnp(sd, f"{pre}.layer_norm"),
            "wqkv": jnp.asarray(np.concatenate([wq, wk, wv], 0).T),
            "bqkv": jnp.asarray(np.concatenate([bq, bk, bv], 0)),
            "wo": jnp.asarray(
                sd.get(f"{pre}.attention.out_proj.weight").T),
            "bo": jnp.asarray(sd.get(f"{pre}.attention.out_proj.bias")),
            "ln2": _lnp(sd, f"{pre}.final_layer_norm"),
        }
        ff = _linear(sd, f"{pre}.feed_forward.intermediate_dense")
        lp["w1"], lp["b1"] = ff["w"], ff["b"]
        ff = _linear(sd, f"{pre}.feed_forward.output_dense")
        lp["w2"], lp["b2"] = ff["w"], ff["b"]
        if is_wavlm:
            gw = sd.get(f"{pre}.attention.gru_rel_pos_linear.weight")
            lp["gru_w"] = jnp.asarray(gw.T)
            lp["gru_b"] = jnp.asarray(
                sd.get(f"{pre}.attention.gru_rel_pos_linear.bias"))
            lp["gru_const"] = jnp.asarray(
                sd.get(f"{pre}.attention.gru_rel_pos_const")
                .reshape(-1))
        p["layers"].append(lp)

    if model.aux_out is not None:
        for head in ("lm_head", "aux"):
            if sd.has(f"{head}.weight"):
                p["aux"] = _linear(sd, head)
                break
        else:
            raise ValueError(
                "model.aux_out is set but the state_dict has no "
                "'lm_head'/'aux' CTC head")
    return _check_tree(p, model, "import_wav2vec2")


# ----------------------------------------------------------------- #
# HiFi-GAN vocoder                                                  #
# ----------------------------------------------------------------- #

def import_hifigan(state_dict: Mapping[str, object], model):
    """HiFi-GAN generator ``state_dict`` →
    ``models.HiFiGANVocoder`` param pytree.

    Accepts both the HF ``SpeechT5HifiGan`` naming
    (``conv_pre`` / ``upsampler.{i}`` / ``resblocks.{r}.convs1.{j}`` /
    ``convs2.{j}`` / ``conv_post``) and the original repo naming
    (``ups.{i}``, type-2 resblocks as ``resblocks.{r}.convs.{j}``);
    weight-norm parametrizations are folded.  ``mean``/``scale``
    input-normalization buffers (HF) are ignored — feed unnormalized
    log-mels, as torchaudio's bundle recipe does.
    """
    sd = _SD(dict(state_dict))

    def up_key(i):
        return (f"upsampler.{i}" if sd.has(f"upsampler.{i}.weight")
                else f"ups.{i}")

    p: Dict = {
        "pre": {"w": _conv_tio(sd.get("conv_pre.weight")),
                "b": jnp.asarray(sd.get("conv_pre.bias"))},
        "ups": [], "mrf": [],
    }
    n_kernels = len(model.rb_kernels)
    for i in range(len(model.rates)):
        p["ups"].append(
            {"w": _convT_tio(sd.get(f"{up_key(i)}.weight")),
             "b": jnp.asarray(sd.get(f"{up_key(i)}.bias"))})
        layer = []
        for kidx in range(n_kernels):
            r = i * n_kernels + kidx
            convs = []
            for j in range(len(model.rb_dilations[kidx])):
                if model.rb_type == 1:
                    blk = {
                        "w1": _conv_tio(
                            sd.get(f"resblocks.{r}.convs1.{j}.weight")),
                        "b1": jnp.asarray(
                            sd.get(f"resblocks.{r}.convs1.{j}.bias")),
                        "w2": _conv_tio(
                            sd.get(f"resblocks.{r}.convs2.{j}.weight")),
                        "b2": jnp.asarray(
                            sd.get(f"resblocks.{r}.convs2.{j}.bias")),
                    }
                else:
                    blk = {
                        "w1": _conv_tio(
                            sd.get(f"resblocks.{r}.convs.{j}.weight")),
                        "b1": jnp.asarray(
                            sd.get(f"resblocks.{r}.convs.{j}.bias")),
                    }
                convs.append(blk)
            layer.append(convs)
        p["mrf"].append(layer)
    p["post"] = {"w": _conv_tio(sd.get("conv_post.weight")),
                 "b": jnp.asarray(sd.get("conv_post.bias"))}
    return _check_tree(p, model, "import_hifigan")


# ----------------------------------------------------------------- #
# ConvTasNet                                                        #
# ----------------------------------------------------------------- #

def import_conv_tasnet(state_dict: Mapping[str, object], model):
    """torchaudio-layout ``models.ConvTasNet`` ``state_dict`` →
    ``models.ConvTasNet`` param pytree.

    Name map (torchaudio ``conv_tasnet.py`` — verified against a torch
    replica of the published architecture in
    ``tests/test_import_torch_extra.py``; torchaudio itself is not
    installed in this environment, so the names are [ref-recon]):

    ============================================  =================
    ``encoder.weight`` ``(N,1,L)``                ``enc``
    ``mask_generator.input_norm``                 ``ln_in``
    ``mask_generator.input_conv``                 ``bottleneck``
    ``…conv_layers.{i}.conv_layers.0``            ``blocks[i].in``
    ``…conv_layers.{i}.conv_layers.1`` (PReLU)    ``blocks[i].a1``
    ``…conv_layers.{i}.conv_layers.2`` (GN)       ``blocks[i].n1``
    ``…conv_layers.{i}.conv_layers.3`` (dw)       ``blocks[i].dw``
    ``…conv_layers.{i}.conv_layers.4/5``          ``a2``/``n2``
    ``…conv_layers.{i}.res_out`` (absent last)    ``blocks[i].res``
    ``…conv_layers.{i}.skip_out``                 ``blocks[i].skip``
    ``mask_generator.output_prelu.weight``        ``mask_a``
    ``mask_generator.output_conv``                ``mask``
    ``decoder.weight`` ``(N,1,L)`` (transpose)    ``dec``
    ============================================  =================
    """
    sd = _SD(dict(state_dict))

    def _gln(prefix):
        return {"g": jnp.asarray(sd.get(f"{prefix}.weight"))[None, :],
                "b": jnp.asarray(sd.get(f"{prefix}.bias"))[None, :]}

    def _c1x1(prefix):
        return {"w": _conv_tio(sd.get(f"{prefix}.weight")),
                "b": jnp.asarray(sd.get(f"{prefix}.bias"))}

    mg = "mask_generator"
    p: Dict = {
        "enc": _conv_tio(sd.get("encoder.weight")),
        "ln_in": _gln(f"{mg}.input_norm"),
        "bottleneck": _c1x1(f"{mg}.input_conv"),
        "blocks": [],
        "mask_a": jnp.asarray(sd.get(f"{mg}.output_prelu.weight")),
        "mask": _c1x1(f"{mg}.output_conv"),
        "dec": _convT_tio(sd.get("decoder.weight")),
    }
    n_blocks = model.R * model.X
    for i in range(n_blocks):
        pre = f"{mg}.conv_layers.{i}"
        blk = {
            "in": _c1x1(f"{pre}.conv_layers.0"),
            "a1": jnp.asarray(sd.get(f"{pre}.conv_layers.1.weight")),
            "n1": _gln(f"{pre}.conv_layers.2"),
            "dw": _c1x1(f"{pre}.conv_layers.3"),
            "a2": jnp.asarray(sd.get(f"{pre}.conv_layers.4.weight")),
            "n2": _gln(f"{pre}.conv_layers.5"),
            "skip": _c1x1(f"{pre}.skip_out"),
        }
        if i != n_blocks - 1:
            blk["res"] = _c1x1(f"{pre}.res_out")
        p["blocks"].append(blk)
    return _check_tree(p, model, "import_conv_tasnet")


# ----------------------------------------------------------------- #
# WaveRNN                                                           #
# ----------------------------------------------------------------- #

def _fold_bn(sd: "_SD", prefix: str, eps: float = 1e-5):
    """BatchNorm1d → frozen per-channel affine: ``g = w/√(rv+eps)``,
    ``b = b − rm·g`` (the exact inference form)."""
    w = sd.get(f"{prefix}.weight").astype(np.float64)
    b = sd.get(f"{prefix}.bias").astype(np.float64)
    rm = sd.get(f"{prefix}.running_mean").astype(np.float64)
    rv = sd.get(f"{prefix}.running_var").astype(np.float64)
    sd.used.add(f"{prefix}.num_batches_tracked")
    g = w / np.sqrt(rv + eps)
    return {"g": jnp.asarray((g).astype(np.float32)),
            "b": jnp.asarray((b - rm * g).astype(np.float32))}


def import_gru(state_dict: Mapping[str, object], prefix: str):
    """One-layer ``nn.GRU`` under ``prefix`` → the ``models.WaveRNN``
    GRU dict ``{"wx", "wh", "bx", "bh"}`` (gate order ``r, z, n``;
    biases stay separate — torch's ``n`` gate applies the reset gate
    to ``W_hn·h + b_hn`` INCLUDING its bias)."""
    sd = state_dict if isinstance(state_dict, _SD) \
        else _SD(dict(state_dict))
    dot = "." if prefix and not prefix.endswith(".") else ""
    return {"wx": jnp.asarray(sd.get(f"{prefix}{dot}weight_ih_l0").T),
            "wh": jnp.asarray(sd.get(f"{prefix}{dot}weight_hh_l0").T),
            "bx": jnp.asarray(sd.get(f"{prefix}{dot}bias_ih_l0")),
            "bh": jnp.asarray(sd.get(f"{prefix}{dot}bias_hh_l0"))}


def import_wavernn(state_dict: Mapping[str, object], model):
    """torchaudio-layout ``models.WaveRNN`` ``state_dict`` →
    ``models.WaveRNN`` param pytree.

    Name map (torchaudio ``wavernn.py`` — verified against a torch
    replica in ``tests/test_import_torch_extra.py``; [ref-recon]):
    ``upsample.resnet.melresnet_model.{0,1,3..,last}`` (conv_in, BN →
    folded affine, ResBlocks ``resblock_model.{0,1,3,4}``, conv_out),
    ``upsample.upsample_layers.{2i+1}.weight`` (smoothing Conv2d
    ``(1,1,1,K)`` → ``(K,1,1)``), ``fc``/``fc1``/``fc2``/``fc3``,
    ``rnn1``/``rnn2`` (``nn.GRU``).
    """
    sd = _SD(dict(state_dict))
    nrb = model.n_res_block
    mm = "upsample.resnet.melresnet_model"
    blocks = []
    for i in range(nrb):
        rb = f"{mm}.{3 + i}.resblock_model"
        blocks.append({
            "c1": _conv_tio(sd.get(f"{rb}.0.weight")),
            "n1": _fold_bn(sd, f"{rb}.1"),
            "c2": _conv_tio(sd.get(f"{rb}.3.weight")),
            "n2": _fold_bn(sd, f"{rb}.4"),
        })
    resnet = {
        "conv_in": _conv_tio(sd.get(f"{mm}.0.weight")),
        "ln_in": _fold_bn(sd, f"{mm}.1"),
        "blocks": blocks,
        "conv_out": _conv_tio(sd.get(f"{mm}.{3 + nrb}.weight")),
        "out_b": jnp.asarray(sd.get(f"{mm}.{3 + nrb}.bias")),
    }
    ups = []
    for i in range(len(model.scales)):
        w = sd.get(f"upsample.upsample_layers.{2 * i + 1}.weight")
        ups.append(jnp.asarray(w.reshape(-1)[:, None, None]))  # (K,1,1)
    p = {
        "resnet": resnet,
        "upsample": ups,
        "fc_in": _linear(sd, "fc"),
        "gru1": import_gru(sd, "rnn1"),
        "gru2": import_gru(sd, "rnn2"),
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
        "fc3": _linear(sd, "fc3"),
    }
    return _check_tree(p, model, "import_wavernn")


# ----------------------------------------------------------------- #
# Tacotron2                                                         #
# ----------------------------------------------------------------- #

def _lstm_cell(sd: "_SD", prefix: str):
    """``nn.LSTMCell``/one ``nn.LSTM`` direction → the
    ``models/tacotron2.py`` dict ``{"wx", "wh", "b"}`` (gates
    ``i,f,g,o``, torch's two biases summed)."""
    suffix = "_l0" if sd.has(f"{prefix}.weight_ih_l0") else ""
    return {"wx": jnp.asarray(sd.get(f"{prefix}.weight_ih{suffix}").T),
            "wh": jnp.asarray(sd.get(f"{prefix}.weight_hh{suffix}").T),
            "b": jnp.asarray(sd.get(f"{prefix}.bias_ih{suffix}")
                             + sd.get(f"{prefix}.bias_hh{suffix}"))}


def import_tacotron2(state_dict: Mapping[str, object], model):
    """torchaudio-layout ``models.Tacotron2`` ``state_dict`` →
    ``models.Tacotron2`` param pytree.

    Name map (torchaudio ``tacotron2.py`` — verified against a torch
    replica in ``tests/test_import_torch_extra.py``; [ref-recon]):
    ``embedding``; ``encoder.convolutions.{i}.{0,1}`` (conv + BN →
    frozen affine) + ``encoder.lstm`` (bi-LSTM, ``_reverse`` weights →
    ``enc_bwd``); ``decoder.prenet.layers.{0,1}`` (bias-free),
    ``decoder.attention_rnn``/``decoder_rnn`` (LSTMCells),
    ``decoder.attention_layer.{query_layer,memory_layer,v,
    location_layer.location_conv,location_layer.location_dense}``
    (all bias-free), ``decoder.linear_projection`` → ``mel_out``,
    ``decoder.gate_layer`` → ``stop``; ``postnet.convolutions.{i}``.
    """
    sd = _SD(dict(state_dict))
    enc_convs = []
    for i in range(model.n_enc_convs):
        pre = f"encoder.convolutions.{i}"
        enc_convs.append({
            "w": _conv_tio(sd.get(f"{pre}.0.weight")),
            "b": jnp.asarray(sd.get(f"{pre}.0.bias")),
            "n": _fold_bn(sd, f"{pre}.1"),
        })
    post = []
    for i in range(model.n_post_convs):
        pre = f"postnet.convolutions.{i}"
        post.append({
            "w": _conv_tio(sd.get(f"{pre}.0.weight")),
            "b": jnp.asarray(sd.get(f"{pre}.0.bias")),
            "n": _fold_bn(sd, f"{pre}.1"),
        })
    att = "decoder.attention_layer"
    enc_bwd = {
        "wx": jnp.asarray(sd.get("encoder.lstm.weight_ih_l0_reverse").T),
        "wh": jnp.asarray(sd.get("encoder.lstm.weight_hh_l0_reverse").T),
        "b": jnp.asarray(sd.get("encoder.lstm.bias_ih_l0_reverse")
                         + sd.get("encoder.lstm.bias_hh_l0_reverse")),
    }
    p: Dict = {
        "embedding": jnp.asarray(sd.get("embedding.weight")),
        "enc_convs": enc_convs,
        "enc_fwd": _lstm_cell(sd, "encoder.lstm"),
        "enc_bwd": enc_bwd,
        "prenet1": {"w": jnp.asarray(
            sd.get("decoder.prenet.layers.0.weight").T)},
        "prenet2": {"w": jnp.asarray(
            sd.get("decoder.prenet.layers.1.weight").T)},
        "att_rnn": _lstm_cell(sd, "decoder.attention_rnn"),
        "att_query": jnp.asarray(
            sd.get(f"{att}.query_layer.weight").T),
        "att_memory": jnp.asarray(
            sd.get(f"{att}.memory_layer.weight").T),
        "att_loc_conv": _conv_tio(
            sd.get(f"{att}.location_layer.location_conv.weight")),
        "att_loc_fc": jnp.asarray(
            sd.get(f"{att}.location_layer.location_dense.weight").T),
        "att_v": jnp.asarray(sd.get(f"{att}.v.weight").T),
        "dec_rnn": _lstm_cell(sd, "decoder.decoder_rnn"),
        "mel_out": _linear(sd, "decoder.linear_projection"),
        "stop": _linear(sd, "decoder.gate_layer"),
        "postnet": post,
    }
    return _check_tree(p, model, "import_tacotron2")


# ----------------------------------------------------------------- #
# LSTM stacks (RNNT predictor etc.)                                 #
# ----------------------------------------------------------------- #

def import_lstm(state_dict: Mapping[str, object], prefix: str,
                num_layers: int):
    """``nn.LSTM`` weights under ``prefix`` → the
    ``models/rnnt.py::RNNTPredictor`` per-layer dicts
    ``{"wi", "wh", "b"}``.

    torch packs gates ``(i, f, g, o)`` along the output dim — the
    same order ``RNNTPredictor.step`` splits — and keeps two biases
    (``bias_ih`` + ``bias_hh``) that always act summed.
    """
    sd = _SD(dict(state_dict))
    dot = "." if prefix and not prefix.endswith(".") else ""
    layers = []
    for i in range(num_layers):
        wi = sd.get(f"{prefix}{dot}weight_ih_l{i}")
        wh = sd.get(f"{prefix}{dot}weight_hh_l{i}")
        b = (sd.get(f"{prefix}{dot}bias_ih_l{i}")
             + sd.get(f"{prefix}{dot}bias_hh_l{i}"))
        layers.append({"wi": jnp.asarray(wi.T),
                       "wh": jnp.asarray(wh.T),
                       "b": jnp.asarray(b)})
    return layers


# ----------------------------------------------------------------- #
# Emformer RNN-T                                                    #
# ----------------------------------------------------------------- #

def import_emformer_rnnt(state_dict: Mapping[str, object], model):
    """torchaudio-layout ``models.RNNT`` (``emformer_rnnt_base``
    family) ``state_dict`` → this package's compat RNNT param pytree.

    The model must come from ``emformer_rnnt_model(...,
    time_reduction_stride>1)`` / ``emformer_rnnt_base(
    compat="torchaudio")`` — an :class:`~..models.EmformerTranscriber`
    transcriber and a :class:`~..models.LayerNormLSTMPredictor`.

    Name map ([ref-recon: torchaudio models/rnnt.py +
    models/emformer.py — UNVERIFIED, mount empty; conversion math
    pinned against a torch replica in
    ``tests/test_import_torch_extra.py``]):

    ======================================================  =========
    ``transcriber.input_linear.weight`` (bias-free)         ``transcriber.in_lin``
    ``…transformer.emformer_layers.{i}.layer_norm_input``   ``ln1``
    ``….attention.emb_to_query``                            ``wq/bq``
    ``….attention.emb_to_key_value`` (K ‖ V rows)           ``wk/bk, wv/bv``
    ``….attention.out_proj``                                ``wo/bo``
    ``….pos_ff.{0,1,4}`` (LN, two GEMMs)                    ``ln2, w1/b1, w2/b2``
    ``….layer_norm_output``                                 ``ln3``
    ``transcriber.output_linear`` / ``.layer_norm``         ``out_lin`` / ``out_ln``
    ``predictor.embedding`` / ``.input_layer_norm``         ``emb`` / ``in_ln``
    ``predictor.lstm_layers.{i}.x2g`` (bias iff no LN)      ``wx (+bx)``
    ``predictor.lstm_layers.{i}.p2g`` (bias-free)           ``wh``
    ``predictor.lstm_layers.{i}.{g_norm,c_norm}``           ``g_ln, c_ln``
    ``predictor.linear`` / ``.output_layer_norm``           ``out`` / ``out_ln``
    ``joiner.linear``                                       ``joiner``
    (no torch counterpart — transcriber already 1024-wide)  ``enc_proj`` = identity
    ======================================================  =========
    """
    from ..models.emformer import EmformerTranscriber
    from ..models.rnnt import LayerNormLSTMPredictor
    trans = getattr(model, "transcriber", None)
    pred = getattr(model, "predictor", None)
    if not isinstance(trans, EmformerTranscriber) or \
            not isinstance(pred, LayerNormLSTMPredictor):
        raise ValueError(
            "import_emformer_rnnt needs the torchaudio-compatible "
            "build — emformer_rnnt_model(..., time_reduction_stride"
            ">1) or emformer_rnnt_base(compat='torchaudio'); got "
            f"transcriber={type(trans).__name__}, "
            f"predictor={type(pred).__name__}")
    sd = _SD(_strip_prefix(dict(state_dict), "transcriber."))

    em = trans.emformer
    layers = []
    for i in range(em.n_layers):
        pre = f"transcriber.transformer.emformer_layers.{i}"
        kv_w = sd.get(f"{pre}.attention.emb_to_key_value.weight")
        kv_b = sd.get(f"{pre}.attention.emb_to_key_value.bias")
        d = em.d
        if kv_w.shape != (2 * d, d):
            raise ValueError(
                f"{pre}.attention.emb_to_key_value.weight has shape "
                f"{kv_w.shape}, expected {(2 * d, d)}")
        lp = {
            "ln1": _lnp(sd, f"{pre}.layer_norm_input"),
            "wq": jnp.asarray(
                sd.get(f"{pre}.attention.emb_to_query.weight").T),
            "bq": jnp.asarray(
                sd.get(f"{pre}.attention.emb_to_query.bias")),
            "wk": jnp.asarray(kv_w[:d].T),
            "bk": jnp.asarray(kv_b[:d]),
            "wv": jnp.asarray(kv_w[d:].T),
            "bv": jnp.asarray(kv_b[d:]),
            "wo": jnp.asarray(
                sd.get(f"{pre}.attention.out_proj.weight").T),
            "bo": jnp.asarray(
                sd.get(f"{pre}.attention.out_proj.bias")),
            "ln2": _lnp(sd, f"{pre}.pos_ff.0"),
            "ln3": _lnp(sd, f"{pre}.layer_norm_output"),
        }
        ff1 = _linear(sd, f"{pre}.pos_ff.1")
        ff2 = _linear(sd, f"{pre}.pos_ff.4")
        lp["w1"], lp["b1"] = ff1["w"], ff1["b"]
        lp["w2"], lp["b2"] = ff2["w"], ff2["b"]
        layers.append(lp)

    p_trans = {
        "in_lin": {"w": jnp.asarray(
            sd.get("transcriber.input_linear.weight").T)},
        "emformer": {"layers": layers},
        "out_lin": _linear(sd, "transcriber.output_linear"),
        "out_ln": _lnp(sd, "transcriber.layer_norm"),
    }

    p_layers = []
    for i in range(pred.n_layers):
        pre = f"predictor.lstm_layers.{i}"
        lp = {"wx": jnp.asarray(sd.get(f"{pre}.x2g.weight").T),
              "wh": jnp.asarray(sd.get(f"{pre}.p2g.weight").T)}
        if pred.layer_norm:
            lp["g_ln"] = _lnp(sd, f"{pre}.g_norm")
            lp["c_ln"] = _lnp(sd, f"{pre}.c_norm")
        else:
            lp["bx"] = jnp.asarray(sd.get(f"{pre}.x2g.bias"))
        p_layers.append(lp)
    p_pred = {
        "emb": jnp.asarray(sd.get("predictor.embedding.weight")),
        "in_ln": _lnp(sd, "predictor.input_layer_norm"),
        "layers": p_layers,
        "out": _linear(sd, "predictor.linear"),
        "out_ln": _lnp(sd, "predictor.output_layer_norm"),
    }

    p = {
        "transcriber": p_trans,
        "predictor": p_pred,
        "enc_proj": {"w": jnp.eye(model.enc_dim, dtype=jnp.float32),
                     "b": jnp.zeros((model.enc_dim,), jnp.float32)},
        "joiner": _linear(sd, "joiner.linear"),
    }
    return _check_tree(p, model, "import_emformer_rnnt")


# ----------------------------------------------------------------- #
# Squim (objective)                                                 #
# ----------------------------------------------------------------- #

def import_squim_objective(state_dict: Mapping[str, object], model):
    """torchaudio-layout ``models.SquimObjective`` ``state_dict`` →
    :class:`~..models.SquimObjectiveTA` param pytree.

    Name map ([ref-recon: torchaudio models/squim/objective.py —
    UNVERIFIED, mount empty; conversion math pinned against a torch
    replica in ``tests/test_import_squim.py``]):
    ``encoder.conv1d`` (bias-free Conv1d) → ``enc``;
    ``dprnn.{row,col}_rnn.{i}.rnn`` (bidirectional ``nn.LSTM``, the
    two torch biases summed, ``_reverse`` → ``bwd``) + ``.proj`` →
    ``blocks[i].{row,col}``; ``dprnn.{row,col}_norm.{i}``
    (GroupNorm(1)) → ``{row,col}_n``; ``dprnn.conv.{0,1}`` (1×1
    Conv2d + PReLU) → ``out_conv``; ``branches.{i}.0``
    (``nn.TransformerEncoderLayer``: fused ``in_proj``, ``out_proj``,
    ``linear1/2``, ``norm1/2``) + ``.1.alpha`` (AutoPool) +
    ``.2.{0,1,2}`` (Linear, PReLU, Linear; the RangeSigmoid is
    parameter-free) → ``branches[metric]`` in (stoi, pesq, si_sdr)
    order.
    """
    from ..models.squim import SquimObjectiveTA
    if not isinstance(model, SquimObjectiveTA):
        raise ValueError(
            "import_squim_objective needs the torchaudio-compatible "
            "build — squim_objective_base(compat='torchaudio'); got "
            f"{type(model).__name__}")
    sd = _SD(dict(state_dict))

    def lstm_dir(prefix, suffix):
        return {"wi": jnp.asarray(
                    sd.get(f"{prefix}.weight_ih_l0{suffix}").T),
                "wh": jnp.asarray(
                    sd.get(f"{prefix}.weight_hh_l0{suffix}").T),
                "b": jnp.asarray(
                    sd.get(f"{prefix}.bias_ih_l0{suffix}")
                    + sd.get(f"{prefix}.bias_hh_l0{suffix}"))}

    def rnn(prefix):
        return {"fwd": lstm_dir(f"{prefix}.rnn", ""),
                "bwd": lstm_dir(f"{prefix}.rnn", "_reverse"),
                "proj": _linear(sd, f"{prefix}.proj")}

    blocks = []
    for i in range(model.n):
        blocks.append({
            "row": rnn(f"dprnn.row_rnn.{i}"),
            "row_n": _lnp(sd, f"dprnn.row_norm.{i}"),
            "col": rnn(f"dprnn.col_rnn.{i}"),
            "col_n": _lnp(sd, f"dprnn.col_norm.{i}"),
        })
    conv_w = sd.get("dprnn.conv.0.weight")        # (d, F, 1, 1)
    p = {
        "enc": {"w": _conv_tio(sd.get("encoder.conv1d.weight"))},
        "blocks": blocks,
        "out_conv": {"w": jnp.asarray(conv_w[:, :, 0, 0].T),
                     "b": jnp.asarray(sd.get("dprnn.conv.0.bias")),
                     "p": jnp.asarray(
                         sd.get("dprnn.conv.1.weight").reshape(-1))},
        "branches": {},
    }
    for bi, metric in enumerate(model.METRICS):
        pre = f"branches.{bi}"
        p["branches"][metric] = {
            "attn": {
                "in_w": jnp.asarray(
                    sd.get(f"{pre}.0.self_attn.in_proj_weight").T),
                "in_b": jnp.asarray(
                    sd.get(f"{pre}.0.self_attn.in_proj_bias")),
                "out_w": jnp.asarray(
                    sd.get(f"{pre}.0.self_attn.out_proj.weight").T),
                "out_b": jnp.asarray(
                    sd.get(f"{pre}.0.self_attn.out_proj.bias")),
            },
            "ln1": _lnp(sd, f"{pre}.0.norm1"),
            "ff": {"w1": jnp.asarray(
                       sd.get(f"{pre}.0.linear1.weight").T),
                   "b1": jnp.asarray(sd.get(f"{pre}.0.linear1.bias")),
                   "w2": jnp.asarray(
                       sd.get(f"{pre}.0.linear2.weight").T),
                   "b2": jnp.asarray(sd.get(f"{pre}.0.linear2.bias"))},
            "ln2": _lnp(sd, f"{pre}.0.norm2"),
            "alpha": jnp.asarray(sd.get(f"{pre}.1.alpha").reshape(-1)),
            "head": {"w1": jnp.asarray(
                         sd.get(f"{pre}.2.0.weight").T),
                     "b1": jnp.asarray(sd.get(f"{pre}.2.0.bias")),
                     "p": jnp.asarray(
                         sd.get(f"{pre}.2.1.weight").reshape(-1)),
                     "w2": jnp.asarray(sd.get(f"{pre}.2.2.weight").T),
                     "b2": jnp.asarray(sd.get(f"{pre}.2.2.bias"))},
        }
    return _check_tree(p, model, "import_squim_objective")


# ----------------------------------------------------------------- #
# HDemucs                                                           #
# ----------------------------------------------------------------- #

def import_hdemucs(state_dict: Mapping[str, object], model):
    """torchaudio-layout ``models.HDemucs`` ``state_dict`` →
    :class:`~..models.HDemucsTA` param pytree.

    Convs/transposed convs keep torch's OIHW / ``(in, out, k)``
    layouts verbatim (the model applies them with matching
    ``dimension_numbers``), so the conversion is a pure renaming plus
    the usual Linear/1×1 transposes.  Name map ([ref-recon: torchaudio
    ``models/_hdemucs.py`` — UNVERIFIED, mount empty; conversion math
    pinned against a torch replica in
    ``tests/test_import_hdemucs.py``]):

    ==================================================  ==============
    ``freq_emb.embedding.weight`` (scale re-applied
    at forward, exactly like ``_ScaledEmbedding``)      ``freq_emb.w``
    ``{t,}encoder.{i}.conv`` / ``.rewrite``             ``conv/rewrite``
    ``{t,}encoder.{i}.norm{1,2}`` (GroupNorm, only
    from ``norm_starts``)                               ``norm{1,2}``
    ``….dconv.layers.{d}.{0,1}`` (dilated conv, GN(1))  ``conv1, gn1``
    ``….dconv.layers.{d}.{j}.lstm`` (2-layer BiLSTM;
    the two torch biases summed, ``_reverse`` → bwd)
    + ``.linear``                                       ``lstm.l/.proj``
    ``….dconv.layers.{d}.{j}`` (_LocalState 1×1 convs)  ``attn.*``
    ``….dconv.layers.{d}.{-4,-3,-1}`` (1×1 conv,
    GN(1), _LayerScale.scale)                           ``conv2,gn2,scale``
    ``{t,}decoder.{i}.conv_tr`` / ``.rewrite`` /
    ``.norm{1,2}``                                      same names
    ==================================================  ==============
    """
    from ..models.hdemucs_ta import HDemucsTA
    if not isinstance(model, HDemucsTA):
        raise ValueError(
            "import_hdemucs needs the torchaudio-compatible build — "
            "HDemucsTA / hdemucs_{low,medium,high}(); got "
            f"{type(model).__name__} (models.HDemucs is this "
            "package's TPU-first redesign and cannot load published "
            "weights)")
    sd = _SD(dict(state_dict))

    def conv(pre):
        return {"w": jnp.asarray(sd.get(f"{pre}.weight")),
                "b": jnp.asarray(sd.get(f"{pre}.bias"))}

    def gnp(pre):
        return {"g": jnp.asarray(sd.get(f"{pre}.weight")),
                "b": jnp.asarray(sd.get(f"{pre}.bias"))}

    def dense1x1(pre):
        w = sd.get(f"{pre}.weight")                   # (out, in, 1)
        return {"w": jnp.asarray(w[:, :, 0].T),
                "b": jnp.asarray(sd.get(f"{pre}.bias"))}

    def lstm_dir(pre, k, suf):
        return {"wi": jnp.asarray(sd.get(f"{pre}.weight_ih_l{k}{suf}").T),
                "wh": jnp.asarray(sd.get(f"{pre}.weight_hh_l{k}{suf}").T),
                "b": jnp.asarray(sd.get(f"{pre}.bias_ih_l{k}{suf}")
                                 + sd.get(f"{pre}.bias_hh_l{k}{suf}"))}

    def dconv(pre, spec):
        blocks = []
        for d in range(model.dconv_depth):
            base = f"{pre}.layers.{d}"
            b = {"conv1": conv(f"{base}.0"), "gn1": gnp(f"{base}.1")}
            j = 3                       # 0 conv, 1 GN, 2 GELU, then…
            if spec["lstm"]:
                lpre = f"{base}.{j}"
                j += 1
                b["lstm"] = {
                    "l": [{"fwd": lstm_dir(f"{lpre}.lstm", k, ""),
                           "bwd": lstm_dir(f"{lpre}.lstm", k,
                                           "_reverse")}
                          for k in range(model.lstm_layers)],
                    "proj": _linear(sd, f"{lpre}.linear")}
            if spec["attn"]:
                apre = f"{base}.{j}"
                j += 1
                b["attn"] = {"content": dense1x1(f"{apre}.content"),
                             "query": dense1x1(f"{apre}.query"),
                             "key": dense1x1(f"{apre}.key"),
                             "qdecay": dense1x1(f"{apre}.query_decay"),
                             "proj": dense1x1(f"{apre}.proj")}
            b["conv2"] = conv(f"{base}.{j}")
            b["gn2"] = gnp(f"{base}.{j + 1}")
            b["scale"] = jnp.asarray(sd.get(f"{base}.{j + 3}.scale"))
            blocks.append(b)
        return blocks

    def enc_layer(pre, spec):
        p = {"conv": conv(f"{pre}.conv")}
        if spec["empty"]:
            return p
        p["rewrite"] = conv(f"{pre}.rewrite")
        if spec["norm"]:
            p["norm1"] = gnp(f"{pre}.norm1")
            p["norm2"] = gnp(f"{pre}.norm2")
        p["dconv"] = dconv(f"{pre}.dconv", spec)
        return p

    def dec_layer(pre, spec):
        p = {"conv_tr": conv(f"{pre}.conv_tr")}
        if spec["norm"]:
            p["norm2"] = gnp(f"{pre}.norm2")
        if not spec["empty"]:
            p["rewrite"] = conv(f"{pre}.rewrite")
            if spec["norm"]:
                p["norm1"] = gnp(f"{pre}.norm1")
        return p

    p = {
        "freq_emb": {"w": jnp.asarray(
            sd.get("freq_emb.embedding.weight"))},
        "encoder": [enc_layer(f"encoder.{i}", s)
                    for i, s in enumerate(model.enc_specs)],
        "tencoder": [enc_layer(f"tencoder.{i}", s)
                     for i, s in enumerate(model.tenc_specs)],
        "decoder": [dec_layer(f"decoder.{i}", s)
                    for i, s in enumerate(model.dec_specs)],
        "tdecoder": [dec_layer(f"tdecoder.{i}", s)
                     for i, s in enumerate(model.tdec_specs)],
    }
    return _check_tree(p, model, "import_hdemucs")


# ----------------------------------------------------------------- #
# Conformer                                                         #
# ----------------------------------------------------------------- #

def import_conformer(state_dict: Mapping[str, object], model,
                     prefix: str = ""):
    """torchaudio-layout ``models.Conformer`` ``state_dict`` → the
    ``models/conformer.py::Conformer`` param pytree.

    Name map (torchaudio ``models/conformer.py`` — verified against a
    torch ``nn``-primitive replica in
    ``tests/test_import_torch_extra.py``; [ref-recon: the contrib
    reference has no model zoo, SURVEY §2]):
    ``conformer_layers.{i}.ffn{1,2}.sequential.{0,1,4}`` (LN, the two
    GEMMs), ``self_attn_layer_norm`` + ``self_attn`` (fused
    ``in_proj`` in q/k/v block order → ``wqkv``/``bqkv``),
    ``conv_module.layer_norm`` + ``conv_module.sequential.{0,2,3,5}``
    (pointwise, depthwise ``(d,1,k)`` → tap-major ``(k,1,d)``,
    BatchNorm1d → frozen affine via ``_fold_bn``, pointwise),
    ``final_layer_norm``.

    Requirements enforced loudly: the model must be built with
    ``conv_norm="affine"`` (BatchNorm's inference form — layernorm
    would silently diverge) and ``input_dim == d_model`` (torchaudio's
    Conformer has no input projection; ``proj`` imports as identity).
    torchaudio's Conformer has no relative-position term, so ``rel``
    imports as the zero table (exactly plain MHA in ``_attention``).
    ``use_group_norm=True`` checkpoints are rejected (GroupNorm is a
    data-dependent normalization, not a foldable affine).
    """
    sd = state_dict if isinstance(state_dict, _SD) \
        else _SD(_strip_prefix(dict(state_dict), "conformer_layers."))
    if prefix and not prefix.endswith("."):
        prefix += "."
    if model.conv_norm != "affine":
        raise ValueError(
            "import_conformer needs a model built with "
            "conv_norm='affine' (BatchNorm1d's inference form); got "
            f"conv_norm={model.conv_norm!r}")
    if model.input_dim != model.d_model:
        raise ValueError(
            "torchaudio's Conformer has no input projection — build "
            f"with input_dim == d_model (got {model.input_dim} vs "
            f"{model.d_model})")

    def _ffn(pre):
        return {"ln": _lnp(sd, f"{pre}.sequential.0"),
                "w1": jnp.asarray(sd.get(f"{pre}.sequential.1.weight").T),
                "b1": jnp.asarray(sd.get(f"{pre}.sequential.1.bias")),
                "w2": jnp.asarray(sd.get(f"{pre}.sequential.4.weight").T),
                "b2": jnp.asarray(sd.get(f"{pre}.sequential.4.bias"))}

    d = model.d_model
    layers = []
    for i in range(model.num_layers):
        lp = f"{prefix}conformer_layers.{i}"
        cm = f"{lp}.conv_module.sequential"
        if not sd.has(f"{cm}.3.running_mean"):
            raise NotImplementedError(
                "use_group_norm=True Conformer checkpoints are not "
                "importable (GroupNorm is not a frozen affine); "
                f"missing '{cm}.3.running_mean'")
        pw1 = sd.get(f"{cm}.0.weight")   # (2d, d, 1)
        dw = sd.get(f"{cm}.2.weight")    # (d, 1, k)
        pw2 = sd.get(f"{cm}.5.weight")   # (d, d, 1)
        layers.append({
            "ffn1": _ffn(f"{lp}.ffn1"),
            "attn": {
                "ln": _lnp(sd, f"{lp}.self_attn_layer_norm"),
                "wqkv": jnp.asarray(
                    sd.get(f"{lp}.self_attn.in_proj_weight").T),
                "bqkv": jnp.asarray(
                    sd.get(f"{lp}.self_attn.in_proj_bias")),
                "wo": jnp.asarray(
                    sd.get(f"{lp}.self_attn.out_proj.weight").T),
                "bo": jnp.asarray(
                    sd.get(f"{lp}.self_attn.out_proj.bias")),
                "rel": jnp.zeros((2 * model.max_distance + 1,
                                  model.num_heads), jnp.float32),
            },
            "conv": {
                "ln": _lnp(sd, f"{lp}.conv_module.layer_norm"),
                "pw1": jnp.asarray(pw1[:, :, 0].T),
                "pb1": jnp.asarray(sd.get(f"{cm}.0.bias")),
                "dw": jnp.asarray(np.transpose(dw, (2, 1, 0))),
                "db": jnp.asarray(sd.get(f"{cm}.2.bias")),
                "norm": _fold_bn(sd, f"{cm}.3"),
                "pw2": jnp.asarray(pw2[:, :, 0].T),
                "pb2": jnp.asarray(sd.get(f"{cm}.5.bias")),
            },
            "ffn2": _ffn(f"{lp}.ffn2"),
            "out_ln": _lnp(sd, f"{lp}.final_layer_norm"),
        })
    p = {"proj": jnp.eye(d, dtype=jnp.float32),
         "proj_b": jnp.zeros((d,), jnp.float32),
         "layers": layers}
    return _check_tree(p, model, "import_conformer")


# ----------------------------------------------------------------- #
# Wav2Letter / DeepSpeech                                           #
# ----------------------------------------------------------------- #

def import_wav2letter(state_dict: Mapping[str, object], model):
    """torchaudio-layout ``models.Wav2Letter`` ``state_dict`` → the
    ``models/asr.py::Wav2Letter`` param pytree.

    torchaudio's model is one conv stack registered in forward order
    (``acoustic_model...``), so the map is positional: every 3-D
    ``.weight`` in state-dict insertion order is a Conv1d kernel
    ``(out, in, k)`` → TIO, paired with its ``.bias`` — robust to the
    flat vs nested-Sequential indexing difference between input types.
    The model must be built with ``compat="torchaudio"`` (symmetric
    paddings + terminal ReLU/log-softmax); torch ``nn``-replica
    forward parity pinned in ``tests/test_import_torch_extra.py``.
    [ref-recon: contrib reference has no model zoo, SURVEY §2]
    """
    if getattr(model, "compat", "tpu") != "torchaudio":
        raise ValueError(
            "import_wav2letter needs a model built with "
            "compat='torchaudio' (torch conv geometry + output "
            f"log-softmax); got compat={model.compat!r}")
    sd = _SD(dict(state_dict))
    convs = [k for k, v in sd.sd.items()
             if k.endswith(".weight") and _np(v).ndim == 3]
    arch = model._arch()
    if len(convs) != len(arch):
        raise ValueError(
            f"import_wav2letter: found {len(convs)} conv kernels, "
            f"model has {len(arch)} layers ({convs[:4]}…)")
    layers = []
    for name, (k, _, cin, cout, _) in zip(convs, arch):
        w = sd.get(name)
        if w.shape != (cout, cin, k):
            raise ValueError(
                f"import_wav2letter: {name} has shape {w.shape}, "
                f"expected {(cout, cin, k)}")
        layers.append({"w": _conv_tio(w),
                       "b": jnp.asarray(
                           sd.get(name[:-len("weight")] + "bias"))})
    return _check_tree({"layers": layers}, model, "import_wav2letter")


def import_deepspeech(state_dict: Mapping[str, object], model):
    """torchaudio-layout ``models.DeepSpeech`` ``state_dict`` → the
    ``models/asr.py::DeepSpeech`` param pytree.

    Name map (torchaudio ``models/deepspeech.py``): ``fc{1..4}.fc``
    (the Linear inside each FullyConnected), ``bi_rnn`` (one
    bidirectional ``nn.RNN`` layer, ``relu`` nonlinearity — the
    ``_reverse`` weights land in the ``bwd`` direction, the two torch
    biases act summed), ``out``.  Forward parity (with
    ``log_probs=True``) pinned against a torch oracle using a REAL
    ``nn.RNN`` in ``tests/test_import_torch_extra.py``.
    """
    sd = _SD(dict(state_dict))

    def rnn_dir(suffix):
        return {"wx": jnp.asarray(
                    sd.get(f"bi_rnn.weight_ih_l0{suffix}").T),
                "wh": jnp.asarray(
                    sd.get(f"bi_rnn.weight_hh_l0{suffix}").T),
                "b": jnp.asarray(
                    sd.get(f"bi_rnn.bias_ih_l0{suffix}")
                    + sd.get(f"bi_rnn.bias_hh_l0{suffix}"))}

    p = {
        "fc1": _linear(sd, "fc1.fc"),
        "fc2": _linear(sd, "fc2.fc"),
        "fc3": _linear(sd, "fc3.fc"),
        "rnn": {"fwd": rnn_dir(""), "bwd": rnn_dir("_reverse")},
        "fc4": _linear(sd, "fc4.fc"),
        "out": _linear(sd, "out"),
    }
    return _check_tree(p, model, "import_deepspeech")


def import_vggish(state_dict: Mapping[str, object], model):
    """``torchvggish`` ``state_dict`` (the layout torchaudio's
    prototype VGGISH bundle ships) → the ``models/vggish.py::VGGish``
    param pytree.

    Name map: ``features.{0,3,6,8,11,13}`` Conv2d ``(out, in, 3, 3)``
    → HWIO ``(3, 3, in, out)``; ``embeddings.{0,2,4}`` Linear
    transposed.  The model flattens NHWC, which equals the torch
    port's ``(H, W, C)`` view ordering, so no index permutation of
    the first FC is needed.  Forward parity pinned against a torch
    ``nn.Sequential`` replica in ``tests/test_vggish.py``.
    """
    sd = _SD(dict(state_dict))
    convs = [{"w": jnp.asarray(np.transpose(
                  sd.get(f"features.{i}.weight"), (2, 3, 1, 0))),
              "b": jnp.asarray(sd.get(f"features.{i}.bias"))}
             for i in (0, 3, 6, 8, 11, 13)]
    fcs = [_linear(sd, f"embeddings.{i}") for i in (0, 2, 4)]
    fcs = [{"w": p["w"], "b": p["b"]} for p in fcs]
    return _check_tree({"convs": convs, "fcs": fcs}, model,
                       "import_vggish")
