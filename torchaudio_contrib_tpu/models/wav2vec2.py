"""Wav2Vec2 acoustic encoder (Baevski et al. 2020) — pure-functional.

Not in the reference (SURVEY §2 — no model zoo); mirrors torchaudio's
``models.wav2vec2_model`` capability: strided conv feature extractor
(raw waveform → ~50 Hz frames) → feature projection → transformer
encoder with a grouped-conv relative positional embedding; an optional
``aux_out`` linear head makes it a CTC fine-tuning model (torchaudio's
``wav2vec2_*`` + ``aux`` layout).

TPU notes: the extractor is 7 MXU convs; the conv positional embedding
is one grouped conv; attention/FFN are the usual GEMMs with key-side
padding masks.  Lengths propagate through the conv stack with the
exact floor formula so padded batches give identical valid outputs
(pinned by test, ``extractor_mode="layer_norm"``).

Both published architecture variants are supported (round 4, for
torch-checkpoint import — verified against ``transformers``
Wav2Vec2Model/HubertModel/WavLMModel forward parity in
``tests/test_import_torch.py``):

- ``extractor_mode="layer_norm"`` (LARGE/XLS-R): LayerNorm after every
  extractor conv, conv bias.  ``"group_norm"`` (BASE): per-channel
  GroupNorm (num_groups == channels, stats over time) after conv 0
  only, no conv bias.  Group-norm stats include padded time — exactly
  the published behavior, so that mode is NOT padding invariant.
- ``layer_norm_first=True`` (LARGE, "stable layer norm"): pre-LN
  layers, ``enc_ln`` applied ONCE at the encoder output.  ``False``
  (BASE): ``enc_ln`` after the positional conv, post-LN layers
  (``ln1`` after the attention residual, ``ln2`` after the FFN
  residual).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ._common import _dense, _conv, _ln, _ln_p

__all__ = ["Wav2Vec2", "wav2vec2_base", "wav2vec2_large",
           "hubert_base", "hubert_large", "hubert_xlarge",
           "WavLM", "wavlm_base", "wavlm_large",
           "wav2vec2_xlsr_300m", "wav2vec2_xlsr_1b",
           "wav2vec2_xlsr_2b", "wav2vec2_large_lv60k"]


class Wav2Vec2:
    """``apply(params, waveforms (B, T), lengths=None)`` →
    ``(features (B, T', d_model) [or logits if aux_out], out_lengths)``.

    ``extractor_conv_layers`` is ``((channels, kernel, stride), ...)``
    — the default is the standard wav2vec2 stack (total stride 320,
    i.e. 20 ms frames at 16 kHz).
    """

    _DEFAULT_EXTRACTOR = ((512, 10, 5), (512, 3, 2), (512, 3, 2),
                          (512, 3, 2), (512, 3, 2), (512, 2, 2),
                          (512, 2, 2))

    def __init__(self, extractor_conv_layers: Sequence[Tuple[int, int, int]]
                 = _DEFAULT_EXTRACTOR, d_model: int = 768,
                 num_layers: int = 12, num_heads: int = 12,
                 ff_dim: int = 3072, pos_conv_kernel: int = 128,
                 pos_conv_groups: int = 16,
                 aux_out: Optional[int] = None,
                 extractor_mode: str = "layer_norm",
                 conv_bias: Optional[bool] = None,
                 layer_norm_first: bool = True):
        if d_model % num_heads:
            raise ValueError("d_model must be divisible by num_heads")
        if d_model % pos_conv_groups:
            raise ValueError(
                "d_model must be divisible by pos_conv_groups")
        if extractor_mode not in ("layer_norm", "group_norm"):
            raise ValueError(
                "extractor_mode must be 'layer_norm' or 'group_norm'")
        self.extractor = tuple(tuple(l) for l in extractor_conv_layers)
        self.d_model = d_model
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.ff_dim = ff_dim
        self.pos_k = pos_conv_kernel
        self.pos_groups = pos_conv_groups
        self.aux_out = aux_out
        self.extractor_mode = extractor_mode
        # published defaults: layer_norm extractor has conv biases
        # (fairseq LARGE), group_norm has none (fairseq BASE)
        self.conv_bias = (extractor_mode == "layer_norm"
                          if conv_bias is None else bool(conv_bias))
        self.layer_norm_first = bool(layer_norm_first)
        self._config = (self.extractor, d_model, num_layers, num_heads,
                        ff_dim, pos_conv_kernel, pos_conv_groups,
                        aux_out, extractor_mode, self.conv_bias,
                        self.layer_norm_first)

    def init(self, key):
        keys = iter(jax.random.split(
            key, 3 + len(self.extractor) + 4 * self.num_layers))
        cin = 1
        ext = []
        for i, (cout, k, s) in enumerate(self.extractor):
            lp = {"w": _conv(next(keys), k, cin, cout)}
            if self.conv_bias:
                lp["b"] = jnp.zeros((cout,))
            if self.extractor_mode == "layer_norm":
                lp["n"] = _ln_p(cout)
            elif i == 0:
                lp["gn"] = _ln_p(cout)
            ext.append(lp)
            cin = cout
        d = self.d_model
        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "ln1": _ln_p(d),
                "wqkv": _dense(next(keys), d, 3 * d),
                "bqkv": jnp.zeros((3 * d,)),
                "wo": _dense(next(keys), d, d),
                "bo": jnp.zeros((d,)),
                "ln2": _ln_p(d),
                "w1": _dense(next(keys), d, self.ff_dim),
                "b1": jnp.zeros((self.ff_dim,)),
                "w2": _dense(next(keys), self.ff_dim, d),
                "b2": jnp.zeros((d,)),
            })
        p = {
            "extractor": ext,
            "proj_ln": _ln_p(cin),
            "proj": {"w": _dense(next(keys), cin, d),
                     "b": jnp.zeros((d,))},
            "pos_conv": _conv(next(keys), self.pos_k,
                              d // self.pos_groups, d),
            "pos_b": jnp.zeros((d,)),
            "enc_ln": _ln_p(d),
            "layers": layers,
        }
        if self.aux_out is not None:
            p["aux"] = {"w": _dense(next(keys), d, self.aux_out),
                        "b": jnp.zeros((self.aux_out,))}
        return p

    def output_length(self, length):
        """Frame count produced for an input sample count (exact)."""
        for _, k, s in self.extractor:
            length = (length - k) // s + 1
        return length

    def _extract(self, params, x):
        y = x[..., None]                              # (B, T, 1)
        for p, (_, k, s) in zip(params["extractor"], self.extractor):
            # output dtype follows the weights (the MXU accumulates in
            # f32 internally either way), so a bf16-cast parameter
            # tree runs a bf16 activation pipeline (mixed-precision
            # training — PERFORMANCE.md round 5)
            y = jax.lax.conv_general_dilated(
                y, p["w"], (s,), "VALID",
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=p["w"].dtype)
            if "b" in p:
                y = y + p["b"]
            if "n" in p:
                y = _ln(y, p["n"])
            elif "gn" in p:
                # per-channel GroupNorm (num_groups == channels):
                # stats over TIME, incl. any padding — published BASE
                mu = jnp.mean(y, 1, keepdims=True)
                var = jnp.var(y, 1, keepdims=True)
                y = ((y - mu) * jax.lax.rsqrt(var + 1e-5)
                     * p["gn"]["g"] + p["gn"]["b"])
            y = jax.nn.gelu(y, approximate=False)
        return y

    def _attention(self, p, x, pad_mask, pos_bias=None):
        b, t, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = (x @ p["wqkv"] + p["bqkv"]).reshape(b, t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if pos_bias is not None:
            # WavLM gated relative position bias: per-(head, query)
            # gates from the PRE-projection attention input x (post-ln1)
            # reshaped into per-head slices — matching published WavLM /
            # torchaudio's WavLMSelfAttention, where gru_rel_pos_linear
            # is applied to x.view(B, T, H, head_dim), NOT to the
            # projected query — via a (head_dim -> 8) projection folded
            # 2x4 -> sigmoid pair (a, b); the bias added to the
            # logits is (a*(b*const - 1) + 2) * bucket_bias.
            gates = jax.nn.sigmoid(
                (x.reshape(b, t, h, hd) @ p["gru_w"] + p["gru_b"])
                .reshape(b, t, h, 2, 4).sum(-1))    # (B, T, H, 2)
            gate = (gates[..., 0]
                    * (gates[..., 1] * p["gru_const"][None, None, :]
                       - 1.0) + 2.0)                # (B, T, H)
            logits = logits + (jnp.transpose(gate, (0, 2, 1))[..., None]
                               * pos_bias[None])
        if pad_mask is not None:
            logits = jnp.where(pad_mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return out @ p["wo"] + p["bo"]

    def encoder_layer(self, p, x, pad_mask=None, pos_bias=None):
        """ONE transformer encoder layer (public so
        ``parallel.pp.pipeline_apply`` can stream the stack across a
        stage-sharded mesh; ``_encode`` loops this same function)."""
        def _ffn(q, y):
            return (jax.nn.gelu(y @ q["w1"] + q["b1"], approximate=False)
                    @ q["w2"] + q["b2"])

        if self.layer_norm_first:
            x = x + self._attention(p, _ln(x, p["ln1"]), pad_mask,
                                    pos_bias)
            x = x + _ffn(p, _ln(x, p["ln2"]))
        else:
            x = _ln(x + self._attention(p, x, pad_mask, pos_bias),
                    p["ln1"])
            x = _ln(x + _ffn(p, x), p["ln2"])
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        return x

    def _encode(self, params, x, pad_mask, pos_bias=None):
        """Transformer layer stack (WavLM passes the gated relative
        position bias through ``pos_bias``).

        ``layer_norm_first=True`` (published LARGE / "stable layer
        norm"): pre-LN layers, then ``enc_ln`` once at the output.
        ``False`` (published BASE): post-LN layers — ``ln1`` after the
        attention residual, ``ln2`` after the FFN residual (``enc_ln``
        was already applied after the positional conv in ``apply``).
        """
        for p in params["layers"]:
            x = self.encoder_layer(p, x, pad_mask, pos_bias)
        if self.layer_norm_first:
            x = _ln(x, params["enc_ln"])
            if pad_mask is not None:
                x = jnp.where(pad_mask[..., None], x, 0.0)
        return x

    def apply(self, params, waveforms, lengths=None, *,
              frame_mask=None, mask_embedding=None,
              return_features=False):
        """Optional SSL-pretraining hooks: ``frame_mask (B, T') bool``
        + ``mask_embedding (d_model,)`` replace the projected features
        at masked frames with the learned mask token (HuBERT/wav2vec2
        masked prediction); ``return_features=True`` additionally
        returns the raw extractor output (for the feature penalty)."""
        waveforms = jnp.asarray(waveforms)
        if waveforms.ndim != 2:
            raise ValueError("waveforms must be (batch, time)")
        feats = self._extract(params, waveforms)      # (B, T', C)
        t_out = feats.shape[1]
        pad_mask = None
        out_lengths = jnp.full((waveforms.shape[0],), t_out, jnp.int32)
        if lengths is not None:
            out_lengths = self.output_length(
                jnp.asarray(lengths, jnp.int32))
            pad_mask = (jnp.arange(t_out)[None, :]
                        < out_lengths[:, None])
            feats = jnp.where(pad_mask[..., None], feats, 0.0)

        x = (_ln(feats, params["proj_ln"]) @ params["proj"]["w"]
             + params["proj"]["b"])
        if frame_mask is not None:
            if mask_embedding is None:
                raise ValueError("frame_mask needs mask_embedding")
            x = jnp.where(frame_mask[..., None], mask_embedding, x)
        # Padded frames of x are NOT zero (feats there are zero, but
        # _ln(0) = proj_ln.b so x_pad = proj_ln.b @ W + proj.b once
        # trained) — zero them so the positional conv's receptive
        # field sees exactly the zeros its own edge padding supplies,
        # keeping outputs independent of the padded length.
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        # grouped-conv positional embedding (wav2vec2's relative pos).
        # Padding (k//2, (k-1)//2): the published conv pads k//2 both
        # sides and trims the LAST output sample for even kernels, so
        # taps span offsets [-k//2, (k-1)//2] (pinned by HF parity).
        pos = jax.lax.conv_general_dilated(
            x, params["pos_conv"], (1,),
            [(self.pos_k // 2, (self.pos_k - 1) // 2)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=self.pos_groups,
            preferred_element_type=params["pos_conv"].dtype) \
            + params["pos_b"]
        x = x + jax.nn.gelu(pos, approximate=False)
        if not self.layer_norm_first:
            # BASE: one LN between the positional conv and the layers
            x = _ln(x, params["enc_ln"])
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        x = self._encode(params, x, pad_mask)
        if self.aux_out is not None:
            x = x @ params["aux"]["w"] + params["aux"]["b"]
        if return_features:
            return x, out_lengths, feats
        return x, out_lengths

    def __call__(self, params, waveforms, lengths=None):
        return self.apply(params, waveforms, lengths)


def wavlm_buckets(rel, num_buckets: int, max_distance: int):
    """T5-style sign-separated half-exact/half-log bucket ids for an
    integer offset array ``rel = k - q`` (NumPy, trace-time static) —
    shared by :class:`WavLM` and the sequence-parallel path
    (``parallel/spattn.py``), which indexes it by a 1-D offset range
    instead of the (t, t) matrix."""
    import numpy as np
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    arel = np.abs(rel)
    max_exact = nb // 2
    log_large = max_exact + (
        np.log(np.maximum(arel, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)).astype(np.int64)
    out += np.where(arel < max_exact, arel,
                    np.minimum(log_large, nb - 1))
    return out


class WavLM(Wav2Vec2):
    """WavLM (Chen et al. 2022) — a Wav2Vec2 encoder whose
    self-attention adds a *gated relative position bias*
    (torchaudio's ``wavlm_model``/``wavlm_base``/``wavlm_large``,
    ``models/wav2vec2/components.py::WavLMSelfAttention``
    [ref-recon: torchaudio, not in the contrib reference]).

    Relative offsets ``k - q`` are bucketed T5-style (half exact,
    half log-spaced up to ``max_distance``, sign-separated) into a
    learned ``(num_buckets, num_heads)`` bias table shared by all
    layers; each layer gates the shared bias per (head, query) from
    its own query vectors.  The bucket grid is built once per traced
    length at trace time (static shapes), so the jitted step carries
    only the table lookup + one small GEMM for the gates — MXU/VPU
    friendly, no dynamic shapes.

    Same pure-params contract, length propagation, and SSL hooks as
    ``Wav2Vec2`` — ``HuBERTPretrainModel`` composes unchanged.
    """

    def __init__(self, *args, num_buckets: int = 320,
                 max_distance: int = 800, **kwargs):
        super().__init__(*args, **kwargs)
        if num_buckets < 4 or num_buckets % 2:
            raise ValueError("num_buckets must be even and >= 4")
        if max_distance <= num_buckets // 4:
            raise ValueError("max_distance must exceed num_buckets//4")
        self.num_buckets = num_buckets
        self.max_distance = max_distance
        self._config = self._config + (num_buckets, max_distance)

    def init(self, key):
        k_base, k_rel, k_gru = jax.random.split(key, 3)
        p = super().init(k_base)
        p["rel_embed"] = (0.02 * jax.random.normal(
            k_rel, (self.num_buckets, self.num_heads), jnp.float32))
        hd = self.d_model // self.num_heads
        for lp, kk in zip(p["layers"],
                          jax.random.split(k_gru, self.num_layers)):
            lp["gru_w"] = _dense(kk, hd, 8)
            lp["gru_b"] = jnp.zeros((8,))
            lp["gru_const"] = jnp.ones((self.num_heads,))
        return p

    def _buckets(self, t: int):
        """(t, t) int bucket indices for offsets ``k - q`` — static
        (NumPy at trace time; t is a traced shape, always concrete)."""
        import numpy as np
        rel = np.arange(t)[None, :] - np.arange(t)[:, None]
        return wavlm_buckets(rel, self.num_buckets, self.max_distance)

    def _encode(self, params, x, pad_mask, pos_bias=None):
        t = x.shape[1]
        table = params["rel_embed"]                   # (buckets, H)
        pos_bias = jnp.transpose(
            table[jnp.asarray(self._buckets(t))], (2, 0, 1))  # (H,T,T)
        return super()._encode(params, x, pad_mask, pos_bias)


# -- standard configurations (torchaudio's wav2vec2_*/hubert_* zoo).
# BASE geometries use the published group_norm extractor + post-LN
# encoder; LARGE+ use layer_norm extractor (conv bias) + pre-LN
# "stable" encoder — matching fairseq/torchaudio/HF, so checkpoints
# import through utils.import_torch without remapping.
def wav2vec2_base(aux_out: Optional[int] = None) -> Wav2Vec2:
    """BASE: 12 layers, d 768, 12 heads, FFN 3072 (95 M params)."""
    return Wav2Vec2(aux_out=aux_out, extractor_mode="group_norm",
                    layer_norm_first=False)


def wav2vec2_large(aux_out: Optional[int] = None) -> Wav2Vec2:
    """LARGE (LibriSpeech-960): 24 layers, d 1024, 16 heads, FFN 4096
    (317 M params).  fairseq/torchaudio's LARGE keeps the BASE
    normalization scheme — group_norm extractor + post-LN encoder;
    the layer_norm/pre-LN variant is :func:`wav2vec2_large_lv60k`."""
    return Wav2Vec2(d_model=1024, num_layers=24, num_heads=16,
                    ff_dim=4096, aux_out=aux_out,
                    extractor_mode="group_norm",
                    layer_norm_first=False)


def wav2vec2_large_lv60k(aux_out: Optional[int] = None) -> Wav2Vec2:
    """LARGE (LibriVox-60k): LARGE geometry with the layer_norm
    extractor (conv bias) + pre-LN "stable" encoder."""
    return Wav2Vec2(d_model=1024, num_layers=24, num_heads=16,
                    ff_dim=4096, aux_out=aux_out)


def hubert_base(aux_out: Optional[int] = None) -> Wav2Vec2:
    """HuBERT BASE — same encoder architecture as wav2vec2 BASE; the
    HuBERT-ness is the pretraining objective (`HuBERTPretrainModel`)."""
    return Wav2Vec2(aux_out=aux_out, extractor_mode="group_norm",
                    layer_norm_first=False)


def hubert_large(aux_out: Optional[int] = None) -> Wav2Vec2:
    return Wav2Vec2(d_model=1024, num_layers=24, num_heads=16,
                    ff_dim=4096, aux_out=aux_out)


def hubert_xlarge(aux_out: Optional[int] = None) -> Wav2Vec2:
    """XLARGE: 48 layers, d 1280, 16 heads, FFN 5120 (~1 B params)."""
    return Wav2Vec2(d_model=1280, num_layers=48, num_heads=16,
                    ff_dim=5120, aux_out=aux_out)


def wavlm_base(aux_out: Optional[int] = None) -> WavLM:
    """WavLM BASE: wav2vec2 BASE dims + gated rel-pos bias
    (320 buckets, max distance 800)."""
    return WavLM(aux_out=aux_out, extractor_mode="group_norm",
                 layer_norm_first=False)


def wavlm_large(aux_out: Optional[int] = None) -> WavLM:
    """WavLM LARGE: 24 layers, d 1024, 16 heads, FFN 4096."""
    return WavLM(d_model=1024, num_layers=24, num_heads=16,
                 ff_dim=4096, aux_out=aux_out)


def wav2vec2_xlsr_300m(aux_out: Optional[int] = None) -> Wav2Vec2:
    """XLS-R 0.3 B: the LARGE encoder geometry (multilingual
    pretraining is a checkpoint property, not an architecture one)."""
    return Wav2Vec2(d_model=1024, num_layers=24, num_heads=16,
                    ff_dim=4096, aux_out=aux_out)


def wav2vec2_xlsr_1b(aux_out: Optional[int] = None) -> Wav2Vec2:
    """XLS-R 1 B: 48 layers, d 1280, 16 heads, FFN 5120."""
    return Wav2Vec2(d_model=1280, num_layers=48, num_heads=16,
                    ff_dim=5120, aux_out=aux_out)


def wav2vec2_xlsr_2b(aux_out: Optional[int] = None) -> Wav2Vec2:
    """XLS-R 2 B: 48 layers, d 1920, 16 heads, FFN 7680."""
    return Wav2Vec2(d_model=1920, num_layers=48, num_heads=16,
                    ff_dim=7680, aux_out=aux_out)
