"""Prototype Conformer-RNNT factory family
(``conformer_rnnt_model``/``conformer_rnnt_base`` over
``ConformerTranscriber``) [ref-recon: torchaudio
prototype/models/rnnt.py — UNVERIFIED, mount empty]: geometry,
time-reduction semantics, loss + grads, greedy decode through the
shared RNNT machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchaudio_contrib_tpu.models import (conformer_rnnt_base,
                                           conformer_rnnt_model)


def _tiny(num_symbols=16):
    return conformer_rnnt_model(
        input_dim=8, encoding_dim=24, time_reduction_stride=4,
        conformer_input_dim=16, conformer_ffn_dim=32,
        conformer_num_layers=2, conformer_num_heads=2,
        conformer_depthwise_conv_kernel_size=7,
        num_symbols=num_symbols, symbol_embedding_dim=8,
        num_lstm_layers=2, lstm_hidden_dim=12)


def test_transcribe_geometry_and_time_reduction():
    model = _tiny()
    p = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 23, 8)), jnp.float32)
    lengths = jnp.array([23, 17], jnp.int32)
    enc, out_lengths = model.transcribe(p, x, lengths)
    # stride 4: 23 frames -> 5 reduced (remainder dropped)
    assert enc.shape == (2, 5, 24)
    assert out_lengths.tolist() == [5, 4]


def test_loss_and_grads_finite():
    model = _tiny()
    p = model.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 24, 8)), jnp.float32)
    tgts = jnp.asarray(
        np.random.default_rng(2).integers(1, 16, (2, 5)), jnp.int32)

    loss, grads = jax.value_and_grad(
        lambda q: model.loss(q, x, tgts, reduction="mean"))(p)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_greedy_decode_runs():
    model = _tiny()
    p = model.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((2, 24, 8)), jnp.float32)
    hyps = model.greedy_decode(p, x, max_symbols=2)
    assert len(hyps) == 2
    for h in hyps:
        assert all(0 < t < 16 for t in h)


def test_base_configuration():
    model = conformer_rnnt_base()
    assert model.v == 1024
    assert model.enc_dim == 1024
    enc = model.transcriber
    assert enc.stride == 4
    assert enc.conformer.d_model == 256
    assert enc.conformer.num_layers == 16
    assert enc.conformer.ff_dim == 1024
    assert enc.conformer.convolution_first


def test_ffn_divisibility_guard():
    with pytest.raises(ValueError, match="multiple"):
        conformer_rnnt_model(
            input_dim=8, encoding_dim=24, time_reduction_stride=2,
            conformer_input_dim=16, conformer_ffn_dim=40,
            conformer_num_layers=1, conformer_num_heads=2,
            conformer_depthwise_conv_kernel_size=7,
            num_symbols=8, symbol_embedding_dim=8,
            num_lstm_layers=1, lstm_hidden_dim=8)


def test_prototype_namespace_exposes_it():
    from torchaudio_contrib_tpu.prototype import models as PM
    assert PM.conformer_rnnt_base is conformer_rnnt_base
