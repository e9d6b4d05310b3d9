"""Sequence layer unit tests (reference tests/layers/sequence_test.py)."""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from deepctr_tpu.layers import sequence as S

from .layer_harness import layer_test

B, T, E = 4, 7, 8


def _seq(seed=0):
    rng = np.random.RandomState(seed)
    seq = rng.standard_normal((B, T, E)).astype(np.float32)
    lengths = rng.randint(1, T + 1, (B, 1)).astype(np.int32)
    return jnp.asarray(seq), jnp.asarray(lengths)


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_sequence_pooling(mode):
    seq, lengths = _seq()
    out = S.sequence_pooling(seq, mode, lengths=lengths)
    assert out.shape == (B, 1, E)
    # manual check row 0
    L = int(lengths[0, 0])
    valid = np.asarray(seq)[0, :L]
    if mode == "sum":
        want = valid.sum(0)
    elif mode == "mean":
        want = valid.sum(0) / (L + 1e-8)
    else:
        want = valid.max(0)
    np.testing.assert_allclose(np.asarray(out)[0, 0], want, rtol=1e-4, atol=1e-5)


def test_sequence_pooling_invalid_mode():
    seq, lengths = _seq()
    with pytest.raises(ValueError):
        S.sequence_pooling(seq, "median", lengths=lengths)


@pytest.mark.parametrize("weight_normalization", [True, False])
def test_weighted_sequence(weight_normalization):
    seq, lengths = _seq()
    rng = np.random.RandomState(1)
    weights = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    out = S.weighted_sequence(seq, weights, lengths=lengths,
                              weight_normalization=weight_normalization)
    assert out.shape == (B, T, E)
    # padded steps contribute ~nothing after pooling
    mask = np.arange(T)[None, :] < np.asarray(lengths)
    padded = np.asarray(out)[~np.broadcast_to(mask[:, :, None], out.shape).reshape(B, T, E)[:, :, 0]]
    if not weight_normalization:
        assert np.allclose(np.asarray(out)[~mask], 0.0, atol=1e-6)


@pytest.mark.parametrize("weight_normalization,return_score",
                         [(True, False), (False, False), (True, True)])
def test_attention_sequence_pooling(weight_normalization, return_score):
    rng = np.random.RandomState(0)
    query = rng.standard_normal((B, 1, E)).astype(np.float32)
    keys = rng.standard_normal((B, T, E)).astype(np.float32)
    lengths = rng.randint(1, T + 1, (B, 1)).astype(np.int32)

    layer = S.AttentionSequencePoolingLayer(
        weight_normalization=weight_normalization, return_score=return_score)
    variables = layer.init(
        {"params": __import__("jax").random.PRNGKey(0)},
        jnp.asarray(query), jnp.asarray(keys), keys_length=jnp.asarray(lengths),
    )
    out = layer.apply(variables, jnp.asarray(query), jnp.asarray(keys),
                      keys_length=jnp.asarray(lengths))
    if return_score:
        assert out.shape == (B, 1, T)
        if weight_normalization:
            np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-4)
    else:
        assert out.shape == (B, 1, E)


@pytest.mark.parametrize("merge_mode", ["fw", "bw", "sum", "mul", "ave", "concat"])
def test_bilstm(merge_mode):
    want_e = 2 * E if merge_mode == "concat" else E
    layer_test(S.BiLSTM, kwargs={"units": E, "merge_mode": merge_mode, "layers": 2},
               input_shape=(B, T, E), expected_output_shape=(B, T, want_e))


@pytest.mark.parametrize("gru_type", ["GRU", "AGRU", "AUGRU", "AIGRU"])
@pytest.mark.parametrize("return_sequence", [True, False])
def test_dynamic_gru(gru_type, return_sequence):
    import jax

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lengths = jnp.asarray(rng.randint(1, T + 1, (B, 1)).astype(np.int32))
    scores = jnp.asarray(rng.rand(B, T, 1).astype(np.float32))
    layer = S.DynamicGRU(gru_type=gru_type, return_sequence=return_sequence)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, seq,
                           sequence_length=lengths, att_score=scores)
    out = layer.apply(variables, seq, sequence_length=lengths, att_score=scores)
    if return_sequence:
        assert out.shape == (B, T, E)
        # outputs past the valid length are zero
        arr = np.asarray(out)
        for b in range(B):
            L = int(lengths[b, 0])
            assert np.allclose(arr[b, L:], 0.0, atol=1e-6)
    else:
        assert out.shape == (B, 1, E)


def test_dynamic_gru_final_state_is_last_valid_output():
    import jax

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lengths = jnp.asarray(rng.randint(1, T + 1, (B, 1)).astype(np.int32))
    layer_seq = S.DynamicGRU(return_sequence=True)
    layer_fin = S.DynamicGRU(return_sequence=False)
    v = layer_seq.init({"params": jax.random.PRNGKey(0)}, seq,
                       sequence_length=lengths)
    outs = layer_seq.apply(v, seq, sequence_length=lengths)
    fin = layer_fin.apply(v, seq, sequence_length=lengths)
    for b in range(B):
        L = int(lengths[b, 0])
        np.testing.assert_allclose(np.asarray(outs)[b, L - 1],
                                   np.asarray(fin)[b, 0], rtol=1e-5)


@pytest.mark.parametrize("attention_type", ["scaled_dot_product", "cos", "ln",
                                            "additive"])
def test_transformer(attention_type):
    import jax

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lengths = jnp.asarray(rng.randint(1, T + 1, (B, 1)).astype(np.int32))
    layer = S.Transformer(att_embedding_size=E // 2, head_num=2,
                          attention_type=attention_type, blinding=False,
                          use_layer_norm=True, output_type="mean")
    variables = layer.init({"params": jax.random.PRNGKey(0)}, q, q,
                           query_lengths=lengths, key_lengths=lengths)
    out = layer.apply(variables, q, q, query_lengths=lengths, key_lengths=lengths)
    assert out.shape == (B, 1, E)
    assert np.all(np.isfinite(np.asarray(out)))


def test_position_encoding():
    layer_test(S.PositionEncoding, kwargs={}, input_shape=(B, T, E),
               expected_output_shape=(B, T, E))


def test_bias_encoding():
    rng = np.random.RandomState(0)
    sessions = [rng.standard_normal((B, T, E)).astype(np.float32) for _ in range(3)]
    out = layer_test(S.BiasEncoding, kwargs={"sess_max_count": 3},
                     input_data=sessions)
    assert isinstance(out, list) and len(out) == 3


def test_kmax_pooling():
    x = jnp.asarray(np.random.RandomState(0).standard_normal((B, T, E)).astype(np.float32))
    out = S.k_max_pooling(x, k=3, axis=1)
    assert out.shape == (B, 3, E)
    want = np.sort(np.asarray(x), axis=1)[:, ::-1, :][:, :3, :]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_sequence_pooling_layer_class_matches_function(mode):
    # class form kept for reference-API parity (ref layers/sequence.py:41-120)
    seq, lengths = _seq(3)
    layer = S.SequencePoolingLayer(mode=mode)
    out = layer.apply({}, seq, lengths=lengths)
    want = S.sequence_pooling(seq, mode, lengths=lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))


@pytest.mark.parametrize("weight_normalization", [True, False])
def test_weighted_sequence_layer_class_matches_function(weight_normalization):
    seq, lengths = _seq(4)
    w = jnp.asarray(np.random.RandomState(5).rand(B, T).astype(np.float32))
    layer = S.WeightedSequenceLayer(weight_normalization=weight_normalization)
    out = layer.apply({}, seq, w, lengths=lengths)
    want = S.weighted_sequence(seq, w, lengths=lengths,
                               weight_normalization=weight_normalization)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))
