"""Sequence layers: masked pooling, DIN attention, (AU)GRU-via-scan, BiLSTM,
Transformer, positional encodings, KMaxPooling.

TPU-first design notes:
- Masks are explicit (B, T) arrays — the reference's Keras implicit-mask and
  explicit-length dual paths (layers/sequence.py:41-315) collapse into one
  convention. Helpers accept either a mask or lengths.
- The reference's while-loop RNN driver (contrib/rnn_v2.py:802) becomes
  ``jax.lax.scan`` over the time axis: traced once, static shapes, and the
  per-step matmuls are batched onto the MXU.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import (
    MASK_PADDING,
    compute_dtype,
    note_mp_preferred,
    glorot_uniform,
    l2_reg,
    ones_init,
    sequence_mask,
    truncated_normal,
    zeros_init,
)
from .core import LocalActivationUnit
from .normalization import LayerNormalization

# Reference export parity (reference sequence.py namespace):
from .utils import div, reduce_max, reduce_mean, reduce_sum, softmax  # noqa: F401
# (the reference sequence.py imports its RNN machinery from deepctr.contrib,
# leaking these names into its namespace — mirror that import path)
from ..contrib.rnn import dynamic_rnn  # noqa: F401
from ..contrib.utils import QAAttGRUCell, VecAttGRUCell  # noqa: F401



def _resolve_mask(seq, mask=None, lengths=None, dtype=jnp.float32):
    """(B, T) float mask from an explicit mask, lengths, or all-ones."""
    T = seq.shape[1]
    if mask is not None:
        return mask.astype(dtype)
    if lengths is not None:
        return sequence_mask(lengths, T, dtype)
    return jnp.ones(seq.shape[:2], dtype)


def sequence_pooling(seq, mode="mean", mask=None, lengths=None):
    """Masked sum/mean/max pooling (B,T,E) -> (B,1,E).

    Reference: SequencePoolingLayer, layers/sequence.py:41-120. ``mean``
    divides by the valid length (+1e-8); ``max`` subtracts 1e9 off padding.
    """
    if mode not in ("sum", "mean", "max"):
        raise ValueError("mode must be sum or mean")
    m = _resolve_mask(seq, mask, lengths)  # (B, T)
    m3 = m[:, :, None]
    if mode == "max":
        hist = seq - (1.0 - m3) * 1e9
        return jnp.max(hist, axis=1, keepdims=True)
    hist = jnp.sum(seq * m3, axis=1, keepdims=False)
    if mode == "mean":
        length = jnp.sum(m, axis=-1, keepdims=True)
        hist = hist / (length + 1e-8)
    return hist[:, None, :]


def weighted_sequence(seq, weights, mask=None, lengths=None, weight_normalization=True):
    """Apply per-step weights to a sequence (B,T,E) (reference
    WeightedSequenceLayer, layers/sequence.py:123-197).

    ``weights``: (B,T) or (B,T,1). With normalization, padding gets -2^32+1
    before a softmax over T; otherwise padding weights are zeroed.
    """
    m = _resolve_mask(seq, mask, lengths, dtype=jnp.bool_)
    if weights.ndim == 2:
        weights = weights[:, :, None]
    pad = jnp.full_like(weights, MASK_PADDING) if weight_normalization else jnp.zeros_like(weights)
    weights = jnp.where(m[:, :, None], weights, pad)
    if weight_normalization:
        weights = jax.nn.softmax(weights, axis=1)
    return seq * weights


class SequencePoolingLayer(nn.Module):
    """Class form of :func:`sequence_pooling` for reference-API parity
    (reference layers/sequence.py:41-120). ``supports_masking`` is kept
    for signature parity; masks here are always explicit (pass ``mask``
    or ``lengths``)."""

    mode: str = "mean"
    supports_masking: bool = False

    @nn.compact
    def __call__(self, seq, mask=None, lengths=None):
        return sequence_pooling(seq, self.mode, mask=mask, lengths=lengths)


class WeightedSequenceLayer(nn.Module):
    """Class form of :func:`weighted_sequence` for reference-API parity
    (reference layers/sequence.py:123-197)."""

    weight_normalization: bool = True
    supports_masking: bool = False

    @nn.compact
    def __call__(self, seq, weights, mask=None, lengths=None):
        return weighted_sequence(
            seq, weights, mask=mask, lengths=lengths,
            weight_normalization=self.weight_normalization)


class AttentionSequencePoolingLayer(nn.Module):
    """DIN attention pooling (reference layers/sequence.py:200-315).

    __call__(query (B,1,E), keys (B,T,E), mask/keys_length) ->
    (B,1,E) weighted sum, or (B,1,T) scores when ``return_score``.
    """

    att_hidden_units: Tuple[int, ...] = (80, 40)
    att_activation: Any = "sigmoid"
    weight_normalization: bool = False
    return_score: bool = False

    @nn.compact
    def __call__(self, query, keys, keys_length=None, mask=None, training: bool = False):
        key_masks = _resolve_mask(keys, mask, keys_length, dtype=jnp.bool_)[:, None, :]  # (B,1,T)
        score = LocalActivationUnit(
            tuple(self.att_hidden_units), self.att_activation, l2_reg=0, dropout_rate=0,
            use_bn=False,
        )(query, keys, training=training)  # (B, T, 1)
        outputs = jnp.transpose(score, (0, 2, 1))  # (B, 1, T)
        pad = (
            jnp.full_like(outputs, MASK_PADDING)
            if self.weight_normalization
            else jnp.zeros_like(outputs)
        )
        outputs = jnp.where(key_masks, outputs, pad)
        if self.weight_normalization:
            outputs = jax.nn.softmax(outputs, axis=-1)
        if not self.return_score:
            outputs = jnp.matmul(outputs, keys)  # (B, 1, E)
        return outputs


# ---------------------------------------------------------------------------
# Recurrent cells via lax.scan (replaces contrib/rnn*.py while-loop drivers)
# ---------------------------------------------------------------------------


class _GRUScan(nn.Module):
    """GRU / AGRU / AUGRU over (B, T, E) with TF-cell-compatible math.

    Gate math mirrors tf GRUCell and the attention variants in reference
    contrib/utils.py:149-378:
      r,u = sigmoid([x,h] @ Wg + bg), bg init 1.0
      c   = tanh([x, r*h] @ Wc + bc), bc init 0
      GRU:   h' = u*h + (1-u)*c
      AGRU:  h' = (1-a)*h + a*c                  (att replaces update gate)
      AUGRU: u' = (1-a)*u ; h' = u'*h + (1-u')*c (att scales update gate)

    sequence_length semantics match tf dynamic_rnn: past the valid length the
    state freezes and per-step outputs are zero.
    """

    num_units: int
    gru_type: str = "GRU"

    @nn.compact
    def __call__(self, inputs, lengths=None, att_scores=None):
        B, T, E = inputs.shape
        U = self.num_units
        gate_kernel = self.param("gate_kernel", glorot_uniform(), (E + U, 2 * U))
        gate_bias = self.param("gate_bias", ones_init(), (2 * U,))
        cand_kernel = self.param("candidate_kernel", glorot_uniform(), (E + U, U))
        cand_bias = self.param("candidate_bias", zeros_init(), (U,))

        if lengths is None:
            step_mask = jnp.ones((B, T), jnp.float32)
        else:
            step_mask = sequence_mask(lengths, T)

        from ..ops.gru import (fused_gru_carries, fused_gru_enabled,
                               fused_gru_interpret, fused_gru_supported)

        if fused_gru_enabled() and fused_gru_supported(T, E, U):
            # whole-sequence Pallas kernel (ops/gru.py): weights stay in
            # VMEM across timesteps; carries come back, outputs/final
            # state derive exactly like the scan below
            carries = fused_gru_carries(
                inputs, step_mask, att_scores, gate_kernel, gate_bias,
                cand_kernel, cand_bias, self.gru_type,
                interpret=fused_gru_interpret())
            outputs = carries * step_mask[:, :, None].astype(carries.dtype)
            return outputs, carries[:, -1]

        xs = jnp.swapaxes(inputs, 0, 1)  # (T, B, E)
        ms = jnp.swapaxes(step_mask, 0, 1)[:, :, None]  # (T, B, 1)
        if att_scores is not None:
            a_scores = att_scores.reshape(B, T, -1)[:, :, :1]
            as_t = jnp.swapaxes(a_scores, 0, 1)  # (T, B, 1)
        else:
            as_t = jnp.zeros((T, B, 1), jnp.float32)

        gru_type = self.gru_type

        def step(h, inp):
            x, m, a = inp
            xh = jnp.concatenate([x, h], axis=-1)
            gates = jax.nn.sigmoid(
                jnp.dot(xh, gate_kernel, preferred_element_type=jnp.float32) + gate_bias
            )
            r, u = jnp.split(gates, 2, axis=-1)
            xrh = jnp.concatenate([x, r * h], axis=-1)
            c = jnp.tanh(
                jnp.dot(xrh, cand_kernel, preferred_element_type=jnp.float32) + cand_bias
            )
            if gru_type == "AGRU":
                new_h = (1.0 - a) * h + a * c
            elif gru_type == "AUGRU":
                u = (1.0 - a) * u
                new_h = u * h + (1.0 - u) * c
            else:
                new_h = u * h + (1.0 - u) * c
            new_h = m * new_h + (1.0 - m) * h  # freeze state past seq end
            return new_h, new_h * m  # zero outputs past seq end

        h0 = jnp.zeros((B, U), jnp.float32)
        final_h, outputs = jax.lax.scan(step, h0, (xs, ms, as_t))
        return jnp.swapaxes(outputs, 0, 1), final_h  # (B,T,U), (B,U)


class DynamicGRU(nn.Module):
    """GRU/AIGRU/AGRU/AUGRU driver (reference layers/sequence.py:760-815)."""

    num_units: Optional[int] = None
    gru_type: str = "GRU"
    return_sequence: bool = True

    @nn.compact
    def __call__(self, rnn_input, sequence_length=None, att_score=None):
        units = self.num_units or rnn_input.shape[-1]
        cell_type = self.gru_type if self.gru_type in ("AGRU", "AUGRU") else "GRU"
        if self.gru_type in ("GRU", "AIGRU"):
            att_score = None
        outputs, final_h = _GRUScan(units, cell_type)(
            rnn_input, lengths=sequence_length, att_scores=att_score
        )
        if self.return_sequence:
            return outputs
        return final_h[:, None, :]


class _LSTMScan(nn.Module):
    """Single-direction LSTM (Keras-compatible gate order i,f,c,o).

    bias init ones to match reference BiLSTM(bias_initializer='ones')
    (layers/sequence.py:366-370).
    """

    units: int
    go_backwards: bool = False

    @nn.compact
    def __call__(self, inputs):
        B, T, E = inputs.shape
        U = self.units
        kernel = self.param("kernel", glorot_uniform(), (E, 4 * U))
        rec_kernel = self.param("recurrent_kernel", nn.initializers.orthogonal(), (U, 4 * U))
        bias = self.param("bias", ones_init(), (4 * U,))

        xs = jnp.swapaxes(inputs, 0, 1)
        if self.go_backwards:
            xs = xs[::-1]

        def step(carry, x):
            h, c = carry
            z = (
                jnp.dot(x, kernel, preferred_element_type=jnp.float32)
                + jnp.dot(h, rec_kernel, preferred_element_type=jnp.float32)
                + bias
            )
            zi, zf, zc, zo = jnp.split(z, 4, axis=-1)
            i = jax.nn.sigmoid(zi)
            f = jax.nn.sigmoid(zf)
            c_new = f * c + i * jnp.tanh(zc)
            o = jax.nn.sigmoid(zo)
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        init = (jnp.zeros((B, U), jnp.float32), jnp.zeros((B, U), jnp.float32))
        _, outputs = jax.lax.scan(step, init, xs)
        return jnp.swapaxes(outputs, 0, 1)  # (B, T, U); bw output in reversed time


class BiLSTM(nn.Module):
    """Stacked bidirectional residual LSTM (reference layers/sequence.py:318-428).

    The backward pass runs on the reversed sequence and its output is
    re-reversed before merging, matching the reference's K.reverse Lambda.
    """

    units: int
    layers: int = 2
    res_layers: int = 0
    dropout_rate: float = 0.2
    merge_mode: str = "ave"

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if self.merge_mode not in ("fw", "bw", "sum", "mul", "ave", "concat", None):
            raise ValueError("Invalid merge mode")
        input_fw = inputs
        input_bw = inputs
        for i in range(self.layers):
            fw_in, bw_in = input_fw, input_bw
            if self.dropout_rate and training:
                fw_in = nn.Dropout(rate=self.dropout_rate, deterministic=not training)(fw_in)
                bw_in = nn.Dropout(rate=self.dropout_rate, deterministic=not training)(bw_in)
            output_fw = _LSTMScan(self.units)(fw_in)
            output_bw = _LSTMScan(self.units, go_backwards=True)(bw_in)
            output_bw = output_bw[:, ::-1, :]
            if i >= self.layers - self.res_layers:
                output_fw = output_fw + input_fw
                output_bw = output_bw + input_bw
            input_fw = output_fw
            input_bw = output_bw
        output_fw, output_bw = input_fw, input_bw
        if self.merge_mode == "fw":
            return output_fw
        if self.merge_mode == "bw":
            return output_bw
        if self.merge_mode == "concat":
            return jnp.concatenate([output_fw, output_bw], axis=-1)
        if self.merge_mode == "sum":
            return output_fw + output_bw
        if self.merge_mode == "ave":
            return (output_fw + output_bw) / 2
        if self.merge_mode == "mul":
            return output_fw * output_bw
        return [output_fw, output_bw]


class PositionEncoding(nn.Module):
    """Trainable sin/cos positional table added to input
    (reference layers/sequence.py:654-703)."""

    pos_embedding_trainable: bool = True
    zero_pad: bool = False
    scale: bool = True

    @nn.compact
    def __call__(self, x):
        _, T, num_units = x.shape
        position_enc = np.array(
            [
                [pos / np.power(10000, 2.0 * (i // 2) / num_units) for i in range(num_units)]
                for pos in range(T)
            ]
        )
        position_enc[:, 0::2] = np.sin(position_enc[:, 0::2])
        position_enc[:, 1::2] = np.cos(position_enc[:, 1::2])
        if self.zero_pad:
            position_enc[0, :] = np.zeros(num_units)
        table_init = jnp.asarray(position_enc, jnp.float32)
        if self.pos_embedding_trainable:
            table = self.param("lookup_table", lambda key: table_init)
        else:
            table = table_init
        out = table[None, :, :]
        if self.scale:
            out = out * (num_units ** 0.5)
        return out + x


class BiasEncoding(nn.Module):
    """DSIN session/position/item bias added per session
    (reference layers/sequence.py:706-757). Input: list of (B, T, E)."""

    sess_max_count: int
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs):
        if self.sess_max_count == 1:
            embed_size = inputs.shape[2]
            seq_len_max = inputs.shape[1]
            items = [inputs]
        else:
            embed_size = inputs[0].shape[2]
            seq_len_max = inputs[0].shape[1]
            items = list(inputs)
        init = truncated_normal(stddev=1e-4)
        sess_bias = self.param("sess_bias_embedding", init, (self.sess_max_count, 1, 1))
        seq_bias = self.param("seq_bias_embedding", init, (1, seq_len_max, 1))
        item_bias = self.param("item_bias_embedding", init, (1, 1, embed_size))
        out = [items[i] + item_bias + seq_bias + sess_bias[i] for i in range(self.sess_max_count)]
        return out if self.sess_max_count > 1 else out[0]


class Transformer(nn.Module):
    """Simplified single transformer block (reference layers/sequence.py:431-651).

    Multi-head attention with 4 score types, key/query masking, optional
    ``blinding`` diagonal mask, FFN, residual, LN, and mean/sum/None output
    pooling. Heads are kept as a separate batched axis (B, H, T, D) instead of
    the reference's concat-along-batch trick — same math, better XLA layout.
    """

    att_embedding_size: int = 1
    head_num: int = 8
    dropout_rate: float = 0.0
    use_positional_encoding: bool = True
    use_res: bool = True
    use_feed_forward: bool = True
    use_layer_norm: bool = False
    blinding: bool = True
    seed: int = 1024
    attention_type: str = "scaled_dot_product"
    output_type: Optional[str] = "mean"

    @nn.compact
    def __call__(self, queries, keys, query_masks=None, key_masks=None,
                 query_lengths=None, key_lengths=None, training: bool = False):
        if self.head_num <= 0:
            raise ValueError("head_num must be a int > 0")
        E = queries.shape[-1]
        D, H = self.att_embedding_size, self.head_num
        if D * H != E:
            raise ValueError(
                "att_embedding_size * head_num must equal the last dimension size of "
                "inputs,got %d * %d != %d" % (D, H, E)
            )
        B, T_q = queries.shape[0], queries.shape[1]
        T_k = keys.shape[1]

        q_mask = _resolve_mask(queries, query_masks, query_lengths)  # (B, T_q)
        k_mask = _resolve_mask(keys, key_masks, key_lengths)  # (B, T_k)

        if self.use_positional_encoding:
            queries = PositionEncoding()(queries)
            keys = PositionEncoding()(keys)

        note_mp_preferred()  # (B,H,T,T) attention: bf16 is a measured win
        # reference uses TF-NATIVE init_ops.TruncatedNormal (stddev 1.0,
        # sequence.py:14+490), not keras's 0.05 (round-4 init-parity fix)
        tn = truncated_normal(stddev=1.0)
        W_Query = self.param("query", tn, (E, D * H))
        W_Key = self.param("key", tn, (E, D * H))
        W_Value = self.param("value", tn, (E, D * H))

        # under compute_dtype="bfloat16" the (B,H,T,T) score/weight arrays
        # and projections are stored bf16; masking/softmax math runs f32
        # inside the fusion (MASK_PADDING is bf16-representable)
        cd = compute_dtype()
        queries = queries.astype(cd)
        keys = keys.astype(cd)

        from ..ops import attention_lanes as lanes_ops
        from ..ops import attention as _fused_probe
        if (self.attention_type == "scaled_dot_product"
                and lanes_ops.lane_attention_enabled()
                and lanes_ops.lane_attention_supported(T_q, T_k, D)
                and not _fused_probe.fused_attention_enabled()):
            # batch-on-lanes layout for tiny (T, dk): the (B,H,T,D)/(B,H,
            # T,T) tensors whose padded minors cost ~26x never exist
            # (ops/attention_lanes.py — round-5 DSIN/BST attack)
            rate = float(self.dropout_rate) if training else 0.0
            rng = self.make_rng("dropout") if rate > 0.0 else None
            merged = lanes_ops.lane_attention(
                queries, keys, W_Query, W_Key, W_Value, q_mask, k_mask,
                D, H, MASK_PADDING, self.blinding, dropout_rate=rate,
                dropout_rng=rng, compute_dtype=cd)
            return self._post_attention(merged, queries, B, T_q, D, H,
                                        training, merged_heads=True)

        from ..ops import attention_block as blk_ops
        if (self.attention_type == "scaled_dot_product"
                and blk_ops.block_attention_enabled()
                and blk_ops.block_attention_supported(T_q, T_k, D, B)
                and not _fused_probe.fused_attention_enabled()
                and not (training and self.dropout_rate > 0)):
            # medium-T tier (BST's T=50): same lane-major layout, but the
            # score/softmax/weighted-sum chain runs inside a Pallas block
            # where the accumulators stay in VMEM — XLA's fusion budget
            # was the blocker at this T (ops/attention_block.py). Falls
            # back when attention-weight dropout is active.
            merged = blk_ops.transformer_block_attention(
                queries, keys, W_Query, W_Key, W_Value, q_mask, k_mask,
                D, H, MASK_PADDING, self.blinding, compute_dtype=cd,
                interpret=blk_ops.block_attention_interpret())
            return self._post_attention(merged, queries, B, T_q, D, H,
                                        training, merged_heads=True)

        def project(x, W, T):
            p = jnp.dot(x, W.astype(cd), preferred_element_type=jnp.float32)
            return p.astype(cd).reshape(B, T, H, D).transpose(0, 2, 1, 3)

        Q = project(queries, W_Query, T_q)
        K = project(keys, W_Key, T_k)
        V = project(keys, W_Value, T_k)

        from ..ops import attention as fused_ops
        if (fused_ops.fused_attention_enabled()
                and self.attention_type == "scaled_dot_product"
                and T_q == T_k):
            # fused VMEM-resident attention: the (B,H,T,T) score/weight
            # arrays never exist in HBM. Query-mask zeroing of weight
            # rows == zeroing output rows, applied after the kernel.
            # Attention-weight dropout runs IN-KERNEL (counter-hash keep
            # mask, replayed by the VJP; nn.Dropout semantics, its own
            # RNG stream).
            rate = float(self.dropout_rate) if training else 0.0
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 1 << 24, jnp.int32)
            result = fused_ops.fused_attention(
                Q, K, V, key_mask=k_mask, scale=1.0 / (D ** 0.5),
                blinding=self.blinding, dropout_rate=rate,
                dropout_seed=seed,
                interpret=fused_ops.fused_attention_interpret())
            result = result * q_mask[:, None, :, None].astype(result.dtype)
            return self._post_attention(result, queries, B, T_q, D, H,
                                        training)

        if self.attention_type == "scaled_dot_product":
            scores = jnp.einsum("bhqd,bhkd->bhqk", Q, K) / (D ** 0.5)
        elif self.attention_type == "cos":
            Qn = Q / (jnp.linalg.norm(Q, axis=-1, keepdims=True) + 1e-12)
            Kn = K / (jnp.linalg.norm(K, axis=-1, keepdims=True) + 1e-12)
            scores = jnp.einsum("bhqd,bhkd->bhqk", Qn, Kn) * 20.0
        elif self.attention_type == "ln":
            Qn = LayerNormalization()(Q)
            Kn = LayerNormalization()(K)
            scores = jnp.einsum("bhqd,bhkd->bhqk", Qn, Kn) / (D ** 0.5)
        elif self.attention_type == "additive":
            # flax glorot needs >=2D shapes; keep a leading singleton axis
            b = self.param("b", glorot_uniform(), (1, D))[0]
            v = self.param("v", glorot_uniform(), (1, D))[0]
            hidden = jnp.tanh(Q[:, :, :, None, :] + K[:, :, None, :, :] + b)
            scores = jnp.einsum("bhqkd,d->bhqk", hidden, v)
        else:
            raise ValueError("attention_type must be [scaled_dot_product,cos,ln,additive]")

        key_mask_b = k_mask[:, None, None, :] > 0  # (B,1,1,T_k)
        scores = jnp.where(key_mask_b, scores, MASK_PADDING)
        if self.blinding:
            eye = jnp.eye(T_q, T_k, dtype=bool)[None, None]
            scores = jnp.where(eye, MASK_PADDING, scores)

        scores = scores.astype(jnp.float32)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        weights = jax.nn.softmax(scores, axis=-1).astype(cd)
        weights = weights * q_mask[:, None, :, None].astype(cd)
        if self.dropout_rate:
            weights = nn.Dropout(rate=self.dropout_rate, deterministic=not training)(weights)

        result = jnp.einsum("bhqk,bhkd->bhqd", weights, V)
        return self._post_attention(result, queries, B, T_q, D, H, training)

    def _post_attention(self, result, queries, B, T_q, D, H, training,
                        merged_heads=False):
        """Shared tail (res/LN/FFN/pooling); result is (B,H,T,D), or
        already (B,T,H*D) when ``merged_heads`` (the lane-major path
        merges heads on exit to skip a padded transpose)."""
        E = queries.shape[-1]
        if not merged_heads:
            result = result.transpose(0, 2, 1, 3).reshape(B, T_q, H * D)

        if self.use_res:
            result = result + queries
        ln = LayerNormalization() if self.use_layer_norm else None
        if self.use_layer_norm:
            result = ln(result)
        if self.use_feed_forward:
            fw1 = self.param("fw1", glorot_uniform(), (E, 4 * E))
            fw2 = self.param("fw2", glorot_uniform(), (4 * E, E))
            hidden = jax.nn.relu(
                jnp.dot(result, fw1.astype(result.dtype),
                        preferred_element_type=jnp.float32).astype(result.dtype))
            if self.dropout_rate:
                hidden = nn.Dropout(rate=self.dropout_rate, deterministic=not training)(hidden)
            ffn_out = jnp.dot(hidden, fw2.astype(result.dtype),
                              preferred_element_type=jnp.float32).astype(result.dtype)
            if self.use_res:
                result = result + ffn_out
            else:
                result = ffn_out
            if self.use_layer_norm:
                result = ln(result)

        if self.output_type == "mean":
            return jnp.mean(result, axis=1, keepdims=True)
        if self.output_type == "sum":
            return jnp.sum(result, axis=1, keepdims=True)
        return result


def transformer_for_trace():
    """Transformer class for the current trace: rematerialized when the
    remat scope is on (layers/base.py; CTRModel.compile(remat=True) —
    OFF by default: fresh-process A/Bs on v5e measured it a no-op at CTR
    shapes, XLA already avoids saving these activations). jax.checkpoint
    makes the backward recompute the attention/FFN activations — exact.
    Callers must pass every argument POSITIONALLY (``training`` is
    static argnum 7 — a traced ``training`` would branch nn.Dropout's
    ``deterministic``)."""
    from .base import remat_enabled

    if remat_enabled():
        return nn.remat(Transformer, static_argnums=(7,), prevent_cse=False)
    return Transformer


def k_max_pooling(x, k=1, axis=-1):
    """Top-k along ``axis``, sorted descending (reference KMaxPooling,
    layers/sequence.py:818-874). Uses lax.top_k on the moved axis."""
    moved = jnp.moveaxis(x, axis, -1)
    top, _ = jax.lax.top_k(moved, k)
    return jnp.moveaxis(top, -1, axis)


class KMaxPooling(nn.Module):
    k: int = 1
    axis: int = -1

    @nn.compact
    def __call__(self, x):
        return k_max_pooling(x, self.k, self.axis)
