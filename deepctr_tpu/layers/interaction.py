"""Interaction layers (FM family, cross networks, attention interactions).

Reference behavior contract: deepctr/layers/interaction.py. Implemented as
flax modules / pure functions over (B, F, E) field-embedding tensors; the
pairwise interactions are expressed as batched matmuls/einsums so XLA keeps
them on the MXU instead of materializing O(F^2) Python loops (the reference
builds per-pair TF subgraphs; here pairs become one gathered contraction).
"""
from __future__ import annotations

import itertools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .activation import activation_fn
from .base import (
    compute_dtype,
    glorot_normal,
    note_mp_preferred,
    glorot_uniform,
    l2_reg,
    ones_init,
    truncated_normal,
    zeros_init,
)

# Reference export parity: the reference interaction.py holds these in its
# namespace and user code imports them from deepctr.layers.interaction.
from .activation import activation_layer  # noqa: F401
from .core import DNN  # noqa: F401
from .utils import concat_func, reduce_mean, reduce_sum, softmax  # noqa: F401


def _pair_indices(n):
    """Static (row, col) index arrays for all i<j field pairs."""
    row, col = [], []
    for i, j in itertools.combinations(range(n), 2):
        row.append(i)
        col.append(j)
    return np.asarray(row, np.int32), np.asarray(col, np.int32)


def _as_fields(inputs):
    """Accept a list of (B,1,E) or a (B,F,E) tensor -> (B,F,E)."""
    if isinstance(inputs, (list, tuple)):
        if len(inputs) == 1:
            return inputs[0]
        return jnp.concatenate(list(inputs), axis=1)
    return inputs


class FM(nn.Module):
    """Factorization Machine pairwise term (reference interaction.py:563-607).

    Input (B, F, E) -> 0.5 * sum_E[(sum_F e)^2 - sum_F e^2] -> (B, 1).
    """

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim
            )
        square_of_sum = jnp.square(jnp.sum(inputs, axis=1, keepdims=True))
        sum_of_square = jnp.sum(inputs * inputs, axis=1, keepdims=True)
        cross_term = square_of_sum - sum_of_square
        return 0.5 * jnp.sum(cross_term, axis=2, keepdims=False)


class AFMLayer(nn.Module):
    """Attentional FM (reference interaction.py:39-160).

    Input: list of (B,1,E) (or (B,F,E)). Pairwise element products ->
    attention MLP -> softmax over pairs -> weighted sum -> projection -> (B,1).
    """

    attention_factor: int = 4
    l2_reg_w: float = 0.0
    dropout_rate: float = 0.0
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        fields = _as_fields(inputs)
        if fields.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % fields.ndim
            )
        F, E = fields.shape[1], fields.shape[2]
        if F < 2:
            raise ValueError("AFMLayer requires at least 2 field inputs")
        row, col = _pair_indices(F)
        p = jnp.take(fields, row, axis=1)  # (B, P, E)
        q = jnp.take(fields, col, axis=1)
        bi_interaction = p * q  # (B, P, E)

        attention_W = self.param("attention_W", glorot_normal(), (E, self.attention_factor))
        attention_b = self.param("attention_b", zeros_init(), (self.attention_factor,))
        projection_h = self.param("projection_h", glorot_normal(), (self.attention_factor, 1))
        projection_p = self.param("projection_p", glorot_normal(), (E, 1))
        l2_reg(self, self.l2_reg_w, attention_W)

        attention_temp = jax.nn.relu(
            jnp.einsum("bpe,ea->bpa", bi_interaction, attention_W) + attention_b
        )
        score = jnp.einsum("bpa,ao->bpo", attention_temp, projection_h)  # (B, P, 1)
        normalized_att_score = jax.nn.softmax(score, axis=1)
        attention_output = jnp.sum(normalized_att_score * bi_interaction, axis=1)  # (B, E)
        if self.dropout_rate:
            attention_output = nn.Dropout(
                rate=self.dropout_rate, deterministic=not training
            )(attention_output)
        return jnp.dot(attention_output, projection_p, preferred_element_type=jnp.float32)


class BiInteractionPooling(nn.Module):
    """NFM bi-interaction pooling (reference interaction.py:163-206).

    Input (B, F, E) -> 0.5 * ((sum_F e)^2 - sum_F e^2) -> (B, 1, E).
    """

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim
            )
        square_of_sum = jnp.square(jnp.sum(inputs, axis=1, keepdims=True))
        sum_of_square = jnp.sum(inputs * inputs, axis=1, keepdims=True)
        return 0.5 * (square_of_sum - sum_of_square)


class CIN(nn.Module):
    """xDeepFM Compressed Interaction Network (reference interaction.py:209-341).

    The reference splits the embedding axis into D unit tensors and runs a
    1-D conv per layer; here each layer is ONE fused einsum contraction
    x0 (B,F0,D) x h_k (B,Fk,D) x W (F0,Fk,S) -> (B,S,D), which XLA maps to a
    single large MXU matmul per layer.
    """

    layer_size: Tuple[int, ...] = (128, 128)
    activation: Any = "relu"
    split_half: bool = True
    l2_reg: float = 1e-5
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if len(self.layer_size) == 0:
            raise ValueError("layer_size must be a list(tuple) of length greater than 1")
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim
            )
        note_mp_preferred()  # CIN feature maps: bf16 is a measured win
        B, F0, D = inputs.shape
        field_nums = [F0]
        hidden = inputs
        final_result = []
        for i, size in enumerate(self.layer_size):
            if self.split_half and i != len(self.layer_size) - 1 and size % 2 > 0:
                raise ValueError(
                    "layer_size must be even number except for the last layer when split_half=True"
                )
            W = self.param(
                "filter" + str(i), glorot_uniform(), (F0, field_nums[-1], size)
            )
            b = self.param("bias" + str(i), zeros_init(), (size,))
            l2_reg(self, self.l2_reg, W)
            # (B,F0,D) x (B,Fk,D) x (F0,Fk,S) -> (B,S,D): fused outer-product +
            # "conv1d" contraction (reference interaction.py:287-306).
            # params cast to the compute dtype at use (bf16 under mixed
            # precision; the (B,*,D) intermediates carry the input's dtype)
            from ..ops import cin_kernel as cin_ops
            if (cin_ops.cin_enabled()
                    and cin_ops.cin_supported(F0, field_nums[-1], size,
                                              B * D)):
                # VMEM-resident outer product: the (B*D, F0*Fk) z
                # intermediate never round-trips HBM (ops/cin_kernel.py)
                z = cin_ops.cin_layer(
                    inputs, hidden, W,
                    interpret=cin_ops.cin_interpret())
            else:
                z = jnp.einsum("bfd,bgd,fgs->bsd", inputs, hidden,
                               W.astype(inputs.dtype))
            z = z + b[None, :, None].astype(inputs.dtype)
            z = activation_fn(self.activation)(z, training=training)
            if self.split_half:
                if i != len(self.layer_size) - 1:
                    next_hidden, direct = jnp.split(z, 2, axis=1)
                else:
                    direct, next_hidden = z, None
            else:
                direct, next_hidden = z, z
            final_result.append(direct)
            if next_hidden is not None:
                field_nums.append(next_hidden.shape[1])
                hidden = next_hidden
        result = jnp.concatenate(final_result, axis=1)  # (B, featuremaps, D)
        return jnp.sum(result, axis=-1)  # (B, featuremaps)


class CrossNet(nn.Module):
    """DCN cross network (reference interaction.py:344-435).

    parameterization 'vector' (DCN) or 'matrix' (DCN-V2). Input (B, units).
    """

    layer_num: int = 2
    parameterization: str = "vector"
    l2_reg: float = 0.0
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 2:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 2 dimensions" % inputs.ndim
            )
        dim = inputs.shape[-1]
        x_0 = inputs  # (B, D)
        x_l = x_0
        for i in range(self.layer_num):
            bias = self.param("bias" + str(i), zeros_init(), (dim,))
            if self.parameterization == "vector":
                kernel = self.param("kernel" + str(i), glorot_normal(), (dim, 1))
                l2_reg(self, self.l2_reg, kernel)
                # x0 * (x_l . w) + b + x_l
                xl_w = jnp.dot(x_l, kernel, preferred_element_type=jnp.float32)  # (B,1)
                x_l = x_0 * xl_w + bias + x_l
            elif self.parameterization == "matrix":
                kernel = self.param("kernel" + str(i), glorot_normal(), (dim, dim))
                l2_reg(self, self.l2_reg, kernel)
                xl_w = jnp.einsum("ij,bj->bi", kernel, x_l)  # W @ x_l
                x_l = x_0 * (xl_w + bias) + x_l
            else:
                raise ValueError("parameterization should be 'vector' or 'matrix'")
        return x_l


class CrossNetMix(nn.Module):
    """DCN-Mix low-rank mixture-of-experts cross net (reference
    interaction.py:438-560). All experts computed in one batched einsum.
    """

    low_rank: int = 32
    num_experts: int = 4
    layer_num: int = 2
    l2_reg: float = 0.0
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 2:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 2 dimensions" % inputs.ndim
            )
        dim = inputs.shape[-1]
        gating_w = self.param("gating", glorot_uniform(), (self.num_experts, dim, 1))
        x_0 = inputs
        x_l = x_0
        for i in range(self.layer_num):
            U = self.param(
                "U_list" + str(i), glorot_normal(), (self.num_experts, dim, self.low_rank)
            )
            V = self.param(
                "V_list" + str(i), glorot_normal(), (self.num_experts, dim, self.low_rank)
            )
            C = self.param(
                "C_list" + str(i), glorot_normal(),
                (self.num_experts, self.low_rank, self.low_rank),
            )
            bias = self.param("bias" + str(i), zeros_init(), (dim,))
            l2_reg(self, self.l2_reg, U, V, C)
            # gate scores from x_l, per expert: (B, E)
            gate = jnp.einsum("bd,edo->be", x_l, gating_w)
            # low-rank path: V^T x -> tanh -> C -> tanh -> U
            v_x = jnp.tanh(jnp.einsum("edr,bd->ber", V, x_l))
            v_x = jnp.tanh(jnp.einsum("ers,bes->ber", C, v_x))
            uv_x = jnp.einsum("edr,ber->bed", U, v_x)  # (B, E, D)
            expert_out = x_0[:, None, :] * (uv_x + bias)  # Hadamard with x0
            moe_out = jnp.einsum(
                "bed,be->bd", expert_out, jax.nn.softmax(gate, axis=1)
            )
            x_l = moe_out + x_l
        return x_l


class InnerProductLayer(nn.Module):
    """PNN inner products of all field pairs (reference interaction.py:610-694).

    Input: list of (B,1,E) or (B,F,E). Output (B,P,1) if reduce_sum else (B,P,E).
    """

    reduce_sum: bool = True

    @nn.compact
    def __call__(self, inputs):
        fields = _as_fields(inputs)
        if fields.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % fields.ndim
            )
        F = fields.shape[1]
        if F < 2:
            raise ValueError("InnerProductLayer requires at least 2 inputs")
        row, col = _pair_indices(F)
        p = jnp.take(fields, row, axis=1)
        q = jnp.take(fields, col, axis=1)
        inner_product = p * q
        if self.reduce_sum:
            inner_product = jnp.sum(inner_product, axis=2, keepdims=True)
        return inner_product


class InteractingLayer(nn.Module):
    """AutoInt multi-head self-attention over fields (reference
    interaction.py:697-790). Heads kept as a batched (B,H,F,D) axis.

    Note the reference applies softmax WITHOUT scaling unless ``scaling``.
    """

    att_embedding_size: int = 8
    head_num: int = 2
    use_res: bool = True
    scaling: bool = False
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs):
        if self.head_num <= 0:
            raise ValueError("head_num must be a int > 0")
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim
            )
        note_mp_preferred()  # (B,H,F,F) scores: bf16 is a measured win
        B, F, E = inputs.shape
        D, H = self.att_embedding_size, self.head_num
        # reference uses the TF-NATIVE init_ops.TruncatedNormal (stddev 1.0,
        # ±2σ truncation), NOT keras's 0.05 default (interaction.py:18+734);
        # the 20x-smaller spread was the round-3 AutoInt quality gap (probe:
        # tools/autoint_parity_probe.py — forward/grad bit-parity, init std
        # 0.044 vs 0.88)
        tn = truncated_normal(stddev=1.0)
        W_Query = self.param("query", tn, (E, D * H))
        W_Key = self.param("key", tn, (E, D * H))
        W_Value = self.param("value", tn, (E, D * H))

        # the (B,H,F,F) score/attention arrays are the layer's HBM traffic;
        # under compute_dtype="bfloat16" they are stored bf16 (softmax math
        # still runs f32 inside the fusion)
        cd = compute_dtype()
        x = inputs.astype(cd)

        from ..ops import attention as fused_ops
        from ..ops import attention_block as blk_ops
        from ..ops import attention_lanes as lanes_ops
        if (lanes_ops.lane_attention_enabled()
                and lanes_ops.lane_core_supported(F, D)
                and not fused_ops.fused_attention_enabled()):
            # batch-on-lanes layout: the tiny (F, D) minors never pad
            # (ops/attention_lanes.py — same physics as the DSIN 3.49x win)
            result = lanes_ops.lane_attention_core(
                x, W_Query, W_Key, W_Value, D, H,
                (1.0 / (D ** 0.5)) if self.scaling else 1.0, cd)
        elif (blk_ops.block_attention_enabled()
              and blk_ops.block_attention_supported(F, F, D, B)
              and not fused_ops.fused_attention_enabled()):
            # medium-F tier: the same layout inside a Pallas block (the
            # pure-XLA lane route measured 0.15x here — fusion failure;
            # the kernel keeps the chain in VMEM, ops/attention_block.py)
            ones = jnp.ones((B, F), jnp.float32)
            result = blk_ops.transformer_block_attention(
                x, x, W_Query, W_Key, W_Value, ones, ones, D, H,
                -1e9, False, compute_dtype=cd,
                interpret=blk_ops.block_attention_interpret(),
                scale=(1.0 / (D ** 0.5)) if self.scaling else 1.0)
        else:
            def project(W):
                p = jnp.dot(x, W.astype(cd),
                            preferred_element_type=jnp.float32)
                # reference splits along last axis into H chunks of size D
                return p.astype(cd).reshape(B, F, H, D).transpose(0, 2, 1, 3)

            Q, K, V = project(W_Query), project(W_Key), project(W_Value)
            if fused_ops.fused_attention_enabled():
                # fused VMEM-resident attention over the field axis: the
                # (B,H,F,F) score/weight arrays never exist in HBM
                result = fused_ops.fused_attention(
                    Q, K, V, key_mask=None,
                    scale=(1.0 / (D ** 0.5)) if self.scaling else 1.0,
                    interpret=fused_ops.fused_attention_interpret())
            else:
                scores = jnp.einsum("bhfd,bhgd->bhfg", Q, K)  # cd storage
                if self.scaling:
                    scores = scores / (D ** 0.5)
                # softmax math in f32 (the casts fuse into the elementwise
                # chain; the stored arrays stay in cd)
                att = jax.nn.softmax(scores.astype(jnp.float32),
                                     axis=-1).astype(cd)
                result = jnp.einsum("bhfg,bhgd->bhfd", att, V)
            result = result.transpose(0, 2, 1, 3).reshape(B, F, H * D)
        if self.use_res:
            W_Res = self.param("res", tn, (E, D * H))
            result = result + jnp.dot(x, W_Res.astype(cd),
                                      preferred_element_type=jnp.float32).astype(cd)
        return jax.nn.relu(result)


class OutterProductLayer(nn.Module):
    """PNN outer products (reference interaction.py:793-934).

    kernel_type 'mat' | 'vec' | 'num'. Input list of (B,1,E) / (B,F,E);
    output (B, P).
    """

    kernel_type: str = "mat"
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs):
        if self.kernel_type not in ("mat", "vec", "num"):
            raise ValueError("kernel_type must be mat,vec or num")
        fields = _as_fields(inputs)
        if fields.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % fields.ndim
            )
        F, E = fields.shape[1], fields.shape[2]
        if F < 2:
            raise ValueError("OutterProductLayer requires at least 2 inputs")
        row, col = _pair_indices(F)
        num_pairs = len(row)
        p = jnp.take(fields, row, axis=1)  # (B,P,E)
        q = jnp.take(fields, col, axis=1)
        if self.kernel_type == "mat":
            kernel = self.param("kernel", glorot_uniform(), (E, num_pairs, E))
            # kp[b,p] = sum_k q[b,p,k] * sum_j p[b,p,j] * kernel[j,p,k]
            return jnp.einsum("bpj,jpk,bpk->bp", p, kernel, q)
        shape = (num_pairs, E) if self.kernel_type == "vec" else (num_pairs, 1)
        kernel = self.param("kernel", glorot_uniform(), shape)
        return jnp.sum(p * q * kernel[None], axis=-1)


class FGCNNLayer(nn.Module):
    """FGCNN feature generation (reference interaction.py:937-1064).

    Conv2D(tanh, same) -> MaxPool(valid) -> Dense(tanh) per stage; each stage
    emits new_maps[i] * pooled_rows new features of the embedding size.
    Input (B,F,E) -> (B, new_feature_num, E).
    """

    filters: Tuple[int, ...] = (14, 16)
    kernel_width: Tuple[int, ...] = (7, 7)
    new_maps: Tuple[int, ...] = (3, 3)
    pooling_width: Tuple[int, ...] = (2, 2)

    @nn.compact
    def __call__(self, inputs):
        if not (
            len(self.filters) == len(self.kernel_width) == len(self.new_maps)
            == len(self.pooling_width)
        ):
            raise ValueError("length of argument must be equal")
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim
            )
        B, F, E = inputs.shape
        x = inputs[:, :, :, None]  # NHWC: (B, F, E, 1)
        new_feature_list = []
        for i in range(len(self.filters)):
            width = self.kernel_width[i]
            pool_w = self.pooling_width[i]
            new_filters = self.new_maps[i]
            x = nn.Conv(
                features=self.filters[i],
                kernel_size=(width, 1),
                strides=(1, 1),
                padding="SAME",
                use_bias=True,
                name="conv%d" % i,
            )(x)
            x = jnp.tanh(x)
            x = nn.max_pool(x, window_shape=(pool_w, 1), strides=(pool_w, 1),
                            padding="VALID")
            rows = x.shape[1]
            flat = x.reshape(B, -1)
            new_result = nn.Dense(
                rows * E * new_filters, use_bias=True,
                kernel_init=glorot_uniform(), name="dense%d" % i,
            )(flat)
            new_result = jnp.tanh(new_result)
            new_feature_list.append(new_result.reshape(B, rows * new_filters, E))
        return jnp.concatenate(new_feature_list, axis=1)


class SENETLayer(nn.Module):
    """FiBiNET squeeze-excitation over fields (reference interaction.py:1067-1139).

    Input list of (B,1,E) (or (B,F,E)); output same structure, rescaled.
    """

    reduction_ratio: int = 3
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        is_list = isinstance(inputs, (list, tuple))
        fields = _as_fields(inputs)
        if fields.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % fields.ndim
            )
        F = fields.shape[1]
        reduction_size = max(1, F // self.reduction_ratio)
        W_1 = self.param("W_1", glorot_normal(), (F, reduction_size))
        W_2 = self.param("W_2", glorot_normal(), (reduction_size, F))
        Z = jnp.mean(fields, axis=-1)  # (B, F)
        A_1 = jax.nn.relu(jnp.dot(Z, W_1, preferred_element_type=jnp.float32))
        A_2 = jax.nn.relu(jnp.dot(A_1, W_2, preferred_element_type=jnp.float32))
        V = fields * A_2[:, :, None]
        if is_list:
            return [V[:, i : i + 1, :] for i in range(F)]
        return V


class BilinearInteraction(nn.Module):
    """FiBiNET bilinear pairwise products (reference interaction.py:1142-1221).

    bilinear_type 'all' (one shared W), 'each' (W per left field), or
    'interaction' (W per pair). Input list of (B,1,E) / (B,F,E) ->
    (B, P, E).
    """

    bilinear_type: str = "interaction"
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs):
        fields = _as_fields(inputs)
        if fields.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % fields.ndim
            )
        F, E = fields.shape[1], fields.shape[2]
        if F < 2:
            raise ValueError("BilinearInteraction requires at least 2 inputs")
        row, col = _pair_indices(F)
        q = jnp.take(fields, col, axis=1)  # (B,P,E) right operands
        if self.bilinear_type == "all":
            W = self.param("bilinear_weight", glorot_normal(), (E, E))
            vdots = jnp.einsum("bfe,eg->bfg", fields, W)  # (B,F,E)
            p = jnp.take(vdots, row, axis=1) * q
        elif self.bilinear_type == "each":
            W = self.param("bilinear_weight", glorot_normal(), (F - 1, E, E))
            vdots = jnp.einsum("bfe,feg->bfg", fields[:, : F - 1, :], W)
            p = jnp.take(vdots, row, axis=1) * q
        elif self.bilinear_type == "interaction":
            W = self.param("bilinear_weight", glorot_normal(), (len(row), E, E))
            left = jnp.take(fields, row, axis=1)  # (B,P,E)
            p = jnp.einsum("bpe,peg->bpg", left, W) * q
        else:
            raise NotImplementedError
        return p


class FieldWiseBiInteraction(nn.Module):
    """FLEN field-wise MF + FM modules (reference interaction.py:1224-1348).

    Input: list of per-group (B, F_i, E) tensors. Output (B, E).
    """

    use_bias: bool = True
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if not isinstance(inputs, (list, tuple)) or len(inputs) < 2:
            raise ValueError(
                "A `Field-Wise Bi-Interaction` layer should be called "
                "on a list of at least 2 inputs"
            )
        num_fields = len(inputs)
        E = inputs[0].shape[-1]
        row, col = _pair_indices(num_fields)
        kernel_mf = self.param("kernel_mf", ones_init(), (len(row), 1))
        kernel_fm = self.param(
            "kernel_fm", nn.initializers.constant(0.5), (num_fields, 1)
        )

        # MF module over per-group summed vectors
        field_wise_vectors = jnp.concatenate(
            [jnp.sum(x, axis=1, keepdims=True) for x in inputs], axis=1
        )  # (B, num_fields, E)
        left = jnp.take(field_wise_vectors, row, axis=1)
        right = jnp.take(field_wise_vectors, col, axis=1)
        h_mf = jnp.sum(left * right * kernel_mf[None], axis=1)  # (B, E)

        # FM module within each group
        field_fm = jnp.concatenate(
            [
                jnp.square(jnp.sum(x, axis=1, keepdims=True))
                - jnp.sum(x * x, axis=1, keepdims=True)
                for x in inputs
            ],
            axis=1,
        )  # (B, num_fields, E)
        h_fm = jnp.sum(field_fm * kernel_fm[None], axis=1)  # (B, E)

        if self.use_bias:
            bias_mf = self.param("bias_mf", zeros_init(), (E,))
            bias_fm = self.param("bias_fm", zeros_init(), (E,))
            h_mf = h_mf + bias_mf
            h_fm = h_fm + bias_fm
        return h_mf + h_fm


class FwFMLayer(nn.Module):
    """Field-weighted FM (reference interaction.py:1351-1425).

    r_ij-weighted pairwise inner products, summed -> (B, 1).
    """

    num_fields: int = 4
    regularizer: float = 1e-6

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim
            )
        if inputs.shape[1] != self.num_fields:
            raise ValueError(
                "Mismatch in number of fields {} and concatenated embeddings dims {}".format(
                    self.num_fields, inputs.shape[1]
                )
            )
        # TF-native TruncatedNormal default (stddev 1.0, interaction.py:1385)
        field_strengths = self.param(
            "field_pair_strengths", truncated_normal(stddev=1.0),
            (self.num_fields, self.num_fields),
        )
        l2_reg(self, self.regularizer, field_strengths)
        # all pairwise inner products at once: (B, F, F)
        ip = jnp.einsum("bfe,bge->bfg", inputs, inputs)
        row, col = _pair_indices(self.num_fields)
        r = field_strengths[row, col]  # (P,)
        pair_ips = ip[:, row, col]  # (B, P)
        return jnp.sum(pair_ips * r[None], axis=1, keepdims=True)


class FEFMLayer(nn.Module):
    """Field-Embedded FM (reference interaction.py:1428-1499).

    Per pair (i,j): x_i (W_ij + W_ij^T) . x_j; output concatenated (B, P).
    All pair matrices held in one (P, E, E) tensor -> a single einsum.
    """

    regularizer: float = 1e-6

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim
            )
        F, E = inputs.shape[1], inputs.shape[2]
        row, col = _pair_indices(F)
        # TF-native TruncatedNormal default (stddev 1.0, interaction.py:1463)
        W = self.param(
            "field_embeddings", truncated_normal(stddev=1.0), (len(row), E, E)
        )
        l2_reg(self, self.regularizer, W)
        W_sym = W + jnp.swapaxes(W, 1, 2)
        xi = jnp.take(inputs, row, axis=1)  # (B,P,E)
        xj = jnp.take(inputs, col, axis=1)
        return jnp.einsum("bpe,pef,bpf->bp", xi, W_sym, xj)


class BridgeModule(nn.Module):
    """EDCN bridge (reference interaction.py:1502-1565).

    bridge_type in {pointwise_addition, hadamard_product, concatenation,
    attention_pooling}. Input: [x, h] both (B, D) -> (B, D).
    """

    bridge_type: str = "hadamard_product"
    activation: Any = "relu"

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if not isinstance(inputs, (list, tuple)) or len(inputs) < 2:
            raise ValueError("A `BridgeModule` layer should be called on a list of 2 inputs")
        x, h = inputs[0], inputs[1]
        if self.bridge_type == "pointwise_addition":
            return x + h
        if self.bridge_type == "hadamard_product":
            return x * h
        dim = x.shape[-1]
        from .core import DNN

        if self.bridge_type == "concatenation":
            out = nn.Dense(dim, kernel_init=glorot_uniform(), name="dense")(
                jnp.concatenate([x, h], axis=-1)
            )
            return activation_fn(self.activation)(out, training=training)
        if self.bridge_type == "attention_pooling":
            a_x = DNN((dim, dim), self.activation, output_activation="softmax",
                      name="dense_x")(x, training=training)
            a_h = DNN((dim, dim), self.activation, output_activation="softmax",
                      name="dense_h")(h, training=training)
            return a_x * x + a_h * h
        raise ValueError("bridge_type must be one of pointwise_addition, "
                         "hadamard_product, concatenation, attention_pooling")
