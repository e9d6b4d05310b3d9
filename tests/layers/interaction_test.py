"""Interaction layer unit tests (reference tests/layers/interaction_test.py)."""
from __future__ import annotations

import numpy as np
import pytest

from deepctr_tpu.layers import interaction as I

from .layer_harness import layer_test

BATCH = 4
FIELDS = 5
EMBED = 8


def _field_list(n=FIELDS, e=EMBED, b=BATCH, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.standard_normal((b, 1, e)).astype(np.float32) for _ in range(n)]


def test_FM():
    layer_test(I.FM, input_shape=(BATCH, FIELDS, EMBED),
               expected_output_shape=(BATCH, 1))


def test_AFMLayer():
    layer_test(I.AFMLayer, kwargs={"attention_factor": 4, "dropout_rate": 0.5},
               input_data=_field_list(), expected_output_shape=(BATCH, 1),
               method_kwargs={"training": True})


def test_BiInteractionPooling():
    out = layer_test(I.BiInteractionPooling, input_shape=(BATCH, FIELDS, EMBED),
                     expected_output_shape=(BATCH, 1, EMBED))
    # parity with FM: sum over E of BiInteraction == FM output
    x = np.random.RandomState(1).standard_normal((BATCH, FIELDS, EMBED)).astype(np.float32)
    bi = layer_test(I.BiInteractionPooling, input_data=x)
    fm = layer_test(I.FM, input_data=x)
    np.testing.assert_allclose(np.asarray(bi).sum(-1), np.asarray(fm), rtol=1e-4)


@pytest.mark.parametrize("split_half", [True, False])
def test_CIN(split_half):
    sizes = (6, 4)
    if split_half:
        fmaps = sizes[0] // 2 + sizes[-1]
    else:
        fmaps = sum(sizes)
    layer_test(I.CIN, kwargs={"layer_size": sizes, "split_half": split_half},
               input_shape=(BATCH, FIELDS, EMBED),
               expected_output_shape=(BATCH, fmaps))


@pytest.mark.parametrize("parameterization", ["vector", "matrix"])
def test_CrossNet(parameterization):
    layer_test(I.CrossNet, kwargs={"layer_num": 2, "parameterization": parameterization},
               input_shape=(BATCH, 16), expected_output_shape=(BATCH, 16))


def test_CrossNetMix():
    layer_test(I.CrossNetMix, kwargs={"low_rank": 4, "num_experts": 2, "layer_num": 2},
               input_shape=(BATCH, 16), expected_output_shape=(BATCH, 16))


@pytest.mark.parametrize("reduce_sum", [True, False])
def test_InnerProductLayer(reduce_sum):
    P = FIELDS * (FIELDS - 1) // 2
    want = (BATCH, P, 1) if reduce_sum else (BATCH, P, EMBED)
    layer_test(I.InnerProductLayer, kwargs={"reduce_sum": reduce_sum},
               input_data=_field_list(), expected_output_shape=want)


@pytest.mark.parametrize("scaling", [True, False])
def test_InteractingLayer(scaling):
    layer_test(I.InteractingLayer,
               kwargs={"att_embedding_size": 4, "head_num": 2, "scaling": scaling},
               input_shape=(BATCH, FIELDS, EMBED),
               expected_output_shape=(BATCH, FIELDS, 8))


@pytest.mark.parametrize("kernel_type", ["mat", "vec", "num"])
def test_OutterProductLayer(kernel_type):
    P = FIELDS * (FIELDS - 1) // 2
    layer_test(I.OutterProductLayer, kwargs={"kernel_type": kernel_type},
               input_data=_field_list(), expected_output_shape=(BATCH, P))


def test_FGCNNLayer():
    # reference compute_output_shape: per stage, pooled = F // pool_w,
    # new += new_maps * pooled (interaction.py:1022-1032)
    F = 8
    filters, widths, new_maps, pools = (3, 2), (2, 2), (2, 2), (2, 2)
    f, total = F, 0
    for nm, pw in zip(new_maps, pools):
        f = f // pw
        total += nm * f
    layer_test(I.FGCNNLayer,
               kwargs={"filters": filters, "kernel_width": widths,
                       "new_maps": new_maps, "pooling_width": pools},
               input_shape=(BATCH, F, EMBED),
               expected_output_shape=(BATCH, total, EMBED))


def test_SENETLayer():
    out = layer_test(I.SENETLayer, kwargs={"reduction_ratio": 2},
                     input_data=_field_list(),
                     expected_output_shape=(BATCH, 1, EMBED))
    assert isinstance(out, list) and len(out) == FIELDS


@pytest.mark.parametrize("bilinear_type", ["all", "each", "interaction"])
def test_BilinearInteraction(bilinear_type):
    P = FIELDS * (FIELDS - 1) // 2
    layer_test(I.BilinearInteraction, kwargs={"bilinear_type": bilinear_type},
               input_data=_field_list(), expected_output_shape=(BATCH, P, EMBED))


def test_FieldWiseBiInteraction():
    rng = np.random.RandomState(0)
    inputs = [rng.standard_normal((BATCH, 3, EMBED)).astype(np.float32)
              for _ in range(3)]
    layer_test(I.FieldWiseBiInteraction, kwargs={"use_bias": True},
               input_data=inputs, expected_output_shape=(BATCH, EMBED))


def test_FwFMLayer():
    layer_test(I.FwFMLayer, kwargs={"num_fields": FIELDS, "regularizer": 1e-6},
               input_shape=(BATCH, FIELDS, EMBED),
               expected_output_shape=(BATCH, 1))


def test_FEFMLayer():
    P = FIELDS * (FIELDS - 1) // 2
    layer_test(I.FEFMLayer, kwargs={"regularizer": 1e-6},
               input_shape=(BATCH, FIELDS, EMBED),
               expected_output_shape=(BATCH, P))


@pytest.mark.parametrize("bridge_type", [
    "pointwise_addition", "hadamard_product", "concatenation", "attention_pooling"])
def test_BridgeModule(bridge_type):
    rng = np.random.RandomState(0)
    inputs = [rng.standard_normal((BATCH, 16)).astype(np.float32) for _ in range(2)]
    layer_test(I.BridgeModule, kwargs={"bridge_type": bridge_type},
               input_data=inputs, expected_output_shape=(BATCH, 16))
