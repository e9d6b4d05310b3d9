"""deepctr_tpu.contrib: importable cells + dynamic_rnn (VERDICT r4 item 5).

Reference users build custom DIEN variants from
``deepctr.contrib.utils.QAAttGRUCell/VecAttGRUCell`` +
``deepctr.contrib.rnn(_v2).dynamic_rnn``
(/root/reference/deepctr/contrib/utils.py:149,264, rnn_v2.py:802).
These tests pin the import surface, the reference dynamic_rnn semantics
(att slicing, length copy-through, time_major), and bit-exact parity with
the built-in DynamicGRU layer (same math, same param names).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from deepctr_tpu.contrib.rnn import dynamic_rnn
from deepctr_tpu.contrib.utils import QAAttGRUCell, VecAttGRUCell
from deepctr_tpu.layers.sequence import DynamicGRU


def _data(B=4, T=6, E=5, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, T, E), jnp.float32)
    att = jnp.asarray(rs.rand(B, T, 1), jnp.float32)
    lens = jnp.asarray(rs.randint(1, T + 1, size=(B,)))
    return x, att, lens


class _CellRNN(nn.Module):
    units: int
    kind: str

    @nn.compact
    def __call__(self, x, lengths=None, att=None, time_major=False):
        cell = (QAAttGRUCell if self.kind == "AGRU" else VecAttGRUCell)(
            self.units)
        return dynamic_rnn(cell, x, att_scores=att,
                           sequence_length=lengths, time_major=time_major)


def _remap_by_leaf_name(src_tree, dst_tree):
    """Both trees hold the same 4 leaf names (gate/candidate kernel+bias)."""
    by_name = {str(p[-1]): v for p, v in tu.tree_flatten_with_path(src_tree)[0]}
    return tu.tree_map_with_path(lambda p, v: by_name[str(p[-1])], dst_tree)


def test_import_surface():
    import deepctr_tpu.contrib as contrib
    from deepctr_tpu.contrib.rnn_v2 import dynamic_rnn as v2
    from deepctr_tpu.layers import sequence as seq

    assert contrib.dynamic_rnn is dynamic_rnn and v2 is dynamic_rnn
    # reference sequence.py namespace leaks the contrib names; ours mirrors
    assert seq.dynamic_rnn is dynamic_rnn
    assert seq.QAAttGRUCell is QAAttGRUCell
    assert seq.VecAttGRUCell is VecAttGRUCell
    for cls in (QAAttGRUCell, VecAttGRUCell):
        c = cls(7)
        assert c.state_size == 7 and c.output_size == 7
        assert c.zero_state(3).shape == (3, 7)


@pytest.mark.parametrize("kind", ["AGRU", "AUGRU"])
def test_cell_dynamic_rnn_matches_dynamicgru(kind):
    x, att, lens = _data()
    m = _CellRNN(8, kind)
    p = m.init(jax.random.PRNGKey(0), x, lens, att)
    out, fin = m.apply(p, x, lens, att)

    g = DynamicGRU(8, kind)
    pg = g.init(jax.random.PRNGKey(1), x, lens, att)
    og = g.apply(_remap_by_leaf_name(p, pg), x, lens, att)
    # identical math/params; only scan-wrapper fusion order differs (ULP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(og), atol=1e-6)
    # outputs zero past each row's length; final state frozen at the last
    # valid step (reference _rnn_step copy-through semantics)
    for b, L in enumerate(np.asarray(lens)):
        assert np.all(np.asarray(out[b, L:]) == 0.0)
        # fin and out[L-1] are the same value computed in two fused
        # expressions (carry vs carry*mask output) — ULP-equal only
        np.testing.assert_allclose(np.asarray(fin[b]),
                                   np.asarray(out[b, L - 1]), atol=1e-6)


def test_time_major_and_no_length():
    x, att, _ = _data()
    m = _CellRNN(8, "AUGRU")
    p = m.init(jax.random.PRNGKey(0), x, None, att)
    out, fin = m.apply(p, x, None, att)
    xt = jnp.swapaxes(x, 0, 1)
    att_t = att  # att_scores stay batch-major per reference slicing
    out_t, fin_t = m.apply(p, xt, None, att_t, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.swapaxes(out_t, 0, 1)),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(fin), np.asarray(fin_t))
    np.testing.assert_array_equal(np.asarray(fin), np.asarray(out[:, -1]))


def test_generic_cell_without_attention():
    class PlainCell(nn.Module):
        num_units: int

        @nn.compact
        def __call__(self, x, h):
            k = self.param("k", nn.initializers.glorot_uniform(),
                           (x.shape[-1] + self.num_units, self.num_units))
            nh = jnp.tanh(jnp.concatenate([x, h], -1) @ k)
            return nh, nh

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, lens):
            return dynamic_rnn(PlainCell(3), x, sequence_length=lens)

    x, _, lens = _data(E=4)
    m = M()
    p = m.init(jax.random.PRNGKey(0), x, lens)
    out, fin = m.apply(p, x, lens)
    assert out.shape == (4, 6, 3) and fin.shape == (4, 3)
    for b, L in enumerate(np.asarray(lens)):
        assert np.all(np.asarray(out[b, L:]) == 0.0)


def test_att_cell_requires_score():
    cell = VecAttGRUCell(4)
    x = jnp.zeros((2, 4))
    with pytest.raises(ValueError, match="att_score"):
        cell.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 4)), None)
