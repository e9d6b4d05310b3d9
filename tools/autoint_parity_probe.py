"""AutoInt quality-gap isolation (VERDICT r3 next-steps #2).

Ports ONE set of reference TF AutoInt weights into the flax AutoInt and
compares, on the exact goldens fixture (criteo sample, dnn (64,32),
edim 4):

  1. forward predictions on the full 200-row batch (bit-parity target)
  2. gradients of the full training loss (BCE mean + L2 reg losses)
  3. a short full-batch Adam trajectory (losses step by step), ours run
     under BOTH optax.adam (bias-corrected eps inside the sqrt-corrected
     denominator) and the TF-legacy-Adam formulation
     (lr_t = lr*sqrt(1-b2^t)/(1-b1^t); denom sqrt(v)+eps, uncorrected v)

Run:
  TF_USE_LEGACY_KERAS=1 TF_CPP_MIN_LOG_LEVEL=3 \
  PYTHONPATH=/root/repo:/root/reference JAX_PLATFORMS=cpu \
  python tools/autoint_parity_probe.py [steps]
"""
from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from sklearn.preprocessing import MinMaxScaler

EDIM = 4
SEED = 1024


def criteo_frames():
    data = pd.read_csv("/root/reference/examples/criteo_sample.txt")
    sparse = ["C%d" % i for i in range(1, 27)]
    dense = ["I%d" % i for i in range(1, 14)]
    data[sparse] = data[sparse].fillna("-1")
    data[dense] = data[dense].fillna(0)
    for f in sparse:
        data[f], _ = pd.factorize(data[f])
    data[dense] = MinMaxScaler().fit_transform(data[dense])
    return data, sparse, dense


def build_tf(data, sparse, dense):
    from deepctr.feature_column import DenseFeat, SparseFeat, get_feature_names
    from deepctr.models import AutoInt

    cols = [SparseFeat(f, int(data[f].max() + 1), EDIM) for f in sparse]
    cols += [DenseFeat(f, 1) for f in dense]
    model = AutoInt(cols, cols, dnn_hidden_units=(64, 32), seed=SEED)
    x = {n: data[n].values for n in get_feature_names(cols)}
    y = data["label"].values.astype("float32")
    return model, x, y


def build_ours(data, sparse, dense):
    from deepctr_tpu import DenseFeat, SparseFeat, get_feature_names
    from deepctr_tpu.models import AutoInt

    cols = [SparseFeat(f, int(data[f].max() + 1), EDIM) for f in sparse]
    cols += [DenseFeat(f, 1) for f in dense]
    model = AutoInt(cols, cols, dnn_hidden_units=(64, 32), seed=SEED)
    model.compile("adam", "binary_crossentropy")
    x = {n: data[n].values for n in get_feature_names(cols)}
    y = data["label"].values.astype("float32")
    return model, x, y


def tf_weight_map(model):
    return {w.name: v for w, v in zip(model.weights, model.get_weights())}


def map_weights_into_flax(tfw, params, sparse):
    """Overwrite the flax param tree with the TF reference weights."""
    import flax
    import jax.numpy as jnp

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))

    def find_tf(prefix):
        hits = [k for k in tfw if k.startswith(prefix)]
        if len(hits) != 1:
            raise KeyError("tf lookup %r -> %r" % (prefix, hits))
        return tfw[hits[0]]

    mapped, missed = {}, []
    for path, leaf in flat.items():
        key = "/".join(str(p) for p in path)
        try:
            w = _map_one(key, path, leaf, find_tf, sparse)
        except KeyError as e:
            missed.append((key, tuple(leaf.shape), str(e)))
            w = None
        if w is not None:
            w = np.asarray(w, np.float32)
            assert w.shape == tuple(leaf.shape), (key, w.shape, leaf.shape)
            mapped[path] = jnp.asarray(w)
        else:
            mapped[path] = leaf
    for key, shape, err in missed:
        print("UNMAPPED %-60s %s %s" % (key, shape, err))
    return flax.traverse_util.unflatten_dict(mapped), len(missed)


def _map_one(key, path, leaf, find_tf, sparse):
    # folded wide-tower dim-1 tables: 'embeddings/emb_linear_CX'
    if "emb_linear_" in key:
        feat = key.split("emb_linear_")[-1]
        return find_tf("linear0sparse_emb_" + feat + "/embeddings")
    # deep embedding tables: 'embeddings/emb_CX' <- TF 'sparse_emb_CX'
    if "/emb_" in key:
        feat = key.split("emb_")[-1]
        return find_tf("sparse_emb_" + feat + "/embeddings")
    if "interacting_" in key:
        i = key.split("interacting_")[1].split("/")[0]
        name = key.split("/")[-1]
        layer = ("interacting_layer/" if i == "0"
                 else "interacting_layer_%s/" % i)
        return find_tf(layer + name)
    if "dnn/" in key:
        return find_tf("dnn/" + key.split("/")[-1])
    if "stack_logit" in key:
        return find_tf("dense/kernel")
    if "global_bias" in key:
        return find_tf("prediction_layer/global_bias")
    if "linear" in key and "kernel" in key:
        return find_tf("linear/linear_kernel")
    raise KeyError("no rule")


def main(steps=40):
    import os

    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    import tensorflow as tf

    import jax
    import jax.numpy as jnp

    data, sparse, dense = criteo_frames()
    tf_model, xtf, y = build_tf(data, sparse, dense)
    our_model, xus, _ = build_ours(data, sparse, dense)

    from deepctr_tpu.features import canonicalize_batch

    xc = canonicalize_batch(xus, our_model.feature_columns)
    our_model._ensure_built(xc)

    print("== TF weights ==")
    tfw = tf_weight_map(tf_model)
    for k, v in sorted(tfw.items()):
        print("  %-60s %s" % (k, v.shape))
    print("== flax params ==")
    import flax

    flat = flax.traverse_util.flatten_dict(our_model.state.params)
    for p, v in sorted(flat.items()):
        print("  %-60s %s" % ("/".join(map(str, p)), v.shape))

    params, n_missed = map_weights_into_flax(
        tfw, our_model.state.params, sparse)
    our_model.state = our_model.state.replace(params=params)
    print("unmapped leaves: %d" % n_missed)

    # ---- forward parity ----
    p_tf = tf_model.predict(xtf, batch_size=len(y), verbose=0).reshape(-1)
    p_us = np.asarray(our_model.predict(xus, batch_size=len(y))).reshape(-1)
    print("forward: max|diff|=%.3e mean|diff|=%.3e" % (
        np.abs(p_tf - p_us).max(), np.abs(p_tf - p_us).mean()))

    # ---- gradient parity (full loss = bce mean + reg losses) ----
    with tf.GradientTape() as tape:
        out = tf_model(xtf_tensors(xtf), training=True)
        bce = tf.keras.losses.binary_crossentropy(
            y.reshape(-1, 1), out)
        loss_tf = tf.reduce_mean(bce) + tf.add_n(tf_model.losses)
    tf_grads = dict(zip([w.name for w in tf_model.trainable_weights],
                        tape.gradient(loss_tf,
                                      tf_model.trainable_weights)))
    print("tf loss: %.6f" % float(loss_tf))

    module = our_model.module
    state = our_model.state
    yb = jnp.asarray(y.reshape(-1, 1))
    wb = jnp.ones((len(y),), jnp.float32)
    xb = {k: jnp.asarray(v) for k, v in xc.items()}

    def loss_fn(p):
        variables = {"params": p, **state.model_state}
        out, mutated = module.apply(
            variables, xb, training=True, mutable=["losses", "batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        task, _ = our_model._loss_from_outputs(out, yb, wb)
        from deepctr_tpu.training.model import _sum_losses_collection

        return task + _sum_losses_collection(mutated)

    loss_us, grads = jax.value_and_grad(loss_fn)(state.params)
    print("our loss: %.6f  (diff %.3e)" % (
        float(loss_us), abs(float(loss_us) - float(loss_tf))))

    # spot-compare a few gradient leaves through the same mapping rules
    gflat = flax.traverse_util.flatten_dict(grads)
    def gf(*frags):
        hits = [k for k in tf_grads if all(f in k for f in frags)]
        return np.asarray(tf_grads[hits[0]]) if len(hits) == 1 else None
    checks = []
    for p, g in gflat.items():
        key = "/".join(map(str, p))
        tfg = None
        if "interacting_0" in key:
            tfg = gf("interacting_layer/" + key.split("/")[-1])
        elif "interacting_2" in key:
            tfg = gf("interacting_layer_2/" + key.split("/")[-1])
        elif "emb_C13" in key and "lin" not in key:
            tfg = gf("sparse_emb_C13/")
        elif "stack_logit" in key:
            tfg = gf("dense/kernel")
        if tfg is not None:
            d = np.abs(np.asarray(g) - tfg)
            checks.append((key, float(d.max())))
    for k, d in checks:
        print("grad %-50s max|diff|=%.3e" % (k, d))

    # ---- short full-batch Adam trajectory ----
    import tensorflow as tf2

    tf_model.compile(tf.keras.optimizers.Adam(), "binary_crossentropy")
    tf_losses = []
    for t in range(steps):
        hist = tf_model.fit(xtf, y, batch_size=len(y), epochs=1, verbose=0,
                            shuffle=False)
        tf_losses.append(hist.history["loss"][-1])

    import optax

    for label, opt in (
            ("optax.adam(eps=1e-7)", optax.adam(0.001, eps=1e-7)),
            ("tf-legacy-adam", _tf_legacy_adam(0.001)),
    ):
        p = jax.tree.map(lambda a: a, params)  # fresh copy of TF init
        ostate = opt.init(p)
        losses = []
        for t in range(steps):
            lv, g = jax.value_and_grad(loss_fn2(module, state, xb, yb, wb,
                                                our_model))(p)
            up, ostate = opt.update(g, ostate, p)
            p = optax.apply_updates(p, up)
            losses.append(float(lv))
        print("trajectory %s:" % label)
        print("  tf : %s" % np.round(tf_losses[:10], 5).tolist())
        print("  us : %s" % np.round(losses[:10], 5).tolist())
        print("  tf[-1]=%.5f us[-1]=%.5f" % (tf_losses[-1], losses[-1]))


def loss_fn2(module, state, xb, yb, wb, our_model):
    import jax

    def fn(p):
        variables = {"params": p, **state.model_state}
        out, mutated = module.apply(
            variables, xb, training=True, mutable=["losses", "batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        task, _ = our_model._loss_from_outputs(out, yb, wb)
        from deepctr_tpu.training.model import _sum_losses_collection

        return task + _sum_losses_collection(mutated)

    return fn


def _tf_legacy_adam(lr, b1=0.9, b2=0.999, eps=1e-7):
    """Keras legacy Adam: lr_t = lr*sqrt(1-b2^t)/(1-b1^t); denominator is
    sqrt(v) + eps on the UNCORRECTED v (optax corrects v inside the sqrt
    and adds eps after — a ~31x larger effective eps at t=1)."""
    import jax
    import jax.numpy as jnp
    import optax

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return (z, jax.tree.map(jnp.zeros_like, params), jnp.zeros((), jnp.int32))

    def update(grads, s, params=None):
        m, v, t = s
        t = t + 1
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, v, grads)
        lr_t = lr * jnp.sqrt(1 - b2 ** t.astype(jnp.float32)) / (
            1 - b1 ** t.astype(jnp.float32))
        ups = jax.tree.map(
            lambda mm, vv: -lr_t * mm / (jnp.sqrt(vv) + eps), m, v)
        return ups, (m, v, t)

    return optax.GradientTransformation(init, update)


def xtf_tensors(x):
    import tensorflow as tf

    return {k: tf.convert_to_tensor(np.asarray(v).reshape(len(v), -1))
            for k, v in x.items()}


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
