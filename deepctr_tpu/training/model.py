"""CTRModel: the Keras-fit-equivalent training driver over a flax module.

Replaces the reference's Keras ``model.compile/fit/predict/evaluate`` path
(docs Quick-Start steps 1-4, exercised at tests/utils.py:356-381) with a
jit-compiled train step:

- loss = task loss(es) + every leaf of the module's 'losses' collection
  (l2 regularization terms + model auxiliary losses, e.g. DIEN)
- optimizer = any optax transform (or a name); state held in a TrainState
- static-shape batching (training/data.py) -> exactly one XLA program per
  batch size
- optional ``jax.sharding.Mesh``: batch sharded over 'data', embedding tables
  row-sharded over 'model' (parallel/sharding.py)
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..features import canonicalize_batch, get_feature_names
from . import data as data_lib
from . import metrics as metrics_lib
from . import optimizers as opt_lib


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    model_state: Any  # non-param collections (e.g. batch_stats)
    step: jnp.ndarray
    embed_state: Any = None  # sparse-update rowwise-adagrad accumulators


def _sum_losses_collection(mutated):
    total = jnp.zeros((), jnp.float32)
    if "losses" in mutated:
        for leaf in jax.tree.leaves(mutated["losses"]):
            total = total + jnp.sum(leaf)
    return total


class History:
    def __init__(self):
        self.history: Dict[str, List[float]] = {}
        self.epoch: List[int] = []

    def append(self, epoch, logs):
        self.epoch.append(epoch)
        for k, v in logs.items():
            self.history.setdefault(k, []).append(v)


class CTRModel:
    """Holds a flax module + variables and drives train/eval/predict.

    ``module.__call__(features_dict, training: bool)`` must return predictions
    of shape (B, num_outputs).
    """

    def __init__(self, module, feature_columns, task="binary", num_outputs=1, seed=1024,
                 output_names=None):
        self.module = module
        self.feature_columns = list(feature_columns)
        self.feature_names = get_feature_names(self.feature_columns)
        self.task = task
        self.num_outputs = num_outputs
        self.output_names = output_names
        self.seed = seed
        self.state: Optional[TrainState] = None
        self.optimizer = None
        self.loss_fns: List[Callable] = []
        self.loss_weights: Optional[Sequence[float]] = None
        self.metrics: List = []
        self.mesh = None
        self.sparse_embedding_updates = False
        self.embedding_lr = 0.01
        self.embedding_dtype = None
        self.compute_dtype = None
        self.pallas_scatter_updates = False
        self.bf16_stochastic_rounding = False
        self.sharded_lookup = None
        self.lookup_capacity = None
        self.remat = None
        self._gather_plan = None
        self.history = History()
        self._train_step = None
        self._multi_train_step = None
        self._multi_k = 0
        self._predict_step = None
        self._rng = jax.random.PRNGKey(seed)
        # set by model factories for save_model/load_model round-trips
        self._build_spec = None

    # ------------------------------------------------------------------
    # compile / build
    # ------------------------------------------------------------------
    def compile(self, optimizer="adam", loss=None, metrics=None, loss_weights=None,
                mesh=None, sparse_embedding_updates=False, embedding_lr=0.01,
                embedding_dtype=None, pallas_scatter_updates=False,
                fused_gather_pool=None, bf16_stochastic_rounding=False,
                compute_dtype=None, fused_attention=None, fused_gru=None,
                sharded_lookup=None, lookup_capacity=None, remat=None):
        """``sparse_embedding_updates=True`` enables the sparse embedding
        engine (training/sparse_embedding.py): embedding-table gradients stay
        row-sparse and tables update in-step with row-wise Adagrad at
        ``embedding_lr``; ``optimizer`` then only drives the dense params.
        ``"auto"`` applies the measured crossover policy (BASELINE.md):
        the engine turns on when any table has >= 1M rows, where its
        O(touched-rows) updates beat dense full-table optimizer passes
        (and are the only feasible path once adam state outgrows HBM).

        ``embedding_dtype="bfloat16"`` stores embedding tables (params named
        ``emb_*``) in bf16 — halves their HBM traffic (the dominant cost of
        CTR training); activations upcast at first use. Pair with
        ``embedding_split_optimizer()`` so optimizer accumulators stay f32.

        ``remat=True`` rematerializes transformer activations (BST/DSIN):
        the backward recomputes them instead of saving them — numerically
        EXACT (jax.checkpoint). Measured a NO-OP at CTR shapes on v5e
        (speed within 1%, temps unchanged — XLA already avoids saving
        these activations), so it stays OFF by default; the knob exists
        for regimes the scheduler may not cover (much longer sequences).

        ``sharded_lookup="auto"|"a2a"|"psum"`` (requires ``mesh``) routes
        row-sharded table gathers through the EXPLICIT shard_map exchange
        (parallel/sharded_lookup.py) instead of jnp.take + XLA auto-SPMD:
        'psum' replicates lookup compute and all-reduces rows (what the
        partitioner emits on its own — O(B*E*n_model) ICI bytes); 'a2a'
        buckets ids to their owner shard, exchanges ids and rows with
        all_to_all (O(B*E) ICI bytes, independent of the model-axis size —
        the scaling-optimal pattern); 'auto' picks a2a on model axes >= 4.
        Only tables the placement policy row-shards take the collective
        path; the sparse engine's hoisted gathers are not affected.
        ``lookup_capacity`` bounds the a2a per-owner exchange buckets
        (capacity-factor semantics: overflowing ids read zero rows) and
        enables the overflow counter (``model.lookup_overflow()``).

        ``compute_dtype="bfloat16"`` runs the forward/backward activations
        in bf16 (mixed precision): parameters stay f32 master weights and
        are cast at use, matmuls accumulate f32 on the MXU, activations —
        including the (B,H,F,F) attention scores of AutoInt/BST and CIN's
        feature maps, the dominant HBM traffic of those models at large
        batch — are stored bf16. Logits, losses, softmax/LayerNorm math and
        the optimizer always stay f32. Composes with ``embedding_dtype``
        (bf16 tables then feed bf16 activations with no upcast).

        The default (None == "auto") applies that policy automatically to
        attention/CIN-dominated graphs (AutoInt/BST/DSIN/xDeepFM/DIFM…):
        those layers mark the init trace (layers.base.note_mp_preferred)
        and the model compiles with bf16 activations — the configs where
        mixed precision measured +25..77% (BASELINE.md) while the 30
        reference-golden quality gates stay green. ``"float32"`` opts
        out."""
        _resolved = opt_lib.resolve_optimizer(optimizer)
        # runtime-mutable LR (Keras optimizer.learning_rate parity): the
        # scale travels in opt_state so LR callbacks never force a retrace
        self.optimizer = opt_lib.MutableLR(
            _resolved, opt_lib.base_learning_rate_of(optimizer, _resolved),
            lr_scale_unsafe=opt_lib.lr_scale_unsafe_of(optimizer, _resolved))
        self._pending_lr_scale = 1.0
        if loss is None:
            loss = "binary_crossentropy" if self.task == "binary" else "mse"
        if isinstance(loss, (list, tuple)):
            self.loss_fns = [metrics_lib.resolve_loss(l) for l in loss]
        else:
            self.loss_fns = [metrics_lib.resolve_loss(loss)] * self.num_outputs
        self.loss_weights = loss_weights
        self.metrics = list(metrics or [])
        self.mesh = mesh
        if isinstance(sparse_embedding_updates, str) and \
                sparse_embedding_updates != "auto":
            raise ValueError(
                "sparse_embedding_updates must be True, False or 'auto'; "
                "got %r" % (sparse_embedding_updates,))
        if sparse_embedding_updates == "auto":
            # measured policy (BASELINE.md dense-vs-sparse crossover, v5e):
            # dense full-table optimizer passes win below ~1M rows/table;
            # the engine's O(touched-rows) updates win above, and are the
            # only feasible path once adam state stops fitting HBM
            max_rows = max(
                (fc.vocabulary_size for fc in self.feature_columns
                 if hasattr(fc, "vocabulary_size")),
                default=0)
            sparse_embedding_updates = max_rows >= 1_000_000
        if sparse_embedding_updates and mesh is not None and pallas_scatter_updates:
            raise ValueError(
                "pallas_scatter_updates does not compose with mesh sharding; "
                "under a mesh the XLA SPMD partitioner owns the scatter "
                "(drop pallas_scatter_updates=True)"
            )
        self.sparse_embedding_updates = sparse_embedding_updates
        self.embedding_lr = embedding_lr
        self.embedding_dtype = embedding_dtype
        self.compute_dtype = compute_dtype
        self.pallas_scatter_updates = pallas_scatter_updates
        if bf16_stochastic_rounding and embedding_dtype != "bfloat16":
            raise ValueError(
                "bf16_stochastic_rounding requires embedding_dtype='bfloat16'"
            )
        if bf16_stochastic_rounding and not sparse_embedding_updates:
            raise ValueError(
                "bf16_stochastic_rounding requires sparse_embedding_updates="
                "True (rounded read-modify-write happens in the sparse "
                "engine's scatter)"
            )
        self.bf16_stochastic_rounding = bf16_stochastic_rounding
        if sharded_lookup not in (None, False, "auto", "a2a", "psum"):
            raise ValueError(
                "sharded_lookup must be None, 'auto', 'a2a' or 'psum'; "
                "got %r" % (sharded_lookup,))
        if sharded_lookup and mesh is None:
            raise ValueError("sharded_lookup requires a mesh")
        if lookup_capacity is not None and not sharded_lookup:
            raise ValueError("lookup_capacity requires sharded_lookup")
        if sharded_lookup and self.sparse_embedding_updates:
            import warnings

            warnings.warn(
                "sharded_lookup only routes the dense lookup path; the "
                "sparse engine's hoisted gathers stay with the XLA "
                "partitioner", stacklevel=2)
        self.sharded_lookup = sharded_lookup or None
        self.lookup_capacity = lookup_capacity
        self.remat = remat
        if fused_gather_pool is not None:
            # process-wide switch: varlen pooling through the Pallas fused
            # gather+pool kernel (ops/embedding.py) wherever eligible
            from ..ops.embedding import set_fused_gather_pool

            set_fused_gather_pool(
                fused_gather_pool,
                interpret=jax.default_backend() == "cpu",
            )
        if fused_attention is not None:
            # process-wide switch: Transformer (scaled_dot_product) and
            # InteractingLayer attention through the fused VMEM-resident
            # Pallas kernel (ops/attention.py) — the (B,H,T,T) arrays
            # never hit HBM
            from ..ops.attention import set_fused_attention

            set_fused_attention(
                fused_attention,
                interpret=jax.default_backend() == "cpu",
            )
        if fused_gru is not None:
            # process-wide switch: DynamicGRU (DIEN interest evolution)
            # through the whole-sequence Pallas kernel (ops/gru.py)
            from ..ops.gru import set_fused_gru

            set_fused_gru(
                fused_gru,
                interpret=jax.default_backend() == "cpu",
            )
        self._gather_plan = None
        self._train_step = None  # force re-trace with the new optimizer
        self._multi_train_step = None
        self._multi_k = 0
        self._predict_step = None
        if self.state is not None:
            # re-compile on a built model: keep the learned params but
            # rebuild optimizer/engine state to match the new configuration
            self._rebind_optimizer()
        return self

    def _resolved_compute_dtype(self):
        """compute_dtype=None/'auto' resolves to bf16 when the init trace
        marked the graph attention/CIN-dominated (layers.base
        note_mp_preferred) — the models where bf16 activations are a
        measured +25..77% (BASELINE.md); everything else stays f32.
        'float32'/'bfloat16' force the choice."""
        cd = self.compute_dtype
        if cd is None or cd == "auto":
            info = getattr(self, "_graph_profile_info", None)
            if info and info.get("mp_preferred"):
                return jnp.bfloat16
            return jnp.float32
        return jnp.dtype(cd)

    def _cd_scope(self):
        """Activate this model's compute dtype for a trace (layers consult
        layers.base.compute_dtype() at trace time)."""
        from ..layers.base import compute_dtype_scope

        return compute_dtype_scope(self._resolved_compute_dtype())

    def _apply_scope(self):
        """Trace scopes for train/predict steps: compute dtype + (when
        configured) explicit sharded lookups. Init/plan-discovery/export
        traces use _cd_scope alone — they run eagerly on unsharded params,
        where a collective lookup would be pure overhead."""
        import contextlib

        stack = contextlib.ExitStack()
        stack.enter_context(self._cd_scope())
        if self.remat is not None:
            from ..layers.base import remat_scope

            stack.enter_context(remat_scope(self.remat))
        if self.sharded_lookup and self.mesh is not None:
            from ..parallel.sharded_lookup import sharded_lookup_scope

            stack.enter_context(sharded_lookup_scope(
                self.sharded_lookup, self.mesh, self.lookup_capacity))
        return stack

    def _train_mutable(self):
        cols = ["batch_stats", "losses"]
        if self.lookup_capacity is not None:
            cols.append("lookup_stats")  # a2a overflow counter
        return cols

    def _rebind_optimizer(self):
        params, model_state = self.state.params, self.state.model_state
        embed_state = None
        if self.sparse_embedding_updates:
            from . import sparse_embedding as se

            if self._gather_plan is None:
                raise ValueError(
                    "sparse_embedding_updates=True on an already-built model "
                    "requires rebuilding: construct the model again before "
                    "compile (the gather plan needs a sample batch)."
                )
            dense_params, tables = se.split_tables(params, self._gather_plan)
            opt_state = self.optimizer.init(dense_params)
            embed_state = se.init_embed_state(tables)
        else:
            opt_state = self.optimizer.init(params)
        self.state = self.state.replace(opt_state=opt_state,
                                        embed_state=embed_state)

    def _init_variables(self, x_canonical):
        sample = {k: jnp.asarray(v[:2]) for k, v in x_canonical.items()}
        self._rng, init_key, drop_key = jax.random.split(self._rng, 3)
        from ..layers.base import graph_profile_scope

        profile = {}
        with graph_profile_scope(profile), self._cd_scope():
            variables = self.module.init(
                {"params": init_key, "dropout": drop_key}, sample, training=False
            )
        # consulted by _resolved_compute_dtype (auto mixed precision)
        self._graph_profile_info = profile
        variables = flax.core.unfreeze(variables)
        params = variables.pop("params")
        variables.pop("losses", None)
        return params, variables

    def _ensure_built(self, x_canonical):
        if self.state is not None:
            return
        if self.optimizer is None:
            self.compile()
        params, model_state = self._init_variables(x_canonical)
        if self.embedding_dtype is not None:
            dtype = jnp.dtype(self.embedding_dtype)

            def cast_tables(path, leaf):
                is_table = any(
                    str(getattr(k, "key", k)).startswith("emb_") for k in path
                )
                return leaf.astype(dtype) if is_table else leaf

            params = jax.tree_util.tree_map_with_path(cast_tables, params)
        if self.mesh is not None and not self._is_multiprocess():
            # Shard params BEFORE optimizer.init so optimizer slots (zeros_like)
            # inherit the same shardings. (Multi-process meshes place the
            # whole TrainState globally after construction instead —
            # device_put can't target non-addressable devices.)
            from ..parallel.sharding import replicate, shard_params

            params = shard_params(params, self.mesh)
            model_state = replicate(model_state, self.mesh)

        embed_state = None
        if self.sparse_embedding_updates:
            from . import sparse_embedding as se

            sample = {k: jnp.asarray(v[:2]) for k, v in x_canonical.items()}
            with self._cd_scope():
                self._gather_plan = se.discover_plan(
                    self.module, {"params": params, **model_state}, sample
                )
            dense_params, tables = se.split_tables(params, self._gather_plan)
            opt_state = self.optimizer.init(dense_params)
            embed_state = se.init_embed_state(tables)
            if self.mesh is not None and not self._is_multiprocess():
                # row-shard each table's adagrad accumulator like its table
                # (same (V, 1) leading dim) so scatter updates stay local
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.mesh import model_axis as _model_axis

                maxis = _model_axis(self.mesh)
                n_model = self.mesh.shape[maxis] if maxis else 1

                def place_acc(path, leaf):
                    tab = tables[path]
                    spec = P()
                    if (maxis and n_model > 1
                            and tab.shape[0] % n_model == 0):
                        spec = P(maxis, None)
                    return jax.device_put(leaf, NamedSharding(self.mesh, spec))

                embed_state = {p: place_acc(p, a)
                               for p, a in embed_state.items()}
        else:
            opt_state = self.optimizer.init(params)
        if getattr(self, "_pending_lr_scale", 1.0) != 1.0:
            # learning_rate was set before the model built
            opt_state = opt_lib.MutableLR.set_scale(
                opt_state, self._pending_lr_scale)
            self._pending_lr_scale = 1.0
        self.state = TrainState(
            params=params, opt_state=opt_state, model_state=model_state,
            step=jnp.zeros((), jnp.int32), embed_state=embed_state,
        )
        if self._is_multiprocess():
            # every process ran the same seeded init -> leaves are
            # host-identical; promote them to global arrays over the mesh
            from ..parallel.distributed import replicate_state_globally

            self.state = replicate_state_globally(self.state, self.mesh)

    @property
    def lr_scale(self) -> float:
        """Multiplier on the compiled optimizer's configured learning rate
        (1.0 = as-compiled). Mutable between steps with no retrace — the
        scale is a traced scalar inside opt_state (optimizers.MutableLR)."""
        if self.state is None or not isinstance(self.optimizer,
                                                opt_lib.MutableLR):
            return float(getattr(self, "_pending_lr_scale", 1.0))
        return float(jax.device_get(
            opt_lib.MutableLR.get_scale(self.state.opt_state)))

    @lr_scale.setter
    def lr_scale(self, value: float):
        if self.optimizer is None:
            raise ValueError("compile the model before setting the "
                             "learning rate")
        value = float(value)
        if self.state is None:
            self._pending_lr_scale = value
            return
        self.state = self.state.replace(
            opt_state=opt_lib.MutableLR.set_scale(self.state.opt_state,
                                                  value))

    @property
    def learning_rate(self) -> float:
        """Current learning rate (Keras ``model.optimizer.learning_rate``
        parity; consumed by LearningRateScheduler / ReduceLROnPlateau).
        Absolute when the compiled optimizer's base rate is known (named
        optimizers, default embedding split); otherwise the value IS the
        multiplier on the configured rate."""
        base = getattr(self.optimizer, "base_learning_rate", None)
        return (base if base is not None else 1.0) * self.lr_scale

    @learning_rate.setter
    def learning_rate(self, value: float):
        base = getattr(self.optimizer, "base_learning_rate", None)
        if base is None and not getattr(self, "_warned_lr_base", False):
            # absolute-LR schedules need the base rate; without it the
            # value is a MULTIPLIER — an absolute schedule like 1e-3
            # would silently collapse the LR 1000x
            import warnings

            warnings.warn(
                "the compiled optimizer's base learning rate is unknown "
                "(custom optax transform); model.learning_rate values are "
                "interpreted as MULTIPLIERS of the configured rate. For "
                "absolute-LR schedules, name the optimizer ('adam', ...) "
                "or set optimizer.base_learning_rate.", stacklevel=2)
            self._warned_lr_base = True
        if getattr(self.optimizer, "lr_scale_unsafe", False) and \
                not getattr(self, "_warned_lr_unsafe", False):
            import warnings

            warnings.warn(
                "this optimizer's update is not linear in the learning "
                "rate (FTRL-proximal); runtime LR scaling changes the "
                "step size but NOT the accumulator trajectory — prefer "
                "recompiling with the new rate for exact FTRL semantics.",
                stacklevel=2)
            self._warned_lr_unsafe = True
        self.lr_scale = float(value) / (base if base is not None else 1.0)

    def _is_multiprocess(self) -> bool:
        """True when the mesh spans multiple jax processes (multi-host
        data-parallel fit: every process feeds its own local batch shard,
        the reference's between-graph-replication contract,
        /root/reference/README.md:27)."""
        import jax as _jax

        return self.mesh is not None and _jax.process_count() > 1

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def _loss_from_outputs(self, preds, y, w):
        preds = preds.reshape(preds.shape[0], -1)
        y = y.reshape(y.shape[0], -1)
        total = jnp.zeros((), jnp.float32)
        per_task = []
        for i, fn in enumerate(self.loss_fns):
            li = fn(y[:, i], preds[:, i], w)
            lw = self.loss_weights[i] if self.loss_weights is not None else 1.0
            per_task.append(li)
            total = total + lw * li
        return total, per_task

    def _build_multi_train_step(self, steps_per_execution: int):
        """Scan ``steps_per_execution`` train steps inside ONE compiled
        call over stacked batches (Keras steps_per_execution parity).
        Amortizes per-call dispatch — decisive on dispatch-bound setups
        (the axon tunnel charges ~1-2 ms per execution) and harmless
        elsewhere. Returns fn(state, xK, yK, wK, rng) -> (state, losses,
        task_losses) with (K, ...) stacked inputs.

        The scan body is UNROLLED (up to 32 steps per while-iteration): an
        XLA while-loop carry forces extra full passes over the
        embedding-table state every iteration (measured +50% step time at
        the criteo shape, 20.5 -> 13.7 ms/step unrolled), while the
        straight-line block lets XLA update tables in place across steps.
        The 32-step cap bounds compile time for large K — carry copies are
        then amortized 32x, which is already in the noise."""
        import jax.lax as lax

        raw = self._train_step_fn()
        unroll = min(steps_per_execution, 32)
        # unroll must divide the scan length or lax.scan falls back to a
        # plain while loop per remainder; pick the largest divisor <= 32
        while steps_per_execution % unroll:
            unroll -= 1

        def multi_step(state: TrainState, xK, yK, wK, rng):
            rngs = jax.random.split(rng, steps_per_execution)

            def body(st, inp):
                xb, yb, wb, r = inp
                st, loss, task_loss = raw(st, xb, yb, wb, r)
                return st, (loss, task_loss)

            state, (losses, task_losses) = lax.scan(
                body, state, (xK, yK, wK, rngs), unroll=unroll)
            return state, losses, task_losses

        return jax.jit(multi_step, donate_argnums=(0,))

    def _train_step_fn(self):
        """The un-jitted single-step function (shared by the jitted single
        and scanned multi-step drivers)."""
        if self.sparse_embedding_updates:
            return self._sparse_train_step_fn()
        module = self.module
        optimizer = self.optimizer
        mesh = self.mesh

        def train_step(state: TrainState, xb, yb, wb, rng):
            if mesh is not None:
                from ..parallel.sharding import constrain_batch

                xb, yb, wb = constrain_batch(mesh, xb, yb, wb)

            def loss_fn(params):
                variables = {"params": params, **state.model_state}
                with self._apply_scope():
                    out, mutated = module.apply(
                        variables, xb, training=True,
                        rngs={"dropout": rng},
                        mutable=self._train_mutable(),
                    )
                task_loss, _ = self._loss_from_outputs(out, yb, wb)
                extra = _sum_losses_collection(mutated)
                return task_loss + extra, (mutated, task_loss)

            (loss, (mutated, task_loss)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            from .optimizers import apply_optimizer

            new_params, new_opt_state = apply_optimizer(
                optimizer, grads, state.opt_state, state.params)
            new_model_state = {k: v for k, v in mutated.items() if k != "losses"}
            # keep collections that were not mutated this step
            for k, v in state.model_state.items():
                if k not in new_model_state:
                    new_model_state[k] = v
            new_state = TrainState(
                params=new_params, opt_state=new_opt_state,
                model_state=new_model_state, step=state.step + 1,
            )
            return new_state, loss, task_loss

        return train_step

    def _build_train_step(self):
        return jax.jit(self._train_step_fn(), donate_argnums=(0,))

    def _sparse_train_step_fn(self):
        """Train step with the sparse embedding engine: gathers hoisted out
        of the loss, row-sparse table grads, in-step rowwise-adagrad scatter
        updates (training/sparse_embedding.py)."""
        from . import sparse_embedding as se

        module = self.module
        optimizer = self.optimizer
        plan = self._gather_plan
        embedding_lr = self.embedding_lr
        use_pallas = self.pallas_scatter_updates
        use_sr = self.bf16_stochastic_rounding
        mesh = self.mesh

        def train_step(state: TrainState, xb, yb, wb, rng):
            if mesh is not None:
                from ..parallel.sharding import constrain_batch

                xb, yb, wb = constrain_batch(mesh, xb, yb, wb)
            dense_params, tables = se.split_tables(state.params, plan)
            rows = se.gather_rows(tables, xb, plan)

            def loss_fn(dense_p, rows_):
                params = se.merge_tables(dense_p, tables)
                variables = {"params": params, "gathered": rows_,
                             **state.model_state}
                with self._apply_scope():
                    out, mutated = module.apply(
                        variables, xb, training=True,
                        rngs={"dropout": rng},
                        mutable=self._train_mutable(),
                    )
                task_loss, _ = self._loss_from_outputs(out, yb, wb)
                extra = _sum_losses_collection(mutated)
                extra = extra + se.lazy_l2(rows_, plan, sample_weight=wb)
                return task_loss + extra, (mutated, task_loss)

            (loss, (mutated, task_loss)), (g_dense, g_rows) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(dense_params, rows)

            from .optimizers import MutableLR, apply_optimizer

            new_dense, new_opt_state = apply_optimizer(
                optimizer, g_dense, state.opt_state, dense_params)
            lr = embedding_lr
            if isinstance(optimizer, MutableLR):
                # engine tables follow the same runtime LR scale as the
                # dense tower (LR callbacks scale both proportionally)
                lr = embedding_lr * MutableLR.get_scale(state.opt_state)
            new_tables, new_embed = se.apply_sparse_updates(
                tables, state.embed_state, g_rows, xb, plan,
                learning_rate=lr, use_pallas=use_pallas,
                sr_key=jax.random.fold_in(rng, 1) if use_sr else None,
            )
            new_params = se.merge_tables(new_dense, new_tables)

            new_model_state = {k: v for k, v in mutated.items() if k != "losses"}
            for k, v in state.model_state.items():
                if k not in new_model_state:
                    new_model_state[k] = v
            new_state = TrainState(
                params=new_params, opt_state=new_opt_state,
                model_state=new_model_state, step=state.step + 1,
                embed_state=new_embed,
            )
            return new_state, loss, task_loss

        return train_step

    def _build_predict_step(self):
        module = self.module
        mesh = self.mesh

        def predict_step(params, model_state, xb):
            if mesh is not None:
                from ..parallel.sharding import constrain_batch

                (xb,) = constrain_batch(mesh, xb)
            variables = {"params": params, **model_state}
            with self._apply_scope():
                return module.apply(variables, xb, training=False)

        return jax.jit(predict_step)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def _canon_y(self, y):
        if isinstance(y, (list, tuple)):
            y = np.stack([np.asarray(t).reshape(len(t)) for t in y], axis=1)
        else:
            y = np.asarray(y)
            if y.ndim == 1:
                y = y[:, None]
        return np.ascontiguousarray(y, np.float32)

    def _canon_stream_item(self, item, pad_to, need_y=True):
        """One yielded stream batch -> canonical (xb, yb, wb, n_real) with
        static shapes (pad_to rows; padding rows weighted 0)."""
        if isinstance(item, dict):
            item = (item,)
        if not isinstance(item, (tuple, list)) or not item:
            raise ValueError(
                "streams must yield (features_dict, labels[, sample_weight]) "
                "tuples; got %r" % (type(item),))
        xb = canonicalize_batch(item[0], self.feature_columns)
        yv = item[1] if len(item) > 1 else None
        if yv is None and need_y:
            raise ValueError(
                "fit/evaluate from a stream requires each batch to include "
                "labels: yield (features_dict, labels)")
        n_real = len(next(iter(xb.values())))
        yb = self._canon_y(yv) if yv is not None else None
        wb = (np.asarray(item[2], np.float32).reshape(-1)
              if len(item) > 2 and item[2] is not None
              else np.ones(n_real, np.float32))
        if pad_to is not None:
            if n_real > pad_to:
                raise ValueError(
                    "stream batch of %d rows exceeds the static batch size "
                    "%d fixed by the first batch" % (n_real, pad_to))
            pad = pad_to - n_real
            if pad:
                xb = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                      for k, v in xb.items()}
                if yb is not None:
                    yb = np.concatenate([yb, np.repeat(yb[-1:], pad, axis=0)])
                wb = np.concatenate([wb, np.zeros(pad, np.float32)])
        return xb, yb, wb, n_real

    def fit(self, x, y=None, batch_size=256, epochs=1, verbose=1,
            initial_epoch=0,
            validation_split=0.0, validation_data=None, shuffle=True,
            sample_weight=None, class_weight=None, callbacks=None,
            profile_dir=None,
            steps_per_execution=1, steps_per_epoch=None,
            validation_steps=None):
        """``steps_per_execution=K`` (Keras parity, tf.keras compile arg)
        scans K optimizer steps inside ONE compiled call over K stacked
        batches — amortizes per-dispatch overhead (decisive when dispatch
        latency rivals step time, e.g. small batches or remote devices).
        The epoch's trailing ``steps % K`` batches run through the
        single-step program. Under multi-process meshes the K process-local
        shards are assembled into (K, global_B, ...) arrays sharded on
        axis 1 and scanned in one call — the regime (remote dispatch
        latency across hosts) where amortization matters most.

        ``x`` may be a STREAM instead of in-memory data: a zero-arg
        ``input_fn`` (estimator/inputs.py — e.g. ``input_fn_tfrecord``,
        constant-memory mmap+C++ TFRecord pipeline) or any generator of
        ``(features_dict, labels[, sample_weight])`` batches (the Keras
        ``fit(generator)`` contract). ``y`` must then be None (labels come
        with each batch), batching/shuffling belong to the pipeline
        (``batch_size``/``shuffle`` are ignored), and ``steps_per_epoch``
        bounds an epoch when the stream repeats. Composes with
        ``steps_per_execution``."""
        stream = None
        if data_lib.is_stream(x):
            if y is not None or sample_weight is not None \
                    or class_weight is not None:
                raise ValueError(
                    "when x is a stream, labels/sample weights travel with "
                    "each yielded batch; pass y=None, sample_weight=None, "
                    "class_weight=None (fold class weights into the "
                    "stream's per-batch weights)")
            if validation_split:
                raise ValueError(
                    "validation_split requires in-memory x; pass "
                    "validation_data instead")
            stream = data_lib.StreamSource(x, self._canon_stream_item)
            xc, _, _, _ = stream.peek_batch()
            n = None
            w = None
            yc = None
        else:
            if y is None:
                raise ValueError(
                    "fit(x, y): y is required for in-memory x (only streams "
                    "carry labels inside each batch)")
            xc = canonicalize_batch(x, self.feature_columns)
            yc = self._canon_y(y)
            n = len(yc)
            w = (
                np.asarray(sample_weight, np.float32)
                if sample_weight is not None
                else np.ones(n, np.float32)
            )
            if class_weight is not None:
                # Keras fit(class_weight={label: weight}) parity —
                # multiplies into the per-sample weights (binary/single
                # task; label keys may be ints or floats)
                cw = {float(k): float(v) for k, v in class_weight.items()}
                w = w * np.vectorize(lambda v: cw.get(float(v), 1.0))(
                    yc[:, 0]).astype(np.float32)

        val = None
        val_stream = None
        if validation_data is not None and data_lib.is_stream(validation_data):
            # a validation input_fn/generator: re-invoked (callable) or
            # replayed-once (iterator: materialized below) per epoch
            val_stream = validation_data
            if not callable(val_stream):
                val_stream = list(val_stream)  # replayable across epochs
        elif validation_data is not None:
            vx, vy = validation_data[0], validation_data[1]
            val = (canonicalize_batch(vx, self.feature_columns), self._canon_y(vy))
        elif stream is None and validation_split and 0.0 < validation_split < 1.0:
            (xc, yc, w), (vx, vy, _) = data_lib.train_valid_split(xc, yc, w, validation_split)
            val = (vx, vy)
            n = len(yc)

        self._ensure_built(xc)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        spe = max(int(steps_per_execution or 1), 1)
        if spe > 1 and (self._multi_train_step is None or self._multi_k != spe):
            self._multi_train_step = self._build_multi_train_step(spe)
            self._multi_k = spe

        if stream is not None:
            epoch_steps = steps_per_epoch
        else:
            epoch_steps = data_lib.num_batches(n, batch_size)
            if steps_per_epoch is not None:
                epoch_steps = min(epoch_steps, int(steps_per_epoch))
        if verbose:
            print(
                "Train on {} samples{}, {} steps per epoch".format(
                    n if n is not None else "streamed",
                    " validate on {} samples".format(len(val[1])) if val else "",
                    epoch_steps if epoch_steps is not None else "unbounded",
                )
            )
        callbacks = list(callbacks or [])
        for cb in callbacks:
            cb.on_train_begin(self)
        # per-batch hooks cost one device->host sync per compiled execution;
        # only pay it when a callback actually overrides a batch hook
        from .callbacks import overrides_batch_hooks
        batch_cbs = [cb for cb in callbacks if overrides_batch_hooks(cb)]

        def _batch_begin(idx):
            for cb in batch_cbs:
                cb.on_train_batch_begin(self, idx)

        def _batch_end(idx, logs_b):
            stop_b = False
            for cb in batch_cbs:
                if cb.on_train_batch_end(self, idx, logs_b):
                    stop_b = True
            return stop_b

        profiling = False
        np_rng = np.random.RandomState(self.seed)
        global_step = 0
        for epoch in range(initial_epoch, epochs):
            t0 = time.time()
            for cb in callbacks:
                cb.on_epoch_begin(self, epoch)
            # keep per-step losses on device: float(loss) would force a
            # host sync every step and serialize the async dispatch pipeline
            step_losses, step_weights = [], []
            buf = []

            def flush_multi(last_idx=None):
                nonlocal buf
                xK = {k: np.stack([b[0][k] for b in buf])
                      for k in buf[0][0]}
                yK = np.stack([b[1] for b in buf])
                wK = np.stack([b[2] for b in buf])
                if self._is_multiprocess():
                    # each buffered batch is THIS process's local shard;
                    # assemble (K, global_B, ...) arrays sharded on axis 1
                    from ..parallel.distributed import \
                        make_global_batch_stacked

                    xK, yK, wK = make_global_batch_stacked(
                        self.mesh, xK, yK, wK)
                if batch_cbs and last_idx is not None:
                    _batch_begin(last_idx)
                self._rng, mrng = jax.random.split(self._rng)
                self.state, losses, _ = self._multi_train_step(
                    self.state, xK, yK, wK, mrng
                )
                for i, b in enumerate(buf):
                    step_losses.append(losses[i])
                    step_weights.append(b[3])
                stop_b = False
                if batch_cbs and last_idx is not None:
                    # scan-boundary cadence: one hook per compiled execution
                    # with the window's accumulated logs (see callbacks.py)
                    sizes = [float(b[3]) for b in buf]
                    lv = [float(l) for l in step_losses[-len(buf):]]
                    wsum = sum(sizes)
                    logs_b = {
                        "loss": sum(l * s for l, s in zip(lv, sizes))
                                / max(wsum, 1.0),
                        "size": wsum,
                        "num_steps": len(buf),
                    }
                    stop_b = _batch_end(last_idx, logs_b)
                buf = []
                return stop_b

            if stream is not None:
                batches = stream.epoch(steps=epoch_steps)
            else:
                batches = data_lib.iterate_batches(
                    xc, yc, w, batch_size, shuffle=shuffle, rng=np_rng)
                if steps_per_epoch is not None:
                    import itertools

                    batches = itertools.islice(batches, epoch_steps)
            epoch_saw_data = False
            epoch_batch = 0
            stop_batch = False
            for xb, yb, wb, n_real in batches:
                epoch_saw_data = True
                if profile_dir is not None:
                    # trace a small window of post-warmup steps
                    if global_step >= 5 and not profiling and global_step < 15:
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    elif global_step >= 15 and profiling:
                        jax.block_until_ready(self.state.params)
                        jax.profiler.stop_trace()
                        profiling = False
                if spe > 1:
                    buf.append((xb, yb, wb, n_real))
                    if len(buf) == spe:
                        stop_batch = flush_multi(epoch_batch)
                    global_step += 1
                    epoch_batch += 1
                    if stop_batch:
                        break
                    continue
                if batch_cbs:
                    _batch_begin(epoch_batch)
                self._rng, step_rng = jax.random.split(self._rng)
                if self._is_multiprocess():
                    # xb/yb/wb are THIS process's local shard; assemble the
                    # global batch (sharded over 'data' across all hosts)
                    from ..parallel.distributed import make_global_batch

                    xb, yb, wb = make_global_batch(self.mesh, xb, yb, wb)
                self.state, loss, task_loss = self._train_step(
                    self.state, xb, yb, wb, step_rng
                )
                step_losses.append(loss)
                step_weights.append(n_real)
                global_step += 1
                if batch_cbs:
                    stop_batch = _batch_end(epoch_batch, {
                        "loss": float(loss), "size": float(n_real),
                        "num_steps": 1})
                epoch_batch += 1
                if stop_batch:
                    break
            # trailing batches (< steps_per_execution of them) run singly;
            # skipped when a batch callback already requested a stop.
            # They were already counted when buffered — rewind so the batch
            # hooks see each one's original index.
            epoch_batch -= len(buf)
            for xb, yb, wb, n_real in (buf if not stop_batch else []):
                if batch_cbs:
                    _batch_begin(epoch_batch)
                self._rng, step_rng = jax.random.split(self._rng)
                self.state, loss, task_loss = self._train_step(
                    self.state, xb, yb, wb, step_rng
                )
                step_losses.append(loss)
                step_weights.append(n_real)
                if batch_cbs:
                    stop_batch = _batch_end(epoch_batch, {
                        "loss": float(loss), "size": float(n_real),
                        "num_steps": 1})
                epoch_batch += 1
                if stop_batch:
                    break
            if stream is not None and not epoch_saw_data:
                break  # plain iterator ran dry on an epoch boundary
            weight_sum = float(sum(step_weights))
            loss_sum = sum(
                float(l) * n for l, n in zip(step_losses, step_weights)
            )
            logs = {"loss": loss_sum / max(weight_sum, 1.0)}
            if val is not None:
                val_logs = self.evaluate(val[0], val[1], batch_size=batch_size,
                                         _already_canonical=True)
                logs.update({"val_" + k: v for k, v in val_logs.items()})
            elif val_stream is not None:
                src = val_stream if callable(val_stream) else iter(val_stream)
                val_logs = self.evaluate(src, steps=validation_steps)
                logs.update({"val_" + k: v for k, v in val_logs.items()})
            if verbose:
                msg = " - ".join("{}: {:.4f}".format(k, v) for k, v in logs.items())
                print("Epoch {}/{} - {:.1f}s - {}".format(epoch + 1, epochs, time.time() - t0, msg))
            stop = False
            for cb in callbacks:
                if cb.on_epoch_end(self, epoch, logs):
                    stop = True
            # after the callbacks, so their log mutations (e.g. "lr") are
            # recorded — Keras runs its History callback last the same way
            self.history.append(epoch, logs)
            if stop or stop_batch:
                break
        if profiling:
            jax.profiler.stop_trace()
        for cb in callbacks:
            cb.on_train_end(self)
        return self.history

    def _predict_stream(self, x, steps=None, _collect_y=False):
        """Forward pass over a stream (input_fn or generator yielding
        features_dict or (features_dict, labels[, w]) batches)."""
        stream = data_lib.StreamSource(
            x, lambda item, pad: self._canon_stream_item(item, pad,
                                                         need_y=_collect_y))
        xc0, _, _, _ = stream.peek_batch()
        self._ensure_built(xc0)
        if self._predict_step is None:
            self._predict_step = self._build_predict_step()
        outs, ys = [], []
        for xb, yb, wb, n_real in stream.epoch(steps=steps):
            out = self._predict_step(self.state.params,
                                     self.state.model_state, xb)
            outs.append(np.asarray(out)[:n_real])
            if _collect_y:
                ys.append(yb[:n_real])
        preds = np.concatenate(outs, axis=0)
        if _collect_y:
            return preds, np.concatenate(ys, axis=0)
        return preds

    def predict(self, x, batch_size=256, verbose=0, _already_canonical=False,
                steps=None):
        # `verbose` accepted for Keras-surface compatibility (reference users
        # call model.predict(x, batch_size, verbose) per Quick-Start step 4)
        del verbose
        if not _already_canonical and data_lib.is_stream(x):
            return self._predict_stream(x, steps=steps)
        xc = x if _already_canonical else canonicalize_batch(x, self.feature_columns)
        self._ensure_built(xc)
        if self._predict_step is None:
            self._predict_step = self._build_predict_step()
        outs = []
        multiprocess = self._is_multiprocess()
        for xb, _, _, n_real in data_lib.iterate_batches(xc, None, None, batch_size):
            if multiprocess:
                # x holds this process's local rows; the returned array
                # covers the GLOBAL batch (gathered to every host)
                from jax.experimental import multihost_utils

                from ..parallel.distributed import make_global_batch

                xb = make_global_batch(self.mesh, xb)
                out = self._predict_step(self.state.params,
                                         self.state.model_state, xb)
                out = multihost_utils.process_allgather(out, tiled=True)
                outs.append(np.asarray(out))
            else:
                out = self._predict_step(self.state.params, self.state.model_state, xb)
                outs.append(np.asarray(out)[:n_real])
        return np.concatenate(outs, axis=0)

    def evaluate(self, x, y=None, batch_size=256, verbose=0,
                 _already_canonical=False, steps=None):
        if not _already_canonical and data_lib.is_stream(x):
            if y is not None:
                raise ValueError(
                    "when x is a stream, labels travel with each yielded "
                    "batch; pass y=None")
            preds, yc = self._predict_stream(x, steps=steps, _collect_y=True)
        else:
            if y is None:
                raise ValueError(
                    "evaluate(x, y): y is required for in-memory x (only "
                    "streams carry labels inside each batch)")
            xc = x if _already_canonical else canonicalize_batch(
                x, self.feature_columns)
            yc = self._canon_y(y)
            preds = self.predict(xc, batch_size=batch_size,
                                 _already_canonical=True)
        preds = preds.reshape(len(yc), -1)
        w = np.ones(len(yc), np.float32)
        logs = {}
        total = 0.0
        for i, fn in enumerate(self.loss_fns):
            li = float(fn(jnp.asarray(yc[:, i]), jnp.asarray(preds[:, i]), jnp.asarray(w)))
            lw = self.loss_weights[i] if self.loss_weights is not None else 1.0
            total += lw * li
        logs["loss"] = total
        for m in self.metrics:
            fn = metrics_lib.resolve_metric(m)
            name = m if isinstance(m, str) else getattr(m, "__name__", "metric")
            if self.num_outputs > 1:
                for i in range(self.num_outputs):
                    out_name = (
                        self.output_names[i] if self.output_names else "out_{}".format(i)
                    )
                    logs["{}_{}".format(out_name, name)] = float(fn(yc[:, i], preds[:, i]))
            else:
                logs[name] = float(fn(yc[:, 0], preds[:, 0]))
        if verbose:
            print(" - ".join("%s: %.4f" % kv for kv in logs.items()))
        return logs

    def lookup_overflow(self):
        """Total ids dropped by a2a capacity overflow since training began
        (0 when none). Requires ``compile(sharded_lookup=..., mesh=...,
        lookup_capacity=N)`` — with the default exact capacity nothing can
        ever drop and no counter is tracked."""
        if self.state is None:
            return 0
        col = self.state.model_state.get("lookup_stats")
        if col is None:
            return 0
        return int(sum(int(np.asarray(leaf).sum())
                       for leaf in jax.tree_util.tree_leaves(col)))

    def export_inference_fn(self):
        """A pure jitted ``fn(batch_dict) -> predictions`` closure over the
        current weights — the serving artifact (the reference's equivalent is
        the Estimator PredictOutput export, estimator/utils.py:91-117).
        The returned fn expects canonical batches (use
        ``features.canonicalize_batch``) and is safe to hand to a server
        loop; weights are baked in at export time."""
        if self.state is None:
            raise ValueError("Model has no variables yet; call fit/predict first.")
        module = self.module
        # REAL copies: the live state buffers get donated by the next train
        # step, which would leave the serving closure holding deleted arrays
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), self.state.params)
        model_state = jax.tree.map(
            lambda x: jnp.array(x, copy=True), self.state.model_state
        )

        cd_scope = self._cd_scope

        @jax.jit
        def serve(batch):
            with cd_scope():
                return module.apply({"params": params, **model_state}, batch,
                                    training=False)

        return serve

    def summary(self, print_fn=print):
        """Keras-surface parity: per-collection parameter counts.

        Requires built variables (fit/predict/evaluate at least once, or
        any batch through ``_ensure_built``)."""
        if self.state is None:
            raise ValueError(
                "Model has no variables yet; call fit/predict first.")
        import numpy as np

        lines = ["Model: %s" % type(self.module).__name__]
        total = 0
        flat = jax.tree_util.tree_flatten_with_path(self.state.params)[0]
        for path, leaf in flat:
            name = "/".join(getattr(p, "key", str(p)) for p in path)
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            total += n
            lines.append("  %-58s %-16s %12s" % (
                name, str(leaf.shape), format(n, ",")))
        lines.append("Total params: %s" % format(total, ","))
        for line in lines:
            print_fn(line)
        return total

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------
    def get_variables(self):
        if self.state is None:
            raise ValueError("Model has no variables yet; call fit/predict first.")
        return {"params": self.state.params, "model_state": self.state.model_state}

    def save_weights(self, path):
        from . import checkpoint

        checkpoint.save_weights(self, path)

    def load_weights(self, path):
        from . import checkpoint

        checkpoint.load_weights(self, path)

    def save(self, path):
        from . import checkpoint

        checkpoint.save_model(self, path)
