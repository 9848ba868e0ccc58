"""Core training engine (analogue of reference ``speechbrain/core.py``).

The ``Brain`` keeps the reference's experiment contract — subclass, override
``compute_forward``/``compute_objectives``, call ``fit``/``evaluate``
(``core.py:330-1277``) — but the execution model is TPU-native:

- ``compute_forward(params, batch, stage, rng)`` and
  ``compute_objectives(predictions, batch, stage)`` are *pure functions* of
  explicit parameter pytrees and array batches. The engine wraps them in a
  single jit-compiled train step (forward + backward + both optimizer updates
  + gradient clipping + nonfinite guard) — one XLA program per batch shape.
- Data parallelism is a device mesh with the batch axis sharded
  (``parallel.mesh``): XLA inserts the gradient ``psum`` over ICI, replacing
  the reference's DDP allreduce-in-backward (``core.py:1150-1169``).
- Parameter freezing (the linear-probe schedule,
  ``MIR_ST500/train_audio_ssl.py:194-199``) is a static argument: frozen
  modules get ``stop_gradient`` and their optimizer update is skipped — the
  exact analogue of ``requires_grad=False`` + untouched optimizer state.
- Mixed precision: ``precision: bf16`` keeps fp32 master params and casts
  params + float batch arrays to bf16 inside the loss (the reference's AMP
  GradScaler, ``core.py:537-538``, is unnecessary with bf16's fp32 range).
- The nonfinite-loss guard replicates ``check_gradients``
  (``core.py:882-924``): skip the optimizer step on a nonfinite loss, raise
  after ``nonfinite_patience`` consecutive skips; clip grads to
  ``max_grad_norm`` global norm.
"""
from __future__ import annotations

import argparse
import functools
import inspect
import logging
import os
import shutil
import sys
import time
from datetime import date
from enum import Enum, auto
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.config import load_hyperyaml, convert_to_yaml
from svt_speechbrain_tpu.dataio.batch import PaddedBatch, PaddedData
from svt_speechbrain_tpu.dataio.dataloader import SaveableDataLoader, LoopedLoader, make_dataloader
from svt_speechbrain_tpu.dataio.sampler import DistributedSamplerWrapper, ReproducibleRandomSampler
from svt_speechbrain_tpu.parallel import mesh as mesh_lib
from svt_speechbrain_tpu.parallel.distributed import run_on_main, if_main_process
from svt_speechbrain_tpu.utils.checkpoints import Checkpointer, PytreeHandle
from svt_speechbrain_tpu.utils.logger import setup_logging, get_environment_description, format_order_of_magnitude
from svt_speechbrain_tpu.nnet.core import count_params

logger = logging.getLogger(__name__)

DEFAULT_LOG_CONFIG = None
INTRA_EPOCH_CKPT_FLAG = "brain_intra_epoch_ckpt"


class Stage(Enum):
    """Stage of experiment: TRAIN, VALID, TEST (reference ``core.py:321``)."""

    TRAIN = auto()
    VALID = auto()
    TEST = auto()


def enable_compile_cache(cache_dir=None):
    """Opt into jax's persistent compilation cache so repeat runs skip the
    multi-minute large-model compiles. Called from experiment setup; safe to
    call repeatedly / on jax versions without the knobs."""
    import jax

    cache_dir = cache_dir or os.environ.get("JAX_CACHE_DIR",
                                            "/tmp/svt_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def create_experiment_directory(experiment_directory, hyperparams_to_save=None,
                                overrides={}, log_config=DEFAULT_LOG_CONFIG,
                                save_env_desc=True):
    """Create the output folder with resolved hyperparams, log and env snapshot
    (reference ``core.py:50-121``); main process only. Also enables the
    persistent XLA compile cache (set ``JAX_CACHE_DIR`` to relocate it)."""
    enable_compile_cache()

    def _create(experiment_directory, hyperparams_to_save, overrides, save_env_desc):
        os.makedirs(experiment_directory, exist_ok=True)
        if hyperparams_to_save is not None:
            hyperparams_filename = os.path.join(experiment_directory, "hyperparams.yaml")
            with open(hyperparams_to_save) as f:
                resolved_yaml = f.read()
            with open(hyperparams_filename, "w") as w:
                w.write("# Generated %s from:\n" % date.today())
                w.write("# %s\n" % os.path.abspath(hyperparams_to_save))
                w.write("# yamllint disable\n")
                if overrides:
                    w.write("# Overrides:\n")
                    for line in str(overrides).splitlines():
                        w.write(f"#   {line}\n")
                w.write(resolved_yaml)
        # copy the executing script for reproducibility (reference core.py:94-98)
        module = inspect.getmodule(inspect.currentframe().f_back.f_back)
        if module is not None and hasattr(module, "__file__"):
            callingfile = os.path.realpath(module.__file__)
            if os.path.exists(callingfile):
                shutil.copy(callingfile, experiment_directory)
        log_file = os.path.join(experiment_directory, "log.txt")
        setup_logging(log_file)
        sys.excepthook = _logging_excepthook
        logger.info("Beginning experiment!")
        logger.info(f"Experiment folder: {experiment_directory}")
        if save_env_desc:
            description_str = get_environment_description()
            with open(os.path.join(experiment_directory, "env.log"), "w") as fo:
                fo.write(description_str)

    run_on_main(_create, args=[experiment_directory, hyperparams_to_save,
                               overrides, save_env_desc])


def _logging_excepthook(exc_type, exc_value, exc_traceback):
    """Interrupt exception raising to log the error (reference ``core.py:124``)."""
    logger.error("Exception:", exc_info=(exc_type, exc_value, exc_traceback))


def parse_arguments(arg_list=None):
    """Parse CLI as ``experiment.py params.yaml --overrides``
    (reference ``core.py:129-301``).

    Returns (param_file, run_opts dict, overrides yaml string).
    """
    if arg_list is None:
        arg_list = sys.argv[1:]
    parser = argparse.ArgumentParser(description="Run an experiment")
    parser.add_argument("param_file", type=str,
                        help="A yaml-formatted file using the extended YAML syntax.")
    parser.add_argument("--debug", default=False, action="store_true",
                        help="Run the experiment with only a few batches for all "
                             "datasets, to ensure code runs without crashing.")
    parser.add_argument("--debug_batches", type=int, default=2,
                        help="Number of batches to run in debug mode.")
    parser.add_argument("--debug_epochs", type=int, default=2,
                        help="Number of epochs to run in debug mode.")
    parser.add_argument("--log_config", type=str, help="Logging config file path")
    parser.add_argument("--device", type=str, default=None,
                        help="JAX platform to run on (tpu, cpu)")
    parser.add_argument("--data_parallel_count", type=int, default=-1,
                        help="Number of devices in the data-parallel mesh (-1 = all)")
    parser.add_argument("--fsdp", default=False, action="store_true",
                        help="Fully shard parameters/optimizer state over the "
                             "data axis (ZeRO-3-style) instead of replicating")
    parser.add_argument("--distributed_launch", default=False, action="store_true",
                        help="Initialize the multi-host (pod) runtime")
    parser.add_argument("--distributed_backend", type=str, default="ici",
                        help="Interconnect hint (kept for CLI compatibility)")
    parser.add_argument("--find_unused_parameters", default=False, action="store_true",
                        help="Kept for CLI compatibility with the reference")
    parser.add_argument("--jit_module_keys", type=str, nargs="*",
                        help="Kept for CLI compatibility; everything is jitted")
    parser.add_argument("--precision", type=str, default=None,
                        choices=["fp32", "bf16"], help="Compute precision")
    parser.add_argument("--auto_mix_prec", default=None, action="store_true",
                        help="Alias for --precision bf16")
    parser.add_argument("--max_grad_norm", type=float, default=None,
                        help="Gradient norm clipping threshold")
    parser.add_argument("--nonfinite_patience", type=int, default=None,
                        help="Number of batches to accept nonfinite loss values")
    parser.add_argument("--noprogressbar", default=None, action="store_true",
                        help="Disable the progress bar")
    parser.add_argument("--ckpt_interval_minutes", type=float, default=None,
                        help="Save intra-epoch checkpoints every N minutes")
    parser.add_argument("--grad_accumulation_factor", type=int, default=None,
                        help="Number of batches to accumulate gradients over")

    run_opts, overrides = parser.parse_known_args(arg_list)
    run_opts = vars(run_opts)
    param_file = run_opts.pop("param_file")
    overrides = convert_to_yaml(overrides)
    # drop run-opts not given so hparams-file values can take precedence
    run_opts = {k: v for k, v in run_opts.items() if v is not None}
    if run_opts.pop("auto_mix_prec", None):
        run_opts["precision"] = "bf16"
    if run_opts.get("device"):
        os.environ.setdefault("JAX_PLATFORMS", run_opts["device"])
    return param_file, run_opts, overrides


class Brain:
    """Training/eval engine (reference ``core.py:330``).

    Arguments
    ---------
    modules : dict[str, nnet.core.Module]
        Named functional modules; the engine owns their parameter pytrees in
        ``self.params[name]``.
    opt_class : callable | None
        Default single-optimizer factory ``lr -> optax transform`` (used when
        ``init_optimizers`` is not overridden). Recipes with several
        optimizers override ``init_optimizers`` and call ``add_optimizer``.
    hparams : dict
        Resolved experiment config, exposed as ``self.hparams.<key>``.
    run_opts : dict
        Execution options (see ``parse_arguments``); precedence
        CLI > hparams > defaults (reference ``core.py:453-472``).
    checkpointer : Checkpointer | None
        Module params / optimizer states / brain counters are auto-registered.

    Example
    -------
    >>> import functools
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import optax
    >>> from svt_speechbrain_tpu.nnet.linear import Linear
    >>> from svt_speechbrain_tpu.nnet import losses
    >>> from svt_speechbrain_tpu.dataio.batch import PaddedData
    >>> class SimpleBrain(Brain):
    ...     def compute_forward(self, params, batch, stage, rng=None):
    ...         x, lens = batch["sig"]
    ...         return self.modules.model(params["model"], x), lens
    ...     def compute_objectives(self, predictions, batch, stage):
    ...         y, lens = predictions
    ...         target, tlens = batch["anno"]
    ...         return losses.mse_loss(y, target.astype(jnp.float32),
    ...                                length=tlens)
    ...     def init_optimizers(self):
    ...         self.add_optimizer("opt", functools.partial(optax.sgd),
    ...                            ["model"], lr=0.3)
    >>> brain = SimpleBrain(modules={"model": Linear(2, 4)},
    ...                     hparams={"seed": 0},
    ...                     run_opts={"noprogressbar": True})
    >>> brain.init_optimizers()
    >>> rng = np.random.default_rng(0)
    >>> x = rng.normal(size=(8, 5, 4)).astype(np.float32)
    >>> target = x[..., :2] + x[..., 2:]          # learnable linear map
    >>> lens = np.ones(8, np.float32)
    >>> batch = {"sig": PaddedData(x, lens), "anno": PaddedData(target, lens)}
    >>> curve = [float(brain.fit_batch(batch)) for _ in range(20)]
    >>> curve[-1] < 0.2 * curve[0]                # loss falls on the jit path
    True
    """

    run_opt_defaults = {
        "debug": False,
        "debug_batches": 2,
        "debug_epochs": 2,
        "device": None,
        "data_parallel_count": -1,
        "distributed_launch": False,
        "distributed_backend": "ici",
        "fsdp": False,
        "precision": "fp32",
        "max_grad_norm": 5.0,
        "nonfinite_patience": 3,
        "noprogressbar": False,
        "ckpt_interval_minutes": 0,
        "grad_accumulation_factor": 1,
        # hardware RNG (XLA RngBitGenerator) for dropout keys on TPU:
        # threefry mask generation costs ~25% of a dropout-heavy train step
        # (measured +37% train throughput on v5e); CPU keeps threefry so
        # golden/parity tests are unaffected
        "fast_rng": True,
    }

    def __init__(self, modules=None, opt_class=None, hparams=None, run_opts=None,
                 checkpointer=None):
        self.opt_class = opt_class
        self.checkpointer = checkpointer
        run_opts = run_opts or {}
        hparams = hparams or {}

        for arg, default in self.run_opt_defaults.items():
            if arg in run_opts:
                setattr(self, arg, run_opts[arg])
            elif arg in hparams:
                setattr(self, arg, hparams[arg])
            else:
                setattr(self, arg, default)

        if self.fast_rng and jax.default_backend() == "tpu":
            try:
                jax.config.update("jax_default_prng_impl", "rbg")
            except Exception:
                pass

        self.hparams = SimpleNamespace(**hparams)
        self.modules = SimpleNamespace(**(modules or {}))
        self.module_names = list((modules or {}).keys())

        # device mesh (pure data parallelism by default; SURVEY §2.4)
        devices = jax.devices()
        if self.data_parallel_count and self.data_parallel_count > 0:
            devices = devices[: self.data_parallel_count]
        self.mesh = mesh_lib.make_mesh(devices=devices)
        self.n_devices = len(devices)

        # parameter init
        seed = int(getattr(self.hparams, "seed", 1986))
        self.rng = jax.random.PRNGKey(seed)
        self.params = {}
        self.states = {}  # modules with running statistics (BatchNorm)
        for name in self.module_names:
            self.rng, sub = jax.random.split(self.rng)
            module = getattr(self.modules, name)
            self.params[name] = module.init(sub)
            if hasattr(module, "init_state"):
                self.states[name] = module.init_state()
        self.params = self._place_params(self.params)
        self.stateful = bool(self.states)
        if self.stateful:
            self.states = mesh_lib.replicate(self.mesh, self.states)

        self.optimizers = {}
        self.opt_states = {}
        self.frozen_modules = frozenset()

        # counters (reference core.py:529-547, 1259-1277)
        self.avg_train_loss = 0.0
        self.step = 0
        self.optimizer_step = 0
        self.nonfinite_count = 0
        self.train_sampler = None

        if self.checkpointer is not None:
            self.checkpointer.add_recoverable("brain", _BrainCounters(self))
            for name in self.module_names:
                self.checkpointer.add_recoverable(
                    name, PytreeHandle(
                        get=functools.partial(self._get_module_params, name),
                        set=functools.partial(self._set_module_params, name)))
            if self.stateful:
                self.checkpointer.add_recoverable(
                    "model_states", PytreeHandle(
                        get=lambda: self.states,
                        set=lambda tree: setattr(
                            self, "states", mesh_lib.replicate(self.mesh, tree))))

        total_params = count_params(self.params)
        if total_params > 0:
            clsname = self.__class__.__name__
            num_str, units = format_order_of_magnitude(total_params)
            logger.info(f"{num_str}{units} trainable parameters in {clsname}")

        self._compiled_steps = {}
        self._compiled_eval = None
        # batch keys that never reach the device (variable-shape host-side
        # references like per-song note annotations — keeps jit signatures
        # stable across songs)
        self.host_only_keys = set()

    # --------------------------------------------------------- param access
    def _place_params(self, tree):
        """Place a param/optimizer pytree on the mesh: replicated (the
        reference's DP semantics) or fully sharded over the data axis when
        the ``fsdp`` run-opt is set (ZeRO-3-style; XLA inserts the
        all-gathers/reduce-scatters — ``parallel.fsdp``)."""
        if getattr(self, "fsdp", False):
            from svt_speechbrain_tpu.parallel.fsdp import apply_fsdp

            return apply_fsdp(tree, self.mesh)
        return mesh_lib.replicate(self.mesh, tree)

    def _get_module_params(self, name):
        return self.params[name]

    def _set_module_params(self, name, tree):
        self.params[name] = self._place_params(tree)

    def load_module_params(self, name, tree):
        """Install externally-loaded (e.g. HF-converted) parameters."""
        self._set_module_params(name, jax.tree_util.tree_map(jnp.asarray, tree))

    def load_module_state(self, name, tree):
        """Install externally-loaded running statistics (BatchNorm etc.)."""
        self.states[name] = mesh_lib.replicate(
            self.mesh, jax.tree_util.tree_map(jnp.asarray, tree))

    # ------------------------------------------------------------ overrides
    def compute_forward(self, params, batch, stage, rng=None):
        """Forward pass: (params, array batch, stage, rng) → predictions.

        Must be a pure jax function of ``params``/``batch``. ``batch`` is a
        dict of arrays / ``PaddedData`` pairs (see ``PaddedBatch.numpy_arrays``).
        """
        raise NotImplementedError

    def compute_objectives(self, predictions, batch, stage):
        """Loss computation: (predictions, array batch, stage) → scalar loss."""
        raise NotImplementedError

    def on_stage_start(self, stage, epoch=None):
        """Called at the beginning of each TRAIN/VALID/TEST stage."""

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Called at the end of each stage."""

    def on_fit_start(self):
        """Called once at the start of ``fit`` (reference ``core.py:771``):
        initializes optimizers and resumes from checkpoint."""
        self.init_optimizers()
        if self.checkpointer is not None:
            self.checkpointer.recover_if_possible()

    def on_evaluate_start(self, max_key=None, min_key=None):
        """Recover best checkpoint by key (reference ``core.py:811-833``)."""
        if self.checkpointer is not None:
            self.checkpointer.recover_if_possible(max_key=max_key, min_key=min_key)

    def on_evaluate_batch_end(self, batch, predictions, loss, stage):
        """Host-side eval hook: ``predictions`` are numpy. Recipes stitch
        song-level predictions here (the reference did this inline in
        ``compute_objectives``, ``train_audio_ssl.py:78-141``)."""

    # ----------------------------------------------------------- optimizers
    def init_optimizers(self):
        """Default: one optimizer over all modules (reference ``core.py:780``)."""
        if self.opt_class is not None:
            self.add_optimizer("opt", self.opt_class, self.module_names)

    def add_optimizer(self, name, opt_factory, module_names, lr=None):
        """Register an optimizer owning a subset of modules.

        ``opt_factory``: an optax transform, or a callable returning one
        (``lambda: optax.adam(lr)`` / ``functools.partial(optax.adam, lr)``).
        The learning rate is made runtime-adjustable via
        ``optax.inject_hyperparams`` when ``lr`` is given.
        """
        import optax

        if callable(opt_factory) and not isinstance(opt_factory, optax.GradientTransformation):
            if lr is not None:
                tx = optax.inject_hyperparams(opt_factory)(learning_rate=lr)
            else:
                tx = opt_factory()
        else:
            tx = opt_factory
        subset = {n: self.params[n] for n in module_names}
        state = tx.init(subset)
        self.optimizers[name] = {"tx": tx, "modules": tuple(module_names)}
        self.opt_states[name] = self._place_params(state)
        if self.checkpointer is not None:
            self.checkpointer.add_recoverable(
                f"{name}_opt", PytreeHandle(
                    get=lambda name=name: self.opt_states[name],
                    set=lambda tree, name=name: self.opt_states.__setitem__(
                        name, self._place_params(tree))))
        self._compiled_steps = {}

    def set_learning_rate(self, opt_name, lr):
        """Write a new lr into injected hyperparams (the analogue of the
        reference's ``update_learning_rate``, ``schedulers.py:18``) — no
        recompilation, the lr is part of optimizer state."""
        state = self.opt_states[opt_name]
        if hasattr(state, "hyperparams"):
            state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        else:
            raise ValueError(
                f"Optimizer {opt_name} was not created with an adjustable lr")

    def get_learning_rate(self, opt_name):
        state = self.opt_states[opt_name]
        if hasattr(state, "hyperparams"):
            return float(np.asarray(state.hyperparams["learning_rate"]))
        raise ValueError(f"Optimizer {opt_name} has no adjustable lr")

    def set_frozen_modules(self, names):
        """Freeze modules by name (linear probing). Static per compilation:
        frozen params get stop_gradient and their optimizer is skipped."""
        self.frozen_modules = frozenset(names)

    # ------------------------------------------------------------- batching
    def make_dataloader(self, dataset, stage, ckpt_prefix="dataloader-", **loader_kwargs):
        """Build a loader with stage defaults (reference ``core.py:648-710``):
        train shuffling via ReproducibleRandomSampler, per-process sharding on
        pods, checkpointable position."""
        if stage == Stage.TRAIN:
            loader_kwargs = self._train_loader_specifics(dataset, loader_kwargs)
        dataloader = make_dataloader(dataset, **loader_kwargs)
        if (self.checkpointer is not None and ckpt_prefix is not None
                and isinstance(dataloader, (SaveableDataLoader, LoopedLoader))):
            self.checkpointer.add_recoverable(ckpt_prefix + stage.name, dataloader)
        return dataloader

    def _train_loader_specifics(self, dataset, loader_kwargs):
        sampler = loader_kwargs.get("sampler", None)
        shuffle = loader_kwargs.get("shuffle", False)
        seed = int(getattr(self.hparams, "seed", 1986))
        if shuffle and sampler is None:
            sampler = ReproducibleRandomSampler(dataset, seed=seed)
            loader_kwargs["sampler"] = sampler
            del loader_kwargs["shuffle"]
        if jax.process_count() > 1:
            from svt_speechbrain_tpu.dataio.sampler import SequentialSampler

            inner = sampler or SequentialSampler(dataset)
            sampler = DistributedSamplerWrapper(inner)
            loader_kwargs["sampler"] = sampler
            loader_kwargs.pop("shuffle", None)
        self.train_sampler = sampler
        return loader_kwargs

    def _batch_arrays(self, batch, accum=1):
        """Extract the jit-feedable arrays from a PaddedBatch (or pass dicts
        through) and shard onto the mesh."""
        if isinstance(batch, PaddedBatch):
            arrays = batch.numpy_arrays()
        else:
            arrays = batch
        if self.host_only_keys:
            arrays = {k: v for k, v in arrays.items() if k not in self.host_only_keys}

        # pad the batch axis to a multiple of the mesh size so the data axis
        # shards evenly; padded rows carry relative length 0 so the masked
        # losses ignore them, and "valid_rows" lets models exclude them from
        # whole-tensor statistics.
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(arrays)
                  if np.asarray(x).ndim >= 1]
        real_b = leaves[0].shape[0] if leaves else 0
        multiple = self.n_devices * accum
        target_b = int(-(-real_b // multiple) * multiple) if real_b else 0
        self._real_batch_size = real_b
        self._padded_batch_size = target_b

        def pad_rows(x):
            x = np.asarray(x)
            if x.ndim == 0 or x.shape[0] != real_b or target_b == real_b:
                return x
            pads = [(0, target_b - real_b)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, pads)

        arrays = jax.tree_util.tree_map(pad_rows, arrays)
        if real_b and target_b != real_b:
            arrays["valid_rows"] = np.pad(
                np.ones(real_b, np.float32), (0, target_b - real_b))
        elif real_b:
            arrays["valid_rows"] = np.ones(real_b, np.float32)

        def cast(x):
            x = np.asarray(x)
            if x.dtype == np.float64:
                return x.astype(np.float32)
            if x.dtype == np.int64:
                return x.astype(np.int32)
            return x

        arrays = jax.tree_util.tree_map(cast, arrays)
        if accum > 1:
            # micro-batch leading axis for the in-step lax.scan; the data
            # axis (axis 1 after the split) stays sharded over the mesh
            def split(x):
                x = np.asarray(x)
                if x.ndim == 0 or x.shape[0] != target_b:
                    return x
                return x.reshape(accum, target_b // accum, *x.shape[1:])

            arrays = jax.tree_util.tree_map(split, arrays)
            return mesh_lib.shard_batch(self.mesh, arrays, batch_axis=1)
        return mesh_lib.shard_batch(self.mesh, arrays)

    def _trim_batch_rows(self, tree):
        """Strip device-padding rows from per-batch outputs (host side)."""
        real_b, padded_b = self._real_batch_size, self._padded_batch_size
        if real_b == padded_b:
            return tree

        def trim(x):
            x = np.asarray(x)
            if x.ndim >= 1 and x.shape[0] == padded_b:
                return x[:real_b]
            return x

        return jax.tree_util.tree_map(trim, tree)

    # ------------------------------------------------------------ train step
    def _cast_for_compute(self, tree):
        if self.precision != "bf16":
            return tree

        def cast(x):
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                return x.astype(jnp.bfloat16)
            return x

        return jax.tree_util.tree_map(cast, tree)

    def _make_train_step(self, frozen):
        import optax

        opt_items = [(name, cfg["tx"], cfg["modules"]) for name, cfg in self.optimizers.items()]
        trainable_names = [n for n in self.module_names if n not in frozen]
        accum = max(int(self.grad_accumulation_factor), 1)

        def train_step(params, opt_states, model_states, batch, rng):
            frozen_params = {n: params[n] for n in frozen}
            train_params = {n: params[n] for n in trainable_names}

            def loss_fn(train_params, micro_batch, states_in, step_rng):
                merged = {**jax.lax.stop_gradient(frozen_params), **train_params}
                merged = self._cast_for_compute(merged)
                if self.stateful:
                    preds, new_states = self.compute_forward(
                        merged, states_in, micro_batch, Stage.TRAIN, step_rng)
                else:
                    preds = self.compute_forward(merged, micro_batch, Stage.TRAIN, step_rng)
                    new_states = states_in
                loss = self.compute_objectives(preds, micro_batch, Stage.TRAIN)
                if isinstance(loss, tuple):
                    loss = loss[0]
                return loss.astype(jnp.float32), new_states

            if accum == 1:
                (loss, new_model_states), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(train_params, batch, model_states, rng)
            else:
                # gradient accumulation (reference ``core.py:856-878``):
                # scan over micro-batches (batch axis 0 pre-split by fit_batch)
                def accum_step(carry, inputs):
                    grads_acc, loss_acc, states_in = carry
                    micro_batch, step_rng = inputs
                    (loss, states_out), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(train_params, micro_batch,
                                               states_in, step_rng)
                    grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                    return (grads_acc, loss_acc + loss, states_out), None

                zero_grads = jax.tree_util.tree_map(jnp.zeros_like, train_params)
                rngs = jax.random.split(rng, accum)
                (grads, loss_sum, new_model_states), _ = jax.lax.scan(
                    accum_step, (zero_grads, 0.0, model_states), (batch, rngs))
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                loss = loss_sum / accum

            # reference check_gradients (core.py:882-924): clip global norm,
            # skip the step when the loss is nonfinite
            gnorm = optax.global_norm(grads)
            finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            # torch clip_grad_norm_ adds 1e-6 to the denominator — matched
            # exactly so clipped-step trajectories agree with the reference
            clip = jnp.minimum(1.0, self.max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * clip, grads)

            new_params = dict(params)
            new_opt_states = dict(opt_states)
            for name, tx, module_names in opt_items:
                owned = [n for n in module_names if n in trainable_names]
                if not owned:
                    continue
                sub_params = {n: params[n] for n in module_names}
                sub_grads = {n: grads.get(n, jax.tree_util.tree_map(jnp.zeros_like, params[n]))
                             for n in module_names}
                updates, new_state = tx.update(sub_grads, opt_states[name], sub_params)
                updated = optax.apply_updates(sub_params, updates)

                def select(new, old):
                    return jax.tree_util.tree_map(lambda a, b: jnp.where(finite, a, b), new, old)

                for n in owned:
                    new_params[n] = select(updated[n], params[n])
                new_opt_states[name] = select(new_state, opt_states[name])
            return new_params, new_opt_states, new_model_states, loss, finite

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    def _get_train_step(self):
        key = self.frozen_modules
        if key not in self._compiled_steps:
            self._compiled_steps[key] = self._make_train_step(key)
        return self._compiled_steps[key]

    def _make_eval_step(self):
        def eval_step(params, model_states, batch, stage):
            params = self._cast_for_compute(params)
            if self.stateful:
                preds, _ = self.compute_forward(params, model_states, batch, stage, None)
            else:
                preds = self.compute_forward(params, batch, stage, None)
            loss = self.compute_objectives(preds, batch, stage)
            if isinstance(loss, tuple):
                loss = loss[0]
            return preds, loss.astype(jnp.float32)

        return jax.jit(eval_step, static_argnames=("stage",))

    # ----------------------------------------------------------------- fit
    def fit_batch(self, batch):
        """One optimization step (reference ``core.py:835-880``).

        With ``grad_accumulation_factor > 1`` the batch is split into
        micro-batches along axis 0 and gradients accumulate inside one jitted
        ``lax.scan`` before a single optimizer update (the reference's
        accumulate-then-step). On TPU prefer one larger sharded batch when it
        fits — accumulation exists for memory-bound configurations."""
        accum = max(int(self.grad_accumulation_factor), 1)
        arrays = self._batch_arrays(batch, accum=accum)
        self.rng, step_rng = jax.random.split(self.rng)
        train_step = self._get_train_step()
        self.params, self.opt_states, self.states, loss, finite = train_step(
            self.params, self.opt_states, self.states, arrays, step_rng)
        loss_val = float(np.asarray(loss))
        if not bool(np.asarray(finite)):
            self.nonfinite_count += 1
            logger.warning(f"Loss is {loss_val}. Step skipped "
                           f"({self.nonfinite_count}/{self.nonfinite_patience}).")
            if self.nonfinite_count > self.nonfinite_patience:
                raise ValueError("Loss is not finite and patience is exhausted.")
        else:
            self.optimizer_step += 1
        return loss_val

    def evaluate_batch(self, batch, stage):
        """Evaluation on one batch: device forward + host hook."""
        arrays = self._batch_arrays(batch)
        if self._compiled_eval is None:
            self._compiled_eval = self._make_eval_step()
        preds, loss = self._compiled_eval(self.params, self.states, arrays, stage)
        preds_np = self._trim_batch_rows(jax.tree_util.tree_map(np.asarray, preds))
        loss_val = float(np.asarray(loss))
        self.on_evaluate_batch_end(batch, preds_np, loss_val, stage)
        return loss_val

    def fit(self, epoch_counter, train_set, valid_set=None, progressbar=None,
            train_loader_kwargs={}, valid_loader_kwargs={}):
        """Epoch/step loops (reference ``core.py:952-1118``)."""
        from tqdm import tqdm

        if not isinstance(train_set, (SaveableDataLoader, LoopedLoader)):
            train_set = self.make_dataloader(
                train_set, stage=Stage.TRAIN, **train_loader_kwargs)
        if valid_set is not None and not isinstance(valid_set, (SaveableDataLoader, LoopedLoader)):
            valid_set = self.make_dataloader(
                valid_set, stage=Stage.VALID, ckpt_prefix=None, **valid_loader_kwargs)

        self.on_fit_start()

        if progressbar is None:
            progressbar = not self.noprogressbar

        for epoch in epoch_counter:
            # TRAIN stage
            self.on_stage_start(Stage.TRAIN, epoch)
            if self.train_sampler is not None and hasattr(self.train_sampler, "set_epoch"):
                self.train_sampler.set_epoch(epoch)
            self.avg_train_loss = 0.0
            self.step = 0
            last_ckpt_time = time.time()
            enable = progressbar and if_main_process()
            with tqdm(train_set, dynamic_ncols=True, disable=not enable) as t:
                for batch in t:
                    self.step += 1
                    loss = self.fit_batch(batch)
                    self.avg_train_loss = self.update_average(loss, self.avg_train_loss)
                    t.set_postfix(train_loss=self.avg_train_loss)
                    if self.debug and self.step == self.debug_batches:
                        break
                    if (self.checkpointer is not None
                            and self.ckpt_interval_minutes > 0
                            and time.time() - last_ckpt_time >= self.ckpt_interval_minutes * 60.0):
                        run_on_main(self._save_intra_epoch_ckpt)
                        last_ckpt_time = time.time()
            self.on_stage_end(Stage.TRAIN, self.avg_train_loss, epoch)
            self.train_loss = self.avg_train_loss
            self.avg_train_loss = 0.0
            self.step = 0

            # VALID stage
            if valid_set is not None:
                self.on_stage_start(Stage.VALID, epoch)
                avg_valid_loss = 0.0
                for batch in tqdm(valid_set, dynamic_ncols=True, disable=not enable):
                    self.step += 1
                    loss = self.evaluate_batch(batch, stage=Stage.VALID)
                    avg_valid_loss = self.update_average(loss, avg_valid_loss)
                    if self.debug and self.step == self.debug_batches:
                        break
                self.step = 0
                run_on_main(self.on_stage_end,
                            args=[Stage.VALID, avg_valid_loss, epoch])

            if self.debug and epoch == self.debug_epochs:
                break

    def _save_intra_epoch_ckpt(self):
        """Intra-epoch checkpoint (reference ``core.py:1127-1135``)."""
        self.checkpointer.save_and_keep_only(
            end_of_epoch=False, num_to_keep=1,
            ckpt_predicate=lambda c: INTRA_EPOCH_CKPT_FLAG in c.meta,
            meta={INTRA_EPOCH_CKPT_FLAG: True}, verbosity=logging.DEBUG)

    def evaluate(self, test_set, max_key=None, min_key=None, progressbar=None,
                 test_loader_kwargs={}):
        """Test loop (reference ``core.py:1171-1237``)."""
        from tqdm import tqdm

        if progressbar is None:
            progressbar = not self.noprogressbar
        if not isinstance(test_set, (SaveableDataLoader, LoopedLoader)):
            test_loader_kwargs["ckpt_prefix"] = None
            test_set = self.make_dataloader(test_set, Stage.TEST, **test_loader_kwargs)
        self.on_evaluate_start(max_key=max_key, min_key=min_key)
        self.on_stage_start(Stage.TEST, epoch=None)
        self.step = 0
        avg_test_loss = 0.0
        for batch in tqdm(test_set, dynamic_ncols=True,
                          disable=not (progressbar and if_main_process())):
            self.step += 1
            loss = self.evaluate_batch(batch, stage=Stage.TEST)
            avg_test_loss = self.update_average(loss, avg_test_loss)
            if self.debug and self.step == self.debug_batches:
                break
        run_on_main(self.on_stage_end, args=[Stage.TEST, avg_test_loss, None])
        self.step = 0
        return avg_test_loss

    def update_average(self, loss, avg_loss):
        """Running average (reference ``core.py:1239-1257``)."""
        if np.isfinite(loss):
            avg_loss -= avg_loss / self.step
            avg_loss += loss / self.step
        return avg_loss


class _BrainCounters:
    """Checkpointable brain counters (reference ``core.py:1259-1277``) plus
    the dropout RNG stream — which the reference does NOT save, so its
    crash-resumed runs diverge from uninterrupted ones whenever dropout is
    on. Saving it makes kill → recover → continue bit-equal
    (``tests/test_crash_recovery.py``)."""

    def __init__(self, brain):
        self.brain = brain

    def state_dict(self):
        return {
            "step": self.brain.step,
            "avg_train_loss": float(self.brain.avg_train_loss),
            "optimizer_step": self.brain.optimizer_step,
            # raw key bits: (2,) threefry or (4,) rbg — impl-agnostic
            "rng": np.asarray(self.brain.rng).tolist(),
        }

    def load_state_dict(self, data, end_of_epoch=True):
        del end_of_epoch
        self.brain.step = data["step"]
        self.brain.avg_train_loss = data["avg_train_loss"]
        self.brain.optimizer_step = data["optimizer_step"]
        if "rng" in data:  # absent in pre-round-4 checkpoints
            self.brain.rng = jnp.asarray(data["rng"], jnp.uint32)
