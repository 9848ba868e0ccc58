"""Checkpointing (analogue of reference ``speechbrain/utils/checkpoints.py``).

Same on-disk model as the reference: a directory per checkpoint
(``CKPT+<timestamp>/``) containing one file per *recoverable* plus a
``CKPT.yaml`` meta file (unixtime, end-of-epoch flag, user keys); retention
policies keep the N best checkpoints by meta keys (``save_and_keep_only``,
reference ``checkpoints.py:570``).

Recoverable protocol (the analogue of ``@mark_as_saver/@mark_as_loader``
hook registration, reference ``checkpoints.py:190-321``) — an object is
checkpointable if it satisfies any of, in priority order:

1. ``ckpt_save(path)`` / ``ckpt_load(path, end_of_epoch)`` methods;
2. ``state_dict()`` / ``load_state_dict(data[, end_of_epoch])`` methods
   (python-state objects: schedulers, counters, loaders) — stored as YAML;
3. a ``PytreeHandle`` wrapping getter/setter for a JAX pytree (params,
   optimizer states) — stored as flax msgpack.
"""
from __future__ import annotations

import inspect
import logging
import os
import shutil
import time

import yaml

logger = logging.getLogger(__name__)

CKPT_PREFIX = "CKPT"
METAFNAME = f"{CKPT_PREFIX}.yaml"


class PytreeHandle:
    """Adapter making an engine-owned pytree checkpointable.

    ``get()`` returns the current pytree; ``set(tree)`` installs the restored
    one. Serialization is flax msgpack (host round-trip, device-agnostic).
    """

    def __init__(self, get, set):
        self._get = get
        self._set = set

    def ckpt_save(self, path):
        from flax import serialization
        import jax

        tree = jax.device_get(self._get())
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(tree))

    def ckpt_load(self, path, end_of_epoch=True):
        from flax import serialization
        import jax

        del end_of_epoch
        target = jax.device_get(self._get())
        with open(path, "rb") as f:
            tree = serialization.from_bytes(target, f.read())
        self._set(tree)


class Checkpoint:
    """A found checkpoint: ``path``, ``meta`` dict, ``paramfiles`` dict."""

    def __init__(self, path, meta, paramfiles):
        self.path = path
        self.meta = meta
        self.paramfiles = paramfiles

    def __repr__(self):
        return f"Checkpoint({self.path})"


def ckpt_recency(ckpt):
    """Recency importance key (reference ``checkpoints.py:376``)."""
    return ckpt.meta["unixtime"]


def _publish(tmp_path, final_path):
    """Atomically promote a fully-written temp file to its final name.

    fsync before the rename so a complete-looking file is complete even
    across a host crash, then ``os.replace`` so readers only ever observe
    the file fully written or not at all.
    """
    fd = os.open(tmp_path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp_path, final_path)


def _save_obj(obj, path):
    # Write to a temp name, then atomically rename: a SIGKILL mid-write
    # must never leave a truncated file under the real name (the reference
    # writes in place — ``checkpoints.py:98`` torch_save — so its killed
    # runs can leave checkpoints that crash recovery; see
    # ``tests/test_crash_recovery.py``).
    tmp = path + ".tmp"
    if hasattr(obj, "ckpt_save"):
        obj.ckpt_save(tmp)
    elif hasattr(obj, "state_dict"):
        with open(tmp, "w") as f:
            yaml.safe_dump(obj.state_dict(), f)
    else:
        raise TypeError(f"Don't know how to checkpoint {type(obj)}")
    _publish(tmp, path)


def _load_obj(obj, path, end_of_epoch):
    if hasattr(obj, "ckpt_load"):
        obj.ckpt_load(path, end_of_epoch=end_of_epoch)
    elif hasattr(obj, "load_state_dict"):
        with open(path) as f:
            data = yaml.safe_load(f)
        sig = inspect.signature(obj.load_state_dict)
        if "end_of_epoch" in sig.parameters:
            obj.load_state_dict(data, end_of_epoch=end_of_epoch)
        else:
            obj.load_state_dict(data)
    else:
        raise TypeError(f"Don't know how to recover {type(obj)}")


class Checkpointer:
    """Reference ``checkpoints.py:381`` analogue.

    Example
    -------
    >>> import tempfile
    >>> from svt_speechbrain_tpu.utils.epoch_loop import EpochCounter
    >>> counter = EpochCounter(limit=10)
    >>> counter.current = 3
    >>> tmpdir = tempfile.mkdtemp()
    >>> ckptr = Checkpointer(tmpdir, recoverables={"epoch": counter})
    >>> _ = ckptr.save_checkpoint(meta={"loss": 1.5}, verbosity=0)
    >>> counter.current = 7                      # diverge, then recover
    >>> _ = ckptr.recover_if_possible()
    >>> counter.current
    3
    >>> ckptr.find_checkpoint().meta["loss"]
    1.5
    """

    def __init__(self, checkpoints_dir, recoverables=None, allow_partial_load=False):
        self.checkpoints_dir = str(checkpoints_dir)
        os.makedirs(self.checkpoints_dir, exist_ok=True)
        self.recoverables = {}
        if recoverables is not None:
            self.add_recoverables(recoverables)
        self.allow_partial_load = allow_partial_load

    def add_recoverable(self, name, obj):
        self.recoverables[name] = obj

    def add_recoverables(self, recoverables):
        self.recoverables.update(recoverables)

    # ------------------------------------------------------------- saving
    def save_checkpoint(self, meta={}, end_of_epoch=True, name=None, verbosity=logging.INFO):
        if name is None:
            ckpt_dir = self._new_checkpoint_dirpath()
        else:
            ckpt_dir = self._custom_checkpoint_dirpath(name)
        os.makedirs(ckpt_dir, exist_ok=True)
        # Recoverables FIRST, the CKPT.yaml meta file LAST: the meta file is
        # the completeness marker (``list_checkpoints`` ignores directories
        # without it), so a crash at ANY point during the save leaves either
        # an invisible partial directory or a fully valid checkpoint — never
        # a discoverable-but-truncated one.
        paramfiles = {}
        for name_, obj in self.recoverables.items():
            objfname = f"{name_}.ckpt"
            savepath = os.path.join(ckpt_dir, objfname)
            paramfiles[name_] = savepath
            _save_obj(obj, savepath)
        saved_meta = self._save_checkpoint_metafile(
            os.path.join(ckpt_dir, METAFNAME), meta, end_of_epoch)
        logger.log(verbosity, f"Saved an end-of-epoch checkpoint in {ckpt_dir}"
                   if end_of_epoch else f"Saved an intra-epoch checkpoint in {ckpt_dir}")
        return Checkpoint(ckpt_dir, saved_meta, paramfiles)

    def save_and_keep_only(self, meta={}, end_of_epoch=True, name=None,
                           num_to_keep=1, keep_recent=True, importance_keys=[],
                           max_keys=[], min_keys=[], ckpt_predicate=None,
                           verbosity=logging.INFO):
        """Save, then delete all but the best ``num_to_keep`` per key
        (reference ``checkpoints.py:570``)."""
        if keep_recent:
            importance_keys = list(importance_keys) + [ckpt_recency]
        self.save_checkpoint(meta=meta, end_of_epoch=end_of_epoch, name=name,
                             verbosity=verbosity)
        self.delete_checkpoints(
            num_to_keep=num_to_keep, max_keys=max_keys, min_keys=min_keys,
            importance_keys=importance_keys, ckpt_predicate=ckpt_predicate,
            verbosity=verbosity)

    # ------------------------------------------------------------ finding
    def list_checkpoints(self):
        checkpoints = []
        for entry in sorted(os.listdir(self.checkpoints_dir)):
            path = os.path.join(self.checkpoints_dir, entry)
            metafile = os.path.join(path, METAFNAME)
            if os.path.isdir(path) and os.path.exists(metafile):
                with open(metafile) as f:
                    meta = yaml.safe_load(f)
                paramfiles = {}
                for f_ in os.listdir(path):
                    if f_.endswith(".ckpt"):
                        paramfiles[f_[:-5]] = os.path.join(path, f_)
                checkpoints.append(Checkpoint(path, meta, paramfiles))
        return checkpoints

    def find_checkpoint(self, importance_key=None, max_key=None, min_key=None,
                        ckpt_predicate=None):
        found = self.find_checkpoints(
            importance_key=importance_key, max_key=max_key, min_key=min_key,
            ckpt_predicate=ckpt_predicate, max_num_checkpoints=1)
        return found[0] if found else None

    def find_checkpoints(self, importance_key=None, max_key=None, min_key=None,
                         ckpt_predicate=None, max_num_checkpoints=None):
        if importance_key is None and min_key is None and max_key is None:
            importance_key = ckpt_recency
        if max_key and not importance_key:
            def importance_key(ckpt):
                return ckpt.meta[max_key]
        elif min_key and not importance_key:
            def importance_key(ckpt):
                return -ckpt.meta[min_key]
        ckpts = self.list_checkpoints()
        if ckpt_predicate is not None:
            ckpts = [c for c in ckpts if ckpt_predicate(c)]
        if max_key or min_key:
            key_name = max_key or min_key
            ckpts = [c for c in ckpts if key_name in c.meta]
        ranked = sorted(ckpts, key=importance_key, reverse=True)
        if max_num_checkpoints is not None:
            ranked = ranked[:max_num_checkpoints]
        return ranked

    # ---------------------------------------------------------- recovery
    def recover_if_possible(self, importance_key=None, max_key=None, min_key=None,
                            ckpt_predicate=None):
        chosen_ckpt = self.find_checkpoint(importance_key, max_key, min_key, ckpt_predicate)
        if chosen_ckpt is not None:
            self.load_checkpoint(chosen_ckpt)
        else:
            logger.info("Would load a checkpoint here, but none found yet.")
        return chosen_ckpt

    def load_checkpoint(self, checkpoint):
        end_of_epoch = checkpoint.meta["end-of-epoch"]
        logger.info(f"Loading a checkpoint from {checkpoint.path}")
        for name, obj in self.recoverables.items():
            loadpath = checkpoint.paramfiles.get(name)
            if loadpath is None:
                if self.allow_partial_load:
                    logger.warning(f"Loading checkpoint: {checkpoint.path}, missing {name}")
                    continue
                raise RuntimeError(
                    f"Loading checkpoint from {checkpoint.path}, but missing a load "
                    f"path for {name}")
            _load_obj(obj, loadpath, end_of_epoch)

    # ---------------------------------------------------------- deleting
    def delete_checkpoints(self, *, num_to_keep=1, min_keys=None, max_keys=None,
                           importance_keys=[ckpt_recency], ckpt_predicate=None,
                           verbosity=logging.INFO):
        """Keep the best ``num_to_keep`` per importance view, delete the rest
        (reference ``checkpoints.py:934``). End-of-epoch checkpoints are
        protected from deletion by intra-epoch saves via predicate filtering
        in the caller when needed."""
        if isinstance(importance_keys, str):
            raise TypeError("Importance keys must be a list of callables")
        importance_keys = list(importance_keys)
        for key in max_keys or []:
            importance_keys.append(lambda c, key=key: c.meta.get(key, float("-inf")))
        for key in min_keys or []:
            importance_keys.append(lambda c, key=key: -c.meta.get(key, float("inf")))
        potential = self.list_checkpoints()
        if ckpt_predicate is not None:
            potential = [c for c in potential if ckpt_predicate(c)]
        protected = set()
        for importance_key in importance_keys:
            for ckpt in sorted(potential, key=importance_key, reverse=True)[:num_to_keep]:
                protected.add(ckpt.path)
        for ckpt in potential:
            if ckpt.path not in protected:
                shutil.rmtree(ckpt.path)
                logger.log(verbosity, f"Deleted checkpoint in {ckpt.path}")

    # ----------------------------------------------------------- helpers
    def _new_checkpoint_dirpath(self):
        t = time.time()
        stamp = time.strftime("%Y-%m-%d+%H-%M-%S", time.localtime(t))
        suffix_num = 0
        while os.path.exists(os.path.join(
                self.checkpoints_dir, f"{CKPT_PREFIX}+{stamp}+{suffix_num:02d}")):
            suffix_num += 1
        return os.path.join(self.checkpoints_dir, f"{CKPT_PREFIX}+{stamp}+{suffix_num:02d}")

    def _custom_checkpoint_dirpath(self, name):
        return os.path.join(self.checkpoints_dir, f"{CKPT_PREFIX}+{name}")

    def _save_checkpoint_metafile(self, fpath, meta_to_include={}, end_of_epoch=True):
        meta = {"unixtime": time.time(), "end-of-epoch": end_of_epoch}
        meta.update(meta_to_include)
        tmp = fpath + ".tmp"
        with open(tmp, "w") as f:
            f.write("# yamllint disable\n")
            yaml.safe_dump(meta, f)
        _publish(tmp, fpath)
        return meta


def average_checkpoints(checkpoint_list, recoverable_name, parameter_loader=None,
                        averager=None):
    """Average a recoverable's pytrees across checkpoints
    (reference ``checkpoints.py:1089``)."""
    from flax import serialization
    import jax
    import numpy as np

    trees = []
    for ckpt in checkpoint_list:
        with open(ckpt.paramfiles[recoverable_name], "rb") as f:
            trees.append(serialization.msgpack_restore(f.read()))
    n = len(trees)
    return jax.tree_util.tree_map(lambda *xs: sum(np.asarray(x) for x in xs) / n, *trees)


# --------------------------------------------------------------------------
# Hook-registry API (reference ``checkpoints.py:190-376``): classes decorate
# methods with @mark_as_saver/@mark_as_loader (+ optional @mark_as_transfer)
# and @register_checkpoint_hooks wires them into the ckpt_save/ckpt_load
# protocol the Checkpointer speaks natively here.

def mark_as_saver(method):
    """Mark ``method(self, path)`` as the class's checkpoint saver
    (reference ``checkpoints.py:190``)."""
    sig = inspect.signature(method)
    if len(sig.parameters) < 2:
        raise TypeError("Checkpoint saver must take (self, path)")
    method._speechbrain_saver = True
    return method


def mark_as_loader(method):
    """Mark ``method(self, path, end_of_epoch=...)`` as the loader
    (reference ``checkpoints.py:218``)."""
    method._speechbrain_loader = True
    return method


def mark_as_transfer(method):
    """Mark ``method(self, path)`` as the parameter-transfer hook used by
    the Pretrainer (reference ``checkpoints.py:250``)."""
    method._speechbrain_transfer = True
    return method


def register_checkpoint_hooks(cls):
    """Class decorator installing ``ckpt_save``/``ckpt_load``/
    ``ckpt_transfer`` from marked methods (reference ``checkpoints.py:278``)."""
    saver = loader = transfer = None
    for name, method in cls.__dict__.items():
        if getattr(method, "_speechbrain_saver", False):
            saver = name
        if getattr(method, "_speechbrain_loader", False):
            loader = name
        if getattr(method, "_speechbrain_transfer", False):
            transfer = name
    if saver is not None and "ckpt_save" not in cls.__dict__:
        def ckpt_save(self, path, _name=saver):
            getattr(self, _name)(path)
        cls.ckpt_save = ckpt_save
    if loader is not None and "ckpt_load" not in cls.__dict__:
        def ckpt_load(self, path, end_of_epoch=True, _name=loader):
            method = getattr(self, _name)
            if "end_of_epoch" in inspect.signature(method).parameters:
                method(path, end_of_epoch=end_of_epoch)
            else:
                method(path)
        cls.ckpt_load = ckpt_load
    if transfer is not None and "ckpt_transfer" not in cls.__dict__:
        def ckpt_transfer(self, path, _name=transfer):
            getattr(self, _name)(path)
        cls.ckpt_transfer = ckpt_transfer
    return cls


def get_default_hook(obj, default_hooks):
    """Look up the hook for an object's class through its MRO
    (reference ``checkpoints.py:323``)."""
    for cls in type(obj).__mro__:
        if cls in default_hooks:
            return default_hooks[cls]
    return None


def average_state_dicts(state_dicts):
    """Elementwise mean of numeric leaves across state dicts
    (reference ``checkpoints.py:1045``)."""
    import numpy as np

    dicts = list(state_dicts)
    if not dicts:
        raise ValueError("no state dicts to average")
    import jax

    return jax.tree_util.tree_map(
        lambda *leaves: sum(np.asarray(l, dtype=np.float64) for l in leaves) / len(leaves)
        if np.issubdtype(np.asarray(leaves[0]).dtype, np.number) else leaves[0],
        *dicts)
