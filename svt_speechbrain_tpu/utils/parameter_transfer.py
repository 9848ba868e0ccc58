"""Declarative pretrained-parameter transfer (analogue of reference
``speechbrain/utils/parameter_transfer.py``).

``Pretrainer`` maps recoverable names → source files (local paths, URLs, or
hub ids), collects them into a save directory and loads each into its target
object using the same hook protocol as the Checkpointer.
"""
from __future__ import annotations

import logging
import pathlib

from svt_speechbrain_tpu.pretrained.fetching import fetch
from svt_speechbrain_tpu.utils.checkpoints import _load_obj

logger = logging.getLogger(__name__)


class Pretrainer:
    """Collect-then-load pretrained parameter transfer
    (reference ``parameter_transfer.py:23``).

    Example
    -------
    >>> import os, tempfile, numpy as np, jax.numpy as jnp
    >>> from svt_speechbrain_tpu.utils.checkpoints import PytreeHandle
    >>> src = tempfile.mkdtemp()
    >>> donor = {"params": {"w": jnp.arange(3.0)}}
    >>> PytreeHandle(lambda: donor["params"],
    ...              lambda t: donor.update(params=t)
    ...              ).ckpt_save(os.path.join(src, "model.ckpt"))
    >>> store = {"params": {"w": jnp.zeros(3)}}
    >>> handle = PytreeHandle(lambda: store["params"],
    ...                       lambda t: store.update(params=t))
    >>> pre = Pretrainer(collect_in=tempfile.mkdtemp(),
    ...                  loadables={"model": handle},
    ...                  paths={"model": os.path.join(src, "model.ckpt")})
    >>> _ = pre.collect_files()
    >>> pre.load_collected()
    >>> np.asarray(store["params"]["w"])
    array([0., 1., 2.], dtype=float32)
    """

    def __init__(self, collect_in="./model_checkpoints", loadables=None,
                 paths=None, custom_hooks=None):
        self.loadables = {}
        self.collect_in = pathlib.Path(collect_in)
        if loadables is not None:
            self.add_loadables(loadables)
        self.paths = {}
        if paths is not None:
            self.add_defaults(paths)
        self.custom_hooks = custom_hooks or {}

    def add_loadables(self, loadables):
        self.loadables.update(loadables)

    def add_defaults(self, paths):
        self.paths.update(paths)

    @staticmethod
    def split_path(path):
        if "/" in str(path):
            return str(path).rsplit("/", 1)
        return "./", str(path)

    def collect_files(self, default_source=None):
        """Fetch every loadable's file into ``collect_in``
        (reference ``:124``)."""
        self.collect_in.mkdir(parents=True, exist_ok=True)
        loadable_paths = {}
        for name in self.loadables:
            save_filename = name + ".ckpt"
            if name in self.paths:
                source, filename = self.split_path(self.paths[name])
            elif default_source is not None:
                filename = save_filename
                source = default_source
            else:
                raise ValueError(f"No path for loadable {name} and no default source")
            path = fetch(filename, source, self.collect_in,
                         save_filename=save_filename)
            loadable_paths[name] = path
        return loadable_paths

    def load_collected(self):
        """Load each collected file into its object (reference ``:199``)."""
        paths = {name: self.collect_in / (name + ".ckpt") for name in self.loadables}
        for name, obj in self.loadables.items():
            path = str(paths[name])
            if name in self.custom_hooks:
                self.custom_hooks[name](obj, path)
            else:
                _load_obj(obj, path, end_of_epoch=False)
            logger.info(f"Loaded pretrained {name} from {path}")
