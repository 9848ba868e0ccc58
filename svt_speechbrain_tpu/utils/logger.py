"""Logging setup (analogue of reference ``speechbrain/utils/logger.py``)."""
from __future__ import annotations

import logging
import logging.config
import math
import os
import sys

ORDERS_ABBREV = {
    -24: "y", -21: "z", -18: "a", -15: "f", -12: "p", -9: "n", -6: "µ", -3: "m",
    0: "", 3: "k", 6: "M", 9: "G", 12: "T", 15: "P", 18: "E", 21: "Z", 24: "Y",
}


def setup_logging(log_file=None, console_level=logging.INFO, file_level=logging.DEBUG):
    """Console INFO + file DEBUG logging (reference ``logger.py:82`` +
    ``speechbrain/log-config.yaml``).

    Third-party libraries that log per-dispatch internals at DEBUG (jax's
    compilation-cache key derivation alone writes ~10 lines per compile)
    are capped at INFO so ``log.txt`` stays a readable experiment log."""
    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    for h in list(root.handlers):
        root.removeHandler(h)
    console = logging.StreamHandler(sys.stdout)
    console.setLevel(console_level)
    console.setFormatter(logging.Formatter("%(name)s - %(message)s"))
    root.addHandler(console)
    if log_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fileh = logging.FileHandler(log_file)
        fileh.setLevel(file_level)
        fileh.setFormatter(logging.Formatter(
            "%(asctime)s - %(levelname)s - %(name)s - %(message)s"))
        root.addHandler(fileh)
    for noisy in ("jax", "jaxlib", "orbax", "absl", "urllib3", "filelock"):
        logging.getLogger(noisy).setLevel(logging.INFO)


def format_order_of_magnitude(number, abbreviate=True):
    """3.5M-style formatting (reference ``logger.py:106``).

    Example
    -------
    >>> format_order_of_magnitude(3_500_000)
    ('3.5', 'M')
    >>> format_order_of_magnitude(950)
    ('950.0', '')
    """
    style = ORDERS_ABBREV
    precision = "{num:3.1f}"
    order = 3 * math.floor(math.log(math.fabs(number), 1000)) if number != 0 else 0
    order = min(max(order, min(style)), max(style))
    factor = 10 ** order
    num_str = precision.format(num=number / factor)
    units = style[order]
    return num_str, units


def get_environment_description():
    """Python/package/platform snapshot (reference ``logger.py:152``; written
    to the experiment dir's ``env.log``)."""
    python_version_str = "Python version:\n" + sys.version + "\n"
    try:
        import importlib.metadata as md

        dependencies = sorted(
            f"{dist.metadata['Name']}=={dist.version}" for dist in md.distributions()
            if dist.metadata["Name"] is not None
        )
        deps_str = "Installed Python packages:\n" + "\n".join(dependencies) + "\n"
    except Exception:
        deps_str = "Could not list python packages\n"
    import platform

    platform_str = "Platform:\n" + platform.platform() + "\n"
    try:
        import jax

        backend_str = ("JAX devices:\n"
                       + "\n".join(str(d) for d in jax.devices()) + "\n")
    except Exception:
        backend_str = "JAX backend unavailable\n"
    return "\n".join([python_version_str, deps_str, platform_str, backend_str])


class TqdmCompatibleStreamHandler(logging.StreamHandler):
    """StreamHandler that writes through tqdm so progress bars survive log
    lines (reference ``logger.py:63``); plain emit when tqdm is absent."""

    def emit(self, record):
        try:
            from tqdm import tqdm

            msg = self.format(record)
            tqdm.write(msg, file=self.stream)
            self.flush()
        except ImportError:
            super().emit(record)
        except Exception:
            self.handleError(record)
