"""Artifact fetching (analogue of reference ``speechbrain/pretrained/fetching.py``).

``fetch`` resolves a filename from a local dir, a URL, or (when the
huggingface_hub package and network are available) an HF-hub repo, and
symlinks it into ``savedir`` (reference ``fetching.py:26``). The TPU build is
zero-egress by default, so remote sources require the file to already be
cached locally.
"""
from __future__ import annotations

import logging
import os
import pathlib
import urllib.request

logger = logging.getLogger(__name__)


def fetch(filename, source, savedir="./pretrained_model_checkpoints",
          overwrite=False, save_filename=None, use_auth_token=False):
    """Materialize ``source/filename`` under ``savedir`` (reference
    ``fetching.py:20``): local directories symlink, URLs download, anything
    else is tried as an HF hub repo id.

    Example
    -------
    >>> import os, tempfile
    >>> src, dst = tempfile.mkdtemp(), tempfile.mkdtemp()
    >>> _ = open(os.path.join(src, "weights.ckpt"), "w").write("x")
    >>> p = fetch("weights.ckpt", src, savedir=dst)
    >>> p.exists(), p.name
    (True, 'weights.ckpt')
    """
    if save_filename is None:
        save_filename = filename
    savedir = pathlib.Path(savedir)
    savedir.mkdir(parents=True, exist_ok=True)
    destination = savedir / save_filename
    if destination.exists() and not overwrite:
        logger.info(f"Fetch {filename}: using existing {destination}.")
        return destination

    if str(source).startswith(("http:", "https:")):
        logger.info(f"Downloading {source}/{filename} to {destination}")
        # Download to a temp name and atomically rename, so a mid-transfer
        # failure never leaves a truncated file that later fetches would
        # trust via the exists-and-not-overwrite early return above.
        partial = destination.with_name(destination.name + ".partial")
        try:
            urllib.request.urlretrieve(f"{source}/{filename}", partial)
            os.replace(partial, destination)
        except urllib.error.URLError as e:
            partial.unlink(missing_ok=True)
            raise ValueError(
                f"Interpreted {source} as web address, but could not "
                f"download.") from e
        return destination

    if pathlib.Path(source).is_dir():
        # local directory: symlink (relink when overwriting)
        sourcefile = pathlib.Path(source) / filename
        if not sourcefile.exists():
            raise FileNotFoundError(sourcefile)
        destination.unlink(missing_ok=True)
        destination.symlink_to(sourcefile.absolute())
        return destination

    # treat as an HF hub repo id: download into the hub's local cache (a
    # no-op when cached), then symlink the savedir name onto the cache file
    try:
        import huggingface_hub

        fetched = huggingface_hub.hf_hub_download(
            repo_id=source, filename=filename,
            token=use_auth_token or None)
        destination.unlink(missing_ok=True)
        destination.symlink_to(pathlib.Path(fetched).absolute())
        return destination
    except ValueError:
        raise
    except Exception as e:
        raise FileNotFoundError(
            f"Could not fetch {filename} from {source}: {e}") from e
