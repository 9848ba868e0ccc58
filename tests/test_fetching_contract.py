"""Offline contract tests for ``pretrained/fetching.py`` against the
reference semantics (``speechbrain/pretrained/fetching.py:26-126``): the
side effect is always "``savedir/save_filename`` points at the file" —
local dirs symlink, URLs download, hub ids download-to-cache then symlink —
with ``overwrite=False`` trusting an existing destination and
``overwrite=True`` relinking. The hub and URL layers are faked so the
contract runs with zero egress.
"""
import os
import pathlib
import urllib.error

import pytest

from svt_speechbrain_tpu.pretrained import fetching
from svt_speechbrain_tpu.pretrained.fetching import fetch


def _mksrc(tmp_path, name="model.ckpt", content="weights-v1"):
    src = tmp_path / "srcdir"
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text(content)
    return src


def test_local_dir_symlinks_absolute(tmp_path):
    src = _mksrc(tmp_path)
    dst = fetch("model.ckpt", str(src), savedir=tmp_path / "save")
    assert dst == tmp_path / "save" / "model.ckpt"
    assert dst.is_symlink()
    # reference links to the ABSOLUTE source path
    assert os.readlink(dst) == str((src / "model.ckpt").absolute())
    assert dst.read_text() == "weights-v1"


def test_save_filename_renames_destination(tmp_path):
    src = _mksrc(tmp_path)
    dst = fetch("model.ckpt", str(src), savedir=tmp_path / "save",
                save_filename="renamed.ckpt")
    assert dst.name == "renamed.ckpt" and dst.read_text() == "weights-v1"


def test_existing_destination_trusted_without_overwrite(tmp_path):
    src = _mksrc(tmp_path)
    dst = fetch("model.ckpt", str(src), savedir=tmp_path / "save")
    # move the source: the stale symlink is trusted when overwrite=False
    src2 = _mksrc(tmp_path / "other", content="weights-v2")
    got = fetch("model.ckpt", str(src2), savedir=tmp_path / "save")
    assert got == dst
    assert os.readlink(got) == str((src / "model.ckpt").absolute())


def test_overwrite_relinks(tmp_path):
    src = _mksrc(tmp_path)
    fetch("model.ckpt", str(src), savedir=tmp_path / "save")
    src2 = _mksrc(tmp_path / "other", content="weights-v2")
    got = fetch("model.ckpt", str(src2), savedir=tmp_path / "save",
                overwrite=True)
    assert os.readlink(got) == str((src2 / "model.ckpt").absolute())
    assert got.read_text() == "weights-v2"


def test_overwrite_replaces_regular_file(tmp_path):
    save = tmp_path / "save"
    save.mkdir()
    (save / "model.ckpt").write_text("stale regular file")
    src = _mksrc(tmp_path)
    got = fetch("model.ckpt", str(src), savedir=save, overwrite=True)
    assert got.is_symlink() and got.read_text() == "weights-v1"


def test_missing_local_file_raises(tmp_path):
    src = _mksrc(tmp_path)
    with pytest.raises(FileNotFoundError):
        fetch("nope.ckpt", str(src), savedir=tmp_path / "save")


def test_url_download(monkeypatch, tmp_path):
    calls = {}

    def fake_urlretrieve(url, destination):
        calls["url"] = url
        pathlib.Path(destination).write_text("downloaded")

    monkeypatch.setattr(fetching.urllib.request, "urlretrieve",
                        fake_urlretrieve)
    got = fetch("model.ckpt", "https://example.com/repo",
                savedir=tmp_path / "save")
    # the URL is source/filename, exactly as the reference composes it
    assert calls["url"] == "https://example.com/repo/model.ckpt"
    assert got.read_text() == "downloaded"


def test_url_failure_raises_valueerror(monkeypatch, tmp_path):
    def fail(url, destination):
        raise urllib.error.URLError("no egress")

    monkeypatch.setattr(fetching.urllib.request, "urlretrieve", fail)
    with pytest.raises(ValueError):
        fetch("model.ckpt", "http://example.com/repo",
              savedir=tmp_path / "save")


def test_hub_id_downloads_to_cache_and_symlinks(monkeypatch, tmp_path):
    """A non-dir non-URL source delegates to the hub: the file lands in the
    hub's own cache layout and ``savedir/save_filename`` symlinks onto it
    (the reference's etag-cache + symlink dance, ``fetching.py:110-125``)."""
    import huggingface_hub

    cache = tmp_path / "hub_cache"
    seen = {}

    def fake_download(repo_id, filename, token=None):
        seen.update(repo_id=repo_id, filename=filename, token=token)
        blob = (cache / f"models--{repo_id.replace('/', '--')}"
                / "snapshots" / "abc123" / filename)
        blob.parent.mkdir(parents=True, exist_ok=True)
        blob.write_text("hub weights")
        return str(blob)

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fake_download)
    got = fetch("model.ckpt", "someorg/somerepo", savedir=tmp_path / "save")
    assert seen["repo_id"] == "someorg/somerepo"
    assert seen["filename"] == "model.ckpt"
    assert got == tmp_path / "save" / "model.ckpt"
    assert got.is_symlink()
    assert "hub_cache" in os.readlink(got)
    assert got.read_text() == "hub weights"
    # second fetch without overwrite: trusted, no re-download
    seen.clear()
    again = fetch("model.ckpt", "someorg/somerepo",
                  savedir=tmp_path / "save")
    assert again == got and not seen


def test_hub_failure_raises_filenotfound(monkeypatch, tmp_path):
    import huggingface_hub

    def fail(repo_id, filename, token=None):
        raise RuntimeError("offline")

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fail)
    with pytest.raises(FileNotFoundError):
        fetch("model.ckpt", "someorg/somerepo", savedir=tmp_path / "save")


def test_failed_download_leaves_no_partial_file(monkeypatch, tmp_path):
    """A mid-transfer failure must not leave a truncated file that a later
    fetch would trust via the exists-and-not-overwrite early return."""
    def fail_mid_body(url, destination):
        pathlib.Path(destination).write_text("trunc")  # partial body landed
        raise urllib.error.ContentTooShortError("cut off", "trunc")

    monkeypatch.setattr(fetching.urllib.request, "urlretrieve",
                        fail_mid_body)
    savedir = tmp_path / "save"
    with pytest.raises(ValueError):
        fetch("model.ckpt", "http://example.com/repo", savedir=savedir)
    assert list(savedir.iterdir()) == []  # neither final nor .partial left

    # and the retry (link recovered) succeeds, not short-circuited by trash
    def ok(url, destination):
        pathlib.Path(destination).write_text("full")

    monkeypatch.setattr(fetching.urllib.request, "urlretrieve", ok)
    got = fetch("model.ckpt", "http://example.com/repo", savedir=savedir)
    assert got.read_text() == "full"
