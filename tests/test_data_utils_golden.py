"""Golden parity for the generic data utilities vs the reference
``speechbrain/utils/data_utils.py``: padding (per-axis valid fractions),
batch padding, un-padding, list/dict helpers and file discovery."""
import os

import numpy as np
import pytest
import torch

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.utils import data_utils as odu

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _ref():
    import_reference_speechbrain()
    from speechbrain.utils import data_utils as rdu
    return rdu


def test_padding_helpers_match_reference():
    rdu = _ref()
    rp, rv = rdu.pad_right_to(torch.ones(2, 3), (4, 5), value=7)
    op, ov = odu.pad_right_to(np.ones((2, 3)), (4, 5), value=7)
    np.testing.assert_array_equal(op, rp.numpy())
    assert ov == rv == [0.5, 0.6]

    rb, rl = rdu.batch_pad_right([torch.ones(2, 3), torch.zeros(4, 3)])
    ob, ol = odu.batch_pad_right([np.ones((2, 3)), np.zeros((4, 3))])
    np.testing.assert_array_equal(ob, rb.numpy())
    np.testing.assert_allclose(np.asarray(ol), rl.numpy() if hasattr(rl, "numpy")
                               else np.asarray(rl))

    batch = torch.tensor([[1., 2., 0.], [3., 4., 5.]])
    lens = torch.tensor([2 / 3, 1.0])
    assert (odu.undo_padding(np.asarray(batch), np.asarray(lens))
            == rdu.undo_padding(batch, lens))


def test_list_dict_helpers_match_reference():
    rdu = _ref()
    assert (list(odu.split_list(list(range(7)), 3))
            == list(rdu.split_list(list(range(7)), 3)))
    d = {"a": {"b": 1}, "c": 2}
    assert sorted(odu.recursive_items(d)) == sorted(rdu.recursive_items(d))
    upd = {"a": {"b": 9}, "d": 3}
    r1 = {"a": {"b": 1}, "c": 2}
    o1 = {"a": {"b": 1}, "c": 2}
    rdu.recursive_update(r1, upd)
    odu.recursive_update(o1, upd)
    assert o1 == r1
    assert (odu.split_by_whitespace(" a  b\tc ")
            == rdu.split_by_whitespace(" a  b\tc "))
    assert odu.split_path("x/y/z.ckpt") == rdu.split_path("x/y/z.ckpt")
    assert tuple(odu.split_path("z.ckpt")) == tuple(rdu.split_path("z.ckpt"))


def test_get_all_files_matches_reference(tmp_path):
    rdu = _ref()
    for name in ("a.wav", "b.txt", "sub/c.wav", "sub/skip_me.wav"):
        p = tmp_path / name
        p.parent.mkdir(exist_ok=True)
        p.write_text("x")
    kwargs = dict(match_and=[".wav"], exclude_or=["skip"])
    assert (sorted(odu.get_all_files(str(tmp_path), **kwargs))
            == sorted(rdu.get_all_files(str(tmp_path), **kwargs)))
