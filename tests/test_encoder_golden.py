"""Golden parity for the label encoders vs the reference
``speechbrain/dataio/encoder.py``: state after every mutation op,
enforce/insert relocation semantics, unk handling, CTC collapsing
(incl. nested), and CROSS-IMPLEMENTATION save/load — files written by one
side load bit-equal on the other (the format users' saved label encoders
are in)."""
import pytest

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.dataio.encoder import (CategoricalEncoder,
                                                CTCTextEncoder, TextEncoder)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _ref():
    import_reference_speechbrain()
    from speechbrain.dataio import encoder as ref
    return ref


def _same_state(ours, refs):
    assert ours.lab2ind == refs.lab2ind
    assert ours.ind2lab == refs.ind2lab
    assert ours.starting_index == refs.starting_index
    for attr in ("unk_label", "bos_label", "eos_label", "blank_label"):
        assert hasattr(ours, attr) == hasattr(refs, attr), attr
        if hasattr(ours, attr):
            assert getattr(ours, attr) == getattr(refs, attr), attr


def test_mutation_ops_match_reference():
    ref_mod = _ref()
    o = CategoricalEncoder(starting_index=1)
    r = ref_mod.CategoricalEncoder(starting_index=1)
    for enc in (o, r):
        enc.update_from_iterable("abca")
        enc.add_unk()
        enc.insert_label("x", 10)
        enc.enforce_label("y", 1)       # relocates 'a'
        enc.enforce_label("x", 1)       # relocates 'y', moves x from 10
    _same_state(o, r)
    assert o.is_continuous() == r.is_continuous()
    assert (o.encode_sequence(["a", "zzz"])
            == r.encode_sequence(["a", "zzz"]))       # unk fallback
    with pytest.raises(KeyError):
        o.encode_label("zzz", allow_unk=False)
    with pytest.raises(KeyError):
        r.encode_label("zzz", allow_unk=False)
    assert o.decode_ndim([[1, 2], [3]]) == r.decode_ndim([[1, 2], [3]])


def test_limited_labelset_matches_reference():
    ref_mod = _ref()
    data = ["aab", "abc", "bcc", "ccc"]
    o = CategoricalEncoder()
    r = ref_mod.CategoricalEncoder()
    oc = o.limited_labelset_from_iterable(data, sequence_input=True,
                                          n_most_common=2, min_count=2)
    rc = r.limited_labelset_from_iterable(data, sequence_input=True,
                                          n_most_common=2, min_count=2)
    assert dict(oc) == dict(rc)
    _same_state(o, r)


def test_special_label_constructors_match_reference():
    ref_mod = _ref()
    o = TextEncoder(bos_label=0, eos_label=1, unk_label="<unk>")
    r = ref_mod.TextEncoder(bos_label=0, eos_label=1, unk_label="<unk>")
    for enc in (o, r):
        enc.update_from_iterable([["hello", "world"]])
    _same_state(o, r)
    assert o.get_bos_index() == r.get_bos_index()
    with pytest.raises(TypeError):
        TextEncoder(bos_label=0)
    with pytest.raises(TypeError):
        ref_mod.TextEncoder(bos_label=0)

    oc = CTCTextEncoder(blank_label=0, unk_label="<unk>")
    rc = ref_mod.CTCTextEncoder(blank_label=0, unk_label="<unk>")
    for enc in (oc, rc):
        enc.update_from_iterable(["abcd"])
    _same_state(oc, rc)


def test_ctc_collapsing_matches_reference():
    ref_mod = _ref()
    o = CTCTextEncoder()
    r = ref_mod.CTCTextEncoder()
    for enc in (o, r):
        enc.update_from_iterable(["abcd"])
        enc.add_blank()
    seq = [4, 4, 0, 0, 1, 4, 1, 2, 3, 4]
    for merge in (True, False):
        assert (o.collapse_indices_ndim(seq, merge)
                == r.collapse_indices_ndim(seq, merge))
        assert (o.collapse_indices_ndim([seq, seq], merge)
                == r.collapse_indices_ndim([seq, seq], merge))
        labels = ["a", "a", "<blank>", "b", "b", "c"]
        assert (o.collapse_labels(labels, merge)
                == r.collapse_labels(labels, merge))


def test_save_load_cross_implementation(tmp_path):
    ref_mod = _ref()

    def build(enc):
        enc.update_from_iterable([["hello", "world"], ["how"]])
        enc.add_unk()
        enc.insert_bos_eos(bos_index=0)
        return enc

    ours = build(TextEncoder())
    refs = build(ref_mod.TextEncoder())
    _same_state(ours, refs)

    # bytes written match exactly
    ours.save(tmp_path / "ours.txt")
    refs.save(tmp_path / "refs.txt")
    assert ((tmp_path / "ours.txt").read_text()
            == (tmp_path / "refs.txt").read_text())

    # reference file -> our loader
    o2 = TextEncoder()
    assert o2.load_if_possible(tmp_path / "refs.txt")
    _same_state(o2, refs)
    # our file -> reference loader
    r2 = ref_mod.TextEncoder()
    assert r2.load_if_possible(tmp_path / "ours.txt")
    _same_state(ours, r2)
    # from_saved + missing file behavior
    assert not TextEncoder().load_if_possible(tmp_path / "absent.txt")
    assert (CategoricalEncoder.from_saved(tmp_path / "ours.txt").lab2ind
            == ours.lab2ind)


def test_unbound_unk_label_raises_at_encode_site():
    """When ``unk_label`` is set but has no index (e.g. a partially written
    saved file), encode_label must raise KeyError at the call site rather
    than silently returning None (which failed far away as ``int(None)``)."""
    enc = CategoricalEncoder()
    enc.update_from_iterable("abc")
    enc.unk_label = "<unk>"  # attr set, never bound via add_unk()
    with pytest.raises(KeyError):
        enc.encode_label("z")
