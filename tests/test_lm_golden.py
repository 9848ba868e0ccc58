"""Golden parity for the n-gram LM stack vs the reference
``speechbrain/lm/{arpa,counting,ngram}.py`` (pure Python, imported with the
stub harness): ARPA parsing, padding/n-gram production, backoff logprob
chains, evaluation details and perplexity."""
import io
import math

import pytest

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.lm import arpa as oarpa
from svt_speechbrain_tpu.lm import counting as ocount
from svt_speechbrain_tpu.lm import ngram as ongram

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")

ARPA = """\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-1.0 <s>
-1.3 hello -0.5
-1.3 world -0.4
-1.2 </s>

\\2-grams:
-0.3 <s> hello
-0.5 hello world
-0.4 world </s>

\\end\\
"""


def _ref_mods():
    import_reference_speechbrain()
    from speechbrain.lm import arpa, counting, ngram
    return arpa, counting, ngram


def test_arpa_reader_matches_reference():
    rarpa, _, _ = _ref_mods()
    r = rarpa.read_arpa(io.StringIO(ARPA))
    o = oarpa.read_arpa(io.StringIO(ARPA))
    assert o == r


def test_counting_matches_reference():
    _, rcount, _ = _ref_mods()
    seq = ["hello", "world"]
    assert list(ocount.pad_ends(seq)) == list(rcount.pad_ends(seq))
    assert (list(ocount.pad_ends(seq, pad_left=False))
            == list(rcount.pad_ends(seq, pad_left=False)))
    padded = list(rcount.pad_ends(seq))
    assert list(ocount.ngrams(padded, 2)) == list(rcount.ngrams(padded, 2))
    assert list(ocount.ngrams(padded, 1)) == list(rcount.ngrams(padded, 1))
    assert (list(ocount.ngrams_for_evaluation(padded, 3))
            == list(rcount.ngrams_for_evaluation(padded, 3)))
    assert (list(ocount.ngrams_for_evaluation("Brain", 3, True))
            == list(rcount.ngrams_for_evaluation("Brain", 3, True)))
    with pytest.raises(ValueError):
        list(ocount.ngrams([], 0))


def test_backoff_lm_and_perplexity_match_reference():
    rarpa, rcount, rngram = _ref_mods()
    num, ngrams_by_order, backoffs = rarpa.read_arpa(io.StringIO(ARPA))
    del num
    rlm = rngram.BackoffNgramLM(ngrams_by_order, backoffs)
    olm = ongram.BackoffNgramLM(ngrams_by_order, backoffs)

    queries = [("world", ("hello",)), ("hello", ("<s>",)),
               ("</s>", ("hello",)),          # backoff: -0.5 + -1.2
               ("world", ()), ("world", ("zzz",))]
    for token, context in queries:
        assert math.isclose(olm.logprob(token, context),
                            rlm.logprob(token, context), rel_tol=1e-12)

    sent = list(rcount.pad_ends(["hello", "world"]))
    data = [list(rcount.ngrams_for_evaluation(sent, 2))]
    r_det = rngram.ngram_evaluation_details(data, rlm)
    o_det = ongram.ngram_evaluation_details(data, olm)
    assert o_det == r_det
    assert math.isclose(ongram.ngram_perplexity(o_det),
                        rngram.ngram_perplexity(r_det), rel_tol=1e-12)
