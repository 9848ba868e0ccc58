"""Runnable docstring examples (the reference's de-facto unit-test tier).

The reference framework runs every module's ``Example`` blocks under
``pytest --doctest-modules`` (SURVEY.md §4; e.g. reference
``speechbrain/core.py:409-419``, ``dataio/batch.py:52-97``). This mirrors
that capability: each module listed here must carry at least one runnable
``>>>`` example, and all of them must pass. Modules are added to the list
as their docstrings gain examples — a module with zero examples FAILS so
the list stays honest.
"""
import doctest
import importlib

import pytest

MODULES = [
    "svt_speechbrain_tpu.nnet.linear",
    "svt_speechbrain_tpu.nnet.cnn",
    "svt_speechbrain_tpu.nnet.normalization",
    "svt_speechbrain_tpu.nnet.pooling",
    "svt_speechbrain_tpu.nnet.embedding",
    "svt_speechbrain_tpu.nnet.dropout",
    "svt_speechbrain_tpu.nnet.activations",
    "svt_speechbrain_tpu.nnet.containers",
    "svt_speechbrain_tpu.nnet.losses",
    "svt_speechbrain_tpu.nnet.schedulers",
    "svt_speechbrain_tpu.nnet.rnn",
    "svt_speechbrain_tpu.nnet.attention",
    "svt_speechbrain_tpu.dataio.batch",
    "svt_speechbrain_tpu.dataio.dataset",
    "svt_speechbrain_tpu.dataio.encoder",
    "svt_speechbrain_tpu.utils.edit_distance",
    "svt_speechbrain_tpu.utils.data_utils",
    "svt_speechbrain_tpu.utils.depgraph",
    "svt_speechbrain_tpu.utils.metric_stats",
    "svt_speechbrain_tpu.utils.transcription_eval",
    "svt_speechbrain_tpu.utils.amt",
    "svt_speechbrain_tpu.decoders.ctc",
    "svt_speechbrain_tpu.models.features",
    "svt_speechbrain_tpu.processing.signal_processing",
    "svt_speechbrain_tpu.processing.multi_mic",
    "svt_speechbrain_tpu.processing.decomposition",
    "svt_speechbrain_tpu.utils.accuracy",
    "svt_speechbrain_tpu.utils.epoch_loop",
    "svt_speechbrain_tpu.dataio.sampler",
    "svt_speechbrain_tpu.utils.bleu",
    "svt_speechbrain_tpu.nnet.loss.transducer_loss",
    "svt_speechbrain_tpu.lm.counting",
    "svt_speechbrain_tpu.processing.video",
    "svt_speechbrain_tpu.dataio.dataio",
    "svt_speechbrain_tpu.config",
    "svt_speechbrain_tpu.utils.checkpoints",
    "svt_speechbrain_tpu.models.xvector",
    "svt_speechbrain_tpu.models.ecapa_tdnn",
    "svt_speechbrain_tpu.models.transformer",
    "svt_speechbrain_tpu.models.conformer",
    "svt_speechbrain_tpu.models.rnnlm",
    "svt_speechbrain_tpu.models.crdnn",
    "svt_speechbrain_tpu.models.separation",
    "svt_speechbrain_tpu.models.fusion",
    "svt_speechbrain_tpu.decoders.seq2seq",
    "svt_speechbrain_tpu.core",
    "svt_speechbrain_tpu.nnet.core",
    "svt_speechbrain_tpu.utils.callchains",
    "svt_speechbrain_tpu.lm.arpa",
    "svt_speechbrain_tpu.dataio.wer",
    "svt_speechbrain_tpu.utils.data_pipeline",
    "svt_speechbrain_tpu.utils.logger",
    "svt_speechbrain_tpu.lm.ngram",
    "svt_speechbrain_tpu.nnet.transducer_joint",
    "svt_speechbrain_tpu.nnet.loss.si_snr_loss",
    "svt_speechbrain_tpu.processing.speech_augmentation",
    "svt_speechbrain_tpu.processing.features",
    "svt_speechbrain_tpu.utils.der",
    "svt_speechbrain_tpu.parallel.mesh",
    "svt_speechbrain_tpu.processing.nmf",
    "svt_speechbrain_tpu.processing.diarization",
    "svt_speechbrain_tpu.processing.plda_lda",
    "svt_speechbrain_tpu.models.contextnet",
    "svt_speechbrain_tpu.models.convolution",
    "svt_speechbrain_tpu.decoders.transducer",
    "svt_speechbrain_tpu.alignment.ctc_segmentation",
    "svt_speechbrain_tpu.nnet.loss.guidedattn_loss",
    "svt_speechbrain_tpu.nnet.loss.stoi_loss",
    "svt_speechbrain_tpu.models.augment",
    "svt_speechbrain_tpu.utils.flops",
    "svt_speechbrain_tpu.parallel.fsdp",
    "svt_speechbrain_tpu.parallel.tp",
    "svt_speechbrain_tpu.alignment.aligner",
    "svt_speechbrain_tpu.nnet.complex_networks",
    "svt_speechbrain_tpu.nnet.quaternion_networks",
    "svt_speechbrain_tpu.dataio.iterators",
    "svt_speechbrain_tpu.dataio.preprocess",
    "svt_speechbrain_tpu.dataio.dataloader",
    "svt_speechbrain_tpu.utils.train_logger",
    "svt_speechbrain_tpu.utils.superpowers",
    "svt_speechbrain_tpu.ops.flash_attention",
    "svt_speechbrain_tpu.parallel.distributed",
    "svt_speechbrain_tpu.tokenizers.sentence_piece",
    "svt_speechbrain_tpu.models.enhancement",
    "svt_speechbrain_tpu.models.resnet",
    "svt_speechbrain_tpu.ops.transducer_lattice",
    "svt_speechbrain_tpu.ops.conv_frontend",
    "svt_speechbrain_tpu.parallel.pipeline",
    "svt_speechbrain_tpu.utils.profiling",
    "svt_speechbrain_tpu.tasks.amt",
    "svt_speechbrain_tpu.models.wav2vec2",
    "svt_speechbrain_tpu.models.wav2vec2_pretrain",
    "svt_speechbrain_tpu.models.transformer_asr",
    "svt_speechbrain_tpu.models.transformer_se_st",
    "svt_speechbrain_tpu.dataio.legacy",
    "svt_speechbrain_tpu.models.beamform_multimic",
    "svt_speechbrain_tpu.utils.orbax_checkpoints",
    "svt_speechbrain_tpu.pretrained.fetching",
    "svt_speechbrain_tpu.utils.hpopt",
    "svt_speechbrain_tpu.models.convert_sb",
]


@pytest.mark.parametrize("modname", MODULES)
def test_module_doctests(modname):
    mod = importlib.import_module(modname)
    result = doctest.testmod(
        mod,
        optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
        verbose=False,
    )
    assert result.attempted > 0, f"{modname} has no runnable examples"
    assert result.failed == 0, f"{modname}: {result.failed} doctest failures"
