"""Neural-net op library (TPU-native analogue of the reference's ``speechbrain/nnet``).

Every module is *functional*: hyperparameters live on the module object,
parameters are explicit pytrees created by ``module.init(rng)`` and passed to
``module(params, ...)`` which is a pure function — jit/grad/vmap/pjit friendly.
"""

from svt_speechbrain_tpu.nnet.core import Module
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.activations import Softmax, GELU, Swish
from svt_speechbrain_tpu.nnet.normalization import LayerNorm, GroupNorm, BatchNorm1d, BatchNorm2d, InstanceNorm1d
from svt_speechbrain_tpu.nnet.containers import Sequential, ModuleList
from svt_speechbrain_tpu.nnet.dropout import Dropout2d
from svt_speechbrain_tpu.nnet.embedding import Embedding
from svt_speechbrain_tpu.nnet import losses, schedulers, attention, cnn, pooling  # noqa: F401
