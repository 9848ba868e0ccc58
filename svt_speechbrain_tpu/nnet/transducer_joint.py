"""Transducer joint network (analogue of reference
``speechbrain/nnet/transducer/transducer_joint.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module
from svt_speechbrain_tpu.nnet.linear import Linear


class Transducer_joint(Module):
    """Join encoder frames (B, T, 1, H) with prediction-network states
    (B, 1, U, H) by sum or concat, then a nonlinearity (reference
    ``transducer_joint.py:14``). Broadcasting produces the (B, T, U, H)
    lattice in one fused XLA op.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> joint = Transducer_joint(joint="sum", nonlinearity="relu")
    >>> tn = jnp.ones((2, 5, 1, 8))          # encoder frames
    >>> pn = jnp.ones((2, 1, 3, 8))          # prediction-net states
    >>> joint({}, tn, pn).shape
    (2, 5, 3, 8)
    """

    def __init__(self, joint_network=None, joint="sum", nonlinearity="tanh"):
        self.joint_network = joint_network  # e.g. a Linear over concat width
        self.joint = joint
        self.nonlinearity = {"tanh": jnp.tanh, "relu": jax.nn.relu,
                             "leaky_relu": jax.nn.leaky_relu}[nonlinearity]

    def init(self, rng):
        if self.joint_network is None:
            return {}
        return {"joint_network": self.joint_network.init(rng)}

    def __call__(self, params, input_TN, input_PN):
        if self.joint == "sum":
            joint = input_TN + input_PN
        elif self.joint == "concat":
            if input_TN.ndim == 4:  # (B,T,1,H) x (B,1,U,H) → (B,T,U,2H)
                t = input_TN.shape[1]
                u = input_PN.shape[2]
                tn = jnp.broadcast_to(input_TN, (*input_TN.shape[:2], u, input_TN.shape[-1]))
                pn = jnp.broadcast_to(input_PN, (input_PN.shape[0], t, u, input_PN.shape[-1]))
                joint = jnp.concatenate([tn, pn], axis=-1)
            else:
                joint = jnp.concatenate([input_TN, input_PN], axis=-1)
        else:
            raise NotImplementedError(f"joint={self.joint}")
        if self.joint_network is not None:
            joint = self.joint_network(params["joint_network"], joint)
        return self.nonlinearity(joint)
