"""Parameter activations with hand-written backward rules.

TPU-native re-implementation of the activation pairs the reference keeps in
CUDA (reference: editable_gauss_refl/cuda/csrc/utils/activations.cu:1-84 and
helpers.cu:10-58).  Each Gaussian attribute is stored *pre-activation* in the
scene pytree; these functions map raw -> activated values, and the
``backward_*`` twins implement the exact chain-rule algebra the reference's
hand-written backward pass uses (which we need for the loss-fused render
backward, where we cannot rely on autograd because the reference's gradients
are deliberately non-autograd).

All functions are pure jnp and shape-polymorphic; they vectorize over any
leading dims, making them usable both at the host level and inside Pallas
kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


# * Sigmoid (opacity)

def sigmoid_act(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def backward_sigmoid_act(dL_dy, y):
    """y is the *activated* value (matches activations.cu:8)."""
    return dL_dy * y * (1.0 - y)


def inverse_sigmoid(y):
    return jnp.log(y / (1.0 - y))


# * Softplus (unused by default; kept for parity)

def softplus_act(x):
    return jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(x, 0.0)


def backward_softplus_act(dL_dy, x, y):
    return dL_dy / (1.0 + jnp.exp(-x))


# * ReLU (rgb/diffuse)

def relu_act(x):
    return jnp.maximum(x, 0.0)


def backward_relu_act(dL_dy, y):
    return dL_dy * (y >= 0.0).astype(dL_dy.dtype)


# * Clipped ReLU (f0, roughness)

def clipped_relu_act(x):
    return jnp.clip(x, 0.0, 1.0)


def backward_clipped_relu_act(dL_dy, y):
    inside = jnp.logical_and(y >= 0.0, y <= 1.0)
    return dL_dy * inside.astype(dL_dy.dtype)


# * Exp (scale)

def exp_act(x):
    return jnp.exp(x)


def backward_exp_act(dL_dy, y):
    """y is the activated value: d/dx exp(x) = exp(x) = y."""
    return dL_dy * y


# * Normalize (rotation quaternion, last-axis vectors)

def normalize_act(x, axis=-1, eps=0.0):
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (norm + eps)


def backward_normalize_act(dL_dy, x, y):
    """Matches activations.cu:76-78: grad of x/|x| evaluated at raw x.

    ``y`` (the normalized value) is accepted for signature parity but the
    reference recomputes everything from ``x``.
    """
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    dot = jnp.sum(dL_dy * x, axis=-1, keepdims=True)
    return dot * (-x) / (norm**3) + dL_dy / norm


# * Identity (mean, normal)

def identity_act(x):
    return x


def backward_identity_act(dL_dy, y):
    return dL_dy
