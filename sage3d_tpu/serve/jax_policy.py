"""TPU-hosted JAX navigation policy served over the reference wire protocol.

The reference's policy models are all external CUDA/torch servers
(mllm_server.py, navila_server.py, navid_server.py); the framework keeps
their socket protocol at the edge (serve/mllm_server.py) and — new here —
can also HOST a policy on the TPU itself: a jittable frame-history CNN whose
convolutions run on the MXU, wrapped in the same 8-byte-BE-length + JSON
socket server, so the benchmark client (serve/client.py == ModularVLMClient,
vlm_client_modular.py:494-611) drives it unchanged.

The bundled model is deliberately small (a VLN policy head, not a VLM): it
demonstrates/benchmarks in-framework TPU serving and gives closed-loop tests
a real learned-parameter path; swap ``apply_fn`` for any JAX model (e.g. a
flax VLM) without touching the serving layer.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ACTIONS = ("MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT", "STOP")


def init_cnn_policy(key: jax.Array, height: int = 96, width: int = 128,
                    frames: int = 4, channels: Tuple[int, ...] = (16, 32, 64),
                    hidden: int = 128) -> Dict[str, jnp.ndarray]:
    """He-initialized parameters for ``cnn_policy_apply``.

    Input: (frames, height, width, 3) float32 in [0, 1]; frame history is
    stacked on channels (frames*3 input channels), the TPU-native way to fuse
    short video context without attention.
    """
    ks = jax.random.split(key, len(channels) + 2)
    params: Dict[str, jnp.ndarray] = {}
    cin = frames * 3
    for i, cout in enumerate(channels):
        fan_in = 3 * 3 * cin
        params[f"conv{i}_w"] = jax.random.normal(
            ks[i], (3, 3, cin, cout), jnp.float32) * np.sqrt(2.0 / fan_in)
        params[f"conv{i}_b"] = jnp.zeros((cout,), jnp.float32)
        cin = cout
    h = height // (2 ** len(channels))
    w = width // (2 ** len(channels))
    flat = h * w * cin
    params["fc_w"] = jax.random.normal(
        ks[-2], (flat, hidden), jnp.float32) * np.sqrt(2.0 / flat)
    params["fc_b"] = jnp.zeros((hidden,), jnp.float32)
    params["head_w"] = jax.random.normal(
        ks[-1], (hidden, len(ACTIONS)), jnp.float32) * np.sqrt(2.0 / hidden)
    params["head_b"] = jnp.zeros((len(ACTIONS),), jnp.float32)
    return params


def cnn_policy_apply(params: Dict[str, jnp.ndarray],
                     frames: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W, 3) float32 frames -> (4,) action logits. Jittable; convs are
    strided 3x3 (NHWC, MXU-lowered by XLA), history fused on channels."""
    t, h, w, _ = frames.shape
    x = frames.transpose(1, 2, 0, 3).reshape(1, h, w, t * 3)
    i = 0
    while f"conv{i}_w" in params:
        x = jax.lax.conv_general_dilated(
            x, params[f"conv{i}_w"], window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + params[f"conv{i}_b"])
        i += 1
    x = x.reshape(1, -1)
    x = jax.nn.relu(x @ params["fc_w"] + params["fc_b"])
    return (x @ params["head_w"] + params["head_b"])[0]


def prep_frames(images: List, height: int, width: int,
                frames: int) -> np.ndarray:
    """Normalize a frame history to (frames, height, width, 3) float32 in
    [0,1]: keep the most recent ``frames``, front-pad by repeating the first
    (the 8-frame sliding-buffer contract, vlm_client_modular.py:54-82).
    Single source of truth for every in-framework policy server."""
    from PIL import Image
    imgs = list(images[-frames:]) if images else []
    if not imgs:
        imgs = [Image.new("RGB", (width, height))]
    imgs = [imgs[0]] * (frames - len(imgs)) + imgs
    arrs = []
    for im in imgs:
        if not isinstance(im, Image.Image):
            im = Image.fromarray(np.asarray(im))
        im = im.convert("RGB").resize((width, height))
        arrs.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(arrs)


class JaxPolicyAdapter:
    """MLLMAdapter-compatible wrapper: decode frames, run the jitted policy,
    emit the constrained action word (the MLLM wire contract)."""

    def __init__(self, params, apply_fn: Callable = cnn_policy_apply,
                 height: int = 96, width: int = 128, frames: int = 4):
        self.params = params
        self.height = height
        self.width = width
        self.frames = frames
        self._apply = jax.jit(apply_fn)

    def _prep(self, images: List) -> jnp.ndarray:
        return jnp.asarray(prep_frames(images, self.height, self.width,
                                       self.frames))

    def generate_response(self, images: List, instruction: str) -> str:
        logits = self._apply(self.params, self._prep(images))
        return ACTIONS[int(jax.device_get(jnp.argmax(logits)))]

    def extract_action(self, text: str) -> str:
        return text  # already a canonical action word


def make_jax_policy_server(host: str = "127.0.0.1", port: int = 9701,
                           params=None, seed: int = 0,
                           height: int = 96, width: int = 128,
                           frames: int = 4,
                           apply_fn: Callable = cnn_policy_apply):
    """MLLMServer hosting the JAX policy (random-init unless ``params``)."""
    from .mllm_server import MLLMServer
    if params is None:
        params = init_cnn_policy(jax.random.PRNGKey(seed), height, width,
                                 frames)
    adapter = JaxPolicyAdapter(params, apply_fn, height, width, frames)
    return MLLMServer(adapter, host=host, port=port)
