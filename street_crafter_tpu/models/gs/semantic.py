"""Per-Gaussian semantic channel (reference: gaussian_model.py:23-26, 45,
79, 90-95, 143-155, 191, 244-248; renderer hook street_gaussian_renderer.py:
195-200; config keys use_semantic / num_classes / semantic_mode /
lambda_semantic, config.py:83,104,141).

Off in every published reference config (``use_semantic: False``,
``lambda_semantic: 0``); provided here as a sidecar so enabling it does not
touch the core pool/optimizer pytrees:

- ``SemanticField``: [cap, num_classes] logits aligned with a GaussianPool,
  with the reference's logits/probabilities activation modes;
- densify surgery: pass ``field.logits`` through ``densify_and_prune``'s
  ``extra=`` hook (children copy the parent's logits, matching
  densification_postfix's cat semantics);
- rendering: semantic logits composite through the SAME alpha-blend as
  color — ``render_flat(..., extra_channels=field.get_semantic())`` returns
  them under ``"semantic"`` (the reference routes semantics through
  rasterize_to_pixels as extra color channels);
- ``semantic_loss``: per-pixel cross-entropy against an integer label map,
  weighted by ``lambda_semantic`` (the reference reserves the hyperparameter
  without shipping a consumer; CE over rendered logits is the standard
  street-gaussians formulation it forked from);
- PLY io: trailing ``semantic_i`` properties via utils/gs_ply.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SemanticField:
    logits: jax.Array                     # [cap, num_classes]
    mode: str = dataclasses.field(default="logits",
                                  metadata=dict(static=True))

    @property
    def num_classes(self) -> int:
        return self.logits.shape[-1]

    def get_semantic(self) -> jax.Array:
        """Activation per semantic_mode (gaussian_model.py:244-248)."""
        if self.mode == "logits":
            return self.logits
        if self.mode == "probabilities":
            return jax.nn.softmax(self.logits, axis=-1)
        raise ValueError(self.mode)


def init_semantic(capacity: int, num_classes: int,
                  labels: jax.Array | None = None,
                  mode: str = "logits") -> SemanticField:
    """Fresh field; optional [n] integer init labels become one-hot logits
    (the reference initializes _semantic as zeros or from provided
    per-point labels at create_from_pcd time)."""
    logits = jnp.zeros((capacity, num_classes), jnp.float32)
    if labels is not None:
        n = labels.shape[0]
        onehot = jax.nn.one_hot(labels, num_classes)
        logits = logits.at[:n].set(onehot)
    return SemanticField(logits=logits, mode=mode)


def semantic_loss(rendered: jax.Array,      # [H, W, num_classes] logits
                  labels: jax.Array,        # [H, W] int class ids
                  lambda_semantic: float = 0.0,
                  mask: jax.Array | None = None) -> jax.Array:
    """Pixel cross-entropy on alpha-composited semantic logits, scaled by
    lambda_semantic (config.py:83). Returns a scalar; 0 when the weight
    is 0 (reference default)."""
    if lambda_semantic == 0.0:
        return jnp.zeros(())
    logp = jax.nn.log_softmax(rendered, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if mask is not None:
        m = mask.astype(ce.dtype)
        ce = jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        ce = ce.mean()
    return lambda_semantic * ce
