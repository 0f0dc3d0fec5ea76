"""Pixel/segment memory bank for contrastive segmentation losses.

Reference analog: biapy/models/memory_bank.py (178 LoC) + the memory-bank
contrastive hook in the train loop (base_workflow.py:1025-1039) and
ContrastCELoss / PixelContrastLoss (engine/metrics.py:958/1078).

Design for jit: the queues are plain arrays carried OUTSIDE the jitted step
(host-updated between steps, like the reference updates them outside
backward). The jitted loss receives the queue tensors as inputs; the step
additionally returns per-class mean embeddings ("segment" samples) and a
fixed number of random pixel embeddings that the host enqueues.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MemoryBank:
    """Per-class FIFO queues of L2-normalized embeddings."""

    def __init__(self, n_classes: int, dim: int, pixel_queue: int = 1024,
                 segment_queue: int = 256, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.n_classes = n_classes
        self.dim = dim
        self.pixel_queue = self._norm(rng.normal(size=(n_classes, pixel_queue, dim)).astype(np.float32))
        self.segment_queue = self._norm(rng.normal(size=(n_classes, segment_queue, dim)).astype(np.float32))
        self._pix_ptr = np.zeros(n_classes, np.int64)
        self._seg_ptr = np.zeros(n_classes, np.int64)

    @staticmethod
    def _norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    def enqueue(self, pixel_samples: np.ndarray, segment_samples: np.ndarray,
                valid: np.ndarray) -> None:
        """``pixel_samples``: (n_classes, k, dim); ``segment_samples``:
        (n_classes, dim); ``valid``: (n_classes,) bool — classes present in
        the batch."""
        for c in range(self.n_classes):
            if not valid[c]:
                continue
            seg = segment_samples[c]
            p = int(self._seg_ptr[c]) % self.segment_queue.shape[1]
            self.segment_queue[c, p] = seg / max(np.linalg.norm(seg), 1e-8)
            self._seg_ptr[c] += 1
            for s in pixel_samples[c]:
                n = np.linalg.norm(s)
                if n < 1e-6:
                    continue
                p = int(self._pix_ptr[c]) % self.pixel_queue.shape[1]
                self.pixel_queue[c, p] = s / n
                self._pix_ptr[c] += 1

    def as_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.pixel_queue, self.segment_queue


def sample_embeddings(embed: jnp.ndarray, labels: jnp.ndarray, n_classes: int,
                      k: int = 16, rng: Optional[jax.Array] = None):
    """Jit-friendly sampling: per class, k random pixel embeddings + the
    class mean embedding. Returns (pixel (C,k,D), segment (C,D), valid (C,))."""
    d = embed.shape[-1]
    flat_e = embed.reshape(-1, d)
    flat_l = labels.reshape(-1).astype(jnp.int32)
    n = flat_e.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    scores = jax.random.uniform(rng, (n,))

    def per_class(c):
        m = (flat_l == c)
        cnt = jnp.sum(m)
        seg = jnp.sum(flat_e * m[:, None], axis=0) / jnp.maximum(cnt, 1)
        s = jnp.where(m, scores, -1.0)
        _, idx = jax.lax.top_k(s, k)
        pix = flat_e[idx] * (jnp.take(m, idx))[:, None]
        return pix, seg, cnt > 0

    pix, seg, valid = jax.vmap(per_class)(jnp.arange(n_classes))
    return pix, seg, valid


def pixel_contrast_loss(embed: jnp.ndarray, labels: jnp.ndarray,
                        pixel_queue: jnp.ndarray, segment_queue: jnp.ndarray,
                        n_classes: int, temperature: float = 0.1,
                        n_anchors: int = 64, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Supervised pixel contrastive loss against the memory bank
    (reference: PixelContrastLoss, metrics.py:1078; Wang et al. 2021).

    For sampled anchor pixels, positives are bank entries of the anchor's
    class, negatives all other classes' entries. InfoNCE with temperature.
    """
    d = embed.shape[-1]
    flat_e = embed.reshape(-1, d)
    flat_e = flat_e / jnp.maximum(jnp.linalg.norm(flat_e, axis=-1, keepdims=True), 1e-8)
    flat_l = labels.reshape(-1).astype(jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    scores = jax.random.uniform(rng, flat_l.shape)
    _, idx = jax.lax.top_k(scores, n_anchors)
    anchors = flat_e[idx]                      # (A, D)
    a_cls = flat_l[idx]                        # (A,)

    bank = jnp.concatenate([pixel_queue, segment_queue], axis=1)  # (C, Q, D)
    c_, q_, _ = bank.shape
    bank_flat = bank.reshape(c_ * q_, d)
    bank_cls = jnp.repeat(jnp.arange(c_), q_)

    logits = anchors @ bank_flat.T / temperature          # (A, C*Q)
    pos = (bank_cls[None, :] == a_cls[:, None]).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(logp * pos, axis=-1) / jnp.maximum(jnp.sum(pos, axis=-1), 1.0)
    return jnp.mean(loss)


def contrast_ce_loss(out: Dict, y: jnp.ndarray, pixel_queue, segment_queue,
                     n_classes: int = 2, ce_fn=None, weight: float = 0.1,
                     rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """CE on the prediction + weighted pixel contrastive loss on the
    embedding head (reference: ContrastCELoss, metrics.py:958)."""
    from biapy_tpu.engine.metrics import cross_entropy_loss

    ce = (ce_fn or cross_entropy_loss)(out["pred"], y)
    if "embed" not in out:
        return ce
    labels = (y[..., 0] > 0.5).astype(jnp.int32) if y.shape[-1] == 1 else y[..., 0]
    con = pixel_contrast_loss(out["embed"], labels, pixel_queue, segment_queue, n_classes, rng=rng)
    return ce + weight * con
