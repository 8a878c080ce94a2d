"""Train DISK on synthetic corner scenes (corner + hinge stand-in).

The reference serves *trained* DISK weights through ONNX
(nn_feature_point_detector.cpp:10-31 loads disk.onnx / disk_nms.onnx;
nn_feature_point_detector_disk.cpp:8-28 dispatches them); the blobs are
absent from its snapshot and this environment has no egress, so the weights
are produced in-repo — same bootstrap as SuperPoint
(models/train_superpoint.py), adapted to DISK's full-resolution outputs:

- detector: per-PIXEL weighted binary cross-entropy of the sigmoid heatmap
  against the analytically-known corner map, in frame A and the in-graph
  homographically-warped frame B (DISK's own reinforcement objective needs
  pose-supervised image pairs we cannot download; the corner+hinge stand-in
  trains the same output contract);
- descriptor: the full-res 128-d map is 8x8 average-pooled to cells —
  exactly the front-end's sampling path (frontend/nn_detector.py) — and
  trained with the SuperPoint hinge on cell correspondences from the known
  homography.

CLI:  python -m feature_detector_tpu.models.train_disk \
          --steps 1500 --batch 16 --out feature_detector_tpu/models/weights/disk_synth.npz
"""

from __future__ import annotations

import argparse
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .disk import Disk
from .synth_data import make_batch
from .train_superpoint import (
    CELL,
    _cell_centers,
    save_params_npz,
    warp_bilinear,
)


def labels_to_pixel_map(labels: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Invert the 65-way cell encoding to a [B, H, W] {0,1} corner map.

    label (v%8)*8 + u%8 marks the corner pixel inside its 8x8 cell; 64 =
    empty (synth_data.cell_labels).
    """
    bsz, hc, wc = labels.shape
    onehot = jax.nn.one_hot(labels, CELL * CELL + 1, dtype=jnp.float32)[..., :-1]
    cells = onehot.reshape(bsz, hc, wc, CELL, CELL)           # [B,hc,wc,dv,du]
    return cells.transpose(0, 1, 3, 2, 4).reshape(bsz, h, w)


def _smear(tgt: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Dilate the {0,1} corner map to a (2r+1)² plateau.  A single-pixel
    positive against ~20k negatives trains a timid heatmap whose corner peaks
    barely clear the background (the r04 score-informativeness failure);
    the plateau target concentrates probability mass at corners without
    punishing ±1 px localization."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        tgt, 0.0, jax.lax.max, (1, k, k), (1, 1, 1), "SAME"
    )


def disk_loss(model: Disk, params, batch, lambda_d: float = 2.0,
              margin_neg: float = 0.4, smear_radius: int = 1):
    images = batch["image"]
    bsz, h, w = images.shape
    warped, valid_px = warp_bilinear(images, batch["H_ab"])

    rgb = lambda im: jnp.repeat(im[..., None], 3, axis=-1)
    heat_a, desc_a = model.apply(params, rgb(images))
    heat_b, desc_b = model.apply(params, rgb(warped))

    tgt_a = _smear(labels_to_pixel_map(batch["label_a"], h, w), smear_radius)
    tgt_b = _smear(labels_to_pixel_map(batch["label_b"], h, w), smear_radius)

    def bce(heat, tgt, px_mask=None):
        eps = 1e-6
        pos = -jnp.log(heat + eps) * tgt
        neg = -jnp.log(1.0 - heat + eps) * (1.0 - tgt)
        if px_mask is None:
            px_mask = jnp.ones_like(tgt)
        n_pos = jnp.maximum(jnp.sum(tgt * px_mask), 1.0)
        n_neg = jnp.maximum(jnp.sum((1.0 - tgt) * px_mask), 1.0)
        return (jnp.sum(pos * px_mask) / n_pos + jnp.sum(neg * px_mask) / n_neg)

    det_loss = bce(heat_a, tgt_a) + bce(heat_b, tgt_b, valid_px.astype(jnp.float32))

    # Descriptor hinge on 8x8-pooled cell descriptors (the front-end's own
    # sampling resolution) with homography correspondence.
    pool = lambda d: jax.lax.reduce_window(
        d, 0.0, jax.lax.add, (1, CELL, CELL, 1), (1, CELL, CELL, 1), "VALID"
    ) / float(CELL * CELL)
    da = pool(desc_a)
    db = pool(desc_b)
    hc, wc = da.shape[1:3]
    centers = _cell_centers(hc, wc)
    ones = jnp.ones((centers.shape[0], 1), jnp.float32)
    q = jnp.einsum("bij,nj->bni", batch["H_ab"], jnp.concatenate([centers, ones], 1))
    wa = q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) < 1e-9, 1e-9, q[..., 2:])
    d2 = jnp.sum((wa[:, :, None, :] - centers[None, None, :, :]) ** 2, -1)
    s = (d2 <= float(CELL) ** 2).astype(jnp.float32)

    da = da.reshape(bsz, -1, da.shape[-1])
    db = db.reshape(bsz, -1, db.shape[-1])
    da = da / jnp.maximum(jnp.linalg.norm(da, axis=-1, keepdims=True), 1e-9)
    db = db / jnp.maximum(jnp.linalg.norm(db, axis=-1, keepdims=True), 1e-9)
    dot = jnp.einsum("bnd,bmd->bnm", da, db)
    # Hardest-negative triplet (per anchor cell): the balanced mean hinge is
    # dominated by easy negatives and plateaus with weak descriptors
    # (measured r05: homography-matching precision 0.25 under the hinge vs
    # the SuperPoint-grade target ≥0.5) — the standard fix is to penalize
    # only the hardest negative per anchor (HardNet / DISK practice).
    pos_dot = jnp.max(jnp.where(s > 0, dot, -2.0), axis=2)          # [B, N]
    neg_dot = jnp.max(jnp.where(s > 0, -2.0, dot), axis=2)          # [B, N]
    has_pos = jnp.any(s > 0, axis=2)
    trip = jnp.maximum(0.0, margin_neg + neg_dot - pos_dot) * has_pos
    desc_loss = jnp.sum(trip) / jnp.maximum(jnp.sum(has_pos), 1.0)

    return det_loss + lambda_d * desc_loss, {"det": det_loss, "desc": desc_loss}


def train(steps: int = 1500, batch: int = 16, h: int = 128, w: int = 160,
          lr: float = 1e-3, seed: int = 0, out: Optional[str] = None,
          log_every: int = 50, data_seed: int = 0):
    import optax

    model = Disk()
    rng = np.random.default_rng(data_seed)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: disk_loss(model, p, batch), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = __import__("optax").apply_updates(params, updates)
        return params, opt_state, loss, aux

    history = []
    t0 = time.time()
    # Prefetch thread: scene rendering is ~0.5 s/batch of host numpy/scipy
    # (GIL-releasing) — overlap it with the TPU step instead of serializing.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(1)
    # rich_background: corner-free texture negatives (see synth_data).
    gen = lambda: make_batch(rng, batch, h, w, rich_background=True)
    fut = pool.submit(gen)
    for i in range(steps):
        b = fut.result()
        fut = pool.submit(gen)
        params, opt_state, loss, aux = step_fn(params, opt_state, b)
        if i % log_every == 0 or i == steps - 1:
            l, d, dd = float(loss), float(aux["det"]), float(aux["desc"])
            history.append((i, l, d, dd))
            print(f"step {i:5d}  loss {l:.4f}  det {d:.4f}  desc {dd:.4f}  "
                  f"{(time.time() - t0):.0f}s", flush=True)
    if out:
        save_params_npz(out, params)
        print(f"saved {out}")
    return params, history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", type=str,
                    default="feature_detector_tpu/models/weights/disk_synth.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    train(steps=args.steps, batch=args.batch, lr=args.lr, out=args.out)


if __name__ == "__main__":
    main()
