"""Train SuperPoint on synthetic corner scenes (the flagship training loop).

The reference serves *trained* SuperPoint weights through ONNX
(nn_feature_point_detector.cpp:10-57); its blobs are absent and this
environment has no egress, so the weights are produced here, the way the
SuperPoint pipeline itself bootstraps (DeTone et al. 2018): corner-supervised
training on rendered geometric scenes (models/synth_data.py) plus
homographic-warp descriptor supervision.

TPU-native design:
- the homographic warp of the training pair runs IN-GRAPH (bilinear gather on
  device) — the host only ships one image + one 3x3 matrix per sample;
- losses: 65-way cell softmax cross-entropy in both frames (detector), and
  the SuperPoint hinge loss on cell-descriptor dot products with
  correspondence from the known homography (descriptor, one [Nc, Nc] MXU
  matmul per pair);
- data-parallel over a ``data`` mesh axis via NamedSharding — the same train
  step the driver's ``dryrun_multichip`` compiles at N devices.

CLI:  python -m feature_detector_tpu.models.train_superpoint \
          --steps 2000 --batch 32 --out feature_detector_tpu/models/weights/superpoint_synth.npz
"""

from __future__ import annotations

import argparse
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .superpoint import SuperPoint
from .synth_data import make_batch

CELL = 8


def warp_bilinear(images: jnp.ndarray, H_ab: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-graph homographic warp: B-frame image sampled from A.

    images [B, H, W] float32, H_ab [B, 3, 3] maps A pixel coords -> B.
    Returns (warped [B, H, W], valid [B, H, W] bool — source in bounds).
    """
    bsz, h, w = images.shape
    H_ba = jnp.linalg.inv(H_ab)                                   # B -> A
    v, u = jnp.mgrid[0:h, 0:w]
    ones = jnp.ones_like(u)
    p = jnp.stack([u, v, ones], -1).astype(jnp.float32)           # [H, W, 3]
    q = jnp.einsum("bij,hwj->bhwi", H_ba, p)
    src_u = q[..., 0] / jnp.where(jnp.abs(q[..., 2]) < 1e-9, 1e-9, q[..., 2])
    src_v = q[..., 1] / jnp.where(jnp.abs(q[..., 2]) < 1e-9, 1e-9, q[..., 2])

    u0 = jnp.floor(src_u).astype(jnp.int32)
    v0 = jnp.floor(src_v).astype(jnp.int32)
    fu = src_u - u0
    fv = src_v - v0
    valid = (src_u >= 0) & (src_u <= w - 1) & (src_v >= 0) & (src_v <= h - 1)
    u0c = jnp.clip(u0, 0, w - 2)
    v0c = jnp.clip(v0, 0, h - 2)

    flat = images.reshape(bsz, -1)
    base = v0c * w + u0c                                          # [B, H, W]
    g = lambda off: jnp.take_along_axis(flat, (base + off).reshape(bsz, -1), 1).reshape(bsz, h, w)
    out = ((1 - fu) * (1 - fv) * g(0) + fu * (1 - fv) * g(1)
           + (1 - fu) * fv * g(w) + fu * fv * g(w + 1))
    return jnp.where(valid, out, 0.0), valid


def _cell_centers(hc: int, wc: int) -> jnp.ndarray:
    """[hc*wc, 2] (u, v) pixel centers of 8x8 cells."""
    v, u = jnp.mgrid[0:hc, 0:wc]
    return jnp.stack([u * CELL + CELL / 2.0, v * CELL + CELL / 2.0], -1).reshape(-1, 2).astype(jnp.float32)


def superpoint_loss(model: SuperPoint, params, batch,
                    lambda_d: float = 1.0, margin_pos: float = 1.0,
                    margin_neg: float = 0.2):
    """Detector CE (both frames) + descriptor hinge (SuperPoint eq. 4).

    batch: image [B,H,W] f32, label_a/label_b [B,hc,wc] int32 (65-way),
    H_ab [B,3,3].
    """
    images = batch["image"]
    bsz, h, w = images.shape
    warped, valid_px = warp_bilinear(images, batch["H_ab"])

    logits_a, desc_a = model.apply(params, images[..., None], return_logits=True)
    logits_b, desc_b = model.apply(params, warped[..., None], return_logits=True)
    hc, wc = logits_a.shape[1:3]

    def cell_ce(logits, labels, cell_mask=None):
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), labels[..., None], axis=-1
        )[..., 0]
        if cell_mask is not None:
            ce = ce * cell_mask
            return jnp.sum(ce) / jnp.maximum(jnp.sum(cell_mask), 1.0)
        return jnp.mean(ce)

    # B-frame cells whose center has no source pixel are unlabeled — mask.
    valid_cells = valid_px.reshape(bsz, hc, CELL, wc, CELL)[:, :, CELL // 2, :, CELL // 2]
    det_loss = cell_ce(logits_a, batch["label_a"]) + cell_ce(
        logits_b, batch["label_b"], valid_cells.astype(jnp.float32)
    )

    # Descriptor hinge: correspondence s = 1 iff warped A-cell center lands
    # within one cell of the B-cell center.
    centers = _cell_centers(hc, wc)                                # [Nc, 2]
    ones = jnp.ones((centers.shape[0], 1), jnp.float32)
    ch = jnp.concatenate([centers, ones], 1)                       # [Nc, 3]
    q = jnp.einsum("bij,nj->bni", batch["H_ab"], ch)
    wa = q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) < 1e-9, 1e-9, q[..., 2:])  # [B, Nc, 2]
    d2 = jnp.sum((wa[:, :, None, :] - centers[None, None, :, :]) ** 2, -1)     # [B, Na, Nb]
    s = (d2 <= float(CELL) ** 2).astype(jnp.float32)

    da = desc_a.reshape(bsz, -1, desc_a.shape[-1])
    db = desc_b.reshape(bsz, -1, desc_b.shape[-1])
    dot = jnp.einsum("bnd,bmd->bnm", da, db)                       # [B, Na, Nb] MXU
    hinge = s * jnp.maximum(0.0, margin_pos - dot) + (1.0 - s) * jnp.maximum(0.0, dot - margin_neg)
    # Balance: positives are ~1/Nc of all pairs — weight them up to parity.
    n_pos = jnp.maximum(jnp.sum(s), 1.0)
    n_neg = jnp.maximum(jnp.sum(1.0 - s), 1.0)
    desc_loss = jnp.sum(hinge * s) / n_pos + jnp.sum(hinge * (1.0 - s)) / n_neg

    return det_loss + lambda_d * desc_loss, {"det": det_loss, "desc": desc_loss}


def make_train_step(model: SuperPoint, tx, mesh=None, axis: str = "data"):
    """Jitted (params, opt_state, batch) -> (params, opt_state, loss, aux).

    With ``mesh``, the batch shards over ``axis`` and params replicate —
    gradients all-reduce automatically through jit on NamedSharding inputs.
    """

    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: superpoint_loss(model, p, batch), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = __import__("optax").apply_updates(params, updates)
        return params, opt_state, loss, aux

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sharding = {
        "image": NamedSharding(mesh, P(axis, None, None)),
        "label_a": NamedSharding(mesh, P(axis, None, None)),
        "label_b": NamedSharding(mesh, P(axis, None, None)),
        "H_ab": NamedSharding(mesh, P(axis, None, None)),
    }
    repl = NamedSharding(mesh, P())

    jitted = jax.jit(step)

    def sharded_step(params, opt_state, batch):
        batch = {k: jax.device_put(v, data_sharding[k]) for k, v in batch.items()}
        params = jax.device_put(params, jax.tree.map(lambda _: repl, params,
                                                     is_leaf=lambda x: hasattr(x, "shape")))
        return jitted(params, opt_state, batch)

    return sharded_step


def save_params_npz(path: str, params) -> None:
    """Flatten the param pytree to an npz (float16 storage — the weights are
    consumed in bf16/f32 downstream; f16 halves the artifact size)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[key] = np.asarray(leaf).astype(np.float16)
    np.savez_compressed(path, **flat)


def load_params_npz(path: str):
    """Rebuild the {"params": {...}} pytree from an npz written above."""
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key], jnp.float32)
    return tree


def train(steps: int = 2000, batch: int = 32, h: int = 120, w: int = 160,
          lr: float = 1e-3, seed: int = 0, out: Optional[str] = None,
          mesh=None, log_every: int = 100, data_seed: int = 0):
    """Run the training loop; returns (params, history)."""
    import optax

    model = SuperPoint()
    rng = np.random.default_rng(data_seed)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 1)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx, mesh=mesh)

    history = []
    t0 = time.time()
    for i in range(steps):
        b = make_batch(rng, batch, h, w)
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
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", type=str, default="feature_detector_tpu/models/weights/superpoint_synth.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    train(steps=args.steps, batch=args.batch, lr=args.lr, out=args.out)


if __name__ == "__main__":
    main()
