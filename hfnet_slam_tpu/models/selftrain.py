"""Self-supervised HF-Net fine-tuning on synthetic ground truth.

The reference ships an offline training/export tree (hfnet/ — TF1,
distillation from SuperPoint + NetVLAD teachers, hfnet/README.md); its
public checkpoint cannot enter this environment. This module is the
TPU-native counterpart scaled to what the environment CAN supervise: a
renderable world with exact correspondences (models/synth.CylinderWorld)
trains the descriptor head with a symmetric InfoNCE over ground-truth
pixel correspondences, and the detector head with SuperPoint-style 65-way
cell cross-entropy on known corner locations. A few hundred Adam steps
turn the random-init network into a usable local feature extractor — the
bench's CNN-in-the-loop section trains on the fly (seconds on a TPU
chip) and then runs the full SLAM loop on the REAL model forward.

Everything is one jitted train step (backbone + heads differentiated
end-to-end); the host loop only renders views and samples correspondence
batches.
"""
from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from . import hfnet
from ..ops import extract as X


def _desc_at(params, img, uv, hw):
    """Bilinearly sampled, L2-normalized descriptors at pixel coords uv."""
    lf = hfnet.backbone_local(params, img[None, ..., None])
    _, dm = hfnet.local_head(params, lf)
    return X.sample_descriptors(dm[0], uv, hw)


def desc_info_nce(params, img_a, img_b, uv_a, uv_b, hw, temp=10.0):
    """Symmetric InfoNCE: corresponding pixels are positives, every other
    pair in the batch a negative (the descriptor objective of
    contrastive local-feature training)."""
    da = _desc_at(params, img_a, uv_a, hw)
    db = _desc_at(params, img_b, uv_b, hw)
    S = da @ db.T * temp
    labels = jnp.arange(S.shape[0])
    l = optax.softmax_cross_entropy_with_integer_labels(S, labels).mean()
    l += optax.softmax_cross_entropy_with_integer_labels(S.T, labels).mean()
    return 0.5 * l


def detector_ce(params, img, tgt, dustbin_weight=0.2):
    """SuperPoint-style detector supervision: 65-way cross-entropy per
    stride-8 cell against known corner cells (tgt == 64 is the dustbin).
    Corner cells are rare, so the two populations are balanced."""
    lf = hfnet.backbone_local(params, img[None, ..., None])
    h = jnp.clip(hfnet._conv(lf, params["det0"]["w"], params["det0"]["b"]),
                 0.0, 6.0)
    logits = hfnet._conv(h, params["det1"]["w"], params["det1"]["b"])[0]
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, tgt)
    corner = tgt < hfnet.DETECTOR_GRID ** 2
    pos = jnp.where(corner, ce, 0).sum() / jnp.maximum(corner.sum(), 1)
    neg = jnp.where(~corner, ce, 0).sum() / jnp.maximum((~corner).sum(), 1)
    return pos + dustbin_weight * neg


def loss_fn(params, img_a, img_b, uv_a, uv_b, tgt_a, tgt_b, hw,
            det_weight=1.0):
    l = desc_info_nce(params, img_a, img_b, uv_a, uv_b, hw)
    if det_weight > 0:
        l = l + det_weight * (detector_ce(params, img_a, tgt_a)
                              + detector_ce(params, img_b, tgt_b))
    return l


@partial(jax.jit, static_argnames=("hw", "det_weight", "opt"))
def train_step(params, opt_state, img_a, img_b, uv_a, uv_b, tgt_a, tgt_b,
               hw, det_weight, opt):
    loss, g = jax.value_and_grad(loss_fn)(
        params, img_a, img_b, uv_a, uv_b, tgt_a, tgt_b, hw, det_weight)
    updates, opt_state = opt.update(g, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def train(world, params=None, n_steps=300, n_pairs=192, lr=1e-3,
          det_weight=0.0, pose_range=100, gap=(1, 6), seed=1,
          log_every=0, n_frames_cache=24):
    """Fine-tune HF-Net on a CylinderWorld. Returns (params, stats).

    det_weight=0 trains descriptors only (the proven-stable recipe);
    >0 adds detector supervision. Rendering is cached over a pose subset
    so the host doesn't re-render every step."""
    cam = world.cam
    hw = (cam.height, cam.width)
    if params is None:
        params = hfnet.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)

    # pre-render a pose cache (rendering is host-side and O(HW) per frame)
    idxs = np.linspace(0, pose_range - 1, n_frames_cache).astype(int)
    cache = {}
    for i in idxs:
        pose = world.orbit_pose(int(i))
        img, dep = world.render_rgbd(*pose)
        tgt = world.corner_cells(*pose) if det_weight > 0 else \
            np.zeros((cam.height // 8, cam.width // 8), np.int32)
        cache[int(i)] = (pose, img, dep, tgt)
    keys = sorted(cache)

    t0 = time.perf_counter()
    losses = []
    for it in range(n_steps):
        ka = int(rng.choice(len(keys) - 1))
        kb = min(ka + int(rng.integers(*gap)), len(keys) - 1)
        (pa, ia, da, ta_) = cache[keys[ka]]
        (pb, ib, _, tb_) = cache[keys[kb]]
        ua, ub = world.correspondences(pa, pb, da, n_pairs + 64, rng)
        if len(ua) < n_pairs:
            continue
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(ia), jnp.asarray(ib),
            jnp.asarray(ua[:n_pairs]), jnp.asarray(ub[:n_pairs]),
            jnp.asarray(ta_), jnp.asarray(tb_), hw, det_weight, opt)
        losses.append(float(loss))
        if log_every and it % log_every == 0:
            from ..utils.log import info

            info(f"selftrain step {it}: loss {losses[-1]:.3f}")
    return params, {
        "steps": len(losses),
        "loss_first": losses[0] if losses else None,
        "loss_last": float(np.mean(losses[-10:])) if losses else None,
        "train_s": round(time.perf_counter() - t0, 1),
    }
