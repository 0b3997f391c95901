"""Pyramid feature extractor: the TPU answer to HFextractor.

The reference (src/Extractors/HFextractor.cc:142-283) builds a 4-level image
pyramid and submits one TensorRT inference per level from a thread pool.
Here the whole pyramid is ONE jitted program: each level is resized
on-device and run through HF-Net at its NATIVE resolution (no padded
canvas — a canvas would pay full-resolution conv cost L times; native
sizes pay sum(area_l) ≈ 0.63x of that for 4 levels at 1.2x), the global
NetVLAD head and the stride-16/32 backbone tail run only for level 0
(the reference's kImageToLocal split, BaseModel.h:16-21), and keypoint
selection / descriptor sampling stay on-device (ops/extract.py).

Output is a fixed-capacity, masked feature set (pad_to slots), which is what
the downstream matching/BA kernels consume directly.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from . import hfnet
from ..ops import extract as X


class Features(NamedTuple):
    """Per-frame extracted features, fixed capacity N = pad_to."""

    xy: jnp.ndarray        # (N,2) level-0 pixel coords [x,y]
    score: jnp.ndarray     # (N,)
    octave: jnp.ndarray    # (N,) int32 pyramid level
    desc: jnp.ndarray      # (N,256) L2-normalized local descriptors
    mask: jnp.ndarray      # (N,) bool valid
    global_desc: jnp.ndarray  # (4096,)


class HFExtractor:
    """Static-shape pyramid extractor for one camera resolution.

    Mirrors the reference's extractor config (Settings.h:99-104: nFeatures,
    nLevels, scaleFactor, threshold)."""

    def __init__(
        self,
        params,
        image_hw,
        n_features: int = 1000,
        n_levels: int = 4,
        scale_factor: float = 1.2,
        threshold: float = 0.01,
        pad_to: int = 1024,
        nms_radius: int = 4,
        dtype=jnp.float32,
    ):
        H, W = image_hw
        H, W = (H // 8) * 8, (W // 8) * 8  # crop to multiple of 8 (hf_net.py:188-190)
        self.image_hw = (H, W)
        self.n_levels = n_levels
        self.scale_factor = scale_factor
        self.scales = [scale_factor ** i for i in range(n_levels)]
        self.level_hw = [
            (max(int(round(H / s)) // 8 * 8, 8), max(int(round(W / s)) // 8 * 8, 8))
            for s in self.scales
        ]
        self.threshold = threshold
        self.budgets = X.level_budgets(n_features, scale_factor, n_levels)
        self.pad_to = pad_to
        self.nms_radius = nms_radius
        self.params = params
        self.dtype = dtype
        self._extract = jax.jit(functools.partial(_extract_pyramid, cfg=self._static_cfg()))

    def _static_cfg(self):
        return dict(
            image_hw=self.image_hw,
            level_hw=tuple(self.level_hw),
            scales=tuple(self.scales),
            budgets=tuple(self.budgets),
            threshold=self.threshold,
            pad_to=self.pad_to,
            nms_radius=self.nms_radius,
            dtype=self.dtype,
        )

    def __call__(self, image) -> Features:
        """image: (H,W) or (H,W,1) grayscale float/uint8 [0,255]."""
        if image.ndim == 2:
            image = image[..., None]
        image = image[: self.image_hw[0], : self.image_hw[1]]
        return self._extract(self.params, image.astype(jnp.float32))


def _hashable(cfg):
    return cfg


def _extract_pyramid(params, image, *, cfg) -> Features:
    H, W = cfg["image_hw"]
    L = len(cfg["level_hw"])
    dtype = cfg["dtype"]
    if dtype != jnp.float32:
        # run the conv stack in bf16 on the MXU; selection/normalization
        # stages below cast back to f32
        params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params
        )

    # ---- per-level native-resolution inference + keypoint selection -----
    # Each level is its own conv workload (distinct static shape); level 0
    # additionally runs the stride-16/32 backbone tail + NetVLAD head.
    xs, ss, os_, ds, ms = [], [], [], [], []
    global_desc = None
    for lvl in range(L):
        h, w = cfg["level_hw"][lvl]
        lv = image if lvl == 0 else jax.image.resize(
            image, (h, w, 1), method="bilinear"
        )
        lv = lv[None].astype(dtype)
        if lvl == 0:
            out = hfnet.forward(params, lv, with_global=True)
            scores_dense, desc_map = out["scores_dense"], out["desc_map"]
            global_desc = out["global_desc"][0].astype(jnp.float32)
        else:
            local_feat = hfnet.backbone_local(params, lv)
            scores_dense, desc_map = hfnet.local_head(params, local_feat)
        scores = X.simple_nms(
            scores_dense.astype(jnp.float32), cfg["nms_radius"]
        )[0]
        dm = desc_map[0].astype(jnp.float32)

        k = max(int(cfg["budgets"][lvl]), 1)
        xy, sc, mk = X.select_keypoints(scores, None, cfg["threshold"], k)
        # subpixel peak refinement on the RAW (pre-NMS) score map — the
        # reference keeps integer keypoints; see ops/extract.refine_subpixel
        xy = X.refine_subpixel(scores_dense[0].astype(jnp.float32), xy)
        # Sampling uses the reference's own (w/8-1)/(w-1) align-corners
        # convention exactly (HFNetRTModel.cc:147-149).
        desc = X.sample_descriptors(dm, xy, (h, w))
        scale = cfg["scales"][lvl]
        xs.append(xy * scale)
        ss.append(sc)
        os_.append(jnp.full((k,), lvl, jnp.int32))
        ds.append(desc)
        ms.append(mk)

    xy = jnp.concatenate(xs)
    score = jnp.concatenate(ss)
    octave = jnp.concatenate(os_)
    desc = jnp.concatenate(ds)
    mask = jnp.concatenate(ms)

    n = xy.shape[0]
    pad = cfg["pad_to"] - n
    if pad < 0:
        raise ValueError(f"pad_to {cfg['pad_to']} < total budget {n}")
    if pad:
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2))])
        score = jnp.concatenate([score, jnp.zeros((pad,))])
        octave = jnp.concatenate([octave, jnp.zeros((pad,), jnp.int32)])
        desc = jnp.concatenate([desc, jnp.zeros((pad, desc.shape[1]))])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])

    return Features(xy, score, octave, desc, mask & (score > 0), global_desc)
