"""HF-Net in pure JAX: MobileNetV2 backbone + detector/descriptor heads +
NetVLAD global head.

TPU-native re-implementation of the network described by the reference's
offline export tree (/root/reference/hfnet/models/hf_net.py:13-52 backbone
spec, :56-100 heads; hfnet/models/utils/layers.py:57-109 NetVLAD + dim
reduction). The reference runs this as a TensorRT engine
(src/Extractors/HFNetRTModel.cc); here it is a single jitted JAX function
whose pyramid levels are batched together so the MXU sees one large conv
workload per frame (replacing the cv::parallel_for_ level parallelism of
HFextractor.cc:221-265).

Parameters are stored inference-ready: every conv carries (w, b) with batch
norm already folded (see `fold_bn`), matching how TensorRT consumes the
graph. Weight import from the public TF checkpoint goes through
`tools/convert_hfnet_weights.py`.

Architecture (from MOBILENET_DEF, hf_net.py:29-52):
  layer_1 : conv 3x3 s2, 32
  layer_2..layer_18: 17 MobileNetV2 expanded blocks
     (expansion, stride, out): (1,1,16) (6,2,24) (6,1,24) (6,2,32) (6,1,64)
     (6,1,128)<- local endpoint (stride 8)
     (6,2,64) (6,1,64) (6,1,64) (6,1,64) (6,1,96) (6,1,96) (6,1,96)
     (6,2,160) (6,1,160) (6,1,160) (6,1,320)<- global endpoint (stride 32)
  local head  (hf_net.py:56-100): desc 3x3conv(256)+1x1conv(256), L2-norm;
     detector 3x3conv(128)+1x1conv(65), softmax, drop dustbin,
     depth_to_space(8) -> dense scores at full resolution
  global head: NetVLAD n_clusters=64 over 320-d features + FC -> 4096, L2.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

# (expansion, stride, out_channels) for layer_2..layer_18
BLOCKS = [
    (1, 1, 16),
    (6, 2, 24),
    (6, 1, 24),
    (6, 2, 32),
    (6, 1, 64),
    (6, 1, 128),  # local endpoint (index 5 in this list)
    (6, 2, 64),
    (6, 1, 64),
    (6, 1, 64),
    (6, 1, 64),
    (6, 1, 96),
    (6, 1, 96),
    (6, 1, 96),
    (6, 2, 160),
    (6, 1, 160),
    (6, 1, 160),
    (6, 1, 320),  # global endpoint
]
LOCAL_ENDPOINT = 5
DESC_DIM = 256
DETECTOR_GRID = 8
N_CLUSTERS = 64
GLOBAL_DIM = 4096
GLOBAL_FEAT = 320

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, b, stride=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    return y + b


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _he_init(key, shape, fan_in):
    return jax.random.normal(key, shape, dtype=jnp.float32) * jnp.sqrt(2.0 / fan_in)


def init_params(key) -> Dict[str, Any]:
    """Random (He) initialization of the full inference param tree."""
    keys = iter(jax.random.split(key, 128))

    def conv_p(kh, kw, cin, cout, groups=1):
        w = _he_init(next(keys), (kh, kw, cin // groups, cout), kh * kw * cin // groups)
        return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}

    p: Dict[str, Any] = {}
    p["conv0"] = conv_p(3, 3, 1, 32)
    cin = 32
    blocks = []
    for expansion, stride, cout in BLOCKS:
        blk = {}
        mid = cin * expansion
        if expansion != 1:
            blk["expand"] = conv_p(1, 1, cin, mid)
        blk["depthwise"] = conv_p(3, 3, mid, mid, groups=mid)
        blk["project"] = conv_p(1, 1, mid, cout)
        blocks.append(blk)
        cin = cout
    p["blocks"] = blocks

    p["desc0"] = conv_p(3, 3, 128, DESC_DIM)
    p["desc1"] = conv_p(1, 1, DESC_DIM, DESC_DIM)
    p["det0"] = conv_p(3, 3, 128, 128)
    p["det1"] = conv_p(1, 1, 128, DETECTOR_GRID ** 2 + 1)

    p["vlad_memberships"] = conv_p(1, 1, GLOBAL_FEAT, N_CLUSTERS)
    p["vlad_clusters"] = (
        jax.random.normal(next(keys), (N_CLUSTERS, GLOBAL_FEAT), jnp.float32) * 0.1
    )
    p["proj"] = {
        "w": _he_init(next(keys), (N_CLUSTERS * GLOBAL_FEAT, GLOBAL_DIM), N_CLUSTERS * GLOBAL_FEAT),
        "b": jnp.zeros((GLOBAL_DIM,), jnp.float32),
    }
    return p


def fold_bn(w, gamma, beta, mean, var, eps=1e-3):
    """Fold batch-norm stats into conv weight/bias (slim BN default eps 1e-3)."""
    scale = gamma / jnp.sqrt(var + eps)
    if w.ndim == 4:  # HWIO
        w_f = w * scale[None, None, None, :]
    else:
        w_f = w * scale[None, :]
    b_f = beta - mean * scale
    return w_f, b_f


def _expanded_block(x, blk, expansion, stride):
    cin = x.shape[-1]
    h = x
    if expansion != 1:
        h = _relu6(_conv(h, blk["expand"]["w"], blk["expand"]["b"]))
    h = _relu6(
        _conv(h, blk["depthwise"]["w"], blk["depthwise"]["b"], stride=stride, groups=h.shape[-1])
    )
    h = _conv(h, blk["project"]["w"], blk["project"]["b"])
    if stride == 1 and cin == h.shape[-1]:
        h = h + x
    return h


def backbone_local(params, image):
    """Backbone truncated at the local endpoint (layer_7, stride 8).

    image: (B,H,W,1) raw grayscale [0,255], H,W multiples of 8.
    Returns (B,H/8,W/8,128). This is the `kImageToLocal` mode of the
    reference (BaseModel.h:16-21): pyramid levels > 0 never need the
    stride-16/32 global path, so 11 of the 17 MobileNet blocks are skipped."""
    x = (image - 128.0) / 128.0  # layers.py:6-7 image_normalization
    x = _relu6(_conv(x, params["conv0"]["w"], params["conv0"]["b"], stride=2))
    for (expansion, stride, cout), blk in zip(
        BLOCKS[: LOCAL_ENDPOINT + 1], params["blocks"][: LOCAL_ENDPOINT + 1]
    ):
        x = _expanded_block(x, blk, expansion, stride)
    return x


def backbone(params, image):
    """image: (B,H,W,1) raw grayscale [0,255]. Returns (local_feat, global_feat):
    (B,H/8,W/8,128) and (B,H/32,W/32,320). H and W must be multiples of 8
    (SAME padding handles the stride-16/32 tail)."""
    local_feat = backbone_local(params, image)
    x = local_feat
    for (expansion, stride, cout), blk in zip(
        BLOCKS[LOCAL_ENDPOINT + 1 :], params["blocks"][LOCAL_ENDPOINT + 1 :]
    ):
        x = _expanded_block(x, blk, expansion, stride)
    return local_feat, x


def local_head(params, local_feat):
    """-> (dense_scores (B,H,W), desc_map (B,H/8,W/8,256) L2-normalized)."""
    d = _relu6(_conv(local_feat, params["desc0"]["w"], params["desc0"]["b"]))
    d = _conv(d, params["desc1"]["w"], params["desc1"]["b"])
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    l = _relu6(_conv(local_feat, params["det0"]["w"], params["det0"]["b"]))
    logits = _conv(l, params["det1"]["w"], params["det1"]["b"])
    prob = jax.nn.softmax(logits, axis=-1)[..., :-1]  # drop dustbin
    # depth_to_space(8): (B,h,w,64) -> (B,8h,8w)
    B, h, w, _ = prob.shape
    g = DETECTOR_GRID
    scores = prob.reshape(B, h, w, g, g).transpose(0, 1, 3, 2, 4).reshape(B, h * g, w * g)
    return scores, d


def global_head(params, global_feat, valid_mask=None):
    """NetVLAD + dimensionality reduction -> (B, 4096) L2-normalized.

    valid_mask: optional (B, H/32, W/32) 0/1 mask of valid feature cells
    (used when levels are padded to a common canvas)."""
    m = _conv(global_feat, params["vlad_memberships"]["w"], params["vlad_memberships"]["b"])
    m = jax.nn.softmax(m, axis=-1)  # (B,h,w,K)
    # residuals: clusters (K,C) - features (B,h,w,C); weighted sum over h,w
    # computed as two matmul-style contractions to stay on the MXU:
    #   sum_hw m[...,k] * (c[k] - f) = c[k] * sum_hw m[...,k] - sum_hw m[...,k] f
    if valid_mask is not None:
        m = m * valid_mask[..., None]
    m_sum = jnp.sum(m, axis=(1, 2))  # (B,K)
    mf = jnp.einsum("bhwk,bhwc->bkc", m, global_feat)  # (B,K,C)
    vlad = params["vlad_clusters"][None] * m_sum[..., None] - mf  # (B,K,C)
    # intra-normalization over the *cluster* axis, exactly like the reference
    # (layers.py:89: l2_normalize(descriptor, axis=1) on (B,K,C))
    vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=1, keepdims=True), 1e-12)
    v = vlad.reshape(vlad.shape[0], -1)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    # dimensionality reduction (layers.py:96-109): l2 -> FC -> l2
    v = v @ params["proj"]["w"] + params["proj"]["b"]
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v


def forward(params, image, with_global=True, valid_mask=None):
    """Full HF-Net forward.

    Args:
      image: (B,H,W,1) grayscale float [0,255]; H,W multiples of 32.
      valid_mask: optional (B,H,W) validity (for padded pyramid canvases).
    Returns dict: scores_dense (B,H,W), desc_map (B,H/8,W/8,256),
      global_desc (B,4096) (if with_global).
    """
    local_feat, global_feat = backbone(params, image)
    scores, desc_map = local_head(params, local_feat)
    out = {"scores_dense": scores, "desc_map": desc_map}
    if with_global:
        gmask = None
        if valid_mask is not None:
            s = 32
            gmask = valid_mask[:, ::s, ::s].astype(jnp.float32)
            gmask = gmask[:, : global_feat.shape[1], : global_feat.shape[2]]
        out["global_desc"] = global_head(params, global_feat, gmask)
    return out


# ---------------------------------------------------------------------------
# parameter persistence (the reference ships TF/ONNX checkpoints; our native
# format is a flat .npz keyed by tree path — conversion from the public TF
# checkpoint is offline tooling, see tools/convert_hfnet_weights.py)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], tree


def save_params(path, params):
    import numpy as np

    np.savez_compressed(path, **{k: np.asarray(v) for k, v in _flatten(params)})


def load_params(path):
    """Load a .npz parameter tree written by save_params. The structure is
    reconstructed from the template produced by init_params (all HF-Net
    variants share the fixed architecture, hf_net.py:13-52)."""
    import numpy as np

    z = np.load(path)
    template = init_params(jax.random.PRNGKey(0))

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        key = prefix[:-1]
        arr = jnp.asarray(z[key])
        if arr.shape != tree.shape:
            raise ValueError(f"{key}: shape {arr.shape} != expected {tree.shape}")
        return arr

    return rebuild(template)
