"""Activation-parity harness for HF-Net weight import (VERDICT r3 #4).

test_convert.py validates the converter's variable LAYOUT; this file
validates NUMERICS-THROUGH-THE-MODEL: an independent NumPy implementation
of the reference spec (/root/reference/hfnet/models/hf_net.py:56-100,
hfnet/models/utils/layers.py:57-109 — slim conv->BN->relu6 chains,
MobileNetV2 expanded blocks, detector softmax + depth_to_space, NetVLAD
residual aggregation, dimensionality reduction) consumes the RAW TF-layout
checkpoint (separate BN statistics, TF depthwise weight layout) and
produces golden activations in float64; the JAX model running on the
CONVERTED (BN-folded) parameters must reproduce them.

A transposed conv kernel, a wrong BN fold, a flipped depth_to_space, or a
NetVLAD sign/normalization error all produce O(1) deviations here — none
of which the layout round-trip test can see.
"""
import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tools import convert_hfnet_weights as cvt  # noqa: E402
from hfnet_slam_tpu.models import hfnet  # noqa: E402
from tests.test_convert import _synthetic_ckpt  # noqa: E402


# ---------------------------------------------------------------------------
# independent NumPy reference (float64, TF-layout weights, explicit BN)
# ---------------------------------------------------------------------------

def _same_pad(H, k, s):
    o = -(-H // s)
    p = max((o - 1) * s + k - H, 0)
    return o, p // 2, p - p // 2


def np_conv(x, w, stride=1):
    """NHWC x HWIO 'SAME' conv, float64 accumulation."""
    B, H, W, _ = x.shape
    kh, kw, _, Cout = w.shape
    oh, pt, pb = _same_pad(H, kh, stride)
    ow, pl, pr = _same_pad(W, kw, stride)
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    acc = np.zeros((B, oh, ow, Cout), np.float64)
    for i in range(kh):
        for j in range(kw):
            xs = xp[:, i:i + oh * stride:stride, j:j + ow * stride:stride, :]
            acc += np.einsum("bhwc,cd->bhwd", xs.astype(np.float64),
                             w[i, j].astype(np.float64))
    return acc


def np_depthwise(x, w_tf, stride=1):
    """TF depthwise layout (kh,kw,C,1): channel c convolves with w[:,:,c,0]."""
    B, H, W, C = x.shape
    kh, kw, _, _ = w_tf.shape
    oh, pt, pb = _same_pad(H, kh, stride)
    ow, pl, pr = _same_pad(W, kw, stride)
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    acc = np.zeros((B, oh, ow, C), np.float64)
    for i in range(kh):
        for j in range(kw):
            xs = xp[:, i:i + oh * stride:stride, j:j + ow * stride:stride, :]
            acc += xs.astype(np.float64) * w_tf[i, j, :, 0].astype(np.float64)
    return acc


def np_bn(x, ckpt, scope, eps=1e-3):
    """slim.batch_norm inference transform (epsilon default 0.001)."""
    g = ckpt[f"{scope}/BatchNorm/gamma"].astype(np.float64)
    b = ckpt[f"{scope}/BatchNorm/beta"].astype(np.float64)
    mu = ckpt[f"{scope}/BatchNorm/moving_mean"].astype(np.float64)
    var = ckpt[f"{scope}/BatchNorm/moving_variance"].astype(np.float64)
    return (x - mu) / np.sqrt(var + eps) * g + b


def relu6(x):
    return np.clip(x, 0.0, 6.0)


def np_conv_bn_relu6(x, ckpt, scope, stride=1):
    y = np_conv(x, ckpt[f"{scope}/weights"], stride)
    return relu6(np_bn(y, ckpt, scope))


def np_forward(ckpt, image):
    """Golden forward of the full spec from the RAW checkpoint."""
    x = (image.astype(np.float64) - 128.0) / 128.0
    x = np_conv_bn_relu6(x, ckpt, "MobilenetV2/Conv", stride=2)
    local_feat = None
    for i, (expansion, stride, cout) in enumerate(hfnet.BLOCKS):
        scope = "MobilenetV2/expanded_conv" + (f"_{i}" if i else "")
        h = x
        if expansion != 1:
            h = np_conv_bn_relu6(h, ckpt, f"{scope}/expand")
        h = np_depthwise(h, ckpt[f"{scope}/depthwise/depthwise_weights"],
                         stride)
        h = relu6(np_bn(h, ckpt, f"{scope}/depthwise"))
        h = np_bn(np_conv(h, ckpt[f"{scope}/project/weights"]), ckpt,
                  f"{scope}/project")
        if stride == 1 and x.shape[-1] == h.shape[-1]:
            h = h + x
        x = h
        if i == hfnet.LOCAL_ENDPOINT:
            local_feat = x
    global_feat = x

    # descriptor head: conv3x3+BN+relu6, conv1x1+bias, l2
    d = np_conv_bn_relu6(local_feat, ckpt, "descriptor/Conv")
    d = np_conv(d, ckpt["descriptor/Conv_1/weights"]) \
        + ckpt["descriptor/Conv_1/biases"].astype(np.float64)
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    # detector head: conv3x3+BN+relu6, conv1x1+bias, softmax, dustbin,
    # depth_to_space(8)
    l = np_conv_bn_relu6(local_feat, ckpt, "detector/Conv")
    logits = np_conv(l, ckpt["detector/Conv_1/weights"]) \
        + ckpt["detector/Conv_1/biases"].astype(np.float64)
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    prob = (e / e.sum(axis=-1, keepdims=True))[..., :-1]
    B, h, w, _ = prob.shape
    g = hfnet.DETECTOR_GRID
    # TF depth_to_space: out[b, h*g+dy, w*g+dx] = in[b, h, w, dy*g+dx]
    scores = prob.reshape(B, h, w, g, g).transpose(0, 1, 3, 2, 4) \
        .reshape(B, h * g, w * g)

    # NetVLAD (layers.py:57-93): memberships conv1x1+BN (no activation),
    # softmax over clusters; residuals = clusters - features, weighted,
    # summed over h,w; intra-normalize over the CLUSTER axis; flatten; l2
    m = np_bn(np_conv(global_feat, ckpt["vlad/memberships/weights"]),
              ckpt, "vlad/memberships")
    em = np.exp(m - m.max(axis=-1, keepdims=True))
    memb = em / em.sum(axis=-1, keepdims=True)          # (B,h,w,K)
    clusters = ckpt["vlad/clusters"].astype(np.float64)  # (1,1,1,K,C)
    resid = clusters - global_feat[..., None, :]         # (B,h,w,K,C)
    resid = resid * memb[..., None]
    desc = resid.sum(axis=(1, 2))                        # (B,K,C)
    desc = desc / np.maximum(
        np.linalg.norm(desc, axis=1, keepdims=True), 1e-12)
    v = desc.reshape(desc.shape[0], -1)
    v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    # dimensionality reduction: l2 -> FC -> l2 (the first l2 is idempotent)
    v = v @ ckpt["dimensionality_reduction/weights"].astype(np.float64) \
        + ckpt["dimensionality_reduction/biases"].astype(np.float64)
    v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return {"local_feat": local_feat, "scores_dense": scores,
            "desc_map": d, "global_desc": v}


# ---------------------------------------------------------------------------
# the parity test
# ---------------------------------------------------------------------------

class TestActivationParity:
    @pytest.fixture(scope="class")
    def ckpt_and_params(self):
        rng = np.random.default_rng(42)
        ckpt = _synthetic_ckpt(rng)
        params = cvt.convert(ckpt)
        return ckpt, params

    @pytest.fixture(scope="class")
    def image(self):
        rng = np.random.default_rng(3)
        return rng.uniform(0, 255, (1, 64, 64, 1)).astype(np.float32)

    def test_backbone_local_matches(self, ckpt_and_params, image):
        """Intermediate parity at the local endpoint (layer_7, 128-ch):
        localizes conv/BN-fold/depthwise-layout errors to the backbone."""
        ckpt, params = ckpt_and_params
        gold = np_forward(ckpt, image)["local_feat"]
        got = np.asarray(hfnet.backbone_local(params, jnp.asarray(image)))
        scale = max(np.abs(gold).max(), 1e-6)
        err = np.abs(got - gold).max() / scale
        assert err < 1e-4, f"local endpoint rel err {err:.2e}"

    def test_full_outputs_match(self, ckpt_and_params, image):
        """End-to-end parity: dense scores, descriptor map, and the 4096-d
        global descriptor from converted params must match the raw-ckpt
        float64 golden to f32 accumulation tolerance."""
        ckpt, params = ckpt_and_params
        gold = np_forward(ckpt, image)
        out = hfnet.forward(params, jnp.asarray(image), with_global=True)
        err_s = np.abs(np.asarray(out["scores_dense"])
                       - gold["scores_dense"]).max()
        err_d = np.abs(np.asarray(out["desc_map"]) - gold["desc_map"]).max()
        err_g = np.abs(np.asarray(out["global_desc"])
                       - gold["global_desc"]).max()
        assert err_s < 1e-4, f"dense scores err {err_s:.2e}"
        assert err_d < 1e-4, f"descriptor map err {err_d:.2e}"
        assert err_g < 1e-4, f"global descriptor err {err_g:.2e}"

    def test_harness_catches_transposed_kernel(self, ckpt_and_params, image):
        """Sanity: the harness actually discriminates — a transposed conv
        kernel in the converted tree must blow the descriptor parity."""
        ckpt, params = ckpt_and_params
        bad = jax.tree.map(lambda a: a, params)  # shallow rebuild
        w = np.asarray(bad["desc0"]["w"])
        bad["desc0"] = {"w": jnp.asarray(np.transpose(w, (1, 0, 2, 3))),
                        "b": bad["desc0"]["b"]}
        gold = np_forward(ckpt, image)
        out = hfnet.forward(bad, jnp.asarray(image), with_global=False)
        err_d = np.abs(np.asarray(out["desc_map"]) - gold["desc_map"]).max()
        assert err_d > 1e-2, "harness failed to detect a transposed kernel"

    def test_harness_catches_bn_fold_error(self, ckpt_and_params, image,
                                           monkeypatch):
        """Sanity: converting the WHOLE tree with a wrong BN-fold epsilon
        (1e-5 instead of slim's 1e-3) must break output parity. (A
        single-layer eps error at conv0 can decay below tolerance through
        the contracting random blocks; a real converter bug hits every
        BN, which is what this probes.)"""
        ckpt, params = ckpt_and_params
        monkeypatch.setattr(cvt, "BN_EPS", 1e-5)
        bad = cvt.convert(ckpt)
        gold = np_forward(ckpt, image)
        out = hfnet.forward(bad, jnp.asarray(image), with_global=True)
        err_d = np.abs(np.asarray(out["desc_map"]) - gold["desc_map"]).max()
        err_g = np.abs(np.asarray(out["global_desc"])
                       - gold["global_desc"]).max()
        # must exceed the parity test's 1e-4 tolerance — i.e. the harness
        # WOULD flag this conversion
        assert max(err_d, err_g) > 1e-4, \
            f"harness failed to detect a wrong BN-fold epsilon " \
            f"(desc {err_d:.2e}, global {err_g:.2e})"
