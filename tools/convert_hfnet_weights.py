"""Convert a public HF-Net TF1 checkpoint into this framework's .npz params.

The reference consumes the checkpoint through its TF1 -> SavedModel -> ONNX
-> TensorRT export chain (/root/reference/hfnet/export_model.py,
hfnet/README.md:9-50). Here the target is the pure-JAX model in
`hfnet_slam_tpu/models/hfnet.py`, whose parameters are stored
inference-ready (batch norm folded into conv weight/bias, exactly what
TensorRT's builder does to the ONNX graph).

Variable layout of the source (TF slim, scopes per
hfnet/models/hf_net.py + hfnet/models/utils/layers.py:57-109):

  MobilenetV2/Conv/weights + BatchNorm/{gamma,beta,moving_mean,moving_variance}
  MobilenetV2/expanded_conv/depthwise/depthwise_weights + BatchNorm/...
  MobilenetV2/expanded_conv/project/weights + BatchNorm/...
  MobilenetV2/expanded_conv_{1..16}/{expand,depthwise,project}/... (expand only
    when expansion != 1, i.e. every block but the first)
  descriptor/Conv/weights + BatchNorm/...   (3x3, relu6)
  descriptor/Conv_1/{weights,biases}        (1x1, linear)
  detector/Conv/weights + BatchNorm/...
  detector/Conv_1/{weights,biases}
  vlad/memberships/weights + BatchNorm/...  (1x1, linear; BN after conv)
  vlad/clusters                             ([1,1,1,64,320])
  dimensionality_reduction/{weights,biases} (FC 64*320 -> 4096)

Names may carry an outer scope prefix (e.g. 'pred/' in the SavedModel,
HFNetTFModelV2.cc:41-48); matching is by suffix so any prefix works.

Usage:
  python tools/convert_hfnet_weights.py <ckpt-or-npz> <out.npz>

<ckpt-or-npz> is either a TF checkpoint prefix (requires tensorflow, read
via tf.train.load_checkpoint) or a .npz of name->array pairs.
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from hfnet_slam_tpu.models import hfnet  # noqa: E402

BN_EPS = 1e-3  # slim.batch_norm default epsilon


def _fold(w, bn, transpose_dw=False):
    """Fold BN stats into conv weight; returns (w, b) as float32.

    transpose_dw: TF depthwise weights are (H,W,C,mult=1); our grouped conv
    wants HWIO = (H,W,1,C)."""
    gamma, beta, mean, var = bn
    scale = gamma / np.sqrt(var + BN_EPS)
    w = np.asarray(w, np.float32)
    if transpose_dw:
        w = w.transpose(0, 1, 3, 2)  # (H,W,C,1) -> (H,W,1,C)
    w = w * scale.reshape((1,) * (w.ndim - 1) + (-1,))
    b = beta - mean * scale
    return w.astype(np.float32), b.astype(np.float32)


class _Vars:
    """Suffix-matched access to a flat name->array dict."""

    def __init__(self, d):
        self.d = dict(d)

    def get(self, suffix):
        hits = [k for k in self.d if k == suffix or k.endswith("/" + suffix)]
        if len(hits) != 1:
            raise KeyError(f"{suffix}: {len(hits)} matches ({hits[:4]})")
        return np.asarray(self.d[hits[0]], np.float32)

    def bn(self, scope):
        return tuple(
            self.get(f"{scope}/BatchNorm/{n}")
            for n in ("gamma", "beta", "moving_mean", "moving_variance")
        )

    def conv_bn(self, scope, depthwise=False):
        wname = "depthwise_weights" if depthwise else "weights"
        w, b = _fold(self.get(f"{scope}/{wname}"), self.bn(scope), transpose_dw=depthwise)
        return {"w": w, "b": b}

    def conv_bias(self, scope):
        return {
            "w": self.get(f"{scope}/weights"),
            "b": self.get(f"{scope}/biases"),
        }


def convert(var_dict) -> dict:
    """name->array dict (TF layout) -> hfnet param tree (BN folded)."""
    v = _Vars(var_dict)
    p = {}
    p["conv0"] = v.conv_bn("MobilenetV2/Conv")
    blocks = []
    for i, (expansion, _stride, _cout) in enumerate(hfnet.BLOCKS):
        scope = "MobilenetV2/expanded_conv" + (f"_{i}" if i else "")
        blk = {}
        if expansion != 1:
            blk["expand"] = v.conv_bn(f"{scope}/expand")
        blk["depthwise"] = v.conv_bn(f"{scope}/depthwise", depthwise=True)
        blk["project"] = v.conv_bn(f"{scope}/project")
        blocks.append(blk)
    p["blocks"] = blocks

    p["desc0"] = v.conv_bn("descriptor/Conv")
    p["desc1"] = v.conv_bias("descriptor/Conv_1")
    p["det0"] = v.conv_bn("detector/Conv")
    p["det1"] = v.conv_bias("detector/Conv_1")

    p["vlad_memberships"] = v.conv_bn("vlad/memberships")
    clusters = v.get("vlad/clusters")  # (1,1,1,K,C)
    p["vlad_clusters"] = clusters.reshape(hfnet.N_CLUSTERS, hfnet.GLOBAL_FEAT)
    p["proj"] = {
        "w": v.get("dimensionality_reduction/weights"),
        "b": v.get("dimensionality_reduction/biases"),
    }
    _check_shapes(p)
    return p


def _check_shapes(p):
    import jax

    template = hfnet.init_params(jax.random.PRNGKey(0))
    flat_t = dict(hfnet._flatten(template))
    flat_p = dict(hfnet._flatten(p))
    missing = set(flat_t) - set(flat_p)
    extra = set(flat_p) - set(flat_t)
    if missing or extra:
        raise ValueError(f"param tree mismatch: missing={missing} extra={extra}")
    for k, t in flat_t.items():
        if tuple(np.shape(flat_p[k])) != tuple(t.shape):
            raise ValueError(f"{k}: {np.shape(flat_p[k])} != {tuple(t.shape)}")


def load_source(path: str) -> dict:
    if path.endswith(".npz"):
        z = np.load(path)
        return {k: z[k] for k in z.files}
    import tensorflow as tf  # optional dependency, only for real ckpts

    reader = tf.train.load_checkpoint(path)
    return {
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
        if not name.endswith(("Momentum", "ExponentialMovingAverage", "global_step"))
    }


def main():
    if len(sys.argv) != 3:
        print("usage: python tools/convert_hfnet_weights.py <ckpt-or-npz> <out.npz>",
              file=sys.stderr)
        raise SystemExit(2)
    src, dst = sys.argv[1], sys.argv[2]
    params = convert(load_source(src))
    hfnet.save_params(dst, params)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
